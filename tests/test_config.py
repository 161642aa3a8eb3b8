"""Config layer tests (reference contract: source/CWSL_DIGI.cpp:534-1063)."""

import textwrap

import pytest

from cwsl_digi_tpu.config import default_config, load_config, parse_decoder_line
from cwsl_digi_tpu.constants import (
    LONG_MODES,
    Mode,
    get_rx_period,
    is_mode_fst4,
    is_mode_fst4w,
)


def test_mode_periods():
    # reference: source/CWSL_DIGI.hpp:44-113
    assert get_rx_period("FT8") == 15.0
    assert get_rx_period("FT4") == 7.5
    assert get_rx_period("WSPR") == 120.0
    assert get_rx_period("JT65") == 60.0
    assert get_rx_period("Q65-30") == 30.0
    assert get_rx_period("JS8") == 15.0
    assert get_rx_period("FST4-1800") == 1800.0
    assert get_rx_period("FST4W-120") == 120.0
    with pytest.raises(ValueError):
        get_rx_period("FT9000")


def test_fst4_predicates():
    assert is_mode_fst4("FST4-60") and not is_mode_fst4("FST4W-120")
    assert is_mode_fst4w("FST4W-900") and not is_mode_fst4w("FST4-900")
    assert Mode.WSPR in LONG_MODES and Mode.FT8 not in LONG_MODES


def test_decoder_line_grammar():
    # reference: source/CWSL_DIGI.cpp:731-836 "freq mode [shmem] [cal] [wsprcall]"
    d = parse_decoder_line("14074000 FT8")
    assert d.freq == 14074000 and d.mode == Mode.FT8 and d.smnum == -1
    d = parse_decoder_line("7038600 WSPR 1 1.000000123 W2AXR")
    assert d.smnum == 1 and d.wspr_call == "W2AXR"
    assert d.calibrated_freq == pytest.approx(7038600 / 1.000000123)
    with pytest.raises(ValueError):
        parse_decoder_line("14074000")


def test_ini_and_overrides(tmp_path):
    ini = tmp_path / "config.ini"
    ini.write_text(
        textwrap.dedent(
            """
            [radio]
            freqcalibration=1.000000048
            [operator]
            callsign=W2AXR
            gridsquare=FN13
            [decoders]
            decoder=14074000 FT8
            decoder=7074000 FT8
            decoder=14095600 WSPR
            [wsjtx]
            decodedepth=2
            unknownkey=tolerated
            [reporting]
            pskreporter=true
            """
        )
    )
    cfg = load_config(ini)
    assert cfg.get("operator", "callsign") == "W2AXR"
    assert cfg.get("radio", "freqcalibration") == pytest.approx(1.000000048)
    assert cfg.get("wsjtx", "decodedepth") == 2
    assert cfg.get("reporting", "pskreporter") is True
    assert len(cfg.decoders) == 3
    cfg2 = load_config(ini, overrides=["wsjtx.decodedepth=3",
                                       "decoders.decoder=7038600 WSPR"])
    assert cfg2.get("wsjtx", "decodedepth") == 3
    assert len(cfg2.decoders) == 4


def test_pool_sizing_heuristic():
    # reference: source/CWSL_DIGI.cpp:856-885
    cfg = default_config()
    from cwsl_digi_tpu.config import DecoderLine

    lines = [DecoderLine(14074000 + i, Mode.FT8) for i in range(10)]
    lines += [DecoderLine(14095600 + i, Mode.WSPR) for i in range(3)]
    cfg.set("decoders", "decoders", lines)
    n = cfg.num_decode_slots()
    assert n == round(10 / 5 + 3 / 3 + 0.55) == 4
    assert cfg.max_long_slots() == max(1, round(n * 3 / 13))


def test_reference_config_keys(tmp_path):
    """Every key from the reference's option table (source/CWSL_DIGI.cpp:537-574)
    parses under its exact reference name."""
    ini = tmp_path / "config.ini"
    ini.write_text(
        textwrap.dedent(
            """\
            [radio]
            freqcalibration=1.0
            sharedmem=-1
            [operator]
            callsign=W2AXR
            gridsquare=FN13
            [decoders]
            decoder=14074000 FT8
            [wsjtx]
            decoderburden=1.5
            keepwav=true
            numjt9instances=4
            maxwsprdinstances=2
            numjt9threads=3
            highestdecodefreq=4000
            decodedepth=3
            temppath=/tmp/x
            binpath=/opt/wsjtx/bin
            ftaudioscalefactor=0.85
            wspraudioscalefactor=0.25
            maxdataage=5
            wsprcycles=500
            transfermethod=wavfile
            [js8call]
            binpath=/opt/js8call/bin
            [reporting]
            pskreporter=true
            wsprnet=true
            rbn=true
            aggregatorport=2216
            aggregatorip=10.0.0.1
            ignoredcalls=BADCALL1 BADCALL2
            [logging]
            statsreportinginterval=60
            decodesfile=dec.log
            logreports=false
            printjt9output=true
            loglevel=5
            badmsglog=bad.log
            logimmediately=true
            logfile=out.log
            """
        )
    )
    cfg = load_config(ini)
    assert cfg.get("wsjtx", "decoderburden") == pytest.approx(1.5)
    assert cfg.get("wsjtx", "keepwav") is True
    assert cfg.get("wsjtx", "numjt9instances") == 4
    assert cfg.get("wsjtx", "maxwsprdinstances") == 2
    assert cfg.get("wsjtx", "highestdecodefreq") == 4000
    assert cfg.get("wsjtx", "decodedepth") == 3
    assert cfg.get("wsjtx", "ftaudioscalefactor") == pytest.approx(0.85)
    assert cfg.get("wsjtx", "wspraudioscalefactor") == pytest.approx(0.25)
    assert cfg.get("wsjtx", "wsprcycles") == 500
    assert cfg.get("wsjtx", "transfermethod") == "wavfile"
    assert cfg.get("reporting", "rbn") is True
    assert cfg.get("reporting", "aggregatorip") == "10.0.0.1"
    assert cfg.get("reporting", "aggregatorport") == 2216
    assert cfg.get("reporting", "ignoredcalls") == "BADCALL1 BADCALL2"
    assert cfg.get("logging", "statsreportinginterval") == 60
    assert cfg.get("logging", "logreports") is False
