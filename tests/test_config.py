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
            ftdecoderdepth=2
            unknownkey=tolerated
            [reporting]
            pskreporter=true
            """
        )
    )
    cfg = load_config(ini)
    assert cfg.get("operator", "callsign") == "W2AXR"
    assert cfg.get("radio", "freqcalibration") == pytest.approx(1.000000048)
    assert cfg.get("wsjtx", "ftdecoderdepth") == 2
    assert cfg.get("reporting", "pskreporter") is True
    assert len(cfg.decoders) == 3
    cfg2 = load_config(ini, overrides=["wsjtx.ftdecoderdepth=3",
                                       "decoders.decoder=7038600 WSPR"])
    assert cfg2.get("wsjtx", "ftdecoderdepth") == 3
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
