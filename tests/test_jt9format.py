"""jt9/wsprd text format round-trips (column-parsing compat, SURVEY §4a)."""

from cwsl_digi_tpu.constants import Mode
from cwsl_digi_tpu.modes.base import DecodeResult
from cwsl_digi_tpu.report.jt9format import (
    format_jt9,
    format_wsprd,
    parse_jt9,
    parse_wsprd,
)


def _res(mode=Mode.FT8, msg="CQ W2AXR FN13"):
    return DecodeResult(message=msg, snr_db=-12.0, dt_s=0.3, freq_hz=1502.0,
                        mode=mode)


def test_jt9_roundtrip():
    line = format_jt9(_res(), epoch_time=1_700_000_115)
    assert line.startswith("221515")   # 2023-11-14 22:15:15 UTC
    assert "~" in line and line.endswith("CQ W2AXR FN13")
    back = parse_jt9(line)
    assert back.message == "CQ W2AXR FN13"
    assert back.snr_db == -12 and back.dt_s == 0.3 and back.freq_hz == 1502


def test_jt9_markers_per_mode():
    assert "~" in format_jt9(_res(Mode.FT8), 0)
    assert "+" in format_jt9(_res(Mode.FT4), 0)
    assert "#" in format_jt9(_res(Mode.JT65), 0)
    assert "`" in format_jt9(_res(Mode.FST4W_300), 0)


def test_jt9_parse_rejects_garbage():
    assert parse_jt9("not a decode line") is None
    assert parse_jt9("000000 xx yy zz ~ MSG") is None


def test_wsprd_roundtrip():
    r = _res(Mode.WSPR, "K1ABC EN34 30")
    r.freq_hz = 1480.2
    line = format_wsprd(r, epoch_time=1_700_000_040, dial_freq_hz=14_095_600)
    back = parse_wsprd(line)
    assert back.message == "K1ABC EN34 30"
    assert abs(back.freq_hz - (14_095_600 + 1480.2)) < 1.0
    assert parse_wsprd("short line") is None
