"""Utility tests: locator/callsign validation, WAV I/O, logging, time."""

import io

import numpy as np
import pytest

from cwsl_digi_tpu.utils.hamutils import band_name, check_call, is_valid_locator
from cwsl_digi_tpu.utils.logging import LogLevel, ScreenPrinter
from cwsl_digi_tpu.utils.timeutils import next_period_boundary
from cwsl_digi_tpu.utils.wav import (
    float_to_int16,
    prepare_audio,
    raw_wav_header,
    read_wav,
    write_wav,
)


def test_locator():
    # reference: source/HamUtils.hpp:26-43
    assert is_valid_locator("FN13")
    assert is_valid_locator("aa00")
    assert not is_valid_locator("F13")
    assert not is_valid_locator("1N13")
    assert not is_valid_locator("FN1X")


def test_check_call():
    # reference: source/OutputHandler.cpp:802-874
    assert check_call("W2AXR")
    assert check_call("K1ABC/P") is True
    assert not check_call("CQ")          # too short / no digit
    assert not check_call("W2")          # too short
    assert not check_call("ABCD")        # no digit
    assert not check_call("1234")        # no letter
    assert not check_call("FN13")        # grid lookalike
    assert not check_call("A1B?")        # bad char
    assert not check_call("A1 B")        # space


def test_band_name():
    assert band_name(14_074_000) == "20m"
    assert band_name(7_074_000) == "40m"
    assert band_name(999) == "?"


def test_wav_roundtrip(tmp_path):
    sr = 12000
    t = np.arange(sr) / sr
    audio = (0.5 * 32767 * np.sin(2 * np.pi * 1000 * t)).astype(np.int16)
    p = tmp_path / "x.wav"
    write_wav(p, audio, sr)
    back, sr2 = read_wav(p)
    assert sr2 == sr
    np.testing.assert_array_equal(audio, back)
    # header layout: 44 bytes, RIFF/WAVE magic (reference: WaveFile.hpp:19-44)
    hdr = raw_wav_header(len(audio), sr)
    assert len(hdr) == 44 and hdr[:4] == b"RIFF" and hdr[8:12] == b"WAVE"


def test_prepare_audio_scaling():
    # reference: Instance::prepareAudio, source/Instance.cpp:294-338
    a = np.array([0.5, -1.0, 0.25])
    out = prepare_audio(a, scale_factor=0.9)
    assert np.max(np.abs(out)) == pytest.approx(32767.0 / 2.0 * 0.9)
    x = float_to_int16(np.array([1e9, -1e9, 0.0]))
    assert x[0] == 32767 and x[1] == -32767 and x[2] == 0


def test_logger_levels_and_prefixes():
    buf = io.StringIO()
    log = ScreenPrinter(level=LogLevel.WARN, immediate=True, stream=buf)
    log.err("boom")
    log.warn("careful")
    log.info("hidden")  # below threshold
    out = buf.getvalue()
    assert "### ERROR boom" in out
    assert "@@@ WARNING careful" in out
    assert "hidden" not in out


def test_next_period_boundary():
    # FT8 fires at UTC multiples of 15 s (reference: CWSL_DIGI.cpp:234-262)
    b = next_period_boundary(15.0, now=100.0)
    assert b == 105.0
    b = next_period_boundary(7.5, now=105.0)
    assert b == 112.5
    assert next_period_boundary(15.0, now=105.0) == 120.0
