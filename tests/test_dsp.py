"""DSP tests: FIR designer parity, SSBD oracle, batched channelizer parity.

The SSBD oracle below *emulates the reference's block/workspace algorithm*
(source/SSBD.hpp:125-183) step by step, so the vectorized implementations are
checked against the actual reference recurrence, not just against themselves.
"""

import numpy as np
import pytest

from cwsl_digi_tpu.dsp.channelizer import BatchChannelizer
from cwsl_digi_tpu.dsp.lowpass import build_lowpass, build_ssb_filter
from cwsl_digi_tpu.dsp.ssbd import SSBD


# ---------------------------------------------------------------------------
# Reference-algorithm emulator (from the documented recurrence, SSBD.hpp).
# ---------------------------------------------------------------------------
class _RefSSBD:
    """Direct emulation of SSBD::Iterate/ProcessBlock for small inputs."""

    def __init__(self, fs, bw, freq, is_usb=True, latency_log2=3):
        latency = 1 << latency_log2
        self.fs, self.bw = fs, bw
        self.filt = build_ssb_filter(fs, bw, latency_log2)
        self.bs = fs // bw // 2
        self.nws = len(self.filt) // self.bs
        self.sign = 1.0 if is_usb else -1.0
        pd = -2.0 * np.pi * (freq + self.sign * bw / 2.0) / fs
        self.tone = np.exp(1j * pd * np.arange(self.bs))
        self.phase_inc = np.exp(1j * pd * self.bs)
        self.phase = 1.0 + 0j
        self.ws = np.zeros(self.nws, np.complex128)
        self.index = 0

    def _process_block(self, block):
        for n in range(self.nws):
            s = np.sum(block * self.tone * self.filt[n * self.bs : (n + 1) * self.bs])
            self.ws[(self.nws - n - 1 + self.index) % self.nws] += s * self.phase
        self.phase *= self.phase_inc
        out = self.ws[self.index]
        self.ws[self.index] = 0.0
        self.index = (self.index + 1) % self.nws
        return out

    def iterate(self, iq4):
        """Consume 4 blocks, emit 4 real samples (SSBD.hpp:128-137)."""
        out = np.empty(4)
        for k in range(4):
            y = self._process_block(iq4[k * self.bs : (k + 1) * self.bs])
            out[k] = [+y.real, -y.imag * self.sign, -y.real, +y.imag * self.sign][k % 4]
        return out

    def process(self, iq):
        outs = []
        step = 4 * self.bs
        for i in range(0, len(iq) - step + 1, step):
            outs.append(self.iterate(iq[i : i + step]))
        return np.concatenate(outs)


# ---------------------------------------------------------------------------
def test_lowpass_taps_structure():
    # reference: source/LowPass.hpp:16-35
    order = 64
    taps = build_lowpass(order, 0.125)
    assert taps[0] == 0.0
    assert taps[order // 2] == 1.0
    np.testing.assert_allclose(taps[1:], taps[1:][::-1], atol=1e-15)  # symmetric
    # independent recomputation of an interior tap
    n = 7
    x = (-order / 2 + n) * np.pi * 0.125
    expect = np.sin(x) / x * (0.54 - 0.46 * np.cos(2 * np.pi * n / order))
    assert taps[n] == pytest.approx(expect, rel=1e-15)


def test_ssb_filter_normalized():
    taps = build_ssb_filter(48000, 6000)
    assert len(taps) == 8 * 2 * 48000 // 6000  # latency*2*Fs/B = 128
    assert np.sum(taps) == pytest.approx(1.0, abs=1e-12)


def test_ssbd_matches_reference_recurrence():
    rng = np.random.default_rng(0)
    fs, bw, freq = 48000, 6000, 3100.0
    n = 4 * (fs // bw // 2) * 40  # 40 Iterate calls
    iq = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    ref = _RefSSBD(fs, bw, freq)
    ours = SSBD(fs, bw, freq)
    np.testing.assert_allclose(ours.process(iq), ref.process(iq), atol=1e-10)


def test_ssbd_lsb_matches_reference_recurrence():
    rng = np.random.default_rng(1)
    fs, bw, freq = 48000, 6000, -2000.0
    n = 4 * (fs // bw // 2) * 30
    iq = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    ref = _RefSSBD(fs, bw, freq, is_usb=False)
    ours = SSBD(fs, bw, freq, is_usb=False)
    np.testing.assert_allclose(ours.process(iq), ref.process(iq), atol=1e-10)


def test_ssbd_streaming_equals_oneshot():
    rng = np.random.default_rng(2)
    fs, bw = 48000, 6000
    bs = fs // bw // 2
    n = bs * 400
    iq = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    one = SSBD(fs, bw, 1234.0)
    full = one.process(iq)
    two = SSBD(fs, bw, 1234.0)
    parts = [two.process(iq[i : i + bs * 40]) for i in range(0, n, bs * 40)]
    np.testing.assert_allclose(full, np.concatenate(parts), atol=1e-10)


def test_ssbd_tone_demodulation():
    """A USB carrier at F+f0 must appear as an f0 audio tone at unit gain."""
    fs, bw, f_dial, f0 = 96000, 6000, 12000.0, 1500.0
    n = fs  # 1 second
    t = np.arange(n) / fs
    iq = np.exp(2j * np.pi * (f_dial + f0) * t)
    d = SSBD(fs, bw, f_dial)
    audio = d.process(iq)
    audio = audio[2 * d.delay :]  # drop filter transient
    spec = np.abs(np.fft.rfft(audio * np.hanning(len(audio))))
    peak_hz = np.argmax(spec) * d.out_rate / len(audio)
    assert peak_hz == pytest.approx(f0, abs=2.0)
    # passband gain ~1 (tone amplitude ~1 -> sine of amplitude ~1)
    assert np.max(np.abs(audio)) == pytest.approx(1.0, rel=0.05)


def test_batch_channelizer_matches_ssbd():
    rng = np.random.default_rng(3)
    fs, bw = 96000, 6000
    bs = fs // bw // 2
    n = bs * 1000
    iq = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    freqs = [-20000.0, 0.0, 7000.0, 31000.0]
    bc = BatchChannelizer(fs, freqs)
    audio = np.asarray(bc.process_window(iq))
    assert audio.shape == (len(freqs), n // bs)
    for i, f in enumerate(freqs):
        gold = SSBD(fs, bw, f).process(iq.astype(np.complex128))
        # float32 device math vs float64 oracle
        np.testing.assert_allclose(audio[i], gold, atol=2e-3)


def test_batch_channelizer_streaming_continuity():
    rng = np.random.default_rng(4)
    fs, bw = 48000, 6000
    bs = fs // bw // 2
    bc = BatchChannelizer(fs, [5000.0, -3000.0])
    sub = bc._sub  # streaming blocks must be sub-block multiples
    n = sub * 6
    iq = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    whole = np.asarray(bc.process_window(iq))
    bc.reset()
    parts = [np.asarray(bc.process(iq[i : i + sub * 2]))
             for i in range(0, n, sub * 2)]
    np.testing.assert_allclose(whole, np.concatenate(parts, axis=1), atol=1e-4)
    # streaming matches the float64 oracle too
    gold = SSBD(fs, bw, 5000.0).process(iq.astype(np.complex128))
    np.testing.assert_allclose(np.concatenate(parts, axis=1)[0], gold, atol=2e-3)
