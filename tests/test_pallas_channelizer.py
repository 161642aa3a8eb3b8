"""Pallas fused channelizer kernel vs the float64 oracle (interpret mode on
CPU; the same kernel compiles for TPU)."""

import numpy as np
import pytest

from cwsl_digi_tpu.dsp.pallas_channelizer import PallasChannelizer, TILE_C
from cwsl_digi_tpu.dsp.ssbd import SSBD


def test_pallas_matches_oracle():
    fs, bw = 192_000, 6_000
    freqs = np.linspace(-80_000, 80_000, TILE_C)
    pc = PallasChannelizer(fs, freqs)
    rng = np.random.default_rng(0)
    n = pc.tile_t * 3
    iq = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64)
    audio = np.asarray(pc.process_window(iq))
    assert audio.shape == (TILE_C, n // pc.spec.block_size)
    for i in (0, 3, TILE_C - 1):
        gold = SSBD(fs, bw, float(freqs[i])).process(iq.astype(np.complex128))
        np.testing.assert_allclose(audio[i], gold, atol=2e-3)


def test_pallas_streaming_continuity():
    fs = 192_000
    freqs = np.linspace(-50_000, 50_000, TILE_C)
    pc = PallasChannelizer(fs, freqs)
    rng = np.random.default_rng(1)
    n = pc.tile_t * 4
    iq = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64)
    whole = np.asarray(pc.process_window(iq))
    pc.reset()
    parts = [np.asarray(pc.process(iq[i : i + pc.tile_t]))
             for i in range(0, n, pc.tile_t)]
    np.testing.assert_allclose(whole, np.concatenate(parts, axis=1), atol=1e-4)


def test_pallas_rejects_bad_configs():
    with pytest.raises(ValueError):
        PallasChannelizer(192_000, np.zeros(TILE_C + 1))   # channel count
    with pytest.raises(ValueError):
        PallasChannelizer(48_000, np.zeros(TILE_C))        # BS < 8
