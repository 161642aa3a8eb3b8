"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

from cwsl_digi_tpu.dsp.ssbd import SSBD
from cwsl_digi_tpu.parallel.mesh import make_mesh
from cwsl_digi_tpu.parallel.timeshard import TimeShardedChannelizer


def test_mesh_construction():
    import jax

    mesh = make_mesh(8, axes=("ch",))
    assert mesh.shape["ch"] == 8
    mesh2 = make_mesh(8, axes=("ch", "t"), shape=(4, 2))
    assert mesh2.shape == {"ch": 4, "t": 2}
    assert len(jax.devices()) >= 8


def test_time_sharded_channelizer_matches_oracle():
    """Halo-exchange time sharding must agree with the serial float64 oracle."""
    fs, bw = 48_000, 6_000
    mesh = make_mesh(4, axes=("t",))
    freqs = [5_000.0, -9_000.0]
    tsc = TimeShardedChannelizer(fs, freqs, mesh)
    bs = tsc.spec.block_size
    t_len = 4 * bs * 512
    rng = np.random.default_rng(0)
    iq = (rng.standard_normal(t_len) + 1j * rng.standard_normal(t_len)).astype(
        np.complex64
    )
    audio = np.asarray(tsc.channelize(iq))
    assert audio.shape == (2, t_len // bs)
    for i, f in enumerate(freqs):
        gold = SSBD(fs, bw, f).process(iq.astype(np.complex128))
        np.testing.assert_allclose(audio[i], gold, atol=2e-3)


def test_sharded_skim_step_decodes():
    """Channel-sharded channelize+decode finds a real signal end to end."""
    from cwsl_digi_tpu.modes import ft8
    from cwsl_digi_tpu.parallel.pipeline import ShardedSkimStep

    fs = 48_000
    mesh = make_mesh(4, axes=("ch",))
    text = "CQ W2AXR FN13"
    # 8 channels; the signal sits in channel 5's passband at 1.5 kHz audio
    freqs = np.linspace(-18_000, 10_000, 8)
    dial = freqs[5]
    tones = ft8.encode_message(text)
    sps_iq = int(round(ft8.SPS * fs / ft8.WAVE_SR))
    burst = _analytic_gfsk(tones, dial + 1500.0, sps_iq, fs, ft8.TONE_SPACING)
    iq = np.zeros(int(ft8.T_R * fs), dtype=np.complex128)
    start = int(0.5 * fs)
    iq[start : start + len(burst)] = burst
    # realistic noise floor: buries the FIR stopband leakage (~-50 dB) that
    # would otherwise decode in *other* channels of a mathematically
    # noiseless window
    rng = np.random.default_rng(3)
    iq += 0.02 * (rng.standard_normal(len(iq)) + 1j * rng.standard_normal(len(iq)))
    step = ShardedSkimStep(fs, freqs, mesh,
                           decoder=ft8.FT8Decoder(top_k=16, bp_iters=20))
    results = step.decode_window(iq.astype(np.complex64))
    assert any(r.message == text for r in results[5])
    # other channels stay quiet
    assert all(len(results[c]) == 0 for c in range(8) if c != 5)


def _analytic_gfsk(tones, f0, sps, fs, spacing):
    from cwsl_digi_tpu.modes.gfsk import gfsk_modulate_iq

    return gfsk_modulate_iq(tones, f0, sps, fs, spacing)
