"""FT8 end-to-end: encode -> GFSK synth -> batched decode round-trips."""

import numpy as np
import pytest

from cwsl_digi_tpu.modes import ft8
from cwsl_digi_tpu.modes.gfsk import add_noise_at_snr


@pytest.fixture(scope="module")
def decoder():
    return ft8.FT8Decoder(top_k=64, bp_iters=25)


def test_encode_structure():
    tones = ft8.encode_message("CQ W2AXR FN13")
    assert tones.shape == (79,)
    np.testing.assert_array_equal(tones[0:7], ft8.COSTAS)
    np.testing.assert_array_equal(tones[36:43], ft8.COSTAS)
    np.testing.assert_array_equal(tones[72:79], ft8.COSTAS)
    assert tones.min() >= 0 and tones.max() <= 7


def test_decode_clean_signal(decoder):
    text = "CQ W2AXR FN13"
    audio = ft8.synthesize(text, f0_hz=1500.0)
    results = decoder.decode(audio)[0]
    assert len(results) >= 1
    best = results[0]
    assert best.message == text
    assert best.freq_hz == pytest.approx(1500.0, abs=4.0)
    assert best.dt_s == pytest.approx(0.0, abs=0.05)


def test_decode_multiple_signals_one_window(decoder):
    texts = ["CQ W2AXR FN13", "K1ABC W9XYZ -15", "CQ DX VE3XYZ EN93"]
    freqs = [600.0, 1400.0, 2200.0]
    audio = sum(ft8.synthesize(t, f) for t, f in zip(texts, freqs))
    rng = np.random.default_rng(5)
    audio = audio + 0.05 * rng.standard_normal(len(audio))
    results = decoder.decode(audio)[0]
    got = {r.message for r in results}
    assert set(texts) <= got


def test_decode_batch_of_windows(decoder):
    texts = ["CQ W2AXR FN13", "K1ABC W9XYZ RR73"]
    wins = np.stack([ft8.synthesize(t, 1000.0 + 200 * i) for i, t in enumerate(texts)])
    out = decoder.decode(wins)
    assert [r[0].message for r in out] == texts


def test_decode_at_negative_snr(decoder):
    """Decode at -10 dB SNR (2.5 kHz ref) — well into weak-signal territory."""
    text = "K1ABC W9XYZ R-08"
    rng = np.random.default_rng(7)
    clean = ft8.synthesize(text, f0_hz=1700.0)
    audio = add_noise_at_snr(clean, -10.0, ft8.WAVE_SR, rng)
    results = decoder.decode(audio)[0]
    assert any(r.message == text for r in results)


def test_decode_with_time_offset(decoder):
    text = "CQ W2AXR FN13"
    audio = ft8.synthesize(text, f0_hz=1200.0, start_s=1.3)
    results = decoder.decode(audio)[0]
    assert results and results[0].message == text
    assert results[0].dt_s == pytest.approx(0.8, abs=0.05)


def test_ap_decoding_extends_floor():
    """AP hypotheses decode CQ/directed messages below the plain BP floor
    (reference AP flags, DecoderPool.hpp:466-469)."""
    apdec = ft8.FT8Decoder(ap=True, my_call="K1ABC")
    text = "CQ W2AXR FN13"
    ok = 0
    for i in range(6):
        rng = np.random.default_rng(7000 + i)
        a = add_noise_at_snr(ft8.synthesize(text, 900.0 + 200 * i,
                                            start_s=0.55), -20.0, 12000, rng)
        if any(r.message == text for r in apdec.decode(a, depth=1)[0]):
            ok += 1
    assert ok >= 5
    # AP must not hallucinate on noise
    rng = np.random.default_rng(99)
    noise = rng.standard_normal(int(ft8.T_R * ft8.WAVE_SR)).astype(np.float32)
    assert apdec.decode(noise)[0] == []


def test_multipass_subtraction_uncovers_buried_signal():
    """Depth>=2 decodes a signal 15 dB under a co-channel strong one
    (reference deep-decode behavior, decodedepth config.ini:213-215)."""
    dec = ft8.FT8Decoder()
    strong, weak = "CQ W2AXR FN13", "K1ABC W9XYZ -15"
    a = ft8.synthesize(strong, 1500.0, amplitude=1.0, start_s=0.5)
    a += ft8.synthesize(weak, 1503.0, amplitude=0.18, start_s=0.62)
    rng = np.random.default_rng(0)
    a = add_noise_at_snr(a, -4.0, ft8.WAVE_SR, rng)
    msgs1 = {r.message for r in dec.decode(a, depth=1)[0]}
    msgs3 = {r.message for r in dec.decode(a, depth=3)[0]}
    assert weak not in msgs1 and strong in msgs1
    assert {strong, weak} <= msgs3


def test_subtraction_residual_does_not_mask_distant_weak_signal():
    """Regression: the global-gain subtraction decohered on the df
    estimator's ~0.05 Hz residual error, leaving a strong burst's power
    essentially intact and masking weak signals HUNDREDS of Hz away.
    The time-varying (per-symbol smoothed) gain must cancel a -8 dB
    burst to the noise floor so a -19 dB signal 376 Hz below survives
    depth-2 decoding (seed chosen adversarially from a failing run)."""
    weak, strong = 'FT0R GH8YJI AP27', 'GB1EVW TC1TSV HP66'
    wlen = int(ft8.T_R * 12_000)
    noise_power = 0.5 / 2500.0 * (12_000 / 2.0)
    rng = np.random.default_rng(1000 - 19)
    noise = rng.standard_normal(wlen) * np.sqrt(noise_power)
    win = (noise
           + 10.0 ** (-19 / 20.0) * ft8.synthesize(weak, 1332.74, start_s=0.64)
           + 10.0 ** (-8.0 / 20.0) * ft8.synthesize(strong, 1708.55,
                                                    start_s=0.79)
           ).astype(np.float32)
    dec = ft8.FT8Decoder()
    msgs = {r.message for r in dec.decode(win)[0]}
    assert {weak, strong} <= msgs


def test_crowded_band_capacity():
    """Many overlapping signals across a 20 dB dynamic range: the hybrid
    candidate selection + iterative refit subtraction must pull out a solid
    majority with zero false decodes."""
    rng = np.random.default_rng(42)
    texts = [f"CQ K{i}AB{chr(65 + i % 26)} FN{i % 90:02d}" for i in range(1, 13)]
    audio = np.zeros(180000)
    freqs = np.sort(rng.uniform(400, 2800, len(texts)))
    amps = 10 ** (rng.uniform(-18, 0, len(texts)) / 20)
    for t, f, a in zip(texts, freqs, amps):
        audio += ft8.synthesize(t, float(f), amplitude=float(a),
                                start_s=float(rng.uniform(0.4, 0.7)))
    audio = add_noise_at_snr(audio, 6.0, ft8.WAVE_SR, rng)
    dec = ft8.FT8Decoder()
    got = {r.message for r in dec.decode(audio, depth=3)[0]}
    assert len(got - set(texts)) == 0          # no false decodes
    assert len(got & set(texts)) >= 8, f"only {len(got & set(texts))}/12"


def test_no_false_decodes_on_noise(decoder):
    rng = np.random.default_rng(11)
    noise = rng.standard_normal(int(ft8.T_R * ft8.WAVE_SR)).astype(np.float32)
    results = decoder.decode(noise)[0]
    assert results == []


def test_device_subtraction_matches_host():
    """modes/subtract.subtract_known == the host _subtract loop (the
    device path is what decode() actually uses; the host path is the
    readable oracle)."""
    from cwsl_digi_tpu.modes.subtract import subtract_known

    dec = ft8.FT8Decoder()
    rng = np.random.default_rng(5)
    text = "CQ W2AXR FN13"
    a = ft8.synthesize(text, 1501.3, amplitude=1.0, start_s=0.53)
    a = add_noise_at_snr(a, +10.0, ft8.WAVE_SR, rng).astype(np.float32)

    out = dec.decode_arrays(a)
    score = np.where(out["valid"], out["score"], -np.inf)
    wi, k0 = np.unravel_index(np.argmax(score), score.shape)
    info = np.asarray(out["payload"][wi, k0], np.uint8)
    t0_hop = int(out["t0_hop"][wi, k0])
    f0_bin = int(out["f0_bin"][wi, k0])

    host = a.copy()
    dec._subtract(host, info, t0_hop, f0_bin)

    m, k = 8, dec.bp.code.k
    params = np.zeros((1, m, k + 3), np.int32)
    params[0, 0, :k] = info[:k]
    params[0, 0, k:] = [t0_hop, f0_bin, 1]
    device = np.asarray(subtract_known(
        dec.spec, a[None, :], params, dec._gen_parity_f32))[0]

    sig_power = float(np.mean(ft8.synthesize(text, 1501.3) ** 2))
    host_removed = a - host
    dev_removed = a - device
    assert np.mean(host_removed**2) > 0.25 * sig_power
    assert np.mean(dev_removed**2) > 0.25 * sig_power
    # device and host subtract nearly the same waveform
    err = np.mean((dev_removed - host_removed) ** 2) / np.mean(host_removed**2)
    assert err < 1e-3
