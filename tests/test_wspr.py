"""WSPR native decoder tests: codec round-trips and end-to-end decode."""

import numpy as np
import pytest

from cwsl_digi_tpu.modes import wspr
from cwsl_digi_tpu.modes.gfsk import add_noise_at_snr


@pytest.fixture(scope="module")
def decoder():
    return wspr.WSPRDecoder(top_k=8, beam_width=256)


def test_message_pack_roundtrip():
    for call, grid, dbm in [("W2AXR", "FN13", 37), ("K1ABC", "EN34", 10),
                            ("G4XYZ", "IO91", 23), ("VE3ABC", "EN93", 0)]:
        bits = wspr.pack_message(call, grid, dbm)
        assert bits.shape == (50,)
        assert wspr.unpack_message(bits) == (call, grid, dbm)


def test_conv_encoder_properties():
    bits = wspr.pack_message("W2AXR", "FN13", 37)
    coded = wspr.conv_encode(bits)
    assert coded.shape == (162,)
    # linearity over GF(2)
    b2 = wspr.pack_message("K1ABC", "EN34", 10)
    x = wspr.conv_encode((bits + b2) % 2)
    np.testing.assert_array_equal(x, (coded + wspr.conv_encode(b2)) % 2)


def test_interleaver_is_permutation():
    assert sorted(wspr.INTERLEAVE.tolist()) == list(range(162))


def test_encode_tones():
    tones = wspr.encode("W2AXR", "FN13", 37)
    assert tones.shape == (162,)
    assert tones.min() >= 0 and tones.max() <= 3
    # LSB carries the sync vector
    np.testing.assert_array_equal(tones % 2, wspr.SYNC)


def test_decode_clean(decoder):
    audio = wspr.synthesize("W2AXR", "FN13", 37, f0_hz=1500.0)
    res = decoder.decode(audio)[0]
    assert res and res[0].message == "W2AXR FN13 37"
    assert res[0].freq_hz == pytest.approx(1500.0, abs=1.5)


def test_decode_noisy(decoder):
    rng = np.random.default_rng(2)
    clean = wspr.synthesize("K1ABC", "EN34", 30, f0_hz=1520.0)
    audio = add_noise_at_snr(clean, -18.0, 12000, rng)
    res = decoder.decode(audio)[0]
    assert any(r.message == "K1ABC EN34 30" for r in res)


def test_drift_search_recovers_drifting_signal(decoder):
    """A 3 Hz end-to-end drift (4+ bins of smear) decodes via the drift
    hypothesis grid (wsprd's +-4 Hz search)."""
    import scipy.signal as _ss

    tones = wspr.encode("K1ABC", "EN34", 30)
    from cwsl_digi_tpu.modes.gfsk import gfsk_modulate

    sig = gfsk_modulate(tones, 1500.0, wspr.SPS, 12000, wspr.TONE_SPACING)
    n = len(sig)
    ph = np.cumsum(2 * np.pi * 3.0 * (np.arange(n) / n - 0.5) / 12000)
    drifted = np.real(_ss.hilbert(sig) * np.exp(1j * ph))
    audio = np.zeros(int(wspr.T_R * 12000))
    s = int(wspr.SIGNAL_START_S * 12000)
    audio[s : s + n] = drifted
    rng = np.random.default_rng(9)
    audio = add_noise_at_snr(audio, -18.0, 12000, rng)
    res = decoder.decode(audio)[0]
    assert any(r.message == "K1ABC EN34 30" and abs(r.drift_hz - 3.0) <= 1.0
               for r in res)


def test_noise_rejection(decoder):
    rng = np.random.default_rng(3)
    noise = rng.standard_normal(int(wspr.T_R * 12000)).astype(np.float32)
    assert decoder.decode(noise)[0] == []


def test_code_matrices_right_inverse():
    G, R = wspr._code_matrices()
    assert G.shape == (50, 162) and R.shape == (162, 50)
    np.testing.assert_array_equal(G.dot(R) % 2, np.eye(50, dtype=np.uint8))
    # any codeword maps back to its message
    rng = np.random.default_rng(5)
    msg = rng.integers(0, 2, 50).astype(np.uint8)
    cw = msg.dot(G) % 2
    np.testing.assert_array_equal(cw.dot(R) % 2, msg)
    np.testing.assert_array_equal(wspr.conv_encode(msg), cw)


def test_osd_fallback_recovers_true_bits(decoder):
    """The OSD pass (wsprd -o analogue) recovers the message bits even when
    handed only the channel LLRs of a noisy candidate."""
    rng = np.random.default_rng(11)
    clean = wspr.synthesize("K1ABC", "FN42", 30, f0_hz=1512.3)
    audio = add_noise_at_snr(clean, -22.0, 12000, rng)
    out = decoder.decode_arrays(audio)
    true_bits = wspr.pack_message("K1ABC", "FN42", 30)
    n_osd = out["osd_bits"].shape[1]
    assert n_osd > 0
    assert any(np.array_equal(out["osd_bits"][0, k], true_bits)
               for k in range(n_osd))


def test_deep_snr_recall_floor_minus28():
    """CI anchor for the calibrated operating point (WSPR_CALIBRATION.json):
    randomized trials at -28 dB must keep >=6/8 recall with the default
    beam width (wsprcycles=3000 analogue).  The calibration sweep showed
    recall is flat across beam widths 256-1024, so a regression here means
    demod/gates, not search effort."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import parity

    from cwsl_digi_tpu.modes import wspr as m
    from cwsl_digi_tpu.modes.gfsk import add_noise_at_snr

    rng = np.random.default_rng(28)
    cfg = parity.SWEEPS["WSPR"]
    dec = m.WSPRDecoder()
    wins, wants = [], []
    for _ in range(8):
        clean, want = parity.make_trial("WSPR", rng, cfg["f0"], cfg["dt"])
        wins.append(add_noise_at_snr(clean, -28.0, 12000, rng))
        wants.append(want)
    res = dec.decode(np.stack(wins))
    ok = sum(w in [r.message for r in rl] for w, rl in zip(wants, res))
    assert ok >= 6, f"-28 dB recall regression: {ok}/8"
