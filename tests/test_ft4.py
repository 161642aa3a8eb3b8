"""FT4 end-to-end round-trips through the shared GFSK engine."""

import numpy as np
import pytest

from cwsl_digi_tpu.modes import ft4
from cwsl_digi_tpu.modes.gfsk import add_noise_at_snr


@pytest.fixture(scope="module")
def decoder():
    return ft4.FT4Decoder(top_k=48, bp_iters=25)


def test_encode_structure():
    tones = ft4.encode_message("CQ W2AXR FN13")
    assert tones.shape == (105,)
    for off, seq in ft4.SYNC_SEQS:
        np.testing.assert_array_equal(tones[off : off + 4], seq)
    assert tones.min() >= 0 and tones.max() <= 3


def test_decode_clean(decoder):
    text = "CQ W2AXR FN13"
    audio = ft4.synthesize(text, f0_hz=1400.0)
    res = decoder.decode(audio)[0]
    assert res and res[0].message == text
    assert res[0].freq_hz == pytest.approx(1400.0, abs=12.0)


def test_decode_noisy(decoder):
    text = "K1ABC W9XYZ R-12"
    rng = np.random.default_rng(5)
    audio = add_noise_at_snr(ft4.synthesize(text, 900.0), -8.0, 12000, rng)
    res = decoder.decode(audio)[0]
    assert any(r.message == text for r in res)


def test_two_signals(decoder):
    texts = ["CQ W2AXR FN13", "K1ABC W9XYZ 73"]
    audio = ft4.synthesize(texts[0], 700.0) + ft4.synthesize(texts[1], 2100.0)
    res = decoder.decode(audio)[0]
    assert set(texts) <= {r.message for r in res}


def test_noise_rejection(decoder):
    rng = np.random.default_rng(6)
    noise = rng.standard_normal(int(ft4.T_R * 12000)).astype(np.float32)
    assert decoder.decode(noise)[0] == []
