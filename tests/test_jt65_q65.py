"""JT65 and Q65-30 native decoder tests (RS over GF(64) + q-ary engine)."""

import numpy as np
import pytest

from cwsl_digi_tpu.modes import jt65, q65
from cwsl_digi_tpu.modes.gfsk import add_noise_at_snr
from cwsl_digi_tpu.modes.rs64 import RS63


def test_rs63_error_and_erasure_correction():
    rng = np.random.default_rng(0)
    rs = RS63(12)
    info = rng.integers(0, 64, 12)
    cw = rs.encode(info)
    bad = cw.copy()
    err_pos = rng.choice(63, 25, replace=False)   # t = 25 errors correctable
    for p in err_pos:
        bad[p] ^= rng.integers(1, 64)
    assert np.all(rs.decode(bad) == info)
    clean_pos = next(p for p in range(63) if p not in set(err_pos))
    bad[clean_pos] ^= 1  # 26 errors -> fail or miscorrect, never silently "fix"
    out = rs.decode(bad)
    assert out is None or not np.all(out == info)


def test_jt65_message_roundtrip():
    # RR73 is representable because it is a valid (ocean) grid square —
    # the published reason that token was chosen.
    for text in ["CQ W2AXR FN13", "K1ABC W9XYZ -15", "K1ABC W9XYZ RR73",
                 "K1ABC W9XYZ RRR", "K1ABC W9XYZ RO", "CQ 146 K1ABC FN42",
                 "KA1ABC G4XYZ 73", "K1ABC W9XYZ R-22"]:
        syms = jt65.pack_message(text)
        assert syms.shape == (12,) and syms.max() < 64
        assert jt65.unpack_message(syms) == text
    # free text: 13-char base-42 packing with the overflow bits in
    # nc1/nc2 bit 27 (legacy packtext)
    for text in ["TNX FER QSO73", "HELLO WORLD", "73 DE K1ABC"]:
        syms = jt65.pack_message(text)
        assert jt65.unpack_message(syms) == text


def test_jt65_channel_coding_published_parameters():
    # Karn codec: generator roots alpha^3..alpha^53 (fcr=3)
    from cwsl_digi_tpu.modes.rs64 import gpow
    rs = jt65._RS
    assert rs.fcr == 3 and rs.k == 12 and rs.n_parity == 51
    info = np.arange(12, dtype=np.int64) + 1
    cw = rs.encode(info)
    # codeword must vanish at every generator root
    assert max(rs.syndromes(cw)) == 0
    # interleave63 is the 7x9 Fortran transpose; Gray code is reflected
    assert jt65.ILV[1] == 9 and jt65.ILV[7] == 1
    assert sorted(jt65.ILV.tolist()) == list(range(63))
    assert jt65.GRAY[:4].tolist() == [0, 1, 3, 2]
    assert np.all(jt65.UNGRAY[jt65.GRAY] == np.arange(64))


def test_jt65_legacy_field_encodings():
    from cwsl_digi_tpu.modes import legacy72
    # DE token is the published magic constant
    assert legacy72.packcall("DE") == 267796945
    assert legacy72.packcall("CQ") == legacy72.NBASE + 1
    assert legacy72.packcall("QRZ") == legacy72.NBASE + 2
    assert legacy72.unpackcall(legacy72.packcall("G4JNT")) == "G4JNT"
    # grid formula shared with WSPR (G4JNT M1): AA00 -> 179*180 + 0
    assert legacy72.packgrid15("AA00") == 179 * 180
    assert legacy72.packgrid15("RR99") == 0 * 180 + 179
    assert legacy72.unpackgrid15(legacy72.packgrid15("EN37")) == "EN37"


def test_jt65_tones():
    tones = jt65.encode_message("CQ W2AXR FN13")
    assert tones.shape == (126,)
    assert np.all(tones[list(jt65.SYNC_SYMS)] == 0)
    data = tones[list(jt65.DATA_SYMS)]
    assert data.min() >= 2 and data.max() <= 65


def test_jt65_decode_clean_and_noisy():
    dec = jt65.JT65Decoder(top_k=8)
    text = "CQ W2AXR FN13"
    audio = jt65.synthesize(text, f0_hz=1270.5)
    res = dec.decode(audio)[0]
    assert res and res[0].message == text
    # stochastic Chase extends the floor well past the hard-decision limit
    rng = np.random.default_rng(1)
    noisy = add_noise_at_snr(jt65.synthesize(text, 900.0), -21.0, 12000, rng)
    res = dec.decode(noisy)[0]
    assert any(r.message == text for r in res)


def test_jt65_noise_rejection():
    dec = jt65.JT65Decoder(top_k=8)
    rng = np.random.default_rng(2)
    noise = rng.standard_normal(int(jt65.T_R * 12000)).astype(np.float32)
    assert dec.decode(noise)[0] == []


def test_q65_message_roundtrip():
    for text in ["CQ W2AXR FN13", "K1ABC W9XYZ R-08"]:
        syms = q65.pack_message(text)
        assert syms.shape == (13,)
        assert q65.unpack_message(syms) == text


def test_q65_decode():
    dec = q65.Q65Decoder(top_k=8)
    text = "K1ABC W9XYZ R-08"
    audio = q65.synthesize(text, f0_hz=1000.0)
    res = dec.decode(audio)[0]
    assert res and res[0].message == text
    rng = np.random.default_rng(3)
    noisy = add_noise_at_snr(q65.synthesize(text, 1200.0), -16.0, 12000, rng)
    res = dec.decode(noisy)[0]
    assert any(r.message == text for r in res)


def test_q65_noise_rejection():
    dec = q65.Q65Decoder(top_k=8)
    rng = np.random.default_rng(4)
    noise = rng.standard_normal(int(q65.T_R * 12000)).astype(np.float32)
    assert dec.decode(noise)[0] == []


def test_qra_code_encode_syndrome_roundtrip():
    from cwsl_digi_tpu.modes.qra import build_qra_code

    code = build_qra_code(63, 13)
    rng = np.random.default_rng(3)
    for _ in range(5):
        cw = code.encode(rng.integers(0, 64, 13))
        assert code.syndrome_ok(cw)
        bad = cw.copy()
        bad[int(rng.integers(0, 63))] ^= int(rng.integers(1, 64))
        assert not code.syndrome_ok(bad)


def test_qra_mp_decodes_noisy_symbols():
    """GF(64) sum-product corrects a noncoherent 64-FSK channel at an
    Es/N0 where hard decisions carry many symbol errors."""
    from cwsl_digi_tpu.modes.qra import QaryMPDecoder, build_qra_code

    code = build_qra_code(63, 13)
    dec = QaryMPDecoder(code, iters=33)
    rng = np.random.default_rng(11)
    esn0 = 10 ** (7.0 / 10)
    infos, words = [], []
    for _ in range(6):
        info = rng.integers(0, 64, 13)
        cw = code.encode(info)
        e = rng.exponential(1.0, (63, 64))
        ph = rng.uniform(0, 2 * np.pi, 63)
        zr = np.sqrt(esn0) * np.cos(ph) + rng.normal(0, np.sqrt(0.5), 63)
        zi = np.sqrt(esn0) * np.sin(ph) + rng.normal(0, np.sqrt(0.5), 63)
        e[np.arange(63), cw] = zr ** 2 + zi ** 2
        p = np.exp(e - e.max(1, keepdims=True))
        infos.append(info)
        words.append((p / p.sum(1, keepdims=True)).astype(np.float32))
    hard, ok, _ = dec.decode(np.stack(words))
    hard, ok = np.asarray(hard), np.asarray(ok)
    good = sum(1 for t in range(6)
               if ok[t] and (hard[t][:13] == infos[t]).all())
    assert good >= 5


def test_q65_published_sync_positions():
    # q65.f90 isync (1-based): 22 positions in the 85-symbol frame
    assert q65.SYNC_SYMS == tuple(s - 1 for s in
        (1, 9, 12, 13, 15, 22, 23, 26, 27, 33, 35,
         38, 46, 50, 55, 60, 62, 66, 69, 74, 76, 85))
    assert len(q65.DATA_SYMS) == 63
