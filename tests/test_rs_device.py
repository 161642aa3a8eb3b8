"""Device RS(63,12) errors-and-erasures decoder (modes/rs_device.py).

Validates the carry-less GF(2^6) arithmetic and the branchless
errors-and-erasures Berlekamp-Massey against the host reference codec
(modes/rs64.py), plus the chase program's acceptance behavior.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from cwsl_digi_tpu.modes import rs64
from cwsl_digi_tpu.modes.rs_device import (gmul, ginv, rs_chase_program,
                                           rs_ee_decode)


def test_gf64_arithmetic_matches_host_tables():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 64, 300)
    b = rng.integers(0, 64, 300)
    got = np.asarray(gmul(jnp.asarray(a), jnp.asarray(b)))
    exp = np.asarray([rs64.gmul(int(x), int(y)) for x, y in zip(a, b)])
    assert np.array_equal(got, exp)
    nz = np.arange(1, 64)
    gi = np.asarray(ginv(jnp.asarray(nz)))
    assert all(rs64.gmul(int(x), int(y)) == 1 for x, y in zip(nz, gi))
    assert int(np.asarray(ginv(jnp.asarray([0])))[0]) == 0


def test_ee_decode_corrects_within_capacity():
    """Random codewords + f erasures + t errors with 2t + f <= 51 must
    all decode exactly; the corrected-syndrome gate must never pass a
    wrong word."""
    rs = rs64.RS63(k=12, fcr=3)
    rng = np.random.default_rng(1)
    m, n, k = 96, 63, 12
    recv = np.zeros((m, n), np.int64)
    era = np.zeros((m, n), bool)
    truth = np.zeros((m, n), np.int64)
    for i in range(m):
        cw = rs.encode(rng.integers(0, 64, k)).astype(np.int64)
        truth[i] = cw
        f = int(rng.integers(0, 50))
        t = int(rng.integers(0, (51 - f) // 2 + 1))
        pos = rng.permutation(n)
        r = cw.copy()
        for p in pos[:f]:
            era[i, p] = True
            r[p] = rng.integers(0, 64)
        for p in pos[f : f + t]:
            r[p] = (r[p] + 1 + rng.integers(0, 63)) % 64
        recv[i] = r
    corr, ok = rs_ee_decode((63, 12, 3), (), None,
                            jnp.asarray(recv, jnp.int32), jnp.asarray(era))
    corr, ok = np.asarray(corr), np.asarray(ok)
    assert np.all(ok)
    assert np.array_equal(corr, truth)


def test_ee_decode_rejects_noise():
    rng = np.random.default_rng(2)
    m, n = 128, 63
    recv = rng.integers(0, 64, (m, n))
    _, ok = rs_ee_decode((63, 12, 3), (), None,
                         jnp.asarray(recv, jnp.int32),
                         jnp.asarray(np.zeros((m, n), bool)))
    assert int(np.asarray(ok).sum()) == 0


def _fake_energies(cw: np.ndarray, snr_lin: float, rng) -> tuple:
    """Synthetic top-4 tone energies: the codeword tone carries signal."""
    n = len(cw)
    e = rng.exponential(1.0, (n, 64))
    e[np.arange(n), cw] += snr_lin
    order = np.argsort(-e, axis=1)
    top_tone = order[:, :4]
    top_e = np.take_along_axis(e, top_tone, axis=1)
    return (top_e.astype(np.float32), top_tone.astype(np.int64),
            e.sum(axis=1).astype(np.float32))


def test_chase_program_accepts_true_and_rejects_noise():
    rs = rs64.RS63(k=12, fcr=3)
    rng = np.random.default_rng(3)
    n, k, c = 63, 12, 8
    syms = np.zeros((c, n), np.int64)
    margin = rng.random((c, n)).astype(np.float32)
    tes, tts, ess = [], [], []
    truths = []
    for i in range(c):
        if i < 4:   # true codeword + a few hard errors
            cw = rs.encode(rng.integers(0, 64, k)).astype(np.int64)
            r = cw.copy()
            for p in rng.permutation(n)[:10]:
                r[p] = rng.integers(0, 64)
            te, tt, es = _fake_energies(cw, 8.0, rng)
            truths.append(cw[:k])
        else:       # pure noise candidate
            r = rng.integers(0, 64, n)
            te, tt, es = _fake_energies(rng.integers(0, 64, n), 0.0, rng)
            truths.append(None)
        syms[i] = r
        tes.append(te)
        tts.append(tt)
        ess.append(es)
    info, score, ok = rs_chase_program(
        (63, 12, 3), 64, 6, 0.40,
        jnp.asarray(syms, jnp.int32), jnp.asarray(margin),
        jnp.asarray(np.stack(tes)), jnp.asarray(np.stack(tts), jnp.int32),
        jnp.asarray(np.stack(ess)), jnp.int32(5))
    info, ok = np.asarray(info), np.asarray(ok)
    for i in range(4):
        assert ok[i] and np.array_equal(info[i], truths[i]), i
    assert not ok[4:].any(), "noise candidates must be rejected"
