"""Stage-by-stage on-chip profile of the FT8 decode program.

Times each stage of gfsk_engine.decode_program in isolation on the real
device (block_until_ready, no host fetch), plus the end-to-end production
path, so optimization effort lands where the milliseconds are.

Run:  python tools/profile_decode.py [batch]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from cwsl_digi_tpu import jaxcache

jaxcache.enable()

from cwsl_digi_tpu.modes import ft8
from cwsl_digi_tpu.modes.gfsk_engine import _multisym_llrs, decode_program
from cwsl_digi_tpu.modes.osd import flip_patterns, osd_decode
from cwsl_digi_tpu.modes.subtract import subtract_known


def timeit(fn, *args, reps=5, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / reps, out


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    dec = ft8.FT8Decoder()
    spec = dec.spec
    b = batch or dec.max_device_batch
    print(f"device={jax.devices()[0]}  batch={b}  top_k={spec.top_k} "
          f"osd_j={spec.osd_j} depth={spec.depth}")

    rng = np.random.default_rng(0)
    n = int(ft8.T_R * 12_000)
    audio = rng.standard_normal((b, n)).astype(np.float32)
    for w in range(b):
        audio[w] += 0.5 * ft8.synthesize("K1ABC W9XYZ FN20", 800.0 + 3 * w)
    audio_dev = jnp.asarray(audio)

    sps, hop, nfft = spec.sps, spec.hop, spec.nfft
    n_hops = (n - sps) // hop + 1
    fmin_bin = int(spec.fmin_hz / spec.bin_hz)
    fmax_bin = int(np.ceil(spec.fmax_hz / spec.bin_hz)) + 1
    n_bins = fmax_bin - fmin_bin + spec.os_f * spec.n_tones
    dft = dec._dft_mat_dev

    # --- stage 1: spectrogram matmul -------------------------------------
    @jax.jit
    def stage_spect(a):
        idx = jnp.arange(n_hops)[:, None] * hop + jnp.arange(sps)[None, :]
        frames = a[:, idx]
        four = frames.reshape(b * n_hops, sps) @ dft
        four = four.reshape(b, n_hops, 4, n_bins)
        pad = ((0, 0), (spec.pad_hops, spec.pad_hops), (0, 0))
        power_sync = jnp.pad(four[:, :, 2] ** 2 + four[:, :, 3] ** 2, pad)
        stft = jnp.pad(jax.lax.complex(four[:, :, 0], four[:, :, 1]), pad)
        return power_sync, stft

    t, (power_sync, stft) = timeit(stage_spect, audio_dev)
    print(f"spectrogram        {t*1e3:8.2f} ms  ({t/b*1e3:.2f} ms/win)")

    # --- stage 2: sync corr + topk ----------------------------------------
    n_t0 = spec.max_hops
    n_f0 = fmax_bin - fmin_bin

    @jax.jit
    def stage_sync(power_sync):
        acc = jnp.zeros((b, n_t0, n_f0), jnp.float32)
        for sym, tone in spec.sync_cells:
            h0, b0 = spec.os_t * sym, spec.os_f * tone
            acc = acc + jax.lax.slice(power_sync, (0, h0, b0),
                                      (b, h0 + n_t0, b0 + n_f0))
        real_rows = jax.lax.slice(
            power_sync, (0, spec.pad_hops, 0),
            (b, spec.pad_hops + n_hops, power_sync.shape[2]))
        base = jnp.mean(real_rows, axis=(1, 2), keepdims=True) * len(spec.sync_cells)
        score = acc / (base + 1e-30)
        flat = score.reshape(b, -1)
        neigh = jax.lax.reduce_window(
            score, -jnp.inf, jax.lax.max,
            (1, spec.os_t + 1, spec.os_f + 1), (1, 1, 1), "SAME")
        flat_nms = jnp.where(score >= neigh, score, 0.0).reshape(b, -1)
        k_nms = spec.top_k // 2
        v1, i1 = jax.lax.top_k(flat_nms, k_nms)
        v2, i2 = jax.lax.top_k(flat, spec.top_k - k_nms)
        top_val = jnp.concatenate([v1, v2], axis=1)
        top_idx = jnp.concatenate([i1, i2], axis=1)
        return top_val, top_idx // n_f0, top_idx % n_f0

    t, (top_val, t0c, f0c) = timeit(stage_sync, power_sync)
    print(f"sync+topk          {t*1e3:8.2f} ms  ({t/b*1e3:.2f} ms/win)")

    # --- stage 3: gather csym ----------------------------------------------
    @jax.jit
    def stage_gather(stft, t0, f0):
        # mirrors the block-gather layout in decode_program
        n_hops_tot = stft.shape[1]
        hq = -(-n_hops_tot // spec.os_t)
        fq = -(-stft.shape[2] // spec.os_f)
        stft_r = jnp.pad(stft, ((0, 0), (0, hq * spec.os_t - n_hops_tot),
                                (0, fq * spec.os_f - stft.shape[2])))
        stft_r = stft_r.reshape(b, hq, spec.os_t, fq, spec.os_f)
        stft_r = stft_r.transpose(0, 2, 4, 3, 1)

        def slice_block(planes, tt, ff):
            blk = jax.lax.dynamic_slice(
                planes, (tt % spec.os_t, ff % spec.os_f,
                         ff // spec.os_f, tt // spec.os_t),
                (1, 1, spec.n_tones, spec.n_sym))
            return blk[0, 0]

        csym = jax.vmap(jax.vmap(slice_block, in_axes=(None, 0, 0)))(
            stft_r, t0, f0)
        return csym.transpose(0, 1, 3, 2)

    t, csym = timeit(stage_gather, stft, t0c, f0c)
    print(f"csym gather        {t*1e3:8.2f} ms  ({t/b*1e3:.2f} ms/win)")

    # --- stage 4: multisym LLRs ---------------------------------------------
    bitmaps = jnp.asarray(dec._bitmaps)

    @jax.jit
    def stage_llr(csym, f0):
        abs_bin = (f0 + fmin_bin).astype(jnp.float32)
        rot = jnp.exp(-2j * jnp.pi * abs_bin / spec.os_f)
        return _multisym_llrs(
            spec, csym.reshape(b * spec.top_k, spec.n_sym, spec.n_tones),
            rot.reshape(-1), bitmaps).reshape(b, spec.top_k, spec.n_bits)

    t, llr = timeit(stage_llr, csym, f0c)
    print(f"multisym LLRs      {t*1e3:8.2f} ms  ({t/b*1e3:.2f} ms/win)")

    # --- stage 5: BP --------------------------------------------------------
    @jax.jit
    def stage_bp(llr):
        return dec.bp.decode_full(llr.reshape(b * spec.top_k, dec.bp.code.n))

    t, (hard, ok, post) = timeit(stage_bp, llr)
    print(f"BP x{spec.bp_iters}             {t*1e3:8.2f} ms  ({t/b*1e3:.2f} ms/win)")

    # --- stage 6: OSD -------------------------------------------------------
    j = min(spec.osd_j, spec.top_k)
    gen = np.concatenate(
        [np.eye(dec.bp.code.k, dtype=np.uint8), dec.bp.code.gen_parity], axis=1)
    pats = flip_patterns(dec.bp.code.k, spec.osd_singles,
                         spec.osd_tail2, spec.osd_tail3).astype(np.float32)
    osd_llr = jnp.asarray(
        np.asarray(post[: b * j].reshape(b * j, -1)))

    t, _ = timeit(lambda x: osd_decode(gen, x, pats), osd_llr)
    print(f"OSD j={j}           {t*1e3:8.2f} ms  ({t/b*1e3:.2f} ms/win)")

    # --- subtract scan -------------------------------------------------------
    k_info = dec.bp.code.k
    params = np.zeros((b, 8, k_info + 3), np.int32)
    params[:, 0, k_info] = 20
    params[:, 0, k_info + 1] = 600
    params[:, 0, k_info + 2] = 1

    t, _ = timeit(lambda a, p: subtract_known(spec, a, p, dec._gen_parity_f32),
                  audio_dev, jnp.asarray(params))
    print(f"subtract M=8       {t*1e3:8.2f} ms  ({t/b*1e3:.2f} ms/win)")

    # --- full decode_program (device only) ----------------------------------
    def full(a):
        return decode_program(spec, (a.shape[1],), a, dec._crc_mat,
                              dec._bitmaps, dec._window, dec.bp,
                              dec._data_syms, None, None, dft)

    t, out = timeit(full, audio_dev)
    print(f"decode_program     {t*1e3:8.2f} ms  ({t/b*1e3:.2f} ms/win)")

    # --- fetch cost ----------------------------------------------------------
    dec.decode_arrays(audio)            # warm (compile + cache)
    t0 = time.perf_counter()
    dec.decode_arrays(audio)
    t_fetch = time.perf_counter() - t0
    print(f"decode_arrays e2e  {t_fetch*1e3:8.2f} ms  ({t_fetch/b*1e3:.2f} ms/win)")

    # --- production decode() --------------------------------------------------
    dec.decode(audio)                   # warm (compile + cache)
    t0 = time.perf_counter()
    dec.decode(audio)
    t_dec = time.perf_counter() - t0
    print(f"decode() depth={spec.depth}   {t_dec*1e3:8.2f} ms  ({t_dec/b*1e3:.2f} ms/win)")


if __name__ == "__main__":
    main()
