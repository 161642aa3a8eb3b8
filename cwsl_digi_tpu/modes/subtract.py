"""On-device multi-pass signal subtraction for the GFSK engine.

The reference's deep decode (``jt9 -d 3``) iteratively subtracts decoded
signals inside the external binary.  Round-1 did this on the host, which
meant re-uploading the full audio batch to the device every pass (a 15 s
FT8 window is ~0.7 MB; a 24-window batch is ~17 MB per pass) and
synthesizing each burst in numpy.  This module is the TPU-native version:
the capture batch is uploaded ONCE, and each pass rebuilds the residual on
device from the (tiny) burst parameter lists — host↔device traffic per pass
drops to a few hundred KB of compact decode outputs.

Semantics match ``GFSKDecoder._subtract`` (gfsk_engine.py): for each known
burst, sequentially over a ``lax.scan``

  1. re-encode the payload -> codeword -> tone sequence (generator matmul,
     Gray map, sync template — all MXU/VPU work);
  2. synthesize the GFSK reference: 3-segment Gaussian frequency pulse
     (the block decomposition of the host code's overlapped pulse sum),
     phase cumsum, cos/sin;
  3. refine the frequency from the per-symbol correlation phase slope
     (trusted only within one search bin), which is a pure linear phase
     rotation of the already-synthesized reference — no second cumsum;
  4. fit one global complex gain and subtract the real part in place.

The scan is sequential on purpose: later refits see earlier subtractions,
which cancels better in crowded bands (same reasoning as the host loop).

Precision note: the phase cumsum runs in float32 (TPU-native); accumulated
rounding over a 15 s burst is ~1e-2 rad, i.e. residual after subtraction
<= -38 dB — more than the ~20 dB needed for the next decode pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cwsl_digi_tpu.constants import WAVE_SR
from cwsl_digi_tpu.modes.gfsk import gaussian_frequency_pulse


@functools.partial(jax.jit, static_argnums=(0,))
def subtract_known(spec, audio, params, gen_parity):
    """Rebuild the residual: audio minus every known burst, refit each pass.

    audio:     [B, T] float32 (ORIGINAL capture, device-resident)
    params:    [B, M, k+3] int32, one packed upload per pass:
               [info bits (k) | t0_hop | f0_bin | valid] — t0_hop is the
               burst start in hops (may be negative), f0_bin the absolute
               spectrogram bin of tone 0
    gen_parity:[k, n-k] float32 — systematic generator (code.gen_parity)

    Returns [B, T] float32 residual.
    """
    B, T = audio.shape
    k_info = gen_parity.shape[0]
    infos = params[:, :, :k_info]
    t0_hops = params[:, :, k_info]
    f0_bins = params[:, :, k_info + 1]
    valid = params[:, :, k_info + 2]
    sps, n_sym = spec.sps, spec.n_sym
    L = n_sym * sps
    bps = spec.bits_per_sym
    n_data = len(spec.data_syms)

    pulse = gaussian_frequency_pulse(sps, spec.bt)
    p0 = jnp.asarray(pulse[:sps], jnp.float32)
    p1 = jnp.asarray(pulse[sps : 2 * sps], jnp.float32)
    p2 = jnp.asarray(pulse[2 * sps :], jnp.float32)
    gray = jnp.asarray(spec.gray_map, jnp.int32)
    template = np.zeros(n_sym, np.float32)
    for s, tone in spec.sync_cells:
        template[s] = tone
    template = jnp.asarray(template)
    data_idx = jnp.asarray(spec.data_syms, jnp.int32)
    weights = jnp.asarray([1 << (bps - 1 - b) for b in range(bps)],
                          jnp.float32)
    arange_l = jnp.arange(L, dtype=jnp.int32)
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]
    hmod = spec.tone_spacing / WAVE_SR

    arange_f = arange_l.astype(jnp.float32)

    def step(res, xs):
        info, t0, f0_bin, ok = xs            # [B,k] [B] [B] [B]
        info_f = info.astype(jnp.float32)
        par = jnp.mod(info_f @ gen_parity, 2.0)
        cw = jnp.concatenate([info_f, par], axis=1)[:, : n_data * bps]
        v = (cw.reshape(B, n_data, bps) @ weights).astype(jnp.int32)
        tones = jnp.broadcast_to(template, (B, n_sym))
        tones = tones.at[:, data_idx].set(jnp.take(gray, v).astype(jnp.float32))

        # GFSK instantaneous frequency, block form: symbol b's samples see
        # pulse tails of symbols b-1 / b-2 (edge tones extended virtually)
        t_ext = jnp.concatenate([tones[:, :1], tones, tones[:, -1:]], axis=1)
        dphi_sym = (t_ext[:, 2:, None] * p0 + t_ext[:, 1:-1, None] * p1
                    + t_ext[:, :-2, None] * p2)        # [B, n_sym, sps]
        f0 = f0_bin.astype(jnp.float32) * spec.bin_hz
        dphi = (2.0 * np.pi) * (hmod * dphi_sym.reshape(B, L)
                                + (f0 / WAVE_SR)[:, None])
        phase = jnp.cumsum(dphi, axis=1) - dphi[:, :1]
        zr, zi = jnp.cos(phase), jnp.sin(phase)

        dtone = tones[:, 1:] - tones[:, :-1]           # [B, n_sym-1]
        same = (dtone == 0).astype(jnp.float32)
        # |dtone|<=3 keeps the per-pair phase below pi for the worst
        # plausible start error (~half a hop), avoiding wrap ambiguity
        sel = ((jnp.abs(dtone) >= 1) & (jnp.abs(dtone) <= 3)
               ).astype(jnp.float32)

        def corr(start, df_tot):
            pos = start[:, None] + arange_l[None, :]   # [B, L]
            inb = ((pos >= 0) & (pos < T)).astype(jnp.float32)
            posc = jnp.clip(pos, 0, T - 1)
            seg = jnp.take_along_axis(res, posc, axis=1) * inb
            ang = (2.0 * np.pi / WAVE_SR) * df_tot[:, None] * arange_f
            car, sar = jnp.cos(ang), jnp.sin(ang)
            zcr = zr * car - zi * sar
            zci = zr * sar + zi * car
            cr = (seg * zcr).reshape(B, n_sym, sps).sum(-1)
            ci = (-seg * zci).reshape(B, n_sym, sps).sum(-1)
            return seg, inb, posc, zcr, zci, cr, ci

        def pair(cr, ci):
            pr = cr[:, 1:] * cr[:, :-1] + ci[:, 1:] * ci[:, :-1]
            pi = ci[:, 1:] * cr[:, :-1] - cr[:, 1:] * ci[:, :-1]
            return pr, pi

        # joint (df, dt) refinement.  A full-burst gain fit needs the
        # frequency right to ~1/(2*burst) Hz and the start to a few tens of
        # samples — far tighter than the search grid.  Per-symbol pair
        # phases separate the two: same-tone pairs see only 2*pi*df*T_sym
        # (time error cancels), tone-change pairs see
        # 2*pi*spacing*dtone*(dt_err) once df is removed.
        start = t0 * spec.hop
        df_tot = jnp.zeros((B,), jnp.float32)
        for _ in range(2):
            _, _, _, _, _, cr, ci = corr(start, df_tot)
            pr, pi = pair(cr, ci)
            srr = (pr * same).sum(-1)
            sri = (pi * same).sum(-1)
            df = jnp.arctan2(sri, srr) / (2.0 * np.pi * sps / WAVE_SR)
            df = jnp.where((same.sum(-1) > 0)
                           & (jnp.abs(df) < spec.bin_hz), df, 0.0)
            df_tot = df_tot + df
            _, _, _, _, _, cr, ci = corr(start, df_tot)
            pr, pi = pair(cr, ci)
            w = jnp.sqrt(pr * pr + pi * pi) * sel
            th = jnp.arctan2(pi, pr)
            den = 2.0 * np.pi * spec.tone_spacing * (w * dtone * dtone
                                                     ).sum(-1)
            dt = (w * th * dtone).sum(-1) / jnp.maximum(den, 1e-20)
            shift = jnp.round(dt * WAVE_SR).astype(jnp.int32)
            start = start - jnp.clip(shift, -sps, sps)

        # single global complex gain over the in-window span (|z2| = 1)
        seg, inb, posc, z2r, z2i, _, _ = corr(start, df_tot)
        denom = jnp.maximum(inb.sum(-1), 1.0)
        ar = 2.0 * (seg * z2r).sum(-1) / denom
        ai = -2.0 * (seg * z2i).sum(-1) / denom
        sub = (ar[:, None] * z2r - ai[:, None] * z2i) * inb
        sub = sub * ok.astype(jnp.float32)[:, None]
        res = res.at[rows, posc].add(-sub)
        return res, None

    xs = (jnp.moveaxis(infos, 1, 0), jnp.moveaxis(t0_hops, 1, 0),
          jnp.moveaxis(f0_bins, 1, 0), jnp.moveaxis(valid, 1, 0))
    res, _ = jax.lax.scan(step, audio, xs)
    return res
