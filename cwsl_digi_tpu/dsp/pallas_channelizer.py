"""Pallas TPU kernel: fused NCO mix + polyphase FIR decimation.

STATUS: measured experiment, NOT on the runtime path.  Bench-offs on a
v5e chip (bench.py, 256 channels @ 192 kHz) measured this kernel at
12.4-12.65 us/channel-second vs XLA's batched polyphase matmul at
3.9-4.3 — and a round-3 restructure (whole-tile block-diagonal MXU dot,
K=128) regressed further to 20.7, so the per-channel-dot form below is
kept.  XLA wins because its [C*blocks, BS] @ [BS, NWS] formulation gets a
huge M dimension to amortize the K=16 contraction, while a Pallas tile
is bounded by VMEM; the fusion win this kernel was built for (mixed
signal never touching HBM) does not make up the difference.  Kept as a
documented kernel-engineering record with its parity tests
(tests/test_pallas_channelizer.py); the runtime uses BatchChannelizer.

Math parity with ``channelizer.py`` (reference contract
source/SSBD.hpp:97-183).  One kernel instance processes a
(channel-tile x time-tile) block:

  - the raw IQ tile (with its FIR halo of *past* samples) is DMA'd from HBM
    once per (channel-tile, time-tile) and the NCO tone is one complex
    multiply of a host-precomputed table (f64-accurate) by a per-tile
    phasor — no trig on device, no phase drift;
  - mixing fuses into the polyphase FIR matmul so the mixed signal never
    round-trips to HBM (the XLA version materializes ``mixed`` at [C, T]);
  - data lives transposed as ``[BS, time-blocks]`` so the *lane* dimension
    is the long time axis: tile offsets are 128-aligned, the FIR is
    ``segs^T [NWS, BS] @ m [BS, NB]`` on the MXU, and the overlap-save
    diagonal sum becomes per-sublane lane-rotations (``pltpu.roll``).

State carried between calls: the last ``FO - BS`` *raw* IQ samples plus the
NCO phase offset — cheaper than the mixed-domain history the XLA version
carries, and what makes the fusion possible.

Constraints: ``BS >= 8``, ``C % TILE_C == 0``, block length a multiple of
``tile_t`` (chosen so the per-tile output count is a multiple of 128).
``BatchChannelizer`` remains the general fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cwsl_digi_tpu.constants import SSB_BW
from cwsl_digi_tpu.dsp.channelizer import ChannelizerSpec
from cwsl_digi_tpu.dsp.lowpass import build_ssb_filter

TILE_C = 8
_LANES = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(spec: ChannelizerSpec, tile_t: int, nb_pad: int,
            iq_re_hbm, iq_im_hbm,        # [BS, total_blocks_padded] HBM
            tone_re_ref, tone_im_ref,    # [TILE_C, BS, NB_PAD] VMEM
            rot_ref,                     # [1, TILE_C, 2] VMEM (this tile)
            segs_t_ref,                  # [NWS, BS] VMEM (transposed filter)
            phase_ref,                   # [1, 1] SMEM: out_phase at call start
            audio_ref,                   # [TILE_C, TILE_T // BS] VMEM out
            iq_scratch_re, iq_scratch_im, sem):
    bs, nws = spec.block_size, spec.num_ws
    ti = pl.program_id(1)
    n_out = tile_t // bs                # multiple of 128

    # DMA the IQ block-column tile (incl. halo): columns
    # [ti*n_out, ti*n_out + NB_PAD) — lane offsets are 128-aligned.
    start = ti * n_out
    cp_re = pltpu.make_async_copy(
        iq_re_hbm.at[:, pl.ds(start, nb_pad)], iq_scratch_re, sem.at[0])
    cp_im = pltpu.make_async_copy(
        iq_im_hbm.at[:, pl.ds(start, nb_pad)], iq_scratch_im, sem.at[1])
    cp_re.start()
    cp_im.start()
    cp_re.wait()
    cp_im.wait()

    segs_t = segs_t_ref[:]
    t_idx = (phase_ref[0, 0] + ti * n_out
             + jax.lax.broadcasted_iota(jnp.int32, (1, n_out), 1)) % 4
    sign = jnp.float32(spec.sign)
    a = iq_scratch_re[:]                 # [BS, NB_PAD]
    b = iq_scratch_im[:]

    for c in range(TILE_C):              # static unroll over the channel tile
        rr = rot_ref[0, c, 0]
        ri = rot_ref[0, c, 1]
        t_re = tone_re_ref[c]
        t_im = tone_im_ref[c]
        tr = t_re * rr - t_im * ri       # [BS, NB_PAD]
        tx = t_re * ri + t_im * rr
        mr = a * tr - b * tx             # fused mix, stays in VMEM
        mi = a * tx + b * tr
        # polyphase FIR on the MXU: [NWS, BS] @ [BS, NB_PAD].  The filter
        # rows arrive sublane-REVERSED so the overlap-save diagonal
        # y[t] = sum_s bd[s, t+s] can use a non-negative strided lane
        # rotation (Mosaic allows only stride >= 0, shifts <= vreg width):
        # shear right by s' per sublane, reduce, then undo the constant
        # (NWS-1) offset with one plain roll.
        bd_r = jnp.dot(segs_t, mr, preferred_element_type=jnp.float32)
        bd_i = jnp.dot(segs_t, mi, preferred_element_type=jnp.float32)

        def diag(bd):
            sheared = pltpu.roll(bd, 0, 1, stride=1, stride_axis=0)
            ysum = jnp.sum(sheared, axis=0, keepdims=True)   # [1, NB_PAD]
            # undo the constant (NWS-1) shear offset; roll shifts must be
            # non-negative, so rotate by the modular complement
            return pltpu.roll(ysum, nb_pad - (nws - 1), 1)[0, :n_out]

        y_r = diag(bd_r)[None, :]
        y_i = diag(bd_i)[None, :]
        # output selection Re(y * (j*sign)^t); nested where (jnp.select
        # lowers through argmax, unsupported in Mosaic)
        audio_ref[c, :] = jnp.where(
            t_idx == 0, y_r,
            jnp.where(t_idx == 1, -sign * y_i,
                      jnp.where(t_idx == 2, -y_r, sign * y_i)),
        )[0]


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _pallas_call(spec: ChannelizerSpec, tile_t: int, n_tiles: int,
                 iq_re_t, iq_im_t,         # [BS, total_blocks_padded]
                 tone_re, tone_im,         # [C, BS, NB_PAD]
                 rot, segs_t, phase0):
    c = tone_re.shape[0]
    bs = spec.block_size
    n_out_tile = tile_t // bs
    nb_pad = tone_re.shape[2]
    grid = (c // TILE_C, n_tiles)
    return pl.pallas_call(
        functools.partial(_kernel, spec, tile_t, nb_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),     # iq_re (manual DMA)
            pl.BlockSpec(memory_space=pl.ANY),     # iq_im
            pl.BlockSpec((TILE_C, bs, nb_pad), lambda ci, ti: (ci, 0, 0),
                         memory_space=pltpu.VMEM),    # tone_re
            pl.BlockSpec((TILE_C, bs, nb_pad), lambda ci, ti: (ci, 0, 0),
                         memory_space=pltpu.VMEM),    # tone_im
            pl.BlockSpec((1, TILE_C, 2), lambda ci, ti: (ti, ci, 0),
                         memory_space=pltpu.VMEM),    # rot
            pl.BlockSpec(memory_space=pltpu.VMEM),    # segs_t
            pl.BlockSpec(memory_space=pltpu.SMEM),    # phase0 [1,1]
        ],
        out_specs=pl.BlockSpec((TILE_C, n_out_tile), lambda ci, ti: (ci, ti),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, n_tiles * n_out_tile), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bs, nb_pad), jnp.float32),
            pltpu.VMEM((bs, nb_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=jax.default_backend() == "cpu",  # tests run on CPU
    )(iq_re_t, iq_im_t, tone_re, tone_im, rot, segs_t, phase0)


class PallasChannelizer:
    """Streaming channelizer on the fused Pallas kernel."""

    def __init__(self, fs: int, freqs_hz, bw: int = SSB_BW,
                 latency_log2: int = 3, is_usb: bool = True):
        freqs = np.asarray(freqs_hz, dtype=np.float64)
        if len(freqs) % TILE_C != 0:
            raise ValueError(f"channel count must be a multiple of {TILE_C}")
        self.spec = ChannelizerSpec(fs, len(freqs), bw, latency_log2, is_usb)
        if self.spec.block_size < 8:
            raise ValueError("PallasChannelizer needs Fs/B/2 >= 8 "
                             "(use BatchChannelizer)")
        self.freqs = freqs
        pd = -2.0 * np.pi * (freqs + self.spec.sign * bw / 2.0) / fs
        self._pd = pd
        bs = self.spec.block_size
        self._h_rows = self.spec.num_ws - 1
        self._h = self._h_rows * bs
        # per-tile output count: a multiple of 128 lanes
        self._n_out_tile = 2 * _LANES
        self.tile_t = self._n_out_tile * bs
        nb_need = self._n_out_tile + self._h_rows
        self._nb_pad = _round_up(nb_need, _LANES)
        # tone table over local offsets [-H, tile span), transposed to
        # [BS, NB_PAD] rows; host f64, per-tile phasor restores abs phase
        u = np.arange(-self._h, (self._nb_pad - self._h_rows) * bs)
        ang = pd[:, None] * u[None, :]
        ang = np.angle(np.exp(1j * ang))
        c = len(freqs)
        tone = np.stack([np.cos(ang), np.sin(ang)])     # [2, C, span]
        tone = tone.reshape(2, c, self._nb_pad, bs).transpose(0, 1, 3, 2)
        self.tone_re = jnp.asarray(tone[0].astype(np.float32))
        self.tone_im = jnp.asarray(tone[1].astype(np.float32))
        filt = build_ssb_filter(fs, bw, latency_log2)
        # segs_t[s, r] = filter[s*BS + r], rows reversed for the kernel's
        # non-negative strided shear (see _kernel)
        self.segs_t = jnp.asarray(
            filt.reshape(self.spec.num_ws, bs)[::-1].astype(np.float32))
        self.reset()

    def reset(self) -> None:
        self._iq_tail_re = np.zeros(self._h, np.float32)
        self._iq_tail_im = np.zeros(self._h, np.float32)
        self._abs_sample = 0
        self._out_phase = 0

    def _rot(self, n_tiles: int) -> jax.Array:
        base = self._abs_sample
        t_off = base + np.arange(n_tiles) * self.tile_t
        ang = self._pd[None, :] * t_off[:, None]
        ang = np.angle(np.exp(1j * ang))
        return jnp.asarray(
            np.stack([np.cos(ang), np.sin(ang)], axis=-1), jnp.float32)

    def process(self, iq) -> jax.Array:
        iq = np.asarray(iq)
        if np.iscomplexobj(iq):
            iq_re = iq.real.astype(np.float32)
            iq_im = iq.imag.astype(np.float32)
        else:
            iq_re, iq_im = iq
        t = len(iq_re)
        if t % self.tile_t != 0:
            raise ValueError(f"block length must be a multiple of {self.tile_t}")
        bs = self.spec.block_size
        n_tiles = t // self.tile_t
        # layout: [BS, blocks] transposed, padded to the DMA tile span
        pad_blocks = self._nb_pad - self._h_rows - self._n_out_tile
        pad_re = np.concatenate(
            [self._iq_tail_re, iq_re, np.zeros(pad_blocks * bs, np.float32)])
        pad_im = np.concatenate(
            [self._iq_tail_im, iq_im, np.zeros(pad_blocks * bs, np.float32)])
        iq_re_t = np.ascontiguousarray(pad_re.reshape(-1, bs).T)
        iq_im_t = np.ascontiguousarray(pad_im.reshape(-1, bs).T)
        rot = self._rot(n_tiles)
        phase0 = jnp.asarray([[self._out_phase]], jnp.int32)
        audio = _pallas_call(self.spec, self.tile_t, n_tiles,
                             jnp.asarray(iq_re_t), jnp.asarray(iq_im_t),
                             self.tone_re, self.tone_im, rot, self.segs_t,
                             phase0)
        self._iq_tail_re = pad_re[t : t + self._h]
        self._iq_tail_im = pad_im[t : t + self._h]
        self._abs_sample += t
        self._out_phase = (self._out_phase + t // bs) % 4
        return audio

    def process_window(self, iq) -> jax.Array:
        self.reset()
        iq = np.asarray(iq)
        t = iq.shape[0]
        if t % self.spec.block_size != 0:
            # match BatchChannelizer.process_window's contract exactly so the
            # backends stay drop-in interchangeable
            raise ValueError(
                f"window length must be a multiple of {self.spec.block_size}"
            )
        n_out = t // self.spec.block_size
        pad = (-t) % self.tile_t
        if pad:
            iq = np.concatenate([iq, np.zeros(pad, iq.dtype)])
        return self.process(iq)[:, :n_out]
