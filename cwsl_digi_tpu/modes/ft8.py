"""FT8: 8-GFSK, 79 symbols, LDPC(174,91)+CRC14 — native batched TPU decoder.

The flagship mode.  The reference hands 15 s windows to external ``jt9 -8``
processes (source/DecoderPool.hpp:634-676); here the whole decode — sync
search, demodulation, LDPC, CRC — is one fixed-shape JAX program batched
over capture windows and sync candidates.

Protocol structure (public FT8 parameters):
  - 12.64 s burst: 79 symbols x 0.16 s (1920 samples @ 12 kHz), 6.25 baud;
  - 8-GFSK, tone spacing 6.25 Hz, BT=2.0;
  - 7x7 Costas arrays [3,1,4,0,6,5,2] at symbol offsets 0, 36, 72;
  - 58 data symbols carry 174 codeword bits, 3 per symbol, Gray-mapped;
  - codeword = LDPC(174,91) over [77 payload | 14 CRC] (see ldpc.py for the
    interop note on the parity-check table).

TPU-first decode pipeline (all static shapes):
  1. power spectrogram via length-1920 frames, hop 480 (quarter symbol),
     rfft zero-padded to 3840 -> 3.125 Hz bins (half tone spacing);
  2. Costas sync correlation = 21 shifted-slice adds over the spectrogram,
     normalized by the window's mean power -> score map over
     (start-time, base-frequency);
  3. top-K candidates (static K) with a same-frequency suppression pass;
  4. tone-energy gather [batch, K, 79, 8] -> max-log LLRs for 174 bits;
  5. batched normalized min-sum LDPC + matrix CRC -> valid mask;
  6. host: dedupe payloads, unpack text, SNR/dt/freq per decode.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from cwsl_digi_tpu.constants import Mode, WAVE_SR
from cwsl_digi_tpu.modes import message77
from cwsl_digi_tpu.modes.base import DecodeResult
from cwsl_digi_tpu.modes.crc import ft8_crc, ft8_crc_matrix
from cwsl_digi_tpu.modes.gfsk import gfsk_modulate
from cwsl_digi_tpu.modes.ldpc import ft8_code, get_bp_decoder

# ---------------------------------------------------------------------------
# Protocol constants
# ---------------------------------------------------------------------------
COSTAS = np.array([3, 1, 4, 0, 6, 5, 2], dtype=np.int32)
GRAY = np.array([0, 1, 3, 2, 5, 6, 4, 7], dtype=np.int32)      # 3 bits -> tone
IGRAY = np.argsort(GRAY).astype(np.int32)                       # tone -> 3 bits
NSYM = 79
SPS = 1920                  # samples/symbol @ 12 kHz
BAUD = WAVE_SR / SPS        # 6.25
TONE_SPACING = BAUD         # Hz
NUM_TONES = 8
T_R = 15.0
SIGNAL_START_S = 0.5        # nominal burst start within the period
DATA_SYM = np.array([i for i in range(NSYM) if not (i < 7 or 36 <= i < 43 or i >= 72)],
                    dtype=np.int32)          # 58 data symbol positions
assert len(DATA_SYM) == 58

# Decoder grid
HOP = SPS // 4              # 480 samples = 40 ms time resolution
NFFT = 2 * SPS              # 3840 -> 3.125 Hz bins (2 bins per tone step)
BIN_HZ = WAVE_SR / NFFT
FMIN_HZ, FMAX_HZ = 200.0, 3000.0   # reference default band limits
PAD_HOPS = 64               # zero-pad spectrogram for dt search range


# ---------------------------------------------------------------------------
# Encoder (for tests, benchmarks, and signal subtraction)
# ---------------------------------------------------------------------------

def encode_payload(payload77: np.ndarray) -> np.ndarray:
    """payload 77 bits -> 79 tone indices."""
    payload77 = np.asarray(payload77, np.uint8)
    crc = ft8_crc(payload77)
    info91 = np.concatenate([payload77, crc])
    codeword = ft8_code().encode(info91)            # 174 bits
    sym_vals = codeword.reshape(58, 3)
    vals = sym_vals[:, 0] * 4 + sym_vals[:, 1] * 2 + sym_vals[:, 2]
    data_tones = GRAY[vals]
    tones = np.zeros(NSYM, dtype=np.int32)
    tones[0:7] = COSTAS
    tones[36:43] = COSTAS
    tones[72:79] = COSTAS
    tones[DATA_SYM] = data_tones
    return tones


def encode_message(text: str) -> np.ndarray:
    return encode_payload(message77.pack77(text))


def synthesize(
    text: str,
    f0_hz: float = 1500.0,
    amplitude: float = 1.0,
    window_len: int = int(T_R * WAVE_SR),
    start_s: float = SIGNAL_START_S,
) -> np.ndarray:
    """Full 15 s window containing one FT8 burst (no noise)."""
    tones = encode_message(text)
    burst = gfsk_modulate(tones, f0_hz, SPS, WAVE_SR, TONE_SPACING, bt=2.0)
    out = np.zeros(window_len)
    start = int(round(start_s * WAVE_SR))
    n = min(len(burst), window_len - start)
    out[start : start + n] = amplitude * burst[:n]
    return out


# ---------------------------------------------------------------------------
# Batched decoder (device program)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class FT8DecoderConfig:
    top_k: int = 128            # sync candidates per window
    bp_iters: int = 30
    max_hops: int = 128         # sync start-time grid size (after padding)
    depth: int = 2              # decode passes with signal subtraction
    # highest candidate base frequency, matching the reference's
    # `highestdecodefreq` knob (config.ini / CWSL_DIGI.cpp:570)
    fmax_hz: float = FMAX_HZ


def _sync_tables(cfg: FT8DecoderConfig):
    """Static index tables for the sync correlation."""
    # Costas cell offsets (hop, bin) relative to candidate origin
    sym_off = np.concatenate([np.arange(7), 36 + np.arange(7), 72 + np.arange(7)])
    hop_off = (4 * sym_off).astype(np.int32)                  # [21]
    bin_off = (2 * np.tile(COSTAS, 3)).astype(np.int32)       # [21]
    return hop_off, bin_off


@functools.partial(jax.jit, static_argnums=(0, 1))
def _decode_program(
    cfg: FT8DecoderConfig,
    shapes: tuple,                 # (n_samples,)
    audio: jax.Array,              # [B, N] float32
    crc_mat: jax.Array,            # [77, 14] float32
    bitmaps: jax.Array,            # [3, 8] float32: bit j of tone's gray value
    window: jax.Array,             # [SPS] analysis window
):
    (n_samples,) = shapes
    b = audio.shape[0]
    n_hops = (n_samples - SPS) // HOP + 1
    fmin_bin = int(FMIN_HZ / BIN_HZ)
    fmax_bin = int(cfg.fmax_hz / BIN_HZ)
    n_bins = fmax_bin - fmin_bin + 2 * NUM_TONES  # headroom for tone offsets

    # --- 1. spectrogram ---------------------------------------------------
    idx = jnp.arange(n_hops)[:, None] * HOP + jnp.arange(SPS)[None, :]
    frames = audio[:, idx] * window[None, None, :]             # [B, H, SPS]
    spec = jnp.fft.rfft(frames, n=NFFT, axis=-1)
    power = jnp.abs(spec) ** 2                                  # [B, H, NFFT/2+1]
    power = power[:, :, fmin_bin : fmin_bin + n_bins]
    # pad hops at both ends so out-of-window starts are searchable
    power = jnp.pad(power, ((0, 0), (PAD_HOPS, PAD_HOPS), (0, 0)))
    h_tot = n_hops + 2 * PAD_HOPS

    # --- 2. Costas sync score --------------------------------------------
    hop_off, bin_off = _sync_tables(cfg)
    n_t0 = cfg.max_hops
    n_f0 = fmax_bin - fmin_bin
    # score[b, t0, f0] = sum_k power[b, t0+hop_off[k], f0+bin_off[k]]
    acc = jnp.zeros((b, n_t0, n_f0), jnp.float32)
    for k in range(21):
        sl = jax.lax.slice(
            power,
            (0, int(hop_off[k]), int(bin_off[k])),
            (b, int(hop_off[k]) + n_t0, int(bin_off[k]) + n_f0),
        )
        acc = acc + sl
    base = jnp.mean(power, axis=(1, 2), keepdims=True) * 21.0
    score = acc / (base + 1e-30)

    # --- 3. top-K candidates ---------------------------------------------
    flat = score.reshape(b, -1)
    top_val, top_idx = jax.lax.top_k(flat, cfg.top_k)          # [B, K]
    t0 = top_idx // n_f0                                        # hop index
    f0 = top_idx % n_f0                                         # bin offset

    # --- 4. tone energies + LLRs -----------------------------------------
    # E[b, k, s, tone] = power[b, t0 + 4*s, f0 + 2*tone]
    sym_hops = t0[:, :, None] + 4 * jnp.arange(NSYM, dtype=jnp.int32)[None, None, :]
    tone_bins = f0[:, :, None] + 2 * jnp.arange(NUM_TONES, dtype=jnp.int32)[None, None, :]
    bb = jnp.arange(b)[:, None, None, None]
    e = power[bb, sym_hops[:, :, :, None], tone_bins[:, :, None, :]]
    # log-energy LLRs on the 58 data symbols
    le = jnp.log(e + 1e-30)                                     # [B, K, 79, 8]
    le_data = le[:, :, DATA_SYM, :]                             # [B, K, 58, 8]
    # bitmaps[j, tone] = 1 if bit j of IGRAY[tone] is 1
    big = jnp.float32(1e30)
    le_exp = le_data[:, :, :, None, :]                          # [B,K,58,1,8]
    bm = bitmaps[None, None, None, :, :]
    max0 = jnp.max(jnp.where(bm < 0.5, le_exp, -big), axis=-1)
    max1 = jnp.max(jnp.where(bm > 0.5, le_exp, -big), axis=-1)
    llr = (max0 - max1).reshape(b, cfg.top_k, 174)              # bit0 first

    # --- 5. LDPC + CRC ----------------------------------------------------
    bp = get_bp_decoder("ft8", iters=cfg.bp_iters)
    hard, parity_ok = bp.decode(llr.reshape(b * cfg.top_k, 174))
    hard = hard.reshape(b, cfg.top_k, 174)
    parity_ok = parity_ok.reshape(b, cfg.top_k)
    payload = hard[:, :, :77].astype(jnp.float32)
    crc_calc = jnp.mod(jnp.einsum("bkp,pc->bkc", payload, crc_mat,
                                  preferred_element_type=jnp.float32), 2.0)
    crc_ok = jnp.all(jnp.abs(crc_calc - hard[:, :, 77:91]) < 0.5, axis=-1)
    valid = parity_ok & crc_ok

    # --- SNR estimate: sync power over noise floor ------------------------
    noise = jnp.median(power, axis=(1, 2))                      # [B]
    sig = top_val * base[:, :, 0] / 21.0                        # mean sync cell power
    # power ratio in 6.25 Hz effective bandwidth vs 2500 Hz reference
    snr = 10.0 * jnp.log10((sig + 1e-30) / (noise[:, None] + 1e-30)) \
        - 10.0 * np.float32(np.log10(2500.0 / 6.25))

    return {
        "valid": valid,                     # [B, K] bool
        "payload": hard[:, :, :91],         # [B, K, 91] int8
        "t0_hop": t0 - PAD_HOPS,            # [B, K] hop of burst start
        "f0_bin": f0 + fmin_bin,            # [B, K] absolute freq bin
        "score": top_val,                   # [B, K]
        "snr": snr,                         # [B, K]
    }


class FT8Decoder:
    """Host wrapper: batched windows in, DecodeResult lists out."""

    mode = Mode.FT8

    def __init__(self, config: FT8DecoderConfig | None = None, **kw):
        self.cfg = config or FT8DecoderConfig(**kw)
        self._crc_mat = jnp.asarray(ft8_crc_matrix().astype(np.float32))
        bitmaps = np.zeros((3, NUM_TONES), np.float32)
        for tone in range(NUM_TONES):
            v = int(IGRAY[tone])
            for j in range(3):
                bitmaps[j, tone] = (v >> (2 - j)) & 1
        self._bitmaps = jnp.asarray(bitmaps)
        self._window = jnp.asarray(np.hanning(SPS).astype(np.float32))

    def decode_arrays(self, audio: np.ndarray) -> dict[str, np.ndarray]:
        """Run the device program; returns host arrays."""
        audio = np.asarray(audio, dtype=np.float32)
        if audio.ndim == 1:
            audio = audio[None, :]
        out = _decode_program(
            self.cfg, (audio.shape[1],), jnp.asarray(audio),
            self._crc_mat, self._bitmaps, self._window,
        )
        return {k: np.asarray(v) for k, v in out.items()}

    def decode(self, audio: np.ndarray) -> list[list[DecodeResult]]:
        audio = np.asarray(audio, dtype=np.float32)
        if audio.ndim == 1:
            audio = audio[None, :]
        out = self.decode_arrays(audio)
        return results_from_arrays(out, mode=self.mode)


def results_from_arrays(out: dict[str, np.ndarray],
                        mode: Mode = Mode.FT8) -> list[list[DecodeResult]]:
    """Host-side: validated candidate arrays -> deduped DecodeResult lists."""
    n_windows, top_k = out["valid"].shape
    results: list[list[DecodeResult]] = []
    for wi in range(n_windows):
        seen: dict[bytes, DecodeResult] = {}
        for k in range(top_k):
            if not out["valid"][wi, k]:
                continue
            payload = np.asarray(out["payload"][wi, k, :77])
            key = np.packbits(payload).tobytes()
            dt = out["t0_hop"][wi, k] * HOP / WAVE_SR - SIGNAL_START_S
            freq = out["f0_bin"][wi, k] * BIN_HZ
            r = DecodeResult(
                message=message77.unpack77(payload).text,
                snr_db=round(float(out["snr"][wi, k]), 1),
                dt_s=round(float(dt), 2),
                freq_hz=round(float(freq), 1),
                score=float(out["score"][wi, k]),
                mode=mode,
                payload_bits=payload.copy(),
            )
            prev = seen.get(key)
            if prev is None or r.score > prev.score:
                seen[key] = r
        results.append(sorted(seen.values(), key=lambda r: -r.score))
    return results
