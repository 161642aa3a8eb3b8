"""JT65: 65-tone FSK, 60 s T/R, RS(63,12) over GF(64).

The reference invokes ``jt9 -6`` (source/DecoderPool.hpp:648) and parses its
output at source/OutputHandler.cpp:623-695.  Native structure (public JT65A
parameters, adapted to the 12 kHz pipeline):

  - 126 symbol intervals x 4464 samples (0.372 s) = 46.9 s in the 60 s slot;
  - a 126-chip pseudo-random sync vector: sync intervals transmit the sync
    tone (tone 0), the remaining 63 intervals carry one GF(64) data symbol
    each on tone ``2 + value`` (one guard tone above sync);
  - RS(63,12): 12 GF(64) info symbols = 72 message bits, packed as
    [c28 | c28 | g15 | spare] reusing the FT8 field codecs (message77.py).

Interop note: the sync vector is a deterministic balanced pseudo-random
sequence; swap in the published JT65 vector for on-air interop.
"""

from __future__ import annotations

import numpy as np

from cwsl_digi_tpu.constants import Mode, WAVE_SR
from cwsl_digi_tpu.modes import message77
from cwsl_digi_tpu.modes.base import DecodeResult  # noqa: F401 (re-export)
from cwsl_digi_tpu.modes.gfsk import gfsk_modulate
from cwsl_digi_tpu.modes.qary_engine import QaryDecoder, QarySpec
from cwsl_digi_tpu.modes.rs64 import RS63

NSYM = 126
SPS = 4464
T_R = 60.0
TONE_SPACING = WAVE_SR / SPS          # 2.688 Hz
N_DATA = 63
TONE_OFFSET = 2                       # data value 0 -> 2 tone steps above sync


def _make_sync_vector(n: int = NSYM, seed: int = 0x6A54) -> np.ndarray:
    rng = np.random.default_rng(seed)
    v = np.zeros(n, np.int32)
    ones = np.sort(rng.permutation(n)[: n - N_DATA])
    v[ones] = 1
    return v


SYNC = _make_sync_vector()
SYNC_SYMS = tuple(int(i) for i in np.nonzero(SYNC)[0])
DATA_SYMS = tuple(int(i) for i in np.nonzero(1 - SYNC)[0])
assert len(DATA_SYMS) == N_DATA

SPEC = QarySpec(
    name="JT65",
    n_sym=NSYM,
    sps=SPS,
    n_tones=64,
    tone_offset=TONE_OFFSET,
    sync_syms=SYNC_SYMS,
    data_syms=DATA_SYMS,
    trperiod=T_R,
    signal_start_s=1.0,
    fmin_hz=400.0,
    fmax_hz=2000.0,
    top_k=24,
    max_hops=128,
    pad_hops=64,
)

_RS = RS63(12)


# ---------------------------------------------------------------------------
# 72-bit message codec: [c28 | c28 | g15 | spare1] -> 12 GF(64) symbols
# ---------------------------------------------------------------------------

def pack_message(text: str) -> np.ndarray:
    bits77 = message77.pack77(text)
    msg = message77.unpack77(bits77)
    if msg.is_free_text or msg.i3 not in (1, 2):
        raise ValueError(f"JT65 carries only standard messages: {text!r}")
    c1 = message77.int_from_bits(bits77[0:28])
    c2 = message77.int_from_bits(bits77[29:57])
    g15 = message77.int_from_bits(bits77[59:74])
    rr = int(bits77[58])
    v = (((c1 << 28) | c2) << 15 | g15) << 1 | rr        # 72 bits
    syms = [(v >> (6 * (11 - i))) & 63 for i in range(12)]
    return np.asarray(syms, np.int64)


def unpack_message(symbols: np.ndarray) -> str | None:
    v = 0
    for s in symbols:
        v = (v << 6) | int(s)
    rr = v & 1
    g15 = (v >> 1) & 0x7FFF
    c2 = (v >> 16) & 0xFFFFFFF
    c1 = (v >> 44) & 0xFFFFFFF
    try:
        w1 = message77.unpack_call28(c1)
        w2 = message77.unpack_call28(c2)
        w3 = message77.unpack_grid15(g15, rr)
    except (IndexError, ValueError):
        return None
    if not w1 or not w2:
        return None
    return " ".join(w for w in (w1, w2, w3) if w)


def encode_message(text: str) -> np.ndarray:
    """text -> 126 tone indices (0 = sync tone; data at 2+value)."""
    cw = _RS.encode(pack_message(text))
    tones = np.zeros(NSYM, np.int32)
    tones[list(DATA_SYMS)] = TONE_OFFSET + cw.astype(np.int32)
    return tones


def synthesize(text: str, f0_hz: float = 1270.5, amplitude: float = 1.0,
               window_len: int = int(T_R * WAVE_SR),
               start_s: float = 1.0) -> np.ndarray:
    from cwsl_digi_tpu.modes.gfsk import place_burst

    burst = gfsk_modulate(encode_message(text), f0_hz, SPS, WAVE_SR,
                          TONE_SPACING, bt=2.0)
    return place_burst(burst, window_len, start_s, amplitude)


class JT65Decoder(QaryDecoder):
    mode = Mode.JT65

    def __init__(self, top_k: int | None = None):
        import dataclasses as _dc

        spec = _dc.replace(SPEC, top_k=top_k) if top_k else SPEC
        super().__init__(spec, _RS, Mode.JT65,
                         unpack=lambda info: unpack_message(info))
