"""Mode decoder protocol and registry.

Replaces the reference's per-mode external-process invocation table
(source/DecoderPool.hpp:631-659,1005-1046) with in-process decoder objects,
each wrapping a batched JAX decode program.
"""

from __future__ import annotations

import dataclasses
from typing import Protocol

import numpy as np

from cwsl_digi_tpu.constants import Mode


@dataclasses.dataclass
class DecodeResult:
    """One decoded signal in one capture window.

    Mirrors the information the reference parses out of jt9 stdout lines
    (source/OutputHandler.cpp:505-621): SNR, dt, audio frequency, message.
    """

    message: str
    snr_db: float
    dt_s: float
    freq_hz: float        # audio frequency within the channel passband
    score: float = 0.0    # sync/decoder confidence metric
    mode: Mode = Mode.FT8
    payload_bits: np.ndarray | None = None
    drift_hz: float = 0.0  # linear drift over the burst (WSPR/FST4W)


class ModeDecoder(Protocol):
    mode: Mode

    def decode(self, audio: np.ndarray) -> list[list[DecodeResult]]:
        """audio: [batch, n_samples] at 12 kHz -> per-window decode lists."""
        ...


_REGISTRY: dict[tuple, "ModeDecoder"] = {}


def register_decoder(mode: Mode, decoder: "ModeDecoder") -> None:
    _REGISTRY[(Mode(mode),)] = decoder


def get_decoder(mode: Mode | str, **kwargs) -> "ModeDecoder":
    """Get (lazily constructing) the decoder for a mode.

    The cache key includes the construction kwargs, so differently
    configured decoders (e.g. with/without AP hypotheses) coexist instead
    of the first construction silently winning.
    """
    mode = Mode(mode)
    key = (mode,) + tuple(sorted(kwargs.items()))
    if key not in _REGISTRY:
        _REGISTRY[key] = _construct(mode, **kwargs)
    return _REGISTRY[key]


def warmup_window(mode: Mode | str) -> "np.ndarray":
    """One capture window holding a strong protocol-exact signal.

    Decoding it during app warmup compiles EVERY decode-path program: the
    depth-2 residual pass, the device subtraction scan, and OSD only
    compile once a pass-1 decode succeeds, so warming up on silence (as
    round 4 did) left 60+ s compiles to fire inside the first live
    windows that carried signals."""
    import numpy as np  # noqa: F811

    mode = Mode(mode)
    text = "K1ABC W9XYZ EN37"
    if mode == Mode.FT8:
        from cwsl_digi_tpu.modes import ft8
        return ft8.synthesize(text)
    if mode == Mode.FT4:
        from cwsl_digi_tpu.modes import ft4
        return ft4.synthesize(text)
    if mode == Mode.JS8:
        from cwsl_digi_tpu.modes import js8
        return js8.synthesize("HELLO WORLD")
    if mode == Mode.JT65:
        from cwsl_digi_tpu.modes import jt65
        return jt65.synthesize(text)
    if mode == Mode.Q65_30:
        from cwsl_digi_tpu.modes import q65
        return q65.synthesize(text)
    if mode == Mode.WSPR:
        from cwsl_digi_tpu.modes import wspr
        return wspr.synthesize("K1ABC", "FN42", 37)
    from cwsl_digi_tpu.constants import is_mode_fst4, is_mode_fst4w

    if is_mode_fst4(mode) or is_mode_fst4w(mode):
        from cwsl_digi_tpu.modes import fst4
        return fst4.synthesize(
            "K1ABC FN42 30" if is_mode_fst4w(mode) else text, mode)
    raise NotImplementedError(f"no warmup signal for {mode}")


def _construct(mode: Mode, **kwargs):
    if mode == Mode.FT8:
        from cwsl_digi_tpu.modes.ft8 import FT8Decoder

        return FT8Decoder(**kwargs)
    if mode == Mode.JS8:
        from cwsl_digi_tpu.modes.js8 import JS8Decoder

        return JS8Decoder(**kwargs)
    if mode == Mode.FT4:
        from cwsl_digi_tpu.modes.ft4 import FT4Decoder

        return FT4Decoder(**kwargs)
    if mode == Mode.WSPR:
        from cwsl_digi_tpu.modes.wspr import WSPRDecoder

        return WSPRDecoder(**kwargs)
    if mode == Mode.JT65:
        from cwsl_digi_tpu.modes.jt65 import JT65Decoder

        return JT65Decoder(**kwargs)
    if mode == Mode.Q65_30:
        from cwsl_digi_tpu.modes.q65 import Q65Decoder

        return Q65Decoder(**kwargs)
    from cwsl_digi_tpu.constants import is_mode_fst4, is_mode_fst4w

    if is_mode_fst4(mode) or is_mode_fst4w(mode):
        from cwsl_digi_tpu.modes.fst4 import FST4Decoder

        return FST4Decoder(mode, **kwargs)
    raise NotImplementedError(f"no native decoder yet for {mode}")
