"""Native mode decoders — the framework's models/ops layer.

The reference delegates all mode DSP to external WSJT-X/JS8Call binaries
(spawned at source/DecoderPool.hpp:634-676,1005-1077); here each mode is a
batched JAX program plus host-side message pack/unpack.
"""

from cwsl_digi_tpu.modes.base import DecodeResult, ModeDecoder, get_decoder  # noqa: F401
