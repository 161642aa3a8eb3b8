from cwsl_digi_tpu.runtime.scheduler import CadenceScheduler  # noqa: F401
from cwsl_digi_tpu.runtime.decoderpool import DecodeJob, DecoderPool  # noqa: F401
