from cwsl_digi_tpu.dsp.lowpass import build_lowpass  # noqa: F401
from cwsl_digi_tpu.dsp.ssbd import SSBD  # noqa: F401
from cwsl_digi_tpu.dsp.channelizer import BatchChannelizer, ChannelizerSpec  # noqa: F401
