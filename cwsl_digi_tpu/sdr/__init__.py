from cwsl_digi_tpu.sdr.source import (  # noqa: F401
    IQSource,
    ReplaySource,
    SyntheticSource,
    open_source,
)
