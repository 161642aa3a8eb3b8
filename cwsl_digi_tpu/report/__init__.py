from cwsl_digi_tpu.report.spot import Spot, SpotHandler  # noqa: F401
