from cwsl_digi_tpu.utils import hamutils, stringutils, timeutils, wav  # noqa: F401
from cwsl_digi_tpu.utils.logging import LogLevel, ScreenPrinter  # noqa: F401
