"""OOK modulation stack (alias of :mod:`opticomlib_tpu.models.ook`)."""
from .models.ook import *  # noqa: F401,F403
from .models.ook import __all__  # noqa: F401
