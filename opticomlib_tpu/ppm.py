"""PPM modulation stack (alias of :mod:`opticomlib_tpu.models.ppm`)."""
from .models.ppm import *  # noqa: F401,F403
from .models.ppm import __all__  # noqa: F401
