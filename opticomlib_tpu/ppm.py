"""PPM modulation stack (alias of :mod:`opticomlib_tpu.models.ppm`)."""
from .models.ppm import *  # noqa: F401,F403
from .models.ppm import __all__  # noqa: F401
# the reference's ppm module also exposes the devices it uses
# (reference ppm.py:21: ``from .devices import GET_EYE, SAMPLER, LPF``)
from .devices import GET_EYE, LPF, SAMPLER  # noqa: F401
