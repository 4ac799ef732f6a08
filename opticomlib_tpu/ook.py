"""OOK modulation stack (alias of :mod:`opticomlib_tpu.models.ook`)."""
from .models.ook import *  # noqa: F401,F403
from .models.ook import __all__  # noqa: F401
# the reference's ook module also exposes the devices it uses
# (reference ook.py:16: ``from .devices import GET_EYE, SAMPLER, LPF``)
from .devices import GET_EYE, LPF, SAMPLER  # noqa: F401
