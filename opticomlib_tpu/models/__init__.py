"""Modulation-format model families (OOK, PPM)."""
from . import ook, ppm  # noqa: F401
