"""Compute kernels: JAX/XLA/Pallas implementations of the hot paths."""
from . import eyeana, filters, prbs, pulses, ssfm  # noqa: F401
