"""Test harness configuration.

Tests run on a CPU backend with 8 virtual devices so multi-chip sharding
(`opticomlib_tpu.parallel`) is exercised without TPU hardware
(`--xla_force_host_platform_device_count=8`).

This container boots every interpreter through a sitecustomize that
registers a TPU PJRT plugin and sets JAX_PLATFORMS — but importing jax
does not initialize a backend, so reconfiguring in-process here (before
any jax.devices()/jit call) is sufficient and avoids re-exec tricks that
fight pytest's fd-level output capture.
"""
import os

import jax

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_globals():
    """Reset the global parameter facade before each test (the reference's
    tests do the same with gv.default(); see reference tests/ook_test.py:9-11)."""
    from opticomlib_tpu import gv
    gv.default()
    np.random.seed(0)
    yield
    gv.default()
