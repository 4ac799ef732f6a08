"""Size-based staged-path backend routing (runtime/backend.py).

On the CI mesh (8 virtual CPU devices) there is no second backend, so the
decision logic is tested directly and the placement behavior is exercised
by monkeypatching the routing target to a different virtual device —
``jax.default_device`` semantics are identical across backends.
"""
import contextlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opticomlib_tpu.runtime import backend


@pytest.fixture(autouse=True)
def _reset_threshold():
    yield
    backend.set_small_op_threshold(None)
    backend._cpu_device = None


def test_threshold_default_and_override(monkeypatch):
    backend.set_small_op_threshold(None)
    monkeypatch.delenv("OPTICOMLIB_TPU_SMALL_OP_THRESHOLD", raising=False)
    assert backend.small_op_threshold() == backend.DEFAULT_SMALL_OP_THRESHOLD
    backend.set_small_op_threshold(12345)
    assert backend.small_op_threshold() == 12345
    backend.set_small_op_threshold(None)
    monkeypatch.setenv("OPTICOMLIB_TPU_SMALL_OP_THRESHOLD", "777")
    assert backend.small_op_threshold() == 777


def test_env_disable(monkeypatch):
    backend.set_small_op_threshold(None)
    monkeypatch.setenv("OPTICOMLIB_TPU_SMALL_OP_THRESHOLD", "0")
    scope = backend.route(16)
    assert scope.device is None


def test_no_route_on_cpu_default_backend():
    # default backend IS cpu in tests -> nothing to route to
    backend.set_small_op_threshold(None)
    backend._cpu_device = None
    assert backend.route(16).device is None


def test_no_route_above_threshold(monkeypatch):
    backend.set_small_op_threshold(1024)
    monkeypatch.setattr(backend, "_cpu_device", jax.devices()[1])
    assert backend.route(1024).device is None
    assert backend.route(2048).device is None
    assert backend.route(1023).device is not None


def test_jax_array_payload_blocks_routing(monkeypatch):
    backend.set_small_op_threshold(1024)
    monkeypatch.setattr(backend, "_cpu_device", jax.devices()[1])
    x = jnp.ones(8)
    assert backend.route(16, x).device is None
    assert backend.route(16, np.ones(8)).device is not None


def test_route_scope_places_computation(monkeypatch):
    """Under an active scope, jitted work with uncommitted inputs lands on
    the routing target device."""
    backend.set_small_op_threshold(1024)
    target = jax.devices()[1]
    monkeypatch.setattr(backend, "_cpu_device", target)
    with backend.route(16) as scope:
        assert scope.device is target
        y = jax.jit(lambda a: a * 2)(np.arange(4.0))
    assert list(y.devices()) == [target]


def test_route_scope_put_moves_committed_operand(monkeypatch):
    backend.set_small_op_threshold(1024)
    target = jax.devices()[1]
    monkeypatch.setattr(backend, "_cpu_device", target)
    key = jax.device_put(jax.random.key(0), jax.devices()[0])
    with backend.route(16) as scope:
        moved = scope.put(key)
    assert list(moved.devices()) == [target]
    # draws from the moved key are identical (keys are data)
    a = jax.random.normal(key, (4,))
    b = jax.random.normal(moved, (4,))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_noop_scope_put_passthrough():
    scope = backend.RouteScope(None)
    x = np.ones(3)
    with scope:
        assert scope.put(x) is x
        assert scope.put(None) is None


def test_staged_chain_unaffected_on_cpu():
    """End-to-end: with routing nominally enabled (default threshold) the
    staged chain still produces the same result on the CPU-only backend
    (routing is a placement concern, never a numerics one)."""
    from opticomlib_tpu import gv
    from opticomlib_tpu.devices import FIBER, LASER, MZM, PRBS, DAC

    gv(sps=16, R=10e9, Vpi=5, N=64, seed=7)
    tx = PRBS(order=7, len=gv.N)
    v = DAC(tx, Vpp=5, offset=-2.5)
    mod = MZM(LASER(P0=5), v, bias=-2.5, Vpi=5)
    out1 = FIBER(mod, length=10, alpha=0.2, beta_2=-20, gamma=1.4)

    backend.set_small_op_threshold(0)  # routing disabled
    gv(seed=7)
    tx = PRBS(order=7, len=gv.N)
    v = DAC(tx, Vpp=5, offset=-2.5)
    mod = MZM(LASER(P0=5), v, bias=-2.5, Vpi=5)
    out2 = FIBER(mod, length=10, alpha=0.2, beta_2=-20, gamma=1.4)

    np.testing.assert_allclose(out1.to_numpy(), out2.to_numpy(), rtol=1e-6)


def test_cpu_scope_honors_kill_switch(monkeypatch):
    """OPTICOMLIB_TPU_SMALL_OP_THRESHOLD=0 disables ALL routing,
    including the key-math CPU scope (review fix)."""
    backend.set_small_op_threshold(0)
    assert backend.cpu_scope().device is None
    backend.set_small_op_threshold(1024)
    monkeypatch.setattr(backend, "_cpu_device", jax.devices()[1])
    assert backend.cpu_scope().device is jax.devices()[1]
