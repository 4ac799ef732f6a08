"""Sharded fused link: the whole TX -> channel -> RX chain as ONE XLA
program over a ('wdm', 'time') device mesh — the BASELINE north-star
shape, through the public API.

Runs on an 8-device virtual CPU mesh out of the box; on a real TPU pod
slice the same code shards the waveform over ICI (set JAX_PLATFORMS
accordingly and drop the host-platform flag).

Run: python examples/sharded_fused_link.py
"""
try:  # running from a source checkout without an install
    import opticomlib_tpu  # noqa: F401
except ModuleNotFoundError:
    import os as _os, sys as _sys
    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
import os

# 8 virtual CPU devices (this container pins JAX to a TPU plugin via
# sitecustomize; reconfigure in-process like tests/conftest.py does)
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8"
                           ).strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from opticomlib_tpu.link import (EDFASpec, FiberSpec, LinkSpec,  # noqa: E402
                                 build_link)
from opticomlib_tpu.params import SimParams  # noqa: E402

params = SimParams.create(sps=16, R=10e9, _warn=False)
spec = LinkSpec(
    pulse_shape="gaussian", Vpp=5, offset=-2.5, bias=-2.5, Vpi=5,
    P0=5, loss_dB=3, ER_dB=26,
    stages=(FiberSpec(length=50, alpha=0.2, beta_2=-21.0, gamma=1.3),
            EDFASpec(G=10, NF=5)),
    pd_BW=7.5e9,
)

# --- 4 WDM channels x time-sharded waveforms over a (4, 2) mesh ---
mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("wdm", "time"))
prog = build_link(spec, n_bits=2**12, params=params, mesh=mesh)

sweep = prog.dsp_wdm(4, seed=0)     # fused receivers, scalars-only readback
print("mesh:", dict(mesh.shape))
print("per-channel BER:      ", sweep.ber)
print("per-channel threshold:", np.round(sweep.threshold, 4))

# --- all 8 devices on the time axis for one long channel ---
mesh_t = Mesh(np.array(jax.devices()), ("time",))
prog_t = build_link(spec, n_bits=2**13, params=params, mesh=mesh_t)
r = prog_t.dsp(seed=1)
print(f"time-sharded single channel: BER={r.ber}  ER={r.eye.er:.1f} dB")
assert r.ber == prog_t.dsp(seed=1).ber  # keyed noise: bit-reproducible
