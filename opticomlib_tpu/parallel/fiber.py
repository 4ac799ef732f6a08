"""Sharded split-step Fourier propagation over a device mesh.

The new capability the reference never had (it is single-process NumPy/CuPy,
reference devices.py:1114-1134): scale the NLSE solve across TPU chips by
sharding

* the **time (sample) axis** — the optical-simulation analogue of
  sequence/context parallelism.  Each device owns a contiguous block of the
  waveform; the nonlinear (pointwise) steps need no communication; the
  dispersion steps use blockwise overlap-save with ring halo exchange
  (``ppermute`` over ICI) — see :mod:`opticomlib_tpu.parallel.halo` for the
  derivation of the halo width;
* the **WDM channel axis** — embarrassingly parallel (data-parallel
  analogue), a leading array dimension sharded over the 'wdm' mesh axis.

The sharded fixed-step kernel produces the same waveform as the
single-device :func:`opticomlib_tpu.ops.ssfm.ssfm_propagate` up to the
overlap-save truncation error (tested to ~1e-4 relative on an 8-device CPU
mesh in tests/test_parallel.py).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.ssfm import linear_operator, ssfm_step_schedule
from .dfft import pencil_fft, pencil_ifft, strided_w_grid
from .halo import exchange_halos, halo_width

__all__ = ["make_link_mesh", "ssfm_sharded", "shard_waveform"]


def make_link_mesh(n_wdm: int = 1, n_time: Optional[int] = None,
                   devices=None) -> Mesh:
    """Build a ('wdm', 'time') device mesh.

    ``n_time`` defaults to ``len(devices) // n_wdm`` so all devices are used.
    """
    devices = devices if devices is not None else jax.devices()
    if n_time is None:
        n_time = len(devices) // n_wdm
    n = n_wdm * n_time
    if n > len(devices):
        raise ValueError(
            f"mesh {n_wdm}x{n_time} needs {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(n_wdm, n_time)
    return Mesh(dev_array, axis_names=("wdm", "time"))


def shard_waveform(A: np.ndarray, mesh: Mesh):
    """Place a (channels, nsamples) or (nsamples,) array on the mesh with
    channels over 'wdm' and samples over 'time'."""
    if A.ndim == 1:
        spec = P("time")
    else:
        spec = P("wdm", "time")
    return jax.device_put(A, NamedSharding(mesh, spec))


def _sharded_step_fn(D_pad, H: int, gamma: float, axis_name: str):
    """One NL-L-NL step on a local block with halo exchange for the linear
    operator.  Closure over the padded-block operator (complex64 constant).
    """
    gamma = jnp.float32(gamma)

    def step(x, h):
        # half nonlinear step (pointwise, no comms) — operator frozen at
        # step start, matching reference devices.py:1172-1196
        phi = (gamma * (h / 2)) * (x.real * x.real + x.imag * x.imag)
        half_nl = jax.lax.complex(jnp.cos(phi), jnp.sin(phi))
        x = x * half_nl
        # linear step: overlap-save with ring halos (circular semantics)
        xp = exchange_halos(x, H, axis_name)
        Xp = jnp.fft.fft(xp, axis=-1)
        xp = jnp.fft.ifft(Xp * jnp.exp(D_pad * h), axis=-1)
        x = xp[..., H:-H]
        return x * half_nl, None

    return step


def _pencil_step_fn(n_time: int, block: int, fs: float, alpha: float,
                    beta_2: float, beta_3: float, gamma: float,
                    axis_name: str):
    """One NL-L-NL step with an *exact* distributed FFT (pencil transpose,
    see parallel/dfft.py).  The linear operator is sampled on the strided
    spectrum layout each device owns after ``pencil_fft``."""
    gamma = jnp.float32(gamma)
    alpha_lin = alpha / 4.342944819032518

    def step(x, h):
        phi = (gamma * (h / 2)) * (x.real * x.real + x.imag * x.imag)
        half_nl = jax.lax.complex(jnp.cos(phi), jnp.sin(phi))
        x = x * half_nl
        q = jax.lax.axis_index(axis_name)
        w = strided_w_grid(q, n_time, block, fs) * 1e-12  # rad/ps
        D = (-alpha_lin / 2
             + 1j * beta_2 / 2 * w**2
             + 1j * beta_3 / 6 * w**3).astype(jnp.complex64)
        X = pencil_fft(x, axis_name)
        x = pencil_ifft(X * jnp.exp(D * h), axis_name)
        return x * half_nl, None

    return step


def ssfm_sharded(
    A,
    mesh: Mesh,
    fs: float,
    length: float,
    alpha: float = 0.0,
    beta_2: float = 0.0,
    beta_3: float = 0.0,
    gamma: float = 0.0,
    h: float = 1.0,
    method: str = "pencil",
    halo_safety: float = 4.0,
    time_axis: str = "time",
    wdm_axis: Optional[str] = "wdm",
):
    """Propagate a sharded waveform through ``length`` km of fiber with a
    fixed step ``h`` [km].

    ``A``: (nsamples,) or (channels, nsamples) complex array (host or
    already device_put with the matching sharding).  Returns a sharded
    jax.Array with the same shape.

    ``method``:
      * ``"pencil"`` (default) — exact distributed FFT per linear step
        (2 all_to_all per transform; matches the single-device result to
        float32 round-off);
      * ``"overlap"`` — blockwise overlap-save with ring halo exchange
        (ppermute only; cheaper on the interconnect but approximate — the
        truncation error decays ~1/H^2 in the halo width).
    """
    A = jnp.asarray(A, dtype=jnp.complex64)
    n = A.shape[-1]
    n_time = mesh.shape[time_axis]
    if n % n_time:
        raise ValueError(f"nsamples {n} not divisible by time shards {n_time}")
    block = n // n_time

    hs = ssfm_step_schedule(length, h)

    if method == "pencil":
        if block % n_time:
            raise ValueError(
                f"pencil FFT needs block ({block}) divisible by time shards "
                f"({n_time}) — i.e. nsamples divisible by n_time^2")
        step = _pencil_step_fn(n_time, block, fs, alpha, beta_2, beta_3,
                               gamma, time_axis)
    elif method == "overlap":
        H = halo_width(float(hs.max()), beta_2, beta_3, fs,
                       safety=halo_safety)
        if 2 * H >= block:
            raise ValueError(
                f"halo {H} too large for block {block}; increase samples per "
                f"device or reduce step size")
        # operator on the padded-block grid
        w_pad = 2 * np.pi * np.fft.fftfreq(block + 2 * H) * fs
        D_pad = jnp.asarray(linear_operator(w_pad, alpha, beta_2, beta_3))
        step = _sharded_step_fn(D_pad, H, gamma, time_axis)
    else:
        raise ValueError("method must be 'pencil' or 'overlap'")

    if A.ndim == 1:
        in_spec = out_spec = P(time_axis)
    else:
        in_spec = out_spec = P(wdm_axis, time_axis)

    @partial(shard_map, mesh=mesh, in_specs=(in_spec,), out_specs=out_spec,
             check_vma=False)
    def run(x):
        y, _ = jax.lax.scan(step, x, jnp.asarray(hs))
        return y

    return jax.jit(run)(A)
