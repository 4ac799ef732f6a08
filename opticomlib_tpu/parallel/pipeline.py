"""Span-pipeline parallelism: each device owns one fiber span (+EDFA).

The pipeline-parallel analogue for optical links (SURVEY §2.6: the per-span
FIBER+EDFA chain of reference examples/ook_transmission_fiber_simulation.py
is the PP axis).  Device ``d`` holds span ``d`` of an ``S``-span link; a
batch of ``B`` waveforms (WDM channels, Monte-Carlo shots, parameter
sweeps) streams through as microbatches:

  tick t:  device d propagates microbatch ``m = t - d`` through its span,
           then ``ppermute``s the field to device ``d+1`` over ICI.

After ``B + S - 1`` ticks every microbatch has traversed every span; steady-
state utilization is ``B / (B + S - 1)``.  Each microbatch lives wholly on
one device at a time (no intra-span sharding), so the span step is the
plain single-device fixed-step SSFM scan — pipeline parallelism composes
orthogonally with the 'time'-sharded solver in
:mod:`opticomlib_tpu.parallel.fiber`.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.ssfm import (alpha_per_km, dispersion_phase, _lin_factor,
                        ssfm_step_schedule)

__all__ = ["make_span_mesh", "span_pipeline"]


def make_span_mesh(n_spans: int, devices=None) -> Mesh:
    """1-D ('span',) mesh with one device per fiber span."""
    devices = devices if devices is not None else jax.devices()
    if n_spans > len(devices):
        raise ValueError(f"{n_spans} spans need {n_spans} devices, "
                         f"have {len(devices)}")
    return Mesh(np.asarray(devices[:n_spans]), axis_names=("span",))


def span_pipeline(
    A_batch,
    mesh: Mesh,
    fs: float,
    span_length: float,
    alpha: float = 0.0,
    beta_2: float = 0.0,
    beta_3: float = 0.0,
    gamma: float = 0.0,
    h: float = 1.0,
    gain_db: Optional[float] = None,
    span_axis: str = "span",
):
    """Propagate ``B`` waveforms through ``S = mesh.shape[span_axis]``
    identical spans (fixed-step SSFM + flat EDFA gain), pipelined.

    Parameters
    ----------
    A_batch : (B, n) complex array
        Microbatches.  ``B >= S`` keeps the pipeline usefully full.
    gain_db : float, optional
        Per-span EDFA field gain in dB; defaults to ``alpha * span_length``
        (transparent link).  Noise-free gain — add ASE separately with
        :func:`opticomlib_tpu.devices.EDFA` semantics if needed.

    Returns
    -------
    (B, n) complex jax.Array (replicated) — every microbatch after all S
    spans, identical to applying the spans sequentially on one device
    (tested to float32 round-off in tests/test_parallel.py).
    """
    A_batch = jnp.asarray(A_batch, dtype=jnp.complex64)
    B, n = A_batch.shape
    S = mesh.shape[span_axis]
    if gain_db is None:
        gain_db = alpha * span_length
    g_field = jnp.float32(10.0 ** (gain_db / 20.0))

    w = 2 * np.pi * np.fft.fftfreq(n) * fs
    phi_w = jnp.asarray(dispersion_phase(w, beta_2, beta_3))
    a_km = jnp.float32(alpha_per_km(alpha))
    hs = jnp.asarray(ssfm_step_schedule(span_length, h))
    gamma_f = jnp.float32(gamma)

    def span_step(x):
        """One full span: fixed-step SSFM scan + flat gain (frozen-operator
        symmetric step, reference devices.py:1172-1196).  The leading-step
        linear factor is computed outside the scan (loop-invariant)."""
        h0 = hs[0]
        E0 = _lin_factor(phi_w, a_km, h0)

        def step(a, hh):
            phi = (gamma_f * (hh / 2)) * (a.real * a.real + a.imag * a.imag)
            half = jax.lax.complex(jnp.cos(phi), jnp.sin(phi))
            a = a * half
            E = jax.lax.cond(hh == h0, lambda: E0,
                             lambda: _lin_factor(phi_w, a_km, hh))
            a = jnp.fft.ifft(jnp.fft.fft(a) * E)
            return a * half, None

        x, _ = jax.lax.scan(step, x, hs)
        return x * g_field

    n_ticks = B + S - 1
    perm = [(i, i + 1) for i in range(S - 1)]

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=(P(None, None),),
             out_specs=P(None, None), check_vma=False)
    def run(batch):
        d = jax.lax.axis_index(span_axis)
        is_first = d == 0
        is_last = d == S - 1

        def tick(t, carry):
            recv, out = carry
            m = t - d                      # microbatch this device works on
            active = jnp.logical_and(m >= 0, m < B)
            fresh = jax.lax.dynamic_slice(
                batch, (jnp.clip(t, 0, B - 1), 0), (1, n))[0]
            x_in = jnp.where(is_first, fresh, recv)
            y = span_step(x_in)
            y = jnp.where(active, y, jnp.zeros_like(y))
            # the last span deposits finished microbatches
            take = jnp.logical_and(active, is_last)
            out = jax.lax.dynamic_update_slice(
                out,
                jnp.where(take,
                          y,
                          jax.lax.dynamic_slice(
                              out, (jnp.clip(m, 0, B - 1), 0), (1, n))[0]
                          )[None],
                (jnp.clip(m, 0, B - 1), 0))
            send = jax.lax.ppermute(y, span_axis, perm)
            return send, out

        recv0 = jnp.zeros((n,), jnp.complex64)
        out0 = jnp.zeros((B, n), jnp.complex64)
        _, out = jax.lax.fori_loop(0, n_ticks, tick, (recv0, out0))
        # only the last device holds real outputs; replicate via masked psum
        out = jnp.where(is_last, out, jnp.zeros_like(out))
        return jax.lax.psum(out, span_axis)

    return run(A_batch)
