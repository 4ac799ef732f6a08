"""Span-pipeline parallelism: each device owns one fiber span (+EDFA).

The pipeline-parallel analogue for optical links (SURVEY §2.6: the per-span
FIBER+EDFA chain of reference examples/ook_transmission_fiber_simulation.py
is the PP axis).  Device ``d`` holds span ``d`` of an ``S``-span link; a
batch of ``B`` waveforms (WDM channels, Monte-Carlo shots, parameter
sweeps) streams through as microbatches:

  tick t:  device d propagates microbatch ``m = t - d`` through its span,
           then ``ppermute``s the field to device ``d+1`` over ICI.

After ``B + S - 1`` ticks every microbatch has traversed every span;
steady-state utilization is ``B / (B + S - 1)``.

**Memory is O(B/S · n) per device** (round 2; the round-1 version
replicated the full (B, n) batch on every device).  The batch is sharded
over the 'span' axis — device ``d`` owns microbatches ``[d·C, (d+1)·C)``
with ``C = B/S`` — and two distributed ring buffers stream it:

* the **feed ring** rotates one microbatch toward device 0 per tick, so
  stage 0's fresh input (microbatch ``t`` at tick ``t``) is always at its
  local front slot.  Only one (n,)-sized ``ppermute`` per tick crosses a
  device boundary; the C-slot local buffer is addressed circularly
  (physical slot ``t mod C``), so nothing is locally copied either.
* the **output ring** rotates identically; the last stage writes finished
  microbatch ``m`` into the (constant-virtual-position) slot chosen such
  that after the remaining rotations every output lands exactly at its
  owner — device ``m // C``, slot ``m mod C`` — with no gather/psum.
  A cheap drain phase (rotations only, no span compute) finishes the
  placement after the last output is produced.

Each active microbatch lives wholly on one device at a time (no
intra-span sharding), so the span step is the plain single-device
fixed-step SSFM scan — pipeline parallelism composes orthogonally with
the 'time'-sharded solver in :mod:`opticomlib_tpu.parallel.fiber`.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.noise import gaussian_inside
from ..ops.ssfm import (alpha_per_km, dispersion_phase, ssfm_scan_inside,
                        ssfm_step_schedule, ssfm_while_inside)

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
    h: Optional[float] = 1.0,
    phi_max: float = 0.05,
    gain_db: Optional[float] = None,
    NF: Optional[float] = None,
    f0: Optional[float] = None,
    seed: int = 0,
    span_axis: str = "span",
):
    """Propagate ``B`` waveforms through ``S = mesh.shape[span_axis]``
    identical spans (SSFM + EDFA gain, optionally with keyed ASE),
    pipelined.

    Parameters
    ----------
    A_batch : (B, n) complex array
        Microbatches; ``B`` must be a multiple of ``S`` (each device owns
        ``B/S`` of them — no replication).
    h : float, optional
        Fixed SSFM step [km]; ``None`` -> phi_max-adaptive stepping
        (reference devices.py:1156/1193-1196).  Each active microbatch
        lives wholly on one device, so the adaptive ``max|A|^2`` is a
        local reduction — no collectives.
    gain_db : float, optional
        Per-span EDFA field gain in dB; defaults to ``alpha * span_length``
        (transparent link).
    NF : float, optional
        EDFA noise figure [dB].  When set, each span's gain is followed by
        a keyed ASE draw of power ``idb(NF)*h*f0*(G-1)*fs`` on the carried
        polarization (the EDFA math of the fused link; the orthogonal-pol
        ASE power is not representable in a 1-pol batch — use the fused
        2-pol link for direct-detection ASE-ASE studies).  The key for
        (microbatch ``m``, span ``d``) is
        ``fold_in(fold_in(PRNGKey(seed), m), d)`` — a pure function of the
        logical position, NOT of the pipeline schedule, so the result is
        bit-identical to the sequential span-by-span chain with the same
        keys (tested on an 8-device mesh in tests/test_parallel.py).
    f0 : float, optional
        Optical carrier frequency [Hz] for the ASE power (default:
        c/1550 nm).

    Returns
    -------
    (B, n) complex jax.Array sharded over ``span_axis`` (device ``d``
    holds rows ``[d·B/S, (d+1)·B/S)``) — every microbatch after all S
    spans, identical to applying the spans sequentially on one device
    (tested to float32 round-off in tests/test_parallel.py).
    """
    A_batch = jnp.asarray(A_batch, dtype=jnp.complex64)
    B, n = A_batch.shape
    S = mesh.shape[span_axis]
    if B % S:
        raise ValueError(
            f"batch size {B} must be a multiple of the span count {S} "
            "(each device owns B/S microbatches)")
    C = B // S
    if gain_db is None:
        gain_db = alpha * span_length
    g_field = jnp.float32(10.0 ** (gain_db / 20.0))

    sigma_ase = 0.0
    if NF is not None:
        from scipy.constants import c as c_light

        from ..ops.noise import ase_sigma
        if f0 is None:
            f0 = c_light / 1550e-9
        sigma_ase = ase_sigma(gain_db, NF, f0, fs)
    base_key = jax.random.PRNGKey(seed)

    w = 2 * np.pi * np.fft.fftfreq(n) * fs
    phi_w = jnp.asarray(dispersion_phase(w, beta_2, beta_3))
    a_km = jnp.float32(alpha_per_km(alpha))
    adaptive = h is None and gamma != 0 and (beta_2 != 0 or beta_3 != 0)
    if h is None and not adaptive:
        h = span_length  # linear-only: one step (reference h0 = length)
    hs = (None if adaptive
          else jnp.asarray(ssfm_step_schedule(span_length, h)))
    gamma_f = jnp.float32(gamma)

    def span_step(x, k):
        """One full span: SSFM (fixed scan or phi_max-adaptive while) +
        flat gain + optional keyed ASE (frozen-operator symmetric step,
        reference devices.py:1172-1196)."""
        if adaptive:
            maxP = jnp.maximum(jnp.max(x.real**2 + x.imag**2),
                               jnp.float32(1e-30))
            h0 = jnp.minimum(jnp.float32(phi_max)
                             / (jnp.abs(gamma_f) * maxP),
                             jnp.float32(span_length))
            x, _ = ssfm_while_inside(x, phi_w, span_length, gamma_f,
                                     phi_max, h0, a_km, adaptive=True)
        else:
            x = ssfm_scan_inside(x, phi_w, hs, gamma_f, a_km)
        x = x * g_field
        if sigma_ase:
            d = gaussian_inside(k, (2, n), sigma_ase)
            x = x + jax.lax.complex(d[0], d[1])
        return x

    # ---- schedule bookkeeping (see module docstring) ----
    T1 = B + S - 1                      # compute ticks (last write at T1-1)
    # outputs written (before the tick's rotation) at tick t rotate
    # (T2 - t) positions; landing at virtual position m for every m
    # requires the constant write position w = (T2 - S + 1) mod B to lie
    # in device S-1's virtual range [(S-1)C, B)
    T2 = T1
    while ((T2 - S + 1) % B) < (S - 1) * C:
        T2 += 1
    j0 = ((T2 - S + 1) % B) - (S - 1) * C   # write slot offset, in [0, C)
    n_drain = T2 - T1                        # rotation-only ticks

    ring_left = [(i, (i - 1) % S) for i in range(S)]
    chain_right = [(i, i + 1) for i in range(S - 1)]

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=(P(span_axis, None),),
             out_specs=P(span_axis, None), check_vma=False)
    def run(feed0):
        d = jax.lax.axis_index(span_axis)
        is_first = d == 0
        is_last = d == S - 1

        def rotate(buf, slot):
            """Send physical ``slot`` (the ring front) to the left
            neighbor; the just-vacated slot becomes the back, filled by
            the right neighbor's front."""
            front = jax.lax.dynamic_slice(buf, (slot, 0), (1, n))[0]
            recv = jax.lax.ppermute(front, span_axis, ring_left)
            return jax.lax.dynamic_update_slice(buf, recv[None], (slot, 0))

        def tick(t, carry):
            feed, out, pipe = carry
            fslot = jnp.mod(t, C)
            front = jax.lax.dynamic_slice(feed, (fslot, 0), (1, n))[0]
            x_in = jnp.where(is_first, front, pipe)

            m = t - d
            active = jnp.logical_and(m >= 0, m < B)
            # ASE key is a pure function of the logical (microbatch, span)
            # position — schedule-independent, so pipeline == sequential
            k_md = jax.random.fold_in(
                jax.random.fold_in(base_key, jnp.maximum(m, 0)), d)
            y = span_step(x_in, k_md)
            y = jnp.where(active, y, jnp.zeros_like(y))

            # deposit finished microbatch into the output ring (write
            # happens before this tick's rotation)
            oslot = jnp.mod(j0 + t, C)
            write = jnp.logical_and(active, is_last)
            cur = jax.lax.dynamic_slice(out, (oslot, 0), (1, n))[0]
            out = jax.lax.dynamic_update_slice(
                out, jnp.where(write, y, cur)[None], (oslot, 0))

            feed = rotate(feed, fslot)
            out = rotate(out, jnp.mod(t, C))
            pipe = jax.lax.ppermute(y, span_axis, chain_right)
            return feed, out, pipe

        def drain(t, out):
            return rotate(out, jnp.mod(t, C))

        out0 = jnp.zeros((C, n), jnp.complex64)
        pipe0 = jnp.zeros((n,), jnp.complex64)
        feed, out, _ = jax.lax.fori_loop(0, T1, tick, (feed0, out0, pipe0))
        out = jax.lax.fori_loop(T1, T2, drain, out)
        # physical slot p holds virtual position (p - T2) mod C after the
        # final rotation — undo the circular offset locally
        return jnp.roll(out, -(T2 % C), axis=0)

    A_batch = jax.device_put(A_batch,
                             NamedSharding(mesh, P(span_axis, None)))
    return run(A_batch)
