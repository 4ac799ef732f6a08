"""Multi-host initialization for pod-slice runs.

The sharded runtime (``ssfm_sharded``, ``ShardedLinkProgram``,
``span_pipeline``) is written against a :class:`jax.sharding.Mesh` and
works unchanged on a multi-host TPU slice: ``jax.devices()`` returns the
GLOBAL device list once the distributed runtime is initialized, the
meshes built by :func:`opticomlib_tpu.parallel.fiber.make_link_mesh`
then span hosts, and XLA routes the collectives (``all_to_all`` pencil
transposes, ``ppermute`` halos, ``pmax`` adaptive reductions) over ICI
within a slice and DCN across slices — no code changes.

This module only wraps the standard bring-up so a pod run is one call
per process:

    # on every host (same script, per-host process_id):
    from opticomlib_tpu.parallel import initialize_multihost, make_link_mesh
    initialize_multihost()                       # env-driven on TPU pods
    mesh = make_link_mesh(n_wdm=4)               # global devices
    prog = build_link(spec, n_bits, mesh=mesh)   # same API as 1 host
    sweep = prog.dsp_wdm(16, seed=0)

Sizing guidance (BASELINE config 5, 16 ch x 2^26): shard channels over
hosts ('wdm' across DCN — embarrassingly parallel, no cross-host
traffic) and the time axis within each host's slice ('time' over ICI),
i.e. ``make_link_mesh(n_wdm=n_hosts, n_time=devices_per_host)``.  Keep
the pencil-FFT ``all_to_all`` on ICI; only scalars cross DCN.

Not exercisable in this container (single chip); the mesh semantics are
validated on the 8-device virtual CPU mesh (tests/) and the driver's
``dryrun_multichip``.
"""
from __future__ import annotations

from typing import Optional

__all__ = ["initialize_multihost"]


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> int:
    """Initialize JAX's distributed runtime (idempotent) and return the
    global device count.

    On Cloud TPU pods all three arguments are discovered from the
    environment — call with no arguments.  Elsewhere pass the
    coordinator's ``host:port`` plus this process's index.
    """
    import jax

    # jax.distributed.initialize raises on a second call (its message
    # varies across versions and never says "already initialized"), so
    # idempotency is an explicit state check, not message matching.
    already = False
    if hasattr(jax.distributed, "is_initialized"):
        already = jax.distributed.is_initialized()
    else:  # older jax: the client slot is the ground truth
        from jax._src import distributed as _dist
        already = getattr(_dist.global_state, "client", None) is not None
    if not already:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    return len(jax.devices())
