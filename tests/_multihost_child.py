"""Child process for the REAL 2-process multi-host tests
(tests/test_multihost.py).  Not a pytest module.

Each invocation is one JAX process of a 2-process CPU cluster (4 virtual
devices per process, gloo collectives, localhost coordinator).  Modes:

* ``crash``  — run the segmented sharded SSFM with checkpointing and die
  mid-run at a *divergent* point: process 0 exits right BEFORE saving
  segment 2, process 1 right AFTER.  This manufactures exactly the
  failure the cross-host resume agreement must survive (hosts holding
  different latest steps).
* ``run``    — resume from the same directory (the agreement protocol
  must pick the highest COMMON step, 1), finish the propagation, run an
  uninterrupted reference in a fresh directory, and assert this
  process's local shards are bit-identical between the two.

Usage: python _multihost_child.py <proc_id> <port> <ckpt_dir> <mode>
       [<ref_dir>]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))   # repo root (package not pip-installed)


def _local_blocks(A):
    import numpy as np
    shards = sorted(A.addressable_shards,
                    key=lambda s: (s.index[0].start or 0))
    return np.concatenate([np.asarray(s.data).ravel() for s in shards])


def main():
    proc_id = int(sys.argv[1])
    port = sys.argv[2]
    ckpt_dir = sys.argv[3]
    mode = sys.argv[4]
    ref_dir = sys.argv[5] if len(sys.argv) > 5 else ""

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    import numpy as np

    from opticomlib_tpu.parallel import initialize_multihost
    from opticomlib_tpu.parallel.fiber import make_link_mesh, ssfm_sharded

    n_dev = initialize_multihost(f"localhost:{port}", 2, proc_id)
    assert n_dev == 8, n_dev
    assert jax.process_count() == 2
    assert len(jax.local_devices()) == 4

    if mode == "crash":
        from opticomlib_tpu.runtime import checkpoint as ckpt_mod

        orig_save = ckpt_mod.PropagationCheckpointer.save

        def save(self, step, z, re, im, extra=None):
            if proc_id == 0 and step == 2:
                os._exit(17)            # dies BEFORE its step-2 save
            r = orig_save(self, step, z, re, im, extra=extra)
            if proc_id == 1 and step == 2:
                os._exit(17)            # dies right AFTER saving step 2
            return r

        ckpt_mod.PropagationCheckpointer.save = save

    mesh = make_link_mesh(n_wdm=1, n_time=n_dev)
    n = 4096
    rng = np.random.default_rng(0)
    A0 = ((rng.normal(size=n) + 1j * rng.normal(size=n))
          .astype(np.complex64) * 0.05)
    kw = dict(fs=80e9, length=8.0, alpha=0.2, beta_2=-21.0, gamma=1.3,
              h=0.5, segment_km=2.0)

    A = ssfm_sharded(A0, mesh, ckpt_dir=ckpt_dir, **kw)
    local = _local_blocks(A)
    assert np.isfinite(local).all()

    if mode == "run" and ref_dir:
        A_ref = ssfm_sharded(A0, mesh, ckpt_dir=ref_dir, **kw)
        ref = _local_blocks(A_ref)
        assert np.array_equal(local, ref), (
            "resumed multi-host run is not bit-identical to the "
            "uninterrupted run")
        print(f"[child {proc_id}] OK bitexact", flush=True)


if __name__ == "__main__":
    main()
