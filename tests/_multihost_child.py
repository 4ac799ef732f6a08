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
* ``wdm``    — the CONFIG-5 RECEIVER across processes (round-5): a
  ShardedLinkProgram over the global ('wdm', 'time') = (2, 4) mesh runs
  ``dsp_wdm`` (8 channels x 2 processes x 4 devices) and prints the
  per-channel BER/threshold; the parent compares them against its own
  single-process run of the identical program.
* ``rxcrash``/``rxrun`` — kill-and-resume through a checkpointed
  multi-span RECEIVER chain: OOK waveform -> checkpointed sharded
  multi-segment fiber (crashes divergently in rxcrash) -> resumed ->
  sharded DBP -> mid-slot decision -> BER; rxrun asserts the resumed
  chain's decisions are bit-identical to an uninterrupted chain's.

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


def _rx_chain(proc_id, ckpt_dir, mode, ref_dir):
    """Checkpointed multi-span RECEIVER chain across 2 processes:
    OOK waveform -> checkpointed sharded fiber (crashes divergently in
    'rxcrash') -> loss undo -> sharded DBP -> mid-slot decision -> BER.
    """
    import jax  # noqa: F401  (initialized by caller)
    import numpy as np

    from opticomlib_tpu.parallel.fiber import make_link_mesh, ssfm_sharded

    if mode == "rxcrash":
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

    mesh = make_link_mesh(n_wdm=1, n_time=8)
    sps, n_bits = 16, 256
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, n_bits).astype(np.uint8)
    peak = 0.02
    A0 = (np.repeat(bits, sps) * np.sqrt(peak)).astype(np.complex64)
    fiber = dict(fs=160e9, length=8.0, alpha=0.2, beta_2=-21.0,
                 gamma=1.3, h=0.5)

    def chain(ck):
        A = ssfm_sharded(A0, mesh, ckpt_dir=ck, segment_km=2.0, **fiber)
        gain = np.float32(10 ** (fiber["alpha"] * fiber["length"] / 20))
        Aeq = ssfm_sharded(A * gain, mesh, fs=fiber["fs"],
                           length=fiber["length"], alpha=-fiber["alpha"],
                           beta_2=-fiber["beta_2"], gamma=-fiber["gamma"],
                           h=fiber["h"])
        return _local_blocks(Aeq)       # this process's contiguous half

    local = chain(ckpt_dir)             # resumed (or crashes, rxcrash)
    power_mid = np.abs(local[sps // 2::sps]) ** 2
    rx = (power_mid > peak / 2).astype(np.uint8)
    my_bits = bits[proc_id * rx.size:(proc_id + 1) * rx.size]
    ber = float(np.mean(rx != my_bits))

    if mode == "rxrun" and ref_dir:
        ref = chain(ref_dir)            # uninterrupted chain
        assert np.array_equal(local, ref), (
            "resumed receiver chain is not bit-identical to the "
            "uninterrupted chain")
        print(f"[child {proc_id}] OK rxchain ber={ber:.6f}", flush=True)


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

    if mode == "wdm":
        # config-5 receiver (dsp_wdm) across 2 REAL processes
        from jax.sharding import Mesh

        from opticomlib_tpu.link import (EDFASpec, FiberSpec, LinkSpec,
                                         build_link)
        from opticomlib_tpu.ops.prbs import prbs as _prbs
        from opticomlib_tpu.params import SimParams

        n_ch, n_bits, sps = 8, 256, 8
        mesh = Mesh(np.array(jax.devices()).reshape(2, 4),
                    ("wdm", "time"))
        params = SimParams.create(sps=sps, R=10e9, _warn=False)
        spec = LinkSpec(Vpp=5, offset=-2.5, bias=-2.5, Vpi=5, P0=5,
                        pulse_shape="gaussian", loss_dB=3, ER_dB=26,
                        pd_BW=0.75 * 10e9,
                        stages=(FiberSpec(length=50, alpha=0.2,
                                          beta_2=-21.0, gamma=1.3,
                                          h=1.0),
                                EDFASpec(G=10.0, NF=5.0)))
        prog = build_link(spec, n_bits, params=params, mesh=mesh)
        b, _ = _prbs(15, length=n_ch * n_bits)
        bits = np.asarray(b.data, np.uint8).reshape(n_ch, n_bits)
        sw = prog.dsp_wdm(n_ch, bits=bits, seed=5, nslots=n_bits)
        print(f"[child {proc_id}] WDM "
              f"ber={','.join(f'{x:.6f}' for x in sw.ber)} "
              f"th={','.join(f'{x:.6f}' for x in sw.threshold)}",
              flush=True)
        return

    if mode in ("rxcrash", "rxrun"):
        _rx_chain(proc_id, ckpt_dir, mode, ref_dir)
        return

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
