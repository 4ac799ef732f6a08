"""Sharded-runtime tests on an 8-device CPU mesh
(conftest sets --xla_force_host_platform_device_count=8).

Acceptance criterion from SURVEY.md section 7.5: sharded overlap-save SSFM
must match the single-device SSFM within tolerance."""
import jax
import numpy as np
import pytest

from opticomlib_tpu.ops import ssfm
from opticomlib_tpu.parallel.fiber import (
    make_link_mesh, shard_waveform, ssfm_sharded,
)
from opticomlib_tpu.parallel.halo import halo_width


def _wgrid(n, fs):
    return 2 * np.pi * np.fft.fftfreq(n) * fs


@pytest.fixture(scope="module")
def devices():
    devs = jax.devices()
    assert len(devs) >= 8, "tests need 8 virtual CPU devices"
    return devs


def test_halo_width_scaling():
    h1 = halo_width(0.1, -20.0, 0.0, 640e9)
    h2 = halo_width(0.2, -20.0, 0.0, 640e9)
    assert h2 >= h1
    assert halo_width(0.1, 0.0, 0.0, 640e9) == 8  # floor


def test_mesh_construction(devices):
    mesh = make_link_mesh(n_wdm=2, n_time=4)
    assert mesh.shape["wdm"] == 2 and mesh.shape["time"] == 4
    mesh1 = make_link_mesh(n_wdm=1)
    assert mesh1.shape["time"] == len(devices)
    with pytest.raises(ValueError):
        make_link_mesh(n_wdm=16, n_time=16)


def test_sharded_matches_single_device_linear(devices):
    """Pure dispersion: sharded overlap-save == global FFT within the
    truncation tolerance."""
    n = 2**14
    fs = 160e9
    rng = np.random.default_rng(0)
    # band-limited input (oversampled NRZ-ish) so halo truncation is valid
    bits = rng.integers(0, 2, n // 16).astype(float)
    x = np.repeat(bits, 16)
    from scipy.ndimage import gaussian_filter1d
    A = gaussian_filter1d(x, 4).astype(np.complex64) * 0.2

    single = np.asarray(ssfm.ssfm_propagate(
        A, _wgrid(n, fs), length=10, alpha=0.2, beta_2=-20, h=1.0))

    mesh = make_link_mesh(n_wdm=1, n_time=8)
    sharded = np.asarray(ssfm_sharded(
        A, mesh, fs=fs, length=10, alpha=0.2, beta_2=-20, h=1.0))

    scale = np.max(np.abs(single))
    np.testing.assert_allclose(sharded / scale, single / scale, atol=2e-4)


def test_sharded_matches_single_device_nonlinear(devices):
    """Full NLSE (dispersion + Kerr + attenuation)."""
    n = 2**14
    fs = 160e9
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, n // 16).astype(float)
    from scipy.ndimage import gaussian_filter1d
    A = gaussian_filter1d(np.repeat(bits, 16), 4).astype(np.complex64) * 0.3

    kw = dict(length=20, alpha=0.2, beta_2=-20, gamma=1.3, h=0.5)
    single = np.asarray(ssfm.ssfm_propagate(A, _wgrid(n, fs), **kw))

    mesh = make_link_mesh(n_wdm=1, n_time=8)
    sharded = np.asarray(ssfm_sharded(A, mesh, fs=fs, **kw))

    scale = np.max(np.abs(single))
    np.testing.assert_allclose(sharded / scale, single / scale, atol=5e-4)


def test_sharded_wdm_channels(devices):
    """(channels, samples) input sharded over ('wdm', 'time')."""
    n = 2**13
    fs = 160e9
    rng = np.random.default_rng(2)
    from scipy.ndimage import gaussian_filter1d
    A = np.stack([
        gaussian_filter1d(np.repeat(rng.integers(0, 2, n // 16).astype(float),
                                    16), 4) * 0.2
        for _ in range(2)]).astype(np.complex64)

    kw = dict(length=10, alpha=0.2, beta_2=-20, gamma=1.0, h=1.0)
    mesh = make_link_mesh(n_wdm=2, n_time=4)
    sharded = np.asarray(ssfm_sharded(A, mesh, fs=fs, **kw))

    for ch in range(2):
        single = np.asarray(ssfm.ssfm_propagate(A[ch], _wgrid(n, fs), **kw))
        scale = np.max(np.abs(single))
        np.testing.assert_allclose(sharded[ch] / scale, single / scale,
                                   atol=5e-4)


def test_sharded_input_validation(devices):
    mesh = make_link_mesh(n_wdm=1, n_time=8)
    A = np.zeros(1000, dtype=np.complex64)  # not divisible by 8
    with pytest.raises(ValueError):
        ssfm_sharded(A, mesh, fs=160e9, length=10, beta_2=-20, h=1.0)
    # overlap method: halo larger than block
    A = np.zeros(2**10, dtype=np.complex64)
    with pytest.raises(ValueError):
        ssfm_sharded(A, mesh, fs=10e12, length=10, beta_2=-2000, h=10.0,
                     method="overlap")
    # pencil method: block not divisible by shard count
    A = np.zeros(8 * 12, dtype=np.complex64)  # 12 % 8 != 0
    with pytest.raises(ValueError):
        ssfm_sharded(A, mesh, fs=160e9, length=10, beta_2=-20, h=1.0,
                     method="pencil")
    with pytest.raises(ValueError):
        ssfm_sharded(np.zeros(2**13, dtype=np.complex64), mesh, fs=160e9,
                     length=10, beta_2=-20, h=1.0, method="nope")


def test_sharded_overlap_method_approximate(devices):
    """The cheap overlap-save path stays within its documented ~1/H^2
    truncation error for a band-limited input."""
    n = 2**14
    fs = 160e9
    rng = np.random.default_rng(3)
    from scipy.ndimage import gaussian_filter1d
    A = gaussian_filter1d(
        np.repeat(rng.integers(0, 2, n // 16).astype(float), 16),
        4).astype(np.complex64) * 0.2

    kw = dict(length=10, alpha=0.2, beta_2=-20, h=1.0)
    single = np.asarray(ssfm.ssfm_propagate(A, _wgrid(n, fs), **kw))
    mesh = make_link_mesh(n_wdm=1, n_time=8)
    sharded = np.asarray(ssfm_sharded(A, mesh, fs=fs, method="overlap",
                                      halo_safety=16.0, **kw))
    scale = np.max(np.abs(single))
    np.testing.assert_allclose(sharded / scale, single / scale, atol=5e-3)


# ----------------------------------------------------------- span pipeline
def test_span_pipeline_matches_sequential(devices):
    """4-span pipeline over 4 devices == sequential span application."""
    from opticomlib_tpu.parallel.pipeline import make_span_mesh, span_pipeline

    S, B, n, fs = 4, 8, 1024, 160e9
    rng = np.random.default_rng(3)
    A = (rng.normal(size=(B, n)) + 1j * rng.normal(size=(B, n))
         ).astype(np.complex64) * 0.1
    cfg = dict(alpha=0.2, beta_2=-21.0, gamma=1.3)
    span_L, h = 5.0, 0.5

    mesh = make_span_mesh(S, devices=devices[:S])
    out = np.asarray(span_pipeline(A, mesh, fs, span_L, h=h, **cfg))

    # sequential oracle: spans applied one after another on one device,
    # with the same transparent EDFA gain per span
    w = _wgrid(n, fs)
    g = 10.0 ** (cfg["alpha"] * span_L / 20.0)
    expect = A.copy()
    for _ in range(S):
        expect = np.stack([
            ssfm.ssfm_propagate(expect[b], w, span_L, h=h, **cfg) * g
            for b in range(B)])

    scale = np.max(np.abs(expect))
    np.testing.assert_allclose(out, expect, atol=5e-4 * scale)


def test_span_pipeline_sharded_output_no_replication(devices):
    """Round 2 (VERDICT item 9): the batch is sharded over 'span' —
    memory per device is O(B/S * n), and the result comes back sharded
    (device d owns rows [d*B/S, (d+1)*B/S)), not replicated."""
    from opticomlib_tpu.parallel.pipeline import make_span_mesh, span_pipeline

    S, B, n, fs = 8, 16, 512, 160e9
    rng = np.random.default_rng(7)
    A = (rng.normal(size=(B, n)) + 1j * rng.normal(size=(B, n))
         ).astype(np.complex64) * 0.1
    mesh = make_span_mesh(S, devices=devices[:S])
    out = span_pipeline(A, mesh, fs, 2.0, alpha=0.2, beta_2=-21.0,
                        gamma=1.3, h=1.0)
    # sharded, one (B/S, n) shard per device
    assert len(out.sharding.device_set) == S
    shard_shapes = {s.data.shape for s in out.addressable_shards}
    assert shard_shapes == {(B // S, n)}

    # values still match the sequential oracle
    w = _wgrid(n, fs)
    g = 10.0 ** (0.2 * 2.0 / 20.0)
    expect = A.copy()
    for _ in range(S):
        expect = np.stack([
            ssfm.ssfm_propagate(expect[b], w, 2.0, alpha=0.2, beta_2=-21.0,
                                gamma=1.3, h=1.0) * g for b in range(B)])
    np.testing.assert_allclose(np.asarray(out), expect,
                               atol=1e-3 * np.max(np.abs(expect)))


def test_span_pipeline_rejects_indivisible_batch(devices):
    from opticomlib_tpu.parallel.pipeline import make_span_mesh, span_pipeline

    mesh = make_span_mesh(4, devices=devices[:4])
    A = np.zeros((6, 256), np.complex64)
    with pytest.raises(ValueError):
        span_pipeline(A, mesh, 80e9, 1.0, h=0.5)


def test_span_pipeline_single_span(devices):
    """S=1 degenerates to plain per-batch propagation."""
    from opticomlib_tpu.parallel.pipeline import make_span_mesh, span_pipeline

    B, n, fs = 3, 512, 80e9
    rng = np.random.default_rng(4)
    A = (rng.normal(size=(B, n)) + 1j * rng.normal(size=(B, n))
         ).astype(np.complex64) * 0.1
    mesh = make_span_mesh(1, devices=devices[:1])
    out = np.asarray(span_pipeline(A, mesh, fs, 2.0, alpha=0.2,
                                   beta_2=-21.0, gamma=1.3, h=0.5))
    w = _wgrid(n, fs)
    g = 10.0 ** (0.2 * 2.0 / 20.0)
    expect = np.stack([
        ssfm.ssfm_propagate(A[b], w, 2.0, alpha=0.2, beta_2=-21.0,
                            gamma=1.3, h=0.5) * g for b in range(B)])
    np.testing.assert_allclose(out, expect, atol=5e-4 * np.max(np.abs(expect)))


# ---------------------------------------------------------------------------
# adaptive sharded stepping (round 2: VERDICT item 3 / SURVEY §2.6 —
# phi_max criterion with per-step all-reduce(max) over the mesh)
# ---------------------------------------------------------------------------
def _bandlimited(n, seed, amp):
    from scipy.ndimage import gaussian_filter1d
    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 2, n // 16).astype(float)
    return gaussian_filter1d(np.repeat(bits, 16), 4).astype(np.complex64) * amp


def test_adaptive_sharded_pencil_matches_single(devices):
    n = 2**14
    fs = 160e9
    A = _bandlimited(n, 3, 0.3)
    kw = dict(length=20, alpha=0.2, beta_2=-20, gamma=1.3, phi_max=0.05)

    single = np.asarray(ssfm.ssfm_propagate(A, _wgrid(n, fs), **kw))
    mesh = make_link_mesh(n_wdm=1, n_time=8)
    sharded = np.asarray(ssfm_sharded(A, mesh, fs=fs, h=None, **kw))

    scale = np.max(np.abs(single))
    np.testing.assert_allclose(sharded / scale, single / scale, atol=5e-4)


def test_adaptive_sharded_overlap_matches_single(devices):
    n = 2**15  # larger blocks: the adaptive overlap halo grows with e^{aL}
    fs = 160e9
    A = _bandlimited(n, 4, 0.3)
    kw = dict(length=10, alpha=0.2, beta_2=-20, gamma=1.3, phi_max=0.05)

    single = np.asarray(ssfm.ssfm_propagate(A, _wgrid(n, fs), **kw))
    mesh = make_link_mesh(n_wdm=1, n_time=8)
    sharded = np.asarray(ssfm_sharded(A, mesh, fs=fs, h=None,
                                      method="overlap", **kw))

    # looser than pencil: halo truncation feeds back through the adaptive
    # step controller (the pencil path is exact, see test above)
    scale = np.max(np.abs(single))
    np.testing.assert_allclose(sharded / scale, single / scale, atol=5e-3)


def test_adaptive_sharded_wdm_channels(devices):
    """Adaptive stepping on a (channels, samples) batch: the all-reduce
    spans both mesh axes, matching the single-device global max."""
    n = 2**13
    fs = 160e9
    A = np.stack([_bandlimited(n, 5, 0.2), _bandlimited(n, 6, 0.35)])

    kw = dict(length=10, alpha=0.2, beta_2=-20, gamma=1.3, phi_max=0.05)
    single = np.asarray(ssfm.ssfm_propagate(A, _wgrid(n, fs), **kw))

    mesh = make_link_mesh(n_wdm=2, n_time=4)
    sharded = np.asarray(ssfm_sharded(A, mesh, fs=fs, h=None, **kw))

    scale = np.max(np.abs(single))
    np.testing.assert_allclose(sharded / scale, single / scale, atol=5e-4)


def test_fiber_mesh_drop_in(devices):
    """FIBER(mesh=...) == FIBER single-device (adaptive, drop-in API)."""
    from opticomlib_tpu import gv
    from opticomlib_tpu.devices import FIBER
    from opticomlib_tpu.signals import OpticalSignal

    gv.default()
    gv(sps=16, R=10e9, N=2**10)
    n = gv.N * gv.sps
    x = OpticalSignal(_bandlimited(n, 7, 0.3))

    kw = dict(length=20, alpha=0.2, beta_2=-20.0, gamma=1.3, phi_max=0.05)
    single = FIBER(x, **kw)
    mesh = make_link_mesh(n_wdm=1, n_time=8)
    sharded = FIBER(x, mesh=mesh, **kw)

    a, b = sharded.to_numpy(), single.to_numpy()
    scale = np.max(np.abs(b))
    np.testing.assert_allclose(a / scale, b / scale, atol=5e-4)
    gv.default()


def test_fiber_mesh_rejects_return_steps(devices):
    from opticomlib_tpu import gv
    from opticomlib_tpu.devices import FIBER
    from opticomlib_tpu.signals import OpticalSignal

    gv.default()
    mesh = make_link_mesh(n_wdm=1, n_time=8)
    x = OpticalSignal(np.ones(2048, complex) * 0.1)
    with pytest.raises(ValueError):
        FIBER(x, 10, beta_2=-20, gamma=1.0, mesh=mesh, return_steps=True)
    gv.default()


def test_span_pipeline_ase_matches_sequential_keyed_chain(devices):
    """Round 3 (VERDICT item 8): pipeline with per-span keyed ASE ==
    the sequential keyed span-by-span chain, bit-for-bit — the ASE key
    is a pure function of (microbatch, span), not of the schedule."""
    import jax.numpy as jnp

    from opticomlib_tpu.ops.noise import gaussian_inside
    from opticomlib_tpu.parallel.pipeline import make_span_mesh, span_pipeline
    from scipy.constants import c as c_light, h as h_planck

    S, B, n, fs = 4, 8, 512, 160e9
    span_L, h, NF, seed = 5.0, 0.5, 5.0, 123
    cfg = dict(alpha=0.2, beta_2=-21.0, gamma=1.3)
    rng = np.random.default_rng(3)
    A = (rng.normal(size=(B, n)) + 1j * rng.normal(size=(B, n))
         ).astype(np.complex64) * 0.1

    mesh = make_span_mesh(S, devices=devices[:S])
    out = np.asarray(span_pipeline(A, mesh, fs, span_L, h=h, NF=NF,
                                   seed=seed, **cfg))

    # sequential oracle with the SAME key scheme
    gain_db = cfg["alpha"] * span_L
    g = 10.0 ** (gain_db / 20.0)
    G_lin = 10.0 ** (gain_db / 10.0)
    f0 = c_light / 1550e-9
    P_ase = 10.0 ** (NF / 10.0) * h_planck * f0 * (G_lin - 1.0) * fs
    sigma = float(np.sqrt(P_ase / 4.0))
    base = jax.random.PRNGKey(seed)
    w = _wgrid(n, fs)
    expect = A.copy()
    for d in range(S):
        for m in range(B):
            y = ssfm.ssfm_propagate(expect[m], w, span_L, h=h, **cfg) * g
            k = jax.random.fold_in(jax.random.fold_in(base, m), d)
            dr = np.asarray(jax.jit(gaussian_inside,
                                    static_argnums=(1,))(k, (2, n), sigma))
            expect[m] = y + dr[0] + 1j * dr[1]

    scale = np.max(np.abs(expect))
    np.testing.assert_allclose(out, expect, atol=5e-4 * scale)


def test_span_pipeline_adaptive_matches_sequential(devices):
    """Round 3 (VERDICT item 8): phi_max-adaptive stepping in the
    pipeline (local reduction — each microbatch lives on one device)."""
    from opticomlib_tpu.parallel.pipeline import make_span_mesh, span_pipeline

    S, B, n, fs = 4, 8, 512, 160e9
    span_L, phi_max = 5.0, 0.02
    cfg = dict(alpha=0.2, beta_2=-21.0, gamma=1.3)
    rng = np.random.default_rng(9)
    A = (rng.normal(size=(B, n)) + 1j * rng.normal(size=(B, n))
         ).astype(np.complex64) * 0.1

    mesh = make_span_mesh(S, devices=devices[:S])
    out = np.asarray(span_pipeline(A, mesh, fs, span_L, h=None,
                                   phi_max=phi_max, **cfg))

    w = _wgrid(n, fs)
    g = 10.0 ** (cfg["alpha"] * span_L / 20.0)
    expect = A.copy()
    for _ in range(S):
        expect = np.stack([
            ssfm.ssfm_propagate(expect[b], w, span_L, h=None,
                                phi_max=phi_max, **cfg) * g
            for b in range(B)])
    np.testing.assert_allclose(out, expect,
                               atol=5e-4 * np.max(np.abs(expect)))


def test_ssfm_sharded_program_cache(devices):
    """Round 3 (VERDICT weak-2): repeated ssfm_sharded calls with the
    same (mesh, shape, physics) reuse ONE compiled program."""
    from opticomlib_tpu.parallel import fiber as pf

    mesh = make_link_mesh(n_wdm=1, n_time=4, devices=devices[:4])
    A = _bandlimited(2048, 11, 0.1)
    pf._prog_cache.clear()
    out1 = np.asarray(pf.ssfm_sharded(A, mesh, fs=160e9, length=2.0,
                                      alpha=0.2, beta_2=-21.0, gamma=1.3,
                                      h=0.5, wdm_axis=None))
    assert len(pf._prog_cache) == 1
    out2 = np.asarray(pf.ssfm_sharded(A, mesh, fs=160e9, length=2.0,
                                      alpha=0.2, beta_2=-21.0, gamma=1.3,
                                      h=0.5, wdm_axis=None))
    assert len(pf._prog_cache) == 1
    np.testing.assert_array_equal(out1, out2)
    # different physics -> new entry
    pf.ssfm_sharded(A, mesh, fs=160e9, length=2.0, alpha=0.2,
                    beta_2=-18.0, gamma=1.3, h=0.5, wdm_axis=None)
    assert len(pf._prog_cache) == 2


def test_ssfm_sharded_checkpoint_resume_bitexact(devices, tmp_path):
    """Round 3 (VERDICT item 7): kill-and-resume on the sharded solver
    reproduces the uninterrupted segmented waveform bit-for-bit."""
    from opticomlib_tpu.parallel.fiber import ssfm_sharded
    from opticomlib_tpu.runtime.checkpoint import PropagationCheckpointer

    mesh = make_link_mesh(n_wdm=1, n_time=4, devices=devices[:4])
    A = _bandlimited(2048, 13, 0.15)
    cfg = dict(fs=160e9, length=8.0, alpha=0.2, beta_2=-21.0, gamma=1.3,
               h=0.5, wdm_axis=None)

    # uninterrupted segmented run
    full = np.asarray(ssfm_sharded(A, mesh, segment_km=2.0,
                                   ckpt_dir=str(tmp_path / "full"), **cfg))

    # "crashed" run: monkeypatch save to die after the 2nd segment
    crash_dir = str(tmp_path / "crash")
    orig_save = PropagationCheckpointer.save
    calls = {"n": 0}

    def dying_save(self, *a, **kw):
        out = orig_save(self, *a, **kw)
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated crash after segment 2")
        return out

    PropagationCheckpointer.save = dying_save
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            ssfm_sharded(A, mesh, segment_km=2.0, ckpt_dir=crash_dir,
                         **cfg)
    finally:
        PropagationCheckpointer.save = orig_save

    # resume: picks up from z=4 km and finishes
    resumed = np.asarray(ssfm_sharded(A, mesh, segment_km=2.0,
                                      ckpt_dir=crash_dir, **cfg))
    np.testing.assert_array_equal(resumed, full)

    # wrong physics in the same dir must be rejected
    with pytest.raises(ValueError, match="different"):
        bad = dict(cfg, gamma=2.0)
        ssfm_sharded(A, mesh, segment_km=2.0, ckpt_dir=crash_dir, **bad)


def test_fiber_mesh_stays_device_resident(devices):
    """Round 3: chained FIBER(mesh=) stages keep the waveform on-device
    (jax.Array payload, no host gather between stages) and match the
    host-gathered result."""
    from opticomlib_tpu import gv
    from opticomlib_tpu.devices import FIBER
    from opticomlib_tpu.signals import OpticalSignal

    gv(sps=16, R=10e9)
    mesh = make_link_mesh(n_wdm=1, n_time=4, devices=devices[:4])
    A = _bandlimited(2048, 21, 0.1)
    cfg = dict(length=5.0, alpha=0.2, beta_2=-21.0, gamma=1.3, h=0.5,
               mesh=mesh)

    o1 = FIBER(OpticalSignal(A), **cfg)
    assert isinstance(o1.signal, jax.Array)
    o2 = FIBER(o1, **cfg)  # second stage consumes the device payload
    assert isinstance(o2.signal, jax.Array)

    w = _wgrid(2048, 160e9)
    expect = ssfm.ssfm_propagate(
        ssfm.ssfm_propagate(A, w, 5.0, alpha=0.2, beta_2=-21.0,
                            gamma=1.3, h=0.5),
        w, 5.0, alpha=0.2, beta_2=-21.0, gamma=1.3, h=0.5)
    np.testing.assert_allclose(np.asarray(o2.signal).ravel(), expect,
                               atol=5e-4 * np.max(np.abs(expect)))


def test_multihost_initialize_idempotent(monkeypatch):
    """Round-3 review fix: a second initialize_multihost() must return the
    device count without calling jax.distributed.initialize again (whose
    double-call error never says 'already')."""
    from opticomlib_tpu.parallel.multihost import initialize_multihost

    calls = []

    def fake_initialize(**kw):
        calls.append(kw)
        raise RuntimeError(
            "jax.distributed.initialize() must be called before "
            "any JAX calls are executed.")

    monkeypatch.setattr(jax.distributed, "initialize", fake_initialize)
    # backend reports already-initialized -> no call, no raise
    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: True,
                        raising=False)
    n = initialize_multihost()
    assert n == len(jax.devices()) and calls == []

    # not initialized -> exactly one call (and the error propagates,
    # since our fake initialize always raises)
    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: False,
                        raising=False)
    with pytest.raises(RuntimeError):
        initialize_multihost(coordinator_address="h:1", num_processes=2,
                             process_id=0)
    assert len(calls) == 1


@pytest.mark.parametrize("shape,wdm", [((4096,), None), ((4, 1024), "wdm")])
def test_host_shard_checkpoint_roundtrip(devices, shape, wdm):
    """The per-host shard save/reassemble helpers used by the multi-host
    checkpoint path invert each other on a real mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from opticomlib_tpu.parallel.fiber import (_assemble_from_host_shards,
                                               _host_shard_blocks)

    rng = np.random.default_rng(7)
    A0 = (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
          ).astype(np.complex64)
    mesh = (make_link_mesh(n_wdm=1, n_time=8) if wdm is None
            else make_link_mesh(n_wdm=4, n_time=2))
    A = shard_waveform(A0, mesh, wdm_axis=wdm)

    blocks, indices = _host_shard_blocks(A)
    assert blocks.dtype == np.complex64
    assert len(indices) == len({tuple(map(tuple, i)) for i in indices})

    sharding = NamedSharding(mesh, P("time") if A0.ndim == 1
                             else P(wdm, "time"))
    B = _assemble_from_host_shards(blocks.real, blocks.imag, indices,
                                   shape, sharding)
    assert isinstance(B, jax.Array) and B.sharding == sharding
    np.testing.assert_array_equal(np.asarray(B), A0)


def test_ase_physics_single_source():
    """EDFA ASE power/sigma live in one helper shared by devices.EDFA,
    the fused link and the span pipeline (round-3 review fix)."""
    from opticomlib_tpu.ops.noise import ase_power, ase_sigma

    P = ase_power(20.0, 5.0, 193.4e12, 640e9)
    assert P > 0
    np.testing.assert_allclose(ase_sigma(20.0, 5.0, 193.4e12, 640e9),
                               np.sqrt(P / 4))
    assert ase_power(0.0, 5.0, 193.4e12, 640e9) == 0.0  # G=0 dB: no ASE
    with pytest.raises(ValueError):
        ase_power(-1.0, 5.0, 193.4e12, 640e9)

    # the fused link's stage plan uses the same number
    from opticomlib_tpu.link import EDFASpec, _stage_plan
    plan = _stage_plan((EDFASpec(G=20.0, NF=5.0),), 193.4e12, 640e9,
                       fiber_extra=lambda st: {}, dm_const=lambda st: {},
                       bpf_name=lambda *a: "h", wrap_hs=lambda x: x)
    np.testing.assert_allclose(plan[0]["sigma_ase"],
                               ase_sigma(20.0, 5.0, 193.4e12, 640e9))


def test_span_pipeline_stages_config4_matches_fused_link(devices):
    """Round-4 (VERDICT #4): the heterogeneous stage pipeline runs the
    config-4 shape — N x (FIBER+EDFA) spans followed by N x DBP spans
    with undo-gain — distributed over 8 devices, and reproduces the
    sequential fused LinkProgram's channel output."""
    import jax.numpy as jnp

    from opticomlib_tpu.link import (DBPSpec, EDFASpec, FiberSpec,
                                     LinkSpec, RepeatSpec, build_link)
    from opticomlib_tpu.parallel.pipeline import (make_span_mesh,
                                                  span_pipeline_stages)
    from opticomlib_tpu.params import SimParams

    sps, R, n_bits = 8, 10e9, 256
    params = SimParams.create(sps=sps, R=R, _warn=False)
    stages = (
        RepeatSpec(4, (FiberSpec(length=20, alpha=0.2, beta_2=-21.0,
                                 gamma=1.3, h=0.5),
                       EDFASpec(G=4.0))),
        RepeatSpec(4, (DBPSpec(length=20, alpha=0.2, beta_2=-21.0,
                               gamma=1.3, h=0.5, undo_gain_dB=4.0),)),
    )
    base = dict(Vpp=5, offset=-2.5, bias=-2.5, Vpi=5, P0=5,
                pulse_shape="gaussian", loss_dB=3, ER_dB=26,
                pd_BW=0.75 * R, include_thermal=False, include_shot=False)
    prog_b2b = build_link(LinkSpec(**base), n_bits, params=params,
                          return_field=True)
    prog_full = build_link(LinkSpec(stages=stages, **base), n_bits,
                           params=params, return_field=True)

    B = 8
    rng = np.random.default_rng(7)
    bits = rng.integers(0, 2, (B, n_bits)).astype(np.float32)
    f_in, f_out = [], []
    for c in range(B):
        o0 = prog_b2b.jitted(jnp.asarray(bits[c]), jnp.uint32(0))
        f_in.append(np.asarray(o0[2]) + 1j * np.asarray(o0[3]))
        o1 = prog_full.jitted(jnp.asarray(bits[c]), jnp.uint32(0))
        f_out.append(np.asarray(o1[2]) + 1j * np.asarray(o1[3]))
    f_in = np.stack(f_in)
    f_out = np.stack(f_out)

    mesh = make_span_mesh(8, devices=devices[:8])
    out = np.asarray(span_pipeline_stages(f_in, mesh, fs=params.fs,
                                          stages=stages))
    scale = np.max(np.abs(f_out))
    assert np.max(np.abs(out - f_out)) < 2e-5 * scale
    # round trip really inverted the link (DBP undoes the spans)
    assert np.max(np.abs(out - f_in)) < 5e-3 * scale


def test_span_pipeline_stages_schedule_independence_with_ase(devices):
    """Keyed 2-pol ASE: the 8-device pipelined run is bit-identical to
    the 1-device (fully sequential) run of the same segment chain —
    the noise keys are functions of (microbatch, segment), not of the
    schedule."""
    from opticomlib_tpu.link import EDFASpec, FiberSpec, RepeatSpec
    from opticomlib_tpu.parallel.pipeline import (make_span_mesh,
                                                  span_pipeline_stages)

    B, n, fs = 8, 1024, 160e9
    rng = np.random.default_rng(5)
    A = (rng.normal(size=(B, n)) + 1j * rng.normal(size=(B, n))
         ).astype(np.complex64) * 0.1
    stages = (RepeatSpec(8, (FiberSpec(length=5, alpha=0.2, beta_2=-21.0,
                                       gamma=1.3, h=0.5),
                             EDFASpec(G=1.0, NF=5.0))),)

    out_seq = np.asarray(span_pipeline_stages(
        A, make_span_mesh(1, devices=devices[:1]), fs, stages, seed=3))
    out_pipe = np.asarray(span_pipeline_stages(
        A, make_span_mesh(8, devices=devices[:8]), fs, stages, seed=3))
    assert out_pipe.shape == (B, 2, n)      # ASE promoted to 2 pol
    np.testing.assert_array_equal(out_pipe, out_seq)


def test_span_pipeline_stages_dm_and_attenuator(devices):
    """DMSpec and standalone (noiseless) EDFASpec lower to zero-length /
    linear-only segments; mixed chain matches the fused link."""
    import jax.numpy as jnp

    from opticomlib_tpu.link import (DMSpec, EDFASpec, FiberSpec,
                                     LinkSpec, build_link)
    from opticomlib_tpu.parallel.pipeline import (make_span_mesh,
                                                  span_pipeline_stages)
    from opticomlib_tpu.params import SimParams

    sps, R, n_bits = 8, 10e9, 256
    params = SimParams.create(sps=sps, R=R, _warn=False)
    stages = (FiberSpec(length=40, alpha=0.2, beta_2=-21.0, gamma=0.0),
              DMSpec(D=21.0 * 40), EDFASpec(G=-3.0),
              FiberSpec(length=10, alpha=0.0, beta_2=-5.0, gamma=1.3,
                        h=0.5))
    base = dict(Vpp=5, offset=-2.5, bias=-2.5, Vpi=5, P0=5,
                pulse_shape="gaussian", loss_dB=3, ER_dB=26,
                pd_BW=0.75 * R, include_thermal=False, include_shot=False)
    prog_b2b = build_link(LinkSpec(**base), n_bits, params=params,
                          return_field=True)
    prog_full = build_link(LinkSpec(stages=stages, **base), n_bits,
                           params=params, return_field=True)
    rng = np.random.default_rng(9)
    bits = rng.integers(0, 2, (4, n_bits)).astype(np.float32)
    f_in, f_out = [], []
    for c in range(4):
        o0 = prog_b2b.jitted(jnp.asarray(bits[c]), jnp.uint32(0))
        f_in.append(np.asarray(o0[2]) + 1j * np.asarray(o0[3]))
        o1 = prog_full.jitted(jnp.asarray(bits[c]), jnp.uint32(0))
        f_out.append(np.asarray(o1[2]) + 1j * np.asarray(o1[3]))
    f_in, f_out = np.stack(f_in), np.stack(f_out)

    # 4 segments (fiber, dm, edfa, fiber) over 4 devices, B=4
    mesh = make_span_mesh(4, devices=devices[:4])
    out = np.asarray(span_pipeline_stages(f_in, mesh, fs=params.fs,
                                          stages=stages))
    scale = np.max(np.abs(f_out))
    assert np.max(np.abs(out - f_out)) < 2e-5 * scale


# ------------------------------------------------- shard_method='auto'
def test_resolve_shard_method_rules(monkeypatch):
    """'auto' picks by the measured 2H/block crossover (CROSSOVER.json:
    overlap never beat pencil on this mesh, so the measured threshold
    is 0.0 and auto resolves to pencil whenever pencil is feasible).
    A deployment-measured threshold (env override) re-enables overlap
    for small halos."""
    from opticomlib_tpu.parallel import fiber
    from opticomlib_tpu.parallel.fiber import resolve_shard_method
    from opticomlib_tpu.parallel.halo import halo_width

    fs = 640e9
    # adaptive always resolves to pencil (host-sync'd halo sizing)
    assert resolve_shard_method(2**22, 8, None, -21.0, 0.0, fs,
                                adaptive=True) == "pencil"
    # measured threshold (0.0): fixed step resolves to pencil too
    assert resolve_shard_method(2**22, 8, 0.5, -21.0, 0.0, fs) == \
        "pencil"
    # pencil-indivisible but overlap feasible -> overlap regardless
    n_odd = 8 * 4100  # block = 4100, not divisible by 8
    Ho = halo_width(0.01, -21.0, 0.0, fs)
    assert 2 * Ho < n_odd // 8
    assert resolve_shard_method(n_odd, 8, 0.01, -21.0, 0.0,
                                fs) == "overlap"

    # a slice-measured threshold (OPTICOMLIB_TPU_AUTO_HALO_FRAC)
    # re-enables overlap below it
    monkeypatch.setattr(fiber, "AUTO_HALO_FRAC", 0.25)
    n = 2**22
    H = halo_width(0.5, -21.0, 0.0, fs)
    assert 2 * H / (n // 8) <= 0.25
    assert resolve_shard_method(n, 8, 0.5, -21.0, 0.0, fs) == "overlap"
    # halo dominating the block still picks pencil
    n_small = 2**14
    H5 = halo_width(5.0, -21.0, 0.0, fs)
    assert 2 * H5 < n_small // 8
    assert 2 * H5 / (n_small // 8) > 0.25
    assert resolve_shard_method(n_small, 8, 5.0, -21.0, 0.0, fs) == \
        "pencil"


def test_ssfm_sharded_auto_matches_explicit(devices, monkeypatch):
    """method='auto' produces the same field as the method it resolves
    to, for both resolution outcomes (the overlap outcome via a
    deployment threshold override)."""
    import jax

    from opticomlib_tpu.parallel import fiber
    from opticomlib_tpu.parallel.fiber import (make_link_mesh,
                                               resolve_shard_method,
                                               ssfm_sharded)

    mesh = make_link_mesh(n_wdm=1, n_time=8)
    n = 2**14
    rng = np.random.default_rng(2)
    A0 = ((rng.normal(size=n) + 1j * rng.normal(size=n))
          .astype(np.complex64) * 0.05)
    fs = 160e9
    kw = dict(fs=fs, length=4.0, alpha=0.2, beta_2=-21.0, gamma=1.3,
              h=0.5)
    for frac in (0.0, 0.25):   # measured default / overridden
        monkeypatch.setattr(fiber, "AUTO_HALO_FRAC", frac)
        resolved = resolve_shard_method(n, 8, 0.5, -21.0, 0.0, fs)
        a = np.asarray(ssfm_sharded(A0, mesh, method="auto", **kw))
        b = np.asarray(ssfm_sharded(A0, mesh, method=resolved, **kw))
        np.testing.assert_array_equal(a, b)
    # both outcomes really were exercised
    monkeypatch.setattr(fiber, "AUTO_HALO_FRAC", 0.0)
    assert resolve_shard_method(n, 8, 0.5, -21.0, 0.0, fs) == "pencil"
    monkeypatch.setattr(fiber, "AUTO_HALO_FRAC", 0.25)
    assert resolve_shard_method(n, 8, 0.5, -21.0, 0.0, fs) == "overlap"


def test_ssfm_sharded_schemes_match_unsharded(devices):
    """scheme='o4' (fixed + self-tuning) and 'local_error' on the
    sharded solver reproduce the single-device schemes (pencil FFT is
    exact; the error-norm psum makes the step sequences identical up to
    float32 rounding).  Round-5: FIBER(mesh=) no longer restricts
    method='reference'."""
    from opticomlib_tpu.ops import ssfm
    from opticomlib_tpu.parallel.fiber import make_link_mesh, ssfm_sharded

    mesh = make_link_mesh(n_wdm=1, n_time=8)
    n = 2**13
    rng = np.random.default_rng(5)
    A0 = ((rng.normal(size=n) + 1j * rng.normal(size=n))
          .astype(np.complex64) * 0.05)
    fs = 160e9
    kw = dict(length=8.0, alpha=0.2, beta_2=-21.0, gamma=1.3)
    w = 2 * np.pi * np.fft.fftfreq(n) * fs

    cases = {
        "o4_fixed": (dict(scheme="o4", h=0.5),
                     lambda: ssfm.ssfm_scan_o4(A0, w, h=0.5, **kw)),
        "o4_auto": (dict(scheme="o4", h=None, tol=1e-5),
                    lambda: ssfm.ssfm_o4_auto(A0, w, tol=1e-5, **kw)),
        "local_error": (dict(scheme="local_error", h=None, tol=1e-5),
                        lambda: ssfm.ssfm_local_error(
                            A0, w, tol=1e-5, h0=8.0 / 10, **kw)[0]),
    }
    for name, (skw, ref_fn) in cases.items():
        out = np.asarray(ssfm_sharded(A0, mesh, fs=fs, **kw, **skw))
        ref = ref_fn()
        err = np.linalg.norm(out - ref) / np.linalg.norm(ref)
        assert err < 1e-4, (name, err)


def test_fiber_mesh_accepts_new_methods(devices):
    from opticomlib_tpu import gv
    from opticomlib_tpu.devices import FIBER
    from opticomlib_tpu.parallel.fiber import make_link_mesh
    from opticomlib_tpu.signals import OpticalSignal

    gv(sps=16, R=10e9, N=512)
    mesh = make_link_mesh(n_wdm=1, n_time=8)
    rng = np.random.default_rng(1)
    x = (0.1 * (rng.normal(size=gv.N * gv.sps)
                + 1j * rng.normal(size=gv.N * gv.sps))).astype(np.complex64)
    op = OpticalSignal(x)
    for method, kw in (("o4", dict(tol=1e-5)),
                       ("local_error", dict(tol=1e-5)),
                       ("o4", dict(h=1.0))):
        sharded = FIBER(op, length=8, alpha=0.2, beta_2=-21, gamma=1.3,
                        method=method, mesh=mesh, **kw)
        plain = FIBER(op, length=8, alpha=0.2, beta_2=-21, gamma=1.3,
                      method=method, **kw)
        a, b = sharded.to_numpy(), plain.to_numpy()
        err = np.linalg.norm(a - b) / np.linalg.norm(b)
        assert err < 1e-4, (method, kw, err)


def test_ssfm_sharded_scheme_validation(devices):
    from opticomlib_tpu.parallel.fiber import make_link_mesh, ssfm_sharded

    mesh = make_link_mesh(n_wdm=1, n_time=8)
    A0 = np.ones(2**12, np.complex64) * 0.1
    with pytest.raises(ValueError, match="scheme"):
        ssfm_sharded(A0, mesh, fs=1e11, length=5, scheme="rk4")
    with pytest.raises(ValueError, match="pencil"):
        ssfm_sharded(A0, mesh, fs=1e11, length=5, gamma=1.0,
                     scheme="o4", method="overlap")
    with pytest.raises(ValueError, match="scheme"):
        ssfm_sharded(A0, mesh, fs=1e11, length=5, gamma=1.0,
                     scheme="nope", ckpt_dir="/tmp/nope")


def test_ssfm_sharded_o4_checkpoint_resume_bitexact(devices, tmp_path):
    """Round-5: the self-tuning schemes checkpoint/resume too — a killed
    segmented o4 run resumes bit-identical to the uninterrupted one, and
    the scheme is part of the config fingerprint."""
    from opticomlib_tpu.parallel.fiber import make_link_mesh, ssfm_sharded
    from opticomlib_tpu.runtime.checkpoint import PropagationCheckpointer

    mesh = make_link_mesh(n_wdm=1, n_time=4, devices=devices[:4])
    rng = np.random.default_rng(9)
    n = 2048
    A = ((rng.normal(size=n) + 1j * rng.normal(size=n))
         .astype(np.complex64) * 0.1)
    cfg = dict(fs=160e9, length=8.0, alpha=0.2, beta_2=-21.0, gamma=1.3,
               h=None, scheme="o4", tol=1e-5, wdm_axis=None)

    full = np.asarray(ssfm_sharded(A, mesh, segment_km=2.0,
                                   ckpt_dir=str(tmp_path / "full"), **cfg))

    crash_dir = str(tmp_path / "crash")
    orig_save = PropagationCheckpointer.save
    calls = {"n": 0}

    def dying_save(self, *a, **kw):
        out = orig_save(self, *a, **kw)
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated crash after segment 2")
        return out

    PropagationCheckpointer.save = dying_save
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            ssfm_sharded(A, mesh, segment_km=2.0, ckpt_dir=crash_dir,
                         **cfg)
    finally:
        PropagationCheckpointer.save = orig_save

    resumed = np.asarray(ssfm_sharded(A, mesh, segment_km=2.0,
                                      ckpt_dir=crash_dir, **cfg))
    np.testing.assert_array_equal(resumed, full)

    # a different scheme in the same dir is a different propagation
    with pytest.raises(ValueError, match="different"):
        ssfm_sharded(A, mesh, segment_km=2.0, ckpt_dir=crash_dir,
                     **dict(cfg, scheme="local_error"))
