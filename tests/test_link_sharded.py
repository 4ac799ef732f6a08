"""Public sharded fused link (opticomlib_tpu.link_sharded) on the
8-device CPU mesh: noiseless sharded == unsharded sample-for-sample for
every stage kind; fused receivers reproduce and stay device-resident;
block-local noise streams are keyed-reproducible and boundary-free.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from opticomlib_tpu.link import (BPFSpec, DBPSpec, DMSpec, EDFASpec,
                                 FiberSpec, LinkSpec, RepeatSpec, build_link)
from opticomlib_tpu.params import SimParams

SPS, R = 16, 10e9
N_BITS = 512


@pytest.fixture(scope="module")
def params():
    return SimParams.create(sps=SPS, R=R, _warn=False)


@pytest.fixture(scope="module")
def mesh_t():
    return Mesh(np.array(jax.devices()), ("time",))


@pytest.fixture(scope="module")
def mesh_wt():
    return Mesh(np.array(jax.devices()).reshape(4, 2), ("wdm", "time"))


def _spec(stages=(), **kw):
    base = dict(Vpp=5, offset=-2.5, bias=-2.5, Vpi=5, P0=5,
                pulse_shape="gaussian", loss_dB=3, ER_dB=26,
                pd_BW=0.75 * R, include_thermal=False, include_shot=False)
    base.update(kw)
    return LinkSpec(stages=tuple(stages), **base)


_BITS = np.random.default_rng(0).integers(0, 2, N_BITS).astype(np.float32)

_FIB = FiberSpec(length=50, alpha=0.2, beta_2=-21.0, gamma=1.3, h=1.0)
_STAGE_CASES = {
    "b2b": (),
    "fiber_fixed": (_FIB,),
    "fiber_adaptive": (FiberSpec(length=50, alpha=0.2, beta_2=-21.0,
                                 gamma=1.3),),
    "dm": (FiberSpec(length=40, beta_2=-21.0), DMSpec(D=21.0 * 40)),
    "bpf": (BPFSpec(BW=0.5 * R * SPS),),
    "edfa_bw": (EDFASpec(G=3.0, BW=0.6 * R * SPS),),
    "repeat": (RepeatSpec(3, (FiberSpec(length=20, alpha=0.2, beta_2=-21.0,
                                        gamma=1.3, h=1.0),
                              EDFASpec(G=4.0))),),
    "dbp": (_FIB, EDFASpec(G=10.0),
            DBPSpec(length=50, alpha=0.2, beta_2=-21.0, gamma=1.3, h=1.0,
                    undo_gain_dB=10.0)),
    # round-5 self-tuning schemes (no fixed h, no calibration)
    "o4_auto": (FiberSpec(length=50, alpha=0.2, beta_2=-21.0, gamma=1.3,
                          method="o4", tol=1e-5),),
    "local_error": (FiberSpec(length=50, alpha=0.2, beta_2=-21.0,
                              gamma=1.3, method="local_error",
                              tol=1e-5),),
}


@pytest.mark.parametrize("name", sorted(_STAGE_CASES))
def test_sharded_noiseless_equals_unsharded(params, mesh_t, name):
    spec = _spec(_STAGE_CASES[name])
    pr0 = build_link(spec, N_BITS, params=params)
    v0 = np.asarray(pr0.jitted(jnp.asarray(_BITS), jnp.uint32(0))[0])
    pr1 = build_link(spec, N_BITS, params=params, mesh=mesh_t)
    v1 = np.asarray(pr1.jitted(_BITS, np.uint32([0]))[0])[0]
    scale = np.max(np.abs(v0))
    assert np.max(np.abs(v1 - v0)) < 2e-5 * scale, name


def test_sharded_dsp_reproducible_and_consistent(params, mesh_t):
    spec = _spec((FiberSpec(length=50, alpha=0.2, beta_2=-21.0, gamma=1.3),
                  EDFASpec(G=10, NF=5)),
                 include_thermal=True, include_shot=True)
    pr = build_link(spec, 1024, params=params, mesh=mesh_t)
    r1 = pr.dsp(seed=1)
    r2 = pr.dsp(seed=1)
    r3 = pr.dsp(seed=2)
    assert r1.ber == r2.ber and r1.threshold == r2.threshold
    assert (r1.threshold, r1.eye.mu1) != (r3.threshold, r3.eye.mu1)
    assert r1.ber == 0.0  # high-SNR link decodes cleanly
    # statistically consistent with the unsharded receiver (different
    # noise stream layout, same physics)
    r0 = build_link(spec, 1024, params=params).dsp(seed=1)
    assert abs(r1.eye.mu1 - r0.eye.mu1) < 0.2 * r0.eye.mu1
    assert abs(r1.threshold - r0.threshold) < 0.2 * abs(r0.threshold)


def test_sharded_dsp_noiseless_matches_unsharded_exactly(params, mesh_t):
    spec = _spec((_FIB,))
    r0 = build_link(spec, 1024, params=params).dsp(seed=3)
    r1 = build_link(spec, 1024, params=params, mesh=mesh_t).dsp(seed=3)
    assert r1.ber == r0.ber
    np.testing.assert_allclose(r1.threshold, r0.threshold, atol=1e-5)
    np.testing.assert_allclose(r1.eye.mu1, r0.eye.mu1, rtol=1e-4)


def test_sharded_dsp_wdm(params, mesh_wt):
    spec = _spec((FiberSpec(length=50, alpha=0.2, beta_2=-21.0, gamma=1.3),
                  EDFASpec(G=10, NF=5)),
                 include_thermal=True, include_shot=True)
    pr = build_link(spec, 1024, params=params, mesh=mesh_wt)
    sw = pr.dsp_wdm(8, seed=0)
    assert sw.ber.shape == (8,)
    assert np.isfinite(sw.threshold).all()
    assert (sw.ber == 0).all()
    sw2 = pr.dsp_wdm(8, seed=0)
    np.testing.assert_array_equal(sw.n_errors, sw2.n_errors)
    # same bits on every channel still decode cleanly per channel
    b = np.random.default_rng(5).integers(0, 2, 1024).astype(np.uint8)
    same = pr.dsp_wdm(8, bits=np.tile(b, (8, 1)), seed=0)
    # different seeds per channel -> different noise, same clean decode
    assert (same.ber == same.ber[0]).all()


def test_sharded_wdm_noiseless_channels_identical(params, mesh_wt):
    spec = _spec((_FIB,))
    pr = build_link(spec, N_BITS, params=params, mesh=mesh_wt)
    b = np.tile(_BITS, (8, 1))
    out = pr.jitted(b, np.zeros(8, np.uint32))
    v = np.asarray(out[0])
    for c in range(1, 8):
        np.testing.assert_allclose(v[c], v[0], atol=1e-6)


def test_sharded_wiener_phase_has_no_block_seams(params, mesh_t):
    """The laser phase random walk crosses shard boundaries smoothly
    (local cumsum + all-gathered prefix)."""
    lw = 1e6
    spec = _spec((), lw=lw, P0=0.0)
    pr = build_link(spec, N_BITS, params=params, mesh=mesh_t,
                    return_field=True)
    out = pr.jitted(np.ones(N_BITS, np.float32), np.uint32([7]))
    f = np.asarray(out[2])[0] + 1j * np.asarray(out[3])[0]
    ph = np.unwrap(np.angle(f))
    d = np.abs(np.diff(ph))
    sigma = np.sqrt(2 * np.pi * lw / pr.params.fs)
    # every increment (incl. the 7 shard seams) is a single N(0, sigma)
    # step — a seam bug would show a O(sqrt(block)) jump
    assert d.max() < 8 * sigma, (d.max(), sigma)


def test_sharded_validation(params, mesh_t):
    with pytest.raises(ValueError, match="divisible"):
        build_link(_spec(()), 513, params=params, mesh=mesh_t)
    pr = build_link(_spec(()), N_BITS, params=params, mesh=mesh_t)
    with pytest.raises(ValueError, match="shape"):
        pr.dsp_wdm(4, bits=np.zeros((4, 17)))


def test_sharded_run_gathers(params, mesh_t):
    pr = build_link(_spec((_FIB,)), N_BITS, params=params, mesh=mesh_t)
    r = pr.run(seed=0)
    assert r.v.shape == (N_BITS * SPS,)
    assert r.slots.shape == (N_BITS,)
    assert np.isfinite(r.v).all()


def test_sharded_dsp_wdm_ppm(params, mesh_wt):
    spec = _spec((FiberSpec(length=10, alpha=0.2, beta_2=-21.0, gamma=1.3,
                            h=1.0),),
                 include_thermal=True)
    M, n_sym = 8, 64
    prog = build_link(spec, n_sym * M, params=params, mesh=mesh_wt)
    sw = prog.dsp_wdm_ppm(4, M=M, seed=0)
    assert sw.ber.shape == (4,)
    assert (sw.ber == 0).all()
    sw2 = prog.dsp_wdm_ppm(4, M=M, seed=0)
    np.testing.assert_array_equal(sw.n_errors, sw2.n_errors)
    # unsharded program with the same bits decodes identically
    # (noiseless TX slots; noise streams differ but both decode clean)
    pr0 = build_link(spec, n_sym * M, params=params)
    sw0 = pr0.dsp_wdm_ppm(4, M=M, bits=sw.tx, seed=0)
    np.testing.assert_array_equal(sw0.ber, sw.ber)


def test_sharded_return_field_two_pol(params, mesh_t):
    spec = _spec((FiberSpec(length=10, alpha=0.2, beta_2=-21.0, gamma=1.3,
                            h=1.0), EDFASpec(G=2.0, NF=5.0)))
    pr = build_link(spec, N_BITS, params=params, mesh=mesh_t,
                    return_field=True)
    out = pr.jitted(_BITS, np.uint32([0]))
    assert np.asarray(out[2]).shape == (1, 2, N_BITS * SPS)
    assert np.isfinite(np.asarray(out[2])).all()


def test_sharded_per_channel_adaptive_stepping(params, mesh_wt):
    """Channels with different launch powers must each follow their OWN
    phi_max step schedule (masked multi-channel while_loop): every
    channel of a sharded 2-channel run equals its unsharded single
    -channel twin (different P0 -> very different step counts)."""
    fib = FiberSpec(length=50, alpha=0.2, beta_2=-21.0, gamma=1.3)
    spec = _spec((fib,))
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, (8, N_BITS)).astype(np.float32)
    pr_sh = build_link(spec, N_BITS, params=params, mesh=mesh_wt)
    v_sh = np.asarray(pr_sh.jitted(bits, np.zeros(8, np.uint32))[0])
    pr0 = build_link(spec, N_BITS, params=params)
    for c in (0, 3, 7):
        v0 = np.asarray(pr0.jitted(jnp.asarray(bits[c]),
                                   jnp.uint32(0))[0])
        assert np.max(np.abs(v_sh[c] - v0)) < 2e-5 * np.max(np.abs(v0)), c


def test_sharded_longhaul_repeat_dbp_roundtrip(params, mesh_t):
    """Multi-span RepeatSpec + per-span DBP on the mesh inverts the link
    (the sharded twin of the config-4 shape, scaled down)."""
    L, G = 20.0, 4.0
    fwd = RepeatSpec(4, (
        FiberSpec(length=L, alpha=0.2, beta_2=-21.0, gamma=1.3, h=0.5),
        EDFASpec(G=G)))
    bwd = RepeatSpec(4, (
        DBPSpec(length=L, alpha=0.2, beta_2=-21.0, gamma=1.3, h=0.5,
                undo_gain_dB=G),))
    f0 = None

    def field(stages):
        pr = build_link(_spec(stages), N_BITS, params=params, mesh=mesh_t,
                        return_field=True)
        out = pr.jitted(_BITS, np.uint32([0]))
        return np.asarray(out[2])[0] + 1j * np.asarray(out[3])[0]

    f_rt = field((fwd, bwd))
    f_b2b = field(())
    err = np.max(np.abs(f_rt - f_b2b)) / np.max(np.abs(f_b2b))
    assert err < 5e-3, err


def test_sharded_df_matches_unsharded(params, mesh_t):
    """Round-3 review fix: the sharded laser detuning uses the same
    mod-2pi float64-reduced phase table as the unsharded builder, so the
    carrier rotation agrees sample-for-sample (noiseless)."""
    spec = _spec((), df=1e9)
    pr0 = build_link(spec, N_BITS, params=params)
    v0 = np.asarray(pr0.jitted(jnp.asarray(_BITS), jnp.uint32(0))[0])
    pr1 = build_link(spec, N_BITS, params=params, mesh=mesh_t)
    v1 = np.asarray(pr1.jitted(_BITS, np.uint32([0]))[0])[0]
    scale = np.max(np.abs(v0))
    assert np.max(np.abs(v1 - v0)) < 2e-5 * scale


def test_sharded_rin_too_high_raises(params, mesh_t):
    """The sharded builder refuses RIN configs the staged LASER would
    reject, instead of NaN-ing in-graph (parity with the unsharded
    build-time check)."""
    spec = _spec((), rin=-80)
    with pytest.raises(ValueError, match="RIN"):
        build_link(spec, N_BITS, params=params, mesh=mesh_t)


def test_sharded_adc_matches_unsharded(params, mesh_t):
    """Round-4: the in-graph sharded ADC (psum-reduced histogram-quantile
    99.99% shortest-interval range, no global sort) quantizes the
    noiseless chain within one LSB of the unsharded exact-sort ADC."""
    bits_n = 6
    spec = _spec((_FIB,), adc_bits=bits_n)
    pr0 = build_link(spec, N_BITS, params=params)
    v0 = np.asarray(pr0.jitted(jnp.asarray(_BITS), jnp.uint32(0))[0])
    pr1 = build_link(spec, N_BITS, params=params, mesh=mesh_t)
    v1 = np.asarray(pr1.jitted(_BITS, np.uint32([0]))[0])[0]
    lsb = (v0.max() - v0.min()) / (2 ** bits_n - 1)
    assert np.max(np.abs(v1 - v0)) <= 1.5 * lsb
    # quantization really happened: few distinct output levels
    assert np.unique(np.round(v1, 9)).size <= 2 ** bits_n + 1


def test_sharded_wdm_ppm_hard(params, mesh_wt):
    """Round-4: hard-decision M-PPM on the sharded WDM path (eye
    metrology on the gathered window + keyed HDD) decodes clean and
    matches the unsharded hard receiver channel-for-channel."""
    spec = _spec((FiberSpec(length=10, alpha=0.2, beta_2=-21.0, gamma=1.3,
                            h=1.0),))
    M, n_sym = 8, 64
    prog = build_link(spec, n_sym * M, params=params, mesh=mesh_wt)
    sw = prog.dsp_wdm_ppm(4, M=M, decision="hard", seed=0)
    assert sw.ber.shape == (4,)
    assert (sw.ber == 0).all()
    assert sw.threshold is not None and np.isfinite(sw.threshold).all()
    # reproducible (keyed HDD, deterministic metrology)
    sw2 = prog.dsp_wdm_ppm(4, M=M, decision="hard", seed=0)
    np.testing.assert_array_equal(sw.n_errors, sw2.n_errors)
    # unsharded twin with the same bits: same decisions, close thresholds
    pr0 = build_link(spec, n_sym * M, params=params)
    sw0 = pr0.dsp_wdm_ppm(4, M=M, decision="hard", bits=sw.tx, seed=0)
    np.testing.assert_array_equal(sw0.ber, sw.ber)
    np.testing.assert_allclose(sw0.threshold, sw.threshold, rtol=1e-3,
                               atol=1e-6)
