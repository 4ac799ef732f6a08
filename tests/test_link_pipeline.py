"""Pipelined fused link (build_link(spec, span_mesh=)) on the 8-device
CPU mesh: config-4-shaped chains run span-pipelined through the PUBLIC
link API and reproduce the sequential fused program (VERDICT round-3
item 4)."""
import jax
import numpy as np
import pytest

from opticomlib_tpu.link import (DBPSpec, EDFASpec, FiberSpec, LinkSpec,
                                 RepeatSpec, build_link)
from opticomlib_tpu.parallel.pipeline import make_span_mesh
from opticomlib_tpu.params import SimParams

SPS, R, N_BITS = 8, 10e9, 256

CONFIG4 = (
    RepeatSpec(4, (FiberSpec(length=20, alpha=0.2, beta_2=-21.0,
                             gamma=1.3, h=0.5),
                   EDFASpec(G=4.0))),
    RepeatSpec(4, (DBPSpec(length=20, alpha=0.2, beta_2=-21.0, gamma=1.3,
                           h=0.5, undo_gain_dB=4.0),)),
)


@pytest.fixture(scope="module")
def params():
    return SimParams.create(sps=SPS, R=R, _warn=False)


@pytest.fixture(scope="module")
def span_mesh():
    return make_span_mesh(8)


def _spec(stages=CONFIG4, **kw):
    base = dict(Vpp=5, offset=-2.5, bias=-2.5, Vpi=5, P0=5,
                pulse_shape="gaussian", loss_dB=3, ER_dB=26,
                pd_BW=0.75 * R, include_thermal=False, include_shot=False)
    base.update(kw)
    return LinkSpec(stages=tuple(stages), **base)


def test_pipelined_config4_matches_sequential_fused(params, span_mesh):
    """The 8x(FIBER+EDFA) + 8xDBP chain through build_link(span_mesh=)
    decodes identically to the sequential fused LinkProgram (noiseless:
    same laser keys, same receiver)."""
    spec = _spec()
    pr_pipe = build_link(spec, N_BITS, params=params, span_mesh=span_mesh)
    sw_p = pr_pipe.dsp_wdm(8, seed=0, nslots=N_BITS)
    pr_seq = build_link(spec, N_BITS, params=params)
    sw_s = pr_seq.dsp_wdm(8, bits=sw_p.tx, seed=0, nslots=N_BITS)

    np.testing.assert_array_equal(sw_p.ber, sw_s.ber)
    assert (sw_p.ber == 0).all()    # DBP inverted the spans -> clean
    np.testing.assert_allclose(sw_p.threshold, sw_s.threshold,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(sw_p.mu1, sw_s.mu1, rtol=1e-4)
    np.testing.assert_allclose(sw_p.eye_h, sw_s.eye_h, rtol=5e-3)


def test_pipelined_noisy_reproducible(params, span_mesh):
    """Keyed ASE + PD noise: same seed -> identical scalars; different
    seed -> different noise."""
    spec = _spec((RepeatSpec(8, (FiberSpec(length=20, alpha=0.2,
                                           beta_2=-21.0, gamma=1.3,
                                           h=0.5),
                                 EDFASpec(G=4.0, NF=5.0))),),
                 include_thermal=True, include_shot=True)
    pr = build_link(spec, N_BITS, params=params, span_mesh=span_mesh)
    r1 = pr.dsp_wdm(8, seed=1, nslots=N_BITS)
    r2 = pr.dsp_wdm(8, seed=1, nslots=N_BITS)
    np.testing.assert_array_equal(r1.threshold, r2.threshold)
    np.testing.assert_array_equal(r1.n_errors, r2.n_errors)
    r3 = pr.dsp_wdm(8, bits=r1.tx, seed=99, nslots=N_BITS)
    assert not np.array_equal(r1.threshold, r3.threshold)
    assert np.isfinite(r1.threshold).all()


def test_pipelined_validation(params, span_mesh):
    pr = build_link(_spec(), N_BITS, params=params, span_mesh=span_mesh)
    with pytest.raises(ValueError, match="multiple"):
        pr.dsp_wdm(3)
    with pytest.raises(ValueError, match="not both"):
        from jax.sharding import Mesh
        build_link(_spec(), N_BITS, params=params,
                   mesh=Mesh(np.array(jax.devices()), ("time",)),
                   span_mesh=span_mesh)

def test_pipelined_adc_matches_fused(params, span_mesh):
    """adc_bits on the pipelined link (round-5: previously a stub):
    in-graph quantization matches the sequential fused program exactly
    on a noiseless chain."""
    spec = _spec(adc_bits=6)
    pr_pipe = build_link(spec, N_BITS, params=params, span_mesh=span_mesh)
    sw_p = pr_pipe.dsp_wdm(8, seed=0, nslots=N_BITS)
    pr_seq = build_link(spec, N_BITS, params=params)
    sw_s = pr_seq.dsp_wdm(8, bits=sw_p.tx, seed=0, nslots=N_BITS)
    np.testing.assert_array_equal(sw_p.ber, sw_s.ber)
    np.testing.assert_allclose(sw_p.threshold, sw_s.threshold,
                               rtol=1e-4, atol=1e-6)
    # quantization really happened: coarse ADC changes the thresholds
    sw_u = build_link(_spec(), N_BITS, params=params).dsp_wdm(
        8, bits=sw_p.tx, seed=0, nslots=N_BITS)
    assert not np.allclose(sw_s.mu1, sw_u.mu1, rtol=1e-6)


def test_pipelined_seed_sweep_reuses_compiled_program(params, span_mesh):
    """Seed is a traced argument (round-5 advisor fix): a seed sweep
    must not grow the program cache."""
    spec = _spec((RepeatSpec(8, (FiberSpec(length=20, alpha=0.2,
                                           beta_2=-21.0, gamma=1.3,
                                           h=0.5),
                                 EDFASpec(G=4.0, NF=5.0))),))
    pr = build_link(spec, N_BITS, params=params, span_mesh=span_mesh)
    r0 = pr.dsp_wdm(8, seed=0, nslots=N_BITS)
    n_progs = len(pr._dsp_cache)
    r1 = pr.dsp_wdm(8, bits=r0.tx, seed=1, nslots=N_BITS)
    r2 = pr.dsp_wdm(8, bits=r0.tx, seed=2, nslots=N_BITS)
    assert len(pr._dsp_cache) == n_progs  # no recompile per seed
    assert not np.array_equal(r1.threshold, r2.threshold)  # noise moved


def test_pipelined_ppm_soft_and_hard(params, span_mesh):
    """PPM receivers on the pipelined link: soft and hard both decode a
    clean chain and match the sequential fused program."""
    M, n_sym = 8, 64
    spec = _spec((RepeatSpec(8, (FiberSpec(length=10, alpha=0.2,
                                           beta_2=-21.0, gamma=1.3,
                                           h=1.0),
                                 EDFASpec(G=2.0))),))
    pr_pipe = build_link(spec, n_sym * M, params=params,
                         span_mesh=span_mesh)
    pr_seq = build_link(spec, n_sym * M, params=params)
    for decision in ("soft", "hard"):
        sw = pr_pipe.dsp_wdm_ppm(8, M=M, decision=decision, seed=0,
                                 nslots=n_sym * M)
        assert sw.ber.shape == (8,)
        assert (sw.ber == 0).all(), decision
        sw0 = pr_seq.dsp_wdm_ppm(8, M=M, decision=decision, bits=sw.tx,
                                 seed=0, nslots=n_sym * M)
        np.testing.assert_array_equal(sw0.ber, sw.ber)
        if decision == "hard":
            assert sw.threshold is not None
            np.testing.assert_allclose(sw.threshold, sw0.threshold,
                                       rtol=1e-3, atol=1e-6)


# ---------------------------------------------------------------- matrix
# Every LinkSpec channel-stage type through the PIPELINED path, checked
# against the sequential fused program (noiseless).  Together with the
# sharded matrix (tests/test_link_sharded.py::_STAGE_CASES) and the
# staged-device equivalence tests, this proves the full stage vocabulary
# runs on all four execution paths: staged, fused, time-sharded,
# span-pipelined.  Each case flattens to a segment count divisible by
# the 8-device span mesh.
from opticomlib_tpu.link import BPFSpec, DMSpec

_FIB_KW = dict(length=20, alpha=0.2, beta_2=-21.0, gamma=1.3)
_PIPE_MATRIX = {
    "fiber_fixed": (RepeatSpec(8, (FiberSpec(h=0.5, **_FIB_KW),)),),
    "fiber_adaptive": (RepeatSpec(8, (FiberSpec(**_FIB_KW),)),),
    "o4_fixed": (RepeatSpec(8, (FiberSpec(h=0.5, method="o4",
                                          **_FIB_KW),)),),
    "o4_auto": (RepeatSpec(8, (FiberSpec(method="o4", tol=1e-5,
                                         **_FIB_KW),)),),
    "local_error": (RepeatSpec(8, (FiberSpec(method="local_error",
                                             tol=1e-5, **_FIB_KW),)),),
    "dm": (RepeatSpec(8, (FiberSpec(length=20, beta_2=-21.0),
                          DMSpec(D=21.0 * 20))),),
    "bpf": (RepeatSpec(8, (BPFSpec(BW=0.5 * R * SPS),)),),
    "edfa_bw": (RepeatSpec(8, (EDFASpec(G=0.5, BW=0.6 * R * SPS),)),),
    "fiber_edfa_bw": (RepeatSpec(8, (FiberSpec(h=0.5, **_FIB_KW),
                                     EDFASpec(G=4.0,
                                              BW=0.6 * R * SPS))),),
    "dbp_undo": (RepeatSpec(4, (FiberSpec(h=0.5, **_FIB_KW),
                                EDFASpec(G=4.0))),
                 RepeatSpec(4, (DBPSpec(h=0.5, undo_gain_dB=4.0,
                                        **_FIB_KW),))),
}


@pytest.mark.parametrize("name", sorted(_PIPE_MATRIX))
def test_pipelined_stage_matrix(params, span_mesh, name):
    spec = _spec(_PIPE_MATRIX[name])
    pr_pipe = build_link(spec, N_BITS, params=params, span_mesh=span_mesh)
    sw_p = pr_pipe.dsp_wdm(8, seed=0, nslots=N_BITS)
    pr_seq = build_link(spec, N_BITS, params=params)
    sw_s = pr_seq.dsp_wdm(8, bits=sw_p.tx, seed=0, nslots=N_BITS)
    np.testing.assert_array_equal(sw_p.ber, sw_s.ber)
    np.testing.assert_allclose(sw_p.threshold, sw_s.threshold,
                               rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(sw_p.mu1, sw_s.mu1, rtol=1e-3, atol=1e-7)


def test_pipeline_segments_reject_negative_gain_ase():
    """Round-5 advisor fix: EDFASpec with NF set and G < 0 dB must fail
    at build time (the fused builder's check), not NaN the propagation."""
    from opticomlib_tpu.parallel.pipeline import _stage_segments

    with pytest.raises(ValueError, match="G >= 0"):
        _stage_segments((EDFASpec(G=-3.0, NF=5.0),), fs=1e11, f0=None,
                        n=64)
    with pytest.raises(ValueError, match="G >= 0"):
        _stage_segments((FiberSpec(length=10, h=1.0),
                         EDFASpec(G=-3.0, NF=5.0)), fs=1e11, f0=None,
                        n=64)
