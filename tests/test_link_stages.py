"""Fused-link stage vocabulary: DM / BPF / EDFA(BW) / DBP / Repeat / PM /
ADC stages of :mod:`opticomlib_tpu.link`, each checked against the staged
device it mirrors (sample-for-sample where noiseless) and for
construction-time validation.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from opticomlib_tpu import gv
from opticomlib_tpu.link import (BPFSpec, DBPSpec, DMSpec, EDFASpec,
                                 FiberSpec, LinkSpec, RepeatSpec, build_link)
from opticomlib_tpu.params import SimParams
from opticomlib_tpu.signals import OpticalSignal

SPS, R = 16, 10e9
N_BITS = 256


def _params():
    return SimParams.create(sps=SPS, R=R, _warn=False)


def _spec(stages=(), **kw):
    base = dict(Vpp=5, offset=-2.5, bias=-2.5, Vpi=5, P0=5,
                pulse_shape="gaussian", loss_dB=3, ER_dB=26,
                pd_BW=0.75 * R, include_thermal=False, include_shot=False)
    base.update(kw)
    return LinkSpec(stages=tuple(stages), **base)


def _field(spec, seed=0):
    prog = build_link(spec, n_bits=N_BITS, params=_params(),
                      return_field=True)
    out = prog.jitted(jnp.asarray(np.random.default_rng(7).integers(
        0, 2, N_BITS).astype(np.float32)), jnp.uint32(seed))
    re, im = np.asarray(out[2]), np.asarray(out[3])
    return re + 1j * im


# --------------------------------------------------------------------- DM
def test_dm_stage_matches_staged_device():
    gv(sps=SPS, R=R)
    D = 336.0  # ps^2
    f0 = _field(_spec(()))
    f1 = _field(_spec((DMSpec(D=D),)))
    from opticomlib_tpu.devices import DM
    staged = DM(OpticalSignal(f0), D=D)
    ref = np.asarray(staged.signal).ravel()
    assert np.max(np.abs(f1 - ref)) < 1e-6 * np.max(np.abs(ref))


def test_dm_compensates_linear_fiber():
    L, b2 = 40.0, -21.0
    f0 = _field(_spec(()))
    f1 = _field(_spec((FiberSpec(length=L, beta_2=b2),
                       DMSpec(D=-b2 * L))))
    assert np.max(np.abs(f1 - f0)) < 1e-4 * np.max(np.abs(f0))


# -------------------------------------------------------------------- BPF
def test_bpf_stage_matches_staged_device():
    gv(sps=SPS, R=R)
    BW = 0.6 * R
    f0 = _field(_spec(()))
    f1 = _field(_spec((BPFSpec(BW=BW),)))
    from opticomlib_tpu.devices import BPF
    staged = BPF(OpticalSignal(f0), BW=BW)
    ref = np.asarray(staged.signal).ravel()
    assert np.max(np.abs(f1 - ref)) < 1e-6 * np.max(np.abs(f0))


# ------------------------------------------------------------ EDFA extras
def test_edfa_noiseless_is_pure_scale():
    f0 = _field(_spec(()))
    f1 = _field(_spec((EDFASpec(G=-6.0),)))  # NF=None -> attenuator
    np.testing.assert_allclose(f1, f0 * 10 ** (-6.0 / 20), rtol=2e-6)


def test_edfa_output_filter():
    gv(sps=SPS, R=R)
    BW = 0.5 * R
    f_gain = _field(_spec((EDFASpec(G=3.0),)))
    f_filt = _field(_spec((EDFASpec(G=3.0, BW=BW),)))
    from opticomlib_tpu.devices import BPF
    ref = np.asarray(BPF(OpticalSignal(f_gain), BW=BW).signal).ravel()
    assert np.max(np.abs(f_filt - ref)) < 1e-6 * np.max(np.abs(f_gain))


def test_edfa_ase_needs_nonnegative_gain():
    prog_spec = _spec((EDFASpec(G=-3.0, NF=5.0),))
    with pytest.raises(ValueError, match="G >= 0"):
        build_link(prog_spec, n_bits=N_BITS, params=_params())
    # G = 0 dB with NF set is legal (zero ASE), matching the staged EDFA
    prog = build_link(_spec((EDFASpec(G=0.0, NF=5.0),)),
                      n_bits=N_BITS, params=_params())
    assert prog is not None


# -------------------------------------------------------------------- DBP
def test_dbp_stage_inverts_span():
    fib = FiberSpec(length=30.0, alpha=0.2, beta_2=-21.0, gamma=1.3, h=0.25)
    G = fib.alpha * fib.length
    f0 = _field(_spec(()))
    f1 = _field(_spec((
        fib, EDFASpec(G=G),
        DBPSpec(length=fib.length, alpha=fib.alpha, beta_2=fib.beta_2,
                gamma=fib.gamma, h=fib.h, undo_gain_dB=G))))
    err = np.max(np.abs(f1 - f0)) / np.max(np.abs(f0))
    assert err < 2e-3, err


# ----------------------------------------------------------------- Repeat
def test_repeat_noiseless_equals_unrolled():
    fib = FiberSpec(length=10.0, alpha=0.2, beta_2=-21.0, gamma=1.3, h=1.0)
    amp = EDFASpec(G=2.0)
    f_rep = _field(_spec((RepeatSpec(3, (fib, amp)),)))
    f_unr = _field(_spec((fib, amp) * 3))
    assert np.max(np.abs(f_rep - f_unr)) < 1e-5 * np.max(np.abs(f_unr))


def test_repeat_with_ase_reproducible_and_2pol():
    fib = FiberSpec(length=10.0, alpha=0.2, beta_2=-21.0, gamma=1.3, h=1.0)
    amp = EDFASpec(G=2.0, NF=5.0)
    spec = _spec((RepeatSpec(3, (fib, amp)),))
    fa = _field(spec, seed=5)
    fb = _field(spec, seed=5)
    fc = _field(spec, seed=6)
    assert fa.shape[0] == 2  # promoted to 2 pol before the scan
    np.testing.assert_array_equal(fa, fb)
    assert np.max(np.abs(fa - fc)) > 0
    assert np.isfinite(fa).all()


# --------------------------------------------------------------------- PM
def test_pm_modulator_phase():
    # constant drive: NRZ pulse + all-ones bits -> x = Vpp + offset
    # everywhere, so the field is sqrt(P0)*exp(j*pi*x/Vpi) exactly
    spec = _spec((), modulator="pm", pulse_shape="nrz", Vpp=2.0, offset=0.5)
    prog = build_link(spec, n_bits=N_BITS, params=_params(),
                      return_field=True)
    bits = jnp.ones(N_BITS, jnp.float32)
    out = prog.jitted(bits, jnp.uint32(0))
    f = np.asarray(out[2]) + 1j * np.asarray(out[3])
    from opticomlib_tpu.utils.analysis import idbm
    expect = np.sqrt(idbm(5)) * np.exp(1j * np.pi * 2.5 / 5.0)
    np.testing.assert_allclose(f, np.full_like(f, expect), atol=2e-6)


# -------------------------------------------------------------------- ADC
def test_adc_quantization_matches_staged():
    spec_raw = _spec((FiberSpec(length=20, alpha=0.2, beta_2=-21.0,
                                gamma=1.3, h=1.0),))
    spec_adc = _spec((FiberSpec(length=20, alpha=0.2, beta_2=-21.0,
                                gamma=1.3, h=1.0),), adc_bits=6)
    bits = jnp.asarray(np.random.default_rng(7).integers(
        0, 2, N_BITS).astype(np.float32))
    pr_raw = build_link(spec_raw, n_bits=N_BITS, params=_params())
    pr_adc = build_link(spec_adc, n_bits=N_BITS, params=_params())
    v_raw = np.asarray(pr_raw.jitted(bits, jnp.uint32(3))[0])
    v_adc = np.asarray(pr_adc.jitted(bits, jnp.uint32(3))[0])
    from opticomlib_tpu.devices import ADC
    gv(sps=SPS, R=R)
    ref = np.asarray(ADC(v_raw, n=6).signal).real
    np.testing.assert_allclose(v_adc, ref, atol=1e-5 * np.ptp(ref))
    assert len(np.unique(np.round(v_adc, 8))) <= 2 ** 6


# ------------------------------------------------------------- validation
def test_linkspec_validates_at_construction():
    with pytest.raises(ValueError, match="pulse_shape"):
        _spec((), pulse_shape="gausian")
    with pytest.raises(ValueError, match="coupling"):
        _spec((), coupling="CA")
    with pytest.raises(ValueError, match="modulator"):
        _spec((), modulator="eam")
    with pytest.raises(ValueError, match="unsupported stage"):
        _spec(("fiber",))
    with pytest.raises(ValueError, match="adc_bits"):
        _spec((), adc_bits=40)
    with pytest.raises(ValueError, match="length"):
        FiberSpec(length=-1.0)
    with pytest.raises(ValueError, match="nest"):
        RepeatSpec(2, (RepeatSpec(2, (FiberSpec(length=1.0),)),))
    with pytest.raises(ValueError, match="BW"):
        BPFSpec(BW=0.0)


def test_ac_coupling_tolerates_whitespace():
    # 'ac ' must mean AC, not silently DC
    spec = _spec((), coupling="ac ")
    prog = build_link(spec, n_bits=N_BITS, params=_params())
    bits = jnp.asarray(np.random.default_rng(1).integers(
        0, 2, N_BITS).astype(np.float32))
    v, slots = prog.jitted(bits, jnp.uint32(0))[:2]
    spec_dc = _spec((), coupling="DC")
    prog_dc = build_link(spec_dc, n_bits=N_BITS, params=_params())
    v_dc = prog_dc.jitted(bits, jnp.uint32(0))[0]
    assert abs(float(jnp.mean(v)) ) < abs(float(jnp.mean(v_dc)))


class TestFiberSpecO4:
    """Round-4: FiberSpec(method='o4') — the equal-accuracy 4th-order
    scheme reachable from the fused/sharded/pipelined link vocabulary."""

    def _progs(self, method="o4", h=2.5, mesh=None, span_mesh=None):
        from opticomlib_tpu.link import FiberSpec, LinkSpec, build_link
        from opticomlib_tpu.params import SimParams

        R = 10e9
        params = SimParams.create(sps=16, R=R, _warn=False)
        spec = LinkSpec(Vpp=5, offset=-2.5, bias=-2.5, Vpi=5, P0=5,
                        pulse_shape="gaussian", loss_dB=3, ER_dB=26,
                        pd_BW=0.75 * R, include_thermal=False,
                        include_shot=False,
                        stages=(FiberSpec(length=50, alpha=0.2,
                                          beta_2=-21.0, gamma=1.3, h=h,
                                          method=method),))
        return build_link(spec, 512, params=params, mesh=mesh,
                          span_mesh=span_mesh, return_field=True), params

    def test_fused_o4_matches_staged_scheme(self):
        """Fused FiberSpec(method='o4') == the staged ssfm_scan_o4 on
        the same modulated field."""
        import jax.numpy as jnp
        import numpy as np

        from opticomlib_tpu.link import FiberSpec, LinkSpec, build_link
        from opticomlib_tpu.ops import ssfm
        from opticomlib_tpu.params import SimParams

        prog_o4, params = self._progs()
        # b2b twin gives the modulated input field
        R = 10e9
        spec_b2b = LinkSpec(Vpp=5, offset=-2.5, bias=-2.5, Vpi=5, P0=5,
                            pulse_shape="gaussian", loss_dB=3, ER_dB=26,
                            pd_BW=0.75 * R, include_thermal=False,
                            include_shot=False)
        prog_b2b = build_link(spec_b2b, 512, params=params,
                              return_field=True)
        rng = np.random.default_rng(1)
        bits = rng.integers(0, 2, 512).astype(np.float32)
        o0 = prog_b2b.jitted(jnp.asarray(bits), jnp.uint32(0))
        f_in = np.asarray(o0[2]) + 1j * np.asarray(o0[3])
        o1 = prog_o4.jitted(jnp.asarray(bits), jnp.uint32(0))
        f_o4 = np.asarray(o1[2]) + 1j * np.asarray(o1[3])

        w = 2 * np.pi * np.fft.fftfreq(f_in.size) * params.fs
        expect = ssfm.ssfm_scan_o4(f_in, w, 50.0, alpha=0.2,
                                   beta_2=-21.0, gamma=1.3, h=2.5)
        scale = np.max(np.abs(expect))
        assert np.max(np.abs(f_o4 - expect)) < 2e-5 * scale

    def test_o4_more_accurate_than_reference_at_equal_h(self):
        """At the same (coarse) fixed h, the o4 span's output is closer
        to a fine-step truth than the reference scheme's."""
        import jax.numpy as jnp
        import numpy as np

        rng = np.random.default_rng(2)
        bits = rng.integers(0, 2, 512).astype(np.float32)

        def field(method, h):
            prog, _ = self._progs(method=method, h=h)
            o = prog.jitted(jnp.asarray(bits), jnp.uint32(0))
            return np.asarray(o[2]) + 1j * np.asarray(o[3])

        truth = field("o4", 0.25)
        err_ref = np.linalg.norm(field("reference", 5.0) - truth)
        err_o4 = np.linalg.norm(field("o4", 5.0) - truth)
        assert err_o4 < 0.25 * err_ref, (err_o4, err_ref)

    def test_sharded_o4_matches_unsharded(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from jax.sharding import Mesh

        rng = np.random.default_rng(3)
        bits = rng.integers(0, 2, 512).astype(np.float32)
        prog0, _ = self._progs()
        v0 = np.asarray(prog0.jitted(jnp.asarray(bits),
                                     jnp.uint32(0))[0])
        mesh = Mesh(np.array(jax.devices()), ("time",))
        prog1, _ = self._progs(mesh=mesh)
        v1 = np.asarray(prog1.jitted(bits, np.uint32([0]))[0])[0]
        scale = np.max(np.abs(v0))
        assert np.max(np.abs(v1 - v0)) < 2e-5 * scale

    def test_pipelined_o4_matches_unsharded(self):
        import numpy as np

        from opticomlib_tpu.parallel.pipeline import make_span_mesh

        rng = np.random.default_rng(4)
        bits = rng.integers(0, 2, (2, 512)).astype(np.uint8)
        prog0, _ = self._progs()
        sw0 = prog0.dsp_wdm(2, bits=bits, seed=0, nslots=512)
        prog1, _ = self._progs(span_mesh=make_span_mesh(1))
        sw1 = prog1.dsp_wdm(2, bits=bits, seed=0, nslots=512)
        np.testing.assert_array_equal(sw0.ber, sw1.ber)
        np.testing.assert_allclose(sw1.threshold, sw0.threshold,
                                   rtol=1e-3, atol=1e-6)

    def test_method_validation(self):
        import pytest

        from opticomlib_tpu.link import FiberSpec

        # o4 with h=None self-tunes since round 5 (no longer an error)
        FiberSpec(length=50, gamma=1.3, beta_2=-21.0, method="o4")
        with pytest.raises(ValueError, match="method"):
            FiberSpec(length=50, h=1.0, method="rk4")


# ------------------------------------------------- self-tuning schemes
def test_fiber_o4_auto_reachable_from_linkspec():
    """FiberSpec(method='o4', h=None, tol=...) self-tunes in the fused
    graph (round-5: no calibration script needed) and its DBP twin
    inverts the span."""
    L = 40.0
    kw = dict(alpha=0.2, beta_2=-21.0, gamma=1.3)
    f0 = _field(_spec(()))
    fwd_bwd = _field(_spec((
        FiberSpec(length=L, method="o4", tol=1e-5, **kw),
        DBPSpec(length=L, method="o4", tol=1e-5, **kw),
    )))
    err = np.linalg.norm(fwd_bwd - f0) / np.linalg.norm(f0)
    assert err < 5e-3, err


def test_fiber_local_error_reachable_from_linkspec():
    L = 40.0
    kw = dict(alpha=0.2, beta_2=-21.0, gamma=1.3)
    f_ref = _field(_spec((
        FiberSpec(length=L, phi_max=0.001, **kw),)))
    f_le = _field(_spec((
        FiberSpec(length=L, method="local_error", tol=1e-6, **kw),)))
    err = np.linalg.norm(f_le - f_ref) / np.linalg.norm(f_ref)
    assert err < 5e-3, err


def test_fiber_spec_validation_new_methods():
    with pytest.raises(ValueError):
        FiberSpec(length=10, method="local_error", h=1.0)
    with pytest.raises(ValueError):
        FiberSpec(length=10, tol=0.0)
    # o4 with h=None is now legal (self-tuning)
    FiberSpec(length=10, method="o4")


def test_repeat_block_with_self_tuning_schemes():
    """RepeatSpec lowers to ONE lax.scan whose body may contain the
    self-tuning while_loop schemes (round-5): a 3-span o4-auto repeat
    with per-span DBP inverts the chain."""
    L, kw = 15.0, dict(alpha=0.2, beta_2=-21.0, gamma=1.3)
    f0 = _field(_spec(()))
    f_rt = _field(_spec((
        RepeatSpec(3, (FiberSpec(length=L, method="o4", tol=1e-5, **kw),
                       EDFASpec(G=0.2 * L))),
        RepeatSpec(3, (DBPSpec(length=L, method="o4", tol=1e-5,
                               undo_gain_dB=0.2 * L, **kw),)),
    )))
    err = np.linalg.norm(f_rt - f0) / np.linalg.norm(f0)
    assert err < 5e-3, err

    f_le = _field(_spec((
        RepeatSpec(2, (FiberSpec(length=L, method="local_error",
                                 tol=1e-6, **kw),)),)))
    f_ref = _field(_spec((
        RepeatSpec(2, (FiberSpec(length=L, phi_max=0.001, **kw),)),)))
    err2 = np.linalg.norm(f_le - f_ref) / np.linalg.norm(f_ref)
    assert err2 < 5e-3, err2
