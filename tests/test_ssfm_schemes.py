"""Higher-order SSFM scheme tests.

Oracle: a very fine fixed-step 2nd-order solution (h -> 0 limit).  Checks
the convergence *order* of each scheme and that the local-error adaptive
method hits its tolerance with fewer FFTs than naive fine stepping.
"""
import numpy as np
import pytest

from opticomlib_tpu.ops import ssfm


def _pulse(n=2048, fs=640e9, p0=0.08):
    t = np.arange(n) / fs
    t0 = t.mean()
    A = np.sqrt(p0) * np.exp(-(((t - t0) / 12e-12) ** 2) / 2)
    w = 2 * np.pi * np.fft.fftfreq(n) * fs
    return A.astype(np.complex64), w


CFG = dict(alpha=0.2, beta_2=-21.0, gamma=1.3)
L = 12.0


def _err(a, b):
    return float(np.linalg.norm(a - b) / np.linalg.norm(b))


@pytest.fixture(scope="module")
def fine_reference():
    A, w = _pulse()
    # 4th-order fine solution: splitting error ~(L/512)^4 is far below the
    # float32 noise floor, so this is the h->0 limit for every scheme
    ref = ssfm.ssfm_scan_o4(A, w, L, h=L / 512, **CFG)
    return A, w, ref


def test_reference_step_vs_o4_accuracy_at_equal_step(fine_reference):
    A, w, ref = fine_reference
    h = L / 8
    e2 = _err(ssfm.ssfm_propagate(A, w, L, h=h, **CFG), ref)
    e4 = _err(ssfm.ssfm_scan_o4(A, w, L, h=h, **CFG), ref)
    assert e4 < e2 / 20, (e2, e4)  # ~50x better at equal h in practice


def test_o4_convergence_order(fine_reference):
    A, w, ref = fine_reference
    e_h = _err(ssfm.ssfm_scan_o4(A, w, L, h=L / 8, **CFG), ref)
    e_h2 = _err(ssfm.ssfm_scan_o4(A, w, L, h=L / 16, **CFG), ref)
    # nominal ratio 16; the float32 noise floor (~1.5e-4 relative) flattens
    # the fine solution, so require clearly super-linear convergence plus
    # absolute accuracy below anything the reference step can reach at 2x
    # the step count
    assert e_h / max(e_h2, 1e-7) > 3, (e_h, e_h2)
    assert e_h < 1e-3


def test_reference_step_is_first_order_under_strong_dispersion(fine_reference):
    """The reference freezes the NL operator at step start
    (devices.py:1172-1196), which degrades the symmetric step to ~1st
    order when per-step dispersion is strong — the measured halving ratio
    is ~2, not ~4.  This documents why the o4/local-error schemes use the
    true Strang step."""
    A, w, ref = fine_reference
    e_h = _err(ssfm.ssfm_propagate(A, w, L, h=L / 8, **CFG), ref)
    e_h2 = _err(ssfm.ssfm_propagate(A, w, L, h=L / 16, **CFG), ref)
    assert 1.5 < e_h / max(e_h2, 1e-9) < 3, (e_h, e_h2)


def test_local_error_meets_tolerance(fine_reference):
    A, w, ref = fine_reference
    out, steps = ssfm.ssfm_local_error(A, w, L, tol=1e-6, **CFG)
    assert _err(out, ref) < 5e-4
    assert 0 < steps < 4096  # far fewer attempts than the fine reference

    # looser tolerance -> fewer steps
    _, steps_loose = ssfm.ssfm_local_error(A, w, L, tol=1e-4, **CFG)
    assert steps_loose <= steps


def test_local_error_linear_limit(fine_reference):
    """gamma=0: every scheme must agree with the exact dispersive solution."""
    A, w, _ = fine_reference
    D = ssfm.linear_operator(w, CFG["alpha"], CFG["beta_2"], 0.0)
    exact = np.fft.ifft(np.fft.fft(A) * np.exp(D * L))
    out, _ = ssfm.ssfm_local_error(A, w, L, alpha=CFG["alpha"],
                                   beta_2=CFG["beta_2"], gamma=0.0,
                                   tol=1e-6, h0=L)
    assert _err(out, exact) < 1e-5


def test_o4_auto_meets_tolerance(fine_reference):
    """Self-tuning o4 (round-5): S4 steps under step-doubling local-error
    control — FIBER(method='o4') with no ``h`` and no calibration."""
    A, w, ref = fine_reference
    out = ssfm.ssfm_o4_auto(A, w, L, tol=1e-6, **CFG)
    assert _err(out, ref) < 5e-4

    # looser tolerance -> larger steps -> (weakly) larger error
    out_loose = ssfm.ssfm_o4_auto(A, w, L, tol=1e-3, **CFG)
    assert _err(out_loose, ref) < 5e-2


def test_o4_auto_matches_fixed_step_family(fine_reference):
    """The auto scheme is the same S4 map as ssfm_scan_o4, so at a tight
    tolerance both land within the float32 noise floor of each other."""
    A, w, ref = fine_reference
    auto = ssfm.ssfm_o4_auto(A, w, L, tol=1e-6, **CFG)
    fixed = ssfm.ssfm_scan_o4(A, w, L, h=L / 64, **CFG)
    assert _err(auto, fixed) < 1e-3


def test_fiber_o4_auto_dbp_roundtrip():
    """FIBER(method='o4') -> DBP(method='o4') inverts the span without any
    manual step choice (the round-4 usability gap)."""
    from opticomlib_tpu import gv
    from opticomlib_tpu.devices import DBP, FIBER
    from opticomlib_tpu.signals import OpticalSignal

    gv(sps=16, R=10e9, N=128)
    rs = np.random.RandomState(0)
    x = (0.1 * (rs.randn(gv.N * gv.sps) + 1j * rs.randn(gv.N * gv.sps))
         ).astype(np.complex64)
    op = OpticalSignal(x)
    fwd = FIBER(op, length=40, alpha=0.2, beta_2=-21, gamma=1.3,
                method="o4", tol=1e-5)
    back = DBP(fwd, length=40, alpha=0.2, beta_2=-21, gamma=1.3,
               method="o4", tol=1e-5)
    err = (np.linalg.norm(back.to_numpy() - x) / np.linalg.norm(x))
    assert err < 5e-3, err


def test_adaptive_controllers_survive_saturated_tolerance(fine_reference):
    """A tol below the float32 noise floor of the step-doubling estimate
    must NOT truncate the span (round-5 fix: perpetual rejection used to
    collapse h to h_floor and hit the max_steps backstop mid-span,
    silently returning a partial propagation with ~0.9 relative error).
    The saturation guard restores h and finishes fixed-step: the result
    lands at the float32 accuracy floor."""
    A, w, ref = fine_reference
    out = ssfm.ssfm_o4_auto(A, w, L, tol=1e-8, **CFG)
    assert _err(out, ref) < 5e-2
    out2, steps = ssfm.ssfm_local_error(A, w, L, tol=1e-8, **CFG)
    assert _err(out2, ref) < 5e-2
    assert steps < 400_000
