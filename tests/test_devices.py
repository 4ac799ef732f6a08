"""Per-device unit tests with physics invariants as oracles
(test strategy modeled on reference tests/devices_test.py)."""
import numpy as np
import pytest

from opticomlib_tpu import (
    BinarySequence, ElectricalSignal, Eye, OpticalSignal, dbm, gv, idbm,
)
from opticomlib_tpu.devices import (
    ADC, BPF, DAC, DBP, DM, EDFA, FIBER, GET_EYE, LASER, LPF, MZM, PD, PM,
    SAMPLER,
)


# -------------------------------------------------------------------- DAC
def test_DAC_validation():
    with pytest.raises(ValueError):
        DAC("010", pulse_shape="triangle")
    with pytest.raises(ValueError):
        DAC("010", Vpp=50)
    with pytest.raises(ValueError):
        DAC("010", offset=50)
    with pytest.raises(ValueError):
        DAC("010", pulse_shape="gaussian", T=0)
    with pytest.raises(ValueError):
        DAC("010", pulse_shape="gaussian", T=3 * gv.sps)
    with pytest.raises(ValueError):
        DAC("010", pulse_shape="gaussian", T=8, m=0)
    with pytest.raises(TypeError):
        DAC("010", Vpp="5")
    with pytest.raises(TypeError):
        DAC("010", pulse_shape="gaussian", T=8.5)


def test_DAC_nrz():
    gv(sps=16, R=1e9)
    dac = DAC("010", pulse_shape="nrz", Vpp=5, offset=0)
    assert isinstance(dac, ElectricalSignal)
    assert dac.size == 3 * gv.sps
    expected = np.concatenate(
        [np.zeros(gv.sps), 5 * np.ones(gv.sps), np.zeros(gv.sps)])
    np.testing.assert_allclose(np.asarray(dac.signal), expected, atol=1e-9)


def test_DAC_gaussian_and_offset():
    gv(sps=16, R=1e9)
    dac = DAC("010", pulse_shape="gaussian", Vpp=5, offset=1, T=8, m=2)
    assert dac.size == 3 * gv.sps
    assert np.max(np.asarray(dac.signal)) <= 6 + 1e-6


def test_DAC_ac_coupling():
    gv(sps=16, R=1e9)
    dac = DAC("0101", pulse_shape="nrz", coupling="AC")
    assert abs(np.mean(np.asarray(dac.signal))) < 1e-9


# ------------------------------------------------------------------ LASER
def test_LASER_cw_power():
    gv(sps=16, R=1e9)
    P_dBm = 10
    laser = LASER(P0=P_dBm, lw=0, rin=None, df=0)
    assert isinstance(laser, OpticalSignal)
    np.testing.assert_allclose(np.abs(laser.signal) ** 2,
                               idbm(P_dBm), rtol=1e-9)


def test_LASER_phase_noise_variance():
    """Wiener phase noise: Var[phi(t)] grows as 2*pi*lw*t."""
    gv(sps=64, R=1e9, N=1024)
    np.random.seed(7)
    lw = 1e6
    laser = LASER(P0=0, lw=lw)
    ph = np.unwrap(np.angle(np.asarray(laser.signal)))
    increments = np.diff(ph)
    np.testing.assert_allclose(np.var(increments), 2 * np.pi * lw * gv.dt,
                               rtol=0.1)


def test_LASER_frequency_offset():
    gv(sps=64, R=1e9, N=32)
    df = 2e9
    laser = LASER(P0=0, df=df)
    ph = np.unwrap(np.angle(np.asarray(laser.signal)))
    # gv.t uses endpoint=True (reference typing.py:356) so its step is
    # n/fs/(n-1), not exactly dt — use the actual axis step
    freq = np.diff(ph) / (2 * np.pi * np.diff(gv.t))
    np.testing.assert_allclose(freq, df, rtol=1e-6)
    with pytest.raises(ValueError):
        LASER(P0=0, df=gv.fs)  # beyond Nyquist


# --------------------------------------------------------------------- PM
def test_PM_phase_shift():
    gv(sps=16, R=1e9)
    op = LASER(P0=10)
    out = PM(op, el_input=0, Vpi=5)
    np.testing.assert_allclose(out.signal, op.signal)
    out = PM(op, el_input=5, Vpi=5)
    np.testing.assert_allclose(out.signal, op.signal * np.exp(1j * np.pi))
    with pytest.raises(TypeError):
        PM(ElectricalSignal(np.ones(5)), el_input=1)


# -------------------------------------------------------------------- MZM
def test_MZM_extinction_and_loss():
    """min power = P0 - ER - loss;  max power = P0 - loss
    (oracle: reference tests/devices_test.py:126-128)."""
    gv(R=1e9, N=20, sps=512)
    Vpi = 5.0
    op = OpticalSignal(np.ones(gv.N * gv.sps)) * idbm(0) ** 0.5
    el = np.sin(2 * np.pi * gv.R * gv.t) * Vpi / 2

    mzm = MZM(op, el, bias=Vpi / 2, Vpi=Vpi, loss_dB=2, ER_dB=30, pol="x")
    assert isinstance(mzm, OpticalSignal)
    assert mzm.n_pol == 1
    assert mzm.size == op.size
    p_in = dbm(float(op.power()))
    np.testing.assert_allclose(dbm(np.abs(mzm.signal).min() ** 2),
                               p_in - 32, atol=1e-6)
    np.testing.assert_allclose(dbm(np.abs(mzm.signal).max() ** 2),
                               p_in - 2, atol=1e-6)


def test_MZM_pol_kill_2pol():
    gv(R=1e9, N=20, sps=64)
    op = OpticalSignal(np.ones(gv.N * gv.sps), n_pol=2) * idbm(0) ** 0.5
    mzm = MZM(op, 2.5, bias=2.5, Vpi=5, loss_dB=2, ER_dB=30, pol="x")
    assert mzm.n_pol == 2
    np.testing.assert_array_equal(np.asarray(mzm.signal[1]), 0)
    mzm = MZM(op, 2.5, bias=2.5, Vpi=5, loss_dB=2, ER_dB=30, pol="y")
    np.testing.assert_array_equal(np.asarray(mzm.signal[0]), 0)


def test_MZM_validation():
    with pytest.raises(TypeError):
        MZM(ElectricalSignal(np.ones(5)), 3)
    with pytest.raises(ValueError):
        MZM(OpticalSignal(np.ones(5)), [1, 2, 3])
    with pytest.raises(ValueError):
        MZM(OpticalSignal(np.ones(5)), 3, pol="z")


# -------------------------------------------------------------------- BPF
def test_BPF_passes_dc():
    gv(sps=16, R=1e9)
    op = LASER(P0=10)
    out = BPF(op, BW=10e9)
    assert isinstance(out, OpticalSignal)
    assert out.size == op.size
    np.testing.assert_allclose(np.abs(out.signal) ** 2,
                               np.abs(op.signal) ** 2, rtol=1e-6)


# ------------------------------------------------------------------- EDFA
def test_EDFA_gain_and_ase():
    gv(sps=16, R=1e9, N=4096)
    np.random.seed(1)
    op = LASER(P0=10)
    G, NF = 20.0, 5.0
    out = EDFA(op, G=G, NF=NF)
    assert out.n_pol == 2
    np.testing.assert_allclose(np.abs(out.signal[0]),
                               np.abs(op.signal) * 10 ** (G / 20), rtol=1e-9)
    np.testing.assert_array_equal(np.asarray(out.signal[1]), 0)
    # ASE power ~ NF*h*f0*(G-1)*fs over both pols
    from scipy.constants import h as hpl
    P_ase = 10 ** (NF / 10) * hpl * gv.f0 * (10 ** (G / 10) - 1) * gv.fs
    measured = float(np.sum(np.mean(np.abs(out.noise) ** 2, axis=-1)))
    np.testing.assert_allclose(measured, P_ase, rtol=0.1)


# --------------------------------------------------------------------- DM
def test_DM_allpass_and_identity():
    gv(sps=32, R=10e9, N=64)
    x = DAC("0001000", pulse_shape="gaussian")
    op = OpticalSignal(np.asarray(x.signal).astype(complex))
    out, H = DM(op, D=4000, retH=True)
    # all-pass: energy conserved
    np.testing.assert_allclose(np.sum(np.abs(out.signal) ** 2),
                               np.sum(np.abs(op.signal) ** 2), rtol=1e-9)
    # inverse D cancels
    back = DM(out, D=-4000)
    np.testing.assert_allclose(back.signal, op.signal, atol=1e-9)
    with pytest.raises(TypeError):
        DM(x, D=100)


# ------------------------------------------------------------------ FIBER
def test_FIBER_attenuation():
    gv(sps=16, R=1e9)
    op = LASER(P0=10)
    out = FIBER(op, length=10, alpha=0.2)
    assert isinstance(out, OpticalSignal)
    alpha_lin = 0.2 / 4.343
    expected = np.mean(np.abs(op.signal) ** 2) * np.exp(-alpha_lin * 10)
    np.testing.assert_allclose(np.mean(np.abs(out.signal) ** 2), expected,
                               rtol=1e-3)


def test_FIBER_DBP_roundtrip():
    gv(sps=32, R=10e9, N=128)
    # pattern starts and ends with 0 so the circular-FFT wrap boundary is
    # smooth — a step discontinuity there concentrates splitting error
    x = DAC(BinarySequence("0101100110").data.tolist() * 2,
            pulse_shape="gaussian")
    op = OpticalSignal(np.asarray(x.signal).astype(complex) * 0.1)
    # phi_max small enough that the adaptive fwd/back step asymmetry stays
    # below the tolerance (first-order splitting error ~ phi_max per step)
    fwd = FIBER(op, length=30, alpha=0.2, beta_2=-20, gamma=1.3,
                phi_max=0.003)
    back = DBP(fwd, length=30, alpha=0.2, beta_2=-20, gamma=1.3,
               phi_max=0.003)
    np.testing.assert_allclose(np.asarray(back.signal),
                               np.asarray(op.signal), atol=1e-3)


def test_FIBER_methods_agree():
    """o4 / local_error methods converge to the same field as a fine
    reference-scheme propagation."""
    gv(sps=32, R=10e9, N=64)
    x = DAC(BinarySequence("0110100110").data.tolist() * 2,
            pulse_shape="gaussian")
    op = OpticalSignal(np.asarray(x.signal).astype(complex) * 0.1)
    cfg = dict(length=20, alpha=0.2, beta_2=-20, gamma=1.3)
    ref = FIBER(op, h=0.02, **cfg)                     # fine fixed-step
    o4 = FIBER(op, method="o4", h=1.0, **cfg)          # 50x coarser step
    le = FIBER(op, method="local_error", tol=1e-6, **cfg)
    scale = float(np.max(np.abs(np.asarray(ref.signal))))
    np.testing.assert_allclose(np.asarray(o4.signal),
                               np.asarray(ref.signal), atol=2e-3 * scale)
    np.testing.assert_allclose(np.asarray(le.signal),
                               np.asarray(ref.signal), atol=2e-3 * scale)


def test_FIBER_method_validation():
    gv(sps=16, R=1e9, N=16)
    op = LASER(P0=1)
    with np.testing.assert_raises(ValueError):
        FIBER(op, length=1, method="bogus")
    # o4 without h self-tunes (round-5 change: step-doubling local-error
    # control; previously raised ValueError)
    out = FIBER(op, length=1, beta_2=-20, gamma=1.0, method="o4")
    assert out.shape == op.shape


def test_FIBER_2pol():
    gv(sps=16, R=1e9, N=64)
    op = OpticalSignal(np.ones(gv.N * gv.sps), n_pol=2) * 0.1
    out = FIBER(op, length=5, alpha=0.2, beta_2=-20, gamma=1.0)
    assert out.n_pol == 2
    assert out.shape == (2, gv.N * gv.sps)


# -------------------------------------------------------------------- LPF
def test_LPF_dc_and_shape():
    gv(sps=16, R=1e9)
    el = ElectricalSignal(np.ones(100))
    out = LPF(el, BW=1e9)
    assert isinstance(out, ElectricalSignal)
    assert out.size == el.size
    np.testing.assert_allclose(np.asarray(out.signal), 1.0, atol=1e-6)
    out2, H = LPF(el, BW=1e9, retH=True)
    assert H.shape == (100,)


# --------------------------------------------------------------------- PD
def test_PD_mean_and_noise_modes():
    gv(sps=16, R=1e9)
    np.random.seed(2)
    inp = OpticalSignal(np.ones(100), np.random.normal(0, 0.1, 100), n_pol=2)

    with pytest.raises(TypeError):
        PD(ElectricalSignal([1, 2, 3]), BW=5e9)
    with pytest.raises(ValueError):
        PD(inp, BW=5e9, r=0)
    with pytest.raises(ValueError):
        PD(inp, BW=5e9, T=-10)
    with pytest.raises(ValueError):
        PD(inp, BW=5e9, R_load=-50)
    with pytest.raises(TypeError):
        PD(inp, BW=5e9, include_noise=True)

    for mode in ["all", "ase-only", "thermal-only", "shot-only",
                 "ase-thermal", "ase-shot", "thermal-shot", "none"]:
        out = PD(inp, BW=5e9, r=1, T=200, R_load=50, include_noise=mode)
        assert isinstance(out, ElectricalSignal)
        assert out.size == inp.size
    # mean photodetected voltage = r * P_total * R_load
    out = PD(inp, BW=5e9, r=1, T=200, R_load=50, include_noise="all")
    np.testing.assert_allclose(float(np.mean(out.to_numpy().real)),
                               float(np.sum(inp.power())) * 50, rtol=1e-1)


def test_PD_separates_beat_noise():
    """With pure ASE input noise and include_noise='ase-only', the output
    noise track must carry the sig-ASE + ASE-ASE beats."""
    gv(sps=16, R=1e9)
    np.random.seed(3)
    E = np.ones(20000, dtype=complex)
    n = (np.random.normal(0, 0.05, 20000)
         + 1j * np.random.normal(0, 0.05, 20000))
    inp = OpticalSignal(E, n, n_pol=1)
    out = PD(inp, BW=gv.fs / 2, r=1, R_load=1, include_noise="ase-only",
             i_dark=0)
    # beat noise = 2*Re(E n*) + |n|^2; DC (the mean) passes the LPF
    # unattenuated, so compare against the realized draw exactly
    expected = float(np.mean(2 * np.real(E * np.conj(n)) + np.abs(n) ** 2))
    noise_mean = float(np.mean(np.asarray(out.noise)))
    np.testing.assert_allclose(noise_mean, expected, rtol=1e-6)
    # and the realized mean is near the ensemble value 2*sigma^2
    np.testing.assert_allclose(noise_mean, 2 * 0.05**2, atol=2e-3)


# -------------------------------------------------------------------- ADC
def test_ADC_quantization():
    gv(sps=16, R=1e9)
    t = np.linspace(0, 1, 100)
    el = ElectricalSignal(np.sin(2 * np.pi * t))
    adc = ADC(el, n=2, otype="n")
    vals = np.unique(np.asarray(adc.signal))
    assert vals.size <= 4
    assert vals.min() >= 0 and vals.max() <= 3
    adc_v = ADC(el, n=8, otype="v")
    np.testing.assert_allclose(np.asarray(adc_v.signal),
                               np.sin(2 * np.pi * t), atol=0.02)
    with pytest.raises(ValueError):
        ADC(el, otype="q")


# ---------------------------------------------------------------- GET_EYE
def test_GET_EYE_basic():
    gv(sps=16, R=1e9)
    dac = DAC("010101", pulse_shape="nrz", Vpp=1)
    eye_obj = GET_EYE(dac, nslots=10)
    assert isinstance(eye_obj, Eye)
    assert eye_obj.sps == gv.sps


def test_GET_EYE_statistics():
    """On a noisy NRZ pattern the estimated levels must match the true
    means/sigmas."""
    gv(sps=32, R=1e9)
    np.random.seed(4)
    bits = np.random.randint(0, 2, 512)
    x = DAC(bits.tolist(), pulse_shape="nrz", Vpp=1)
    x = ElectricalSignal(np.asarray(x.signal)
                         + np.random.normal(0, 0.03, x.size))
    eye_obj = GET_EYE(x, nslots=512)
    assert np.isclose(eye_obj.mu1, 1.0, atol=0.05)
    assert np.isclose(eye_obj.mu0, 0.0, atol=0.05)
    assert np.isclose(eye_obj.s0, 0.03, atol=0.02)
    assert np.isclose(eye_obj.s1, 0.03, atol=0.02)
    assert 0.2 < eye_obj.threshold < 0.8
    assert eye_obj.eye_h == pytest.approx(
        eye_obj.mu1 - 3 * eye_obj.s1 - eye_obj.mu0 - 3 * eye_obj.s0)


# ---------------------------------------------------------------- SAMPLER
def test_SAMPLER_index_math():
    gv(sps=4, R=1e9)
    dac = DAC("010", pulse_shape="nrz", Vpp=1)
    sampled = SAMPLER(dac, instant=0)
    np.testing.assert_allclose(np.asarray(sampled.signal), [0, 1, 0],
                               atol=1e-9)
    sampled = SAMPLER(dac, instant=2)
    np.testing.assert_allclose(np.asarray(sampled.signal), [0, 1, 0],
                               atol=1e-9)


def test_ssfm_dark_input_adaptive_no_crash():
    """Round-3 review fix: an all-zero (dark) input through the adaptive
    solver propagates zeros instead of dividing by zero (the reference
    reaches the same one-step result via NumPy inf semantics)."""
    from opticomlib_tpu.ops import ssfm

    n = 256
    w = 2 * np.pi * np.fft.fftfreq(n) * 160e9
    out = ssfm.ssfm_propagate(np.zeros(n, np.complex64), w, 10.0,
                              alpha=0.2, beta_2=-21.0, gamma=1.3)
    assert np.all(out == 0)
    assert ssfm.adaptive_h0(0.05, 1.3, 0.0, 10.0) == 10.0
    assert ssfm.adaptive_h0(0.05, 1.3, 1.0, 10.0) < 10.0


def test_eye_metrics_odd_nslots_and_sps():
    """Round-3 review fix: odd user nslots is floored to even (traces fold
    two slots), and odd sps gives identical centering on host and device."""
    from opticomlib_tpu.ops.eyeana import eye_metrics, eye_metrics_jax

    rng = np.random.default_rng(3)
    sps = 15
    bits = rng.integers(0, 2, 300)
    y = np.repeat(bits, sps) + 0.02 * rng.standard_normal(300 * sps)

    host = eye_metrics(y, sps=sps, nslots=151)   # odd nslots: no crash
    assert host["y"].size % (2 * sps) == 0
    dev = {k: np.asarray(v) for k, v in
           eye_metrics_jax(y.astype(np.float32), sps=sps,
                           nslots=151).items()}
    # identical centering -> identical trace fold and sampling instant
    np.testing.assert_allclose(dev["y"][: host["y"].size], host["y"],
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(float(dev["t_opt"]), host["t_opt"],
                               atol=2.0 / sps)
