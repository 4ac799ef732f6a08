"""OOK stack tests: threshold estimation, end-to-end DSP loopback, BER
estimator vs analytic (modeled on reference tests/ook_test.py)."""
import numpy as np
import pytest

from opticomlib_tpu import ElectricalSignal, Eye, Q, gv
from opticomlib_tpu.devices import DAC, PRBS
import opticomlib_tpu.ook as ook


def _mock_eye(mu0=0.0, mu1=1.0, s0=0.1, s1=0.1):
    return Eye({"mu0": mu0, "mu1": mu1, "s0": s0, "s1": s1})


def test_threshold_symmetric():
    rth = ook.THRESHOLD_EST(_mock_eye())
    assert np.isclose(rth, 0.5, atol=0.01)


def test_threshold_asymmetric_shifts_toward_low_sigma():
    rth = ook.THRESHOLD_EST(_mock_eye(s0=0.05, s1=0.2))
    assert rth < 0.5


def test_end_to_end_dsp_low_noise():
    """PRBS -> DAC -> AWGN -> DSP: at ~17 dB SNR expect <10 bit errors and a
    threshold ~0.5 (oracle: reference tests/ook_test.py:36-68)."""
    gv(sps=32, R=1e9)
    np.random.seed(42)
    tx = PRBS(order=9, len=512)
    x = DAC(tx, pulse_shape="gaussian", Vpp=1)
    x = ElectricalSignal(np.asarray(x.signal),
                         np.random.normal(0, 0.15, x.size))
    rx, eye_obj, rth = ook.DSP(x)
    assert rx.size == tx.size
    n_err = int(np.sum(rx.data != tx.data))
    assert n_err < 10
    assert 0.35 < rth < 0.65


def test_ber_counter():
    tx = [1, 0, 1, 1, 0, 0, 1, 0]
    rx = [1, 0, 0, 1, 0, 0, 1, 1]
    assert ook.BER_analizer("counter", Tx=tx, Rx=rx) == 2 / 8
    with pytest.raises(TypeError):
        ook.BER_analizer("bogus")


def test_ber_estimator_matches_Q():
    """Symmetric eye: estimator == Q(d/2sigma)
    (oracle: reference tests/ook_test.py:94-96)."""
    ber = ook.BER_analizer("estimator", eye_obj=_mock_eye())
    assert np.isclose(ber, Q(5), rtol=0.01)


def test_theory_BER_vectorized():
    out = ook.theory_BER(mu1=1, s0=0.1, s1=0.1)
    assert np.isclose(float(out), 2.8674468224390994e-07, rtol=1e-3)
    arr = ook.theory_BER(mu1=np.array([1.0, 1.0]), s0=0.1, s1=0.1)
    assert arr.shape == (2,)
