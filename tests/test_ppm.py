"""PPM stack tests: golden encode/decode vectors, HDD invariants,
end-to-end noisy loopback (modeled on reference tests/ppm_test.py)."""
import numpy as np
import pytest

from opticomlib_tpu import ElectricalSignal, Eye, gv
from opticomlib_tpu.devices import DAC, PRBS
import opticomlib_tpu.ppm as ppm


def test_encoder_golden():
    """'01111000' in 4-PPM -> known one-hot pattern
    (oracle: reference ppm.py:52-55 doctest)."""
    out = ppm.PPM_ENCODER("01111000", 4)
    np.testing.assert_array_equal(
        out.data, [0, 1, 0, 0, 0, 0, 0, 1, 0, 0, 1, 0, 1, 0, 0, 0])


def test_decoder_golden():
    out = ppm.PPM_DECODER("0100000100101000", 4)
    np.testing.assert_array_equal(out.data, [0, 1, 1, 1, 1, 0, 0, 0])


@pytest.mark.parametrize("M", [4, 8, 16, 32, 64, 128, 256])
def test_encode_decode_roundtrip(M):
    np.random.seed(M)
    k = int(np.log2(M))
    bits = np.random.randint(0, 2, 20 * k)
    enc = ppm.PPM_ENCODER(bits.tolist(), M)
    assert enc.size == 20 * M
    # exactly one ON slot per symbol
    assert np.all(enc.data.reshape(-1, M).sum(axis=1) == 1)
    dec = ppm.PPM_DECODER(enc, M)
    np.testing.assert_array_equal(dec.data, bits)


def test_hdd_repair_invariant():
    """After HDD every symbol has exactly one ON slot
    (oracle: reference tests/ppm_test.py:76-78)."""
    np.random.seed(5)
    out = ppm.HDD("0100 0111 0000", 4)
    s = out.data.reshape(-1, 4).sum(axis=1)
    np.testing.assert_array_equal(s, 1)
    # valid symbols pass through untouched
    np.testing.assert_array_equal(out.data[:4], [0, 1, 0, 0])

    with pytest.raises(ValueError):
        ppm.HDD("0100", 3)
    with pytest.raises(ValueError):
        ppm.HDD("01000", 4)


def test_sdd_golden():
    gv(sps=16, R=1e9)
    x = np.kron([0.1, 1.2, 0.1, 0.2, 0.1, 0.9, 1.0, 1.1, 0.1, 0.1, 0.1, 0.2],
                np.ones(gv.sps))
    out = ppm.SDD(ElectricalSignal(x), M=4)
    np.testing.assert_array_equal(
        out.data, [0, 1, 0, 0, 0, 0, 0, 1, 0, 0, 0, 1])


def test_threshold_est():
    eye_obj = Eye({"mu0": 0.1, "mu1": 1.1, "s0": 0.1, "s1": 0.1})
    th4 = ppm.THRESHOLD_EST(eye_obj, M=4)
    th64 = ppm.THRESHOLD_EST(eye_obj, M=64)
    assert 0.1 < th4 < 1.1
    # more slots -> more OFF-slot false alarms -> higher threshold
    assert th64 > th4
    with pytest.raises(ValueError):
        ppm.THRESHOLD_EST(eye_obj, M=3)
    with pytest.raises(TypeError):
        ppm.THRESHOLD_EST("not an eye", M=4)


@pytest.mark.parametrize("decision", ["hard", "soft"])
def test_end_to_end_noisy_loopback(decision):
    """PRBS -> ENCODER -> DAC -> AWGN -> DSP -> exact bit equality
    (oracle: reference tests/ppm_test.py:132-161)."""
    gv(sps=32, R=1e9)
    np.random.seed(10)
    M = 8
    k = int(np.log2(M))
    tx = PRBS(order=7, len=64 * k)
    enc = ppm.PPM_ENCODER(tx, M)
    x = DAC(enc, pulse_shape="gaussian", Vpp=1)
    x = ElectricalSignal(np.asarray(x.signal),
                         np.random.normal(0, 0.05, x.size))
    rx = ppm.DSP(x, M, decision=decision)
    np.testing.assert_array_equal(rx.data, tx.data[:rx.size])


def test_ber_analizer_counter_and_estimator():
    assert ppm.BER_analizer("counter", Tx=[1, 0, 1, 0], Rx=[1, 0, 0, 0]) == 0.25
    eye_obj = Eye({"mu0": 0.0, "mu1": 1.0, "s0": 0.1, "s1": 0.1})
    b_hard = ppm.BER_analizer("estimator", eye_obj=eye_obj, M=8,
                              decision="hard")
    b_soft = ppm.BER_analizer("estimator", eye_obj=eye_obj, M=8,
                              decision="soft")
    assert b_soft < b_hard < 1e-3


def test_theory_BER_golden():
    """Golden values from the reference doctests (ppm.py:559-563)."""
    bh = ppm.theory_BER(mu1=1, s0=0.1, s1=0.1, M=8, decision="hard")
    bs = ppm.theory_BER(mu1=1, s0=0.1, s1=0.1, M=8, decision="soft")
    assert np.isclose(float(bh), 8.515885763544466e-07, rtol=1e-6)
    assert np.isclose(float(bs), 3.074810247686141e-12, rtol=1e-4)
