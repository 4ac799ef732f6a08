"""Exhaustive signal-algebra coverage, mirroring the reference's
typing_test.py (its largest test file): operator identities including
noise propagation, FFT round trips, validation errors, slicing, and the
NumPy interop surface.
"""
import numpy as np
import pytest

from opticomlib_tpu import NULL, gv
from opticomlib_tpu.signals import (
    BinarySequence, ElectricalSignal, OpticalSignal,
)


rng = np.random.default_rng(11)


def _es(n=64, noise=True):
    s = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    if noise:
        no = 0.1 * (rng.normal(size=n) + 1j * rng.normal(size=n)
                    ).astype(np.complex64)
        return ElectricalSignal(s, no)
    return ElectricalSignal(s)


# --------------------------------------------------------------- noise rules
def test_add_propagates_componentwise():
    a, b = _es(), _es()
    c = a + b
    np.testing.assert_allclose(np.asarray(c.signal),
                               np.asarray(a.signal) + np.asarray(b.signal))
    np.testing.assert_allclose(np.asarray(c.noise),
                               np.asarray(a.noise) + np.asarray(b.noise))


def test_sub_and_rsub():
    a = _es()
    s = np.asarray(a.signal)
    d = 2.0 - a
    np.testing.assert_allclose(np.asarray(d.signal), 2.0 - s, rtol=1e-6)
    e = a - 2.0
    np.testing.assert_allclose(np.asarray(e.signal), s - 2.0, rtol=1e-6)


def test_mul_bilinear_identity():
    """(s1+n1)(s2+n2) = s1 s2 + (s1 n2 + n1 s2 + n1 n2): the wrapped
    product's signal+noise must equal the plain complex product
    (reference typing.py:1337-1344)."""
    a, b = _es(), _es()
    c = a * b
    total = (np.asarray(a.signal) + np.asarray(a.noise)) * \
            (np.asarray(b.signal) + np.asarray(b.noise))
    np.testing.assert_allclose(np.asarray(c.signal) + np.asarray(c.noise),
                               total, rtol=1e-5, atol=1e-6)
    # and the signal track is the noise-free product
    np.testing.assert_allclose(np.asarray(c.signal),
                               np.asarray(a.signal) * np.asarray(b.signal),
                               rtol=1e-5, atol=1e-6)


def test_pow2_identity():
    """(s+n)^2 = s^2 + (2 s n + n^2) (reference typing.py:1400-1419)."""
    a = _es()
    c = a ** 2
    s, n = np.asarray(a.signal), np.asarray(a.noise)
    np.testing.assert_allclose(np.asarray(c.signal), s * s, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(c.noise), 2 * s * n + n * n,
                               rtol=1e-4, atol=1e-6)


def test_pow_0_and_1():
    a = _es()
    one = a ** 0
    np.testing.assert_allclose(np.asarray(one.signal),
                               np.ones(a.size), atol=0)
    same = a ** 1
    np.testing.assert_allclose(np.asarray(same.signal),
                               np.asarray(a.signal))


def test_div_scalar_and_errors():
    a = _es()
    c = a / 2.0
    np.testing.assert_allclose(np.asarray(c.signal),
                               np.asarray(a.signal) / 2.0)
    np.testing.assert_allclose(np.asarray(c.noise),
                               np.asarray(a.noise) / 2.0)
    with pytest.raises(ZeroDivisionError):
        a / 0
    with pytest.raises(TypeError):
        a / "x"


def test_neg():
    a = _es()
    c = -a
    np.testing.assert_allclose(np.asarray(c.signal), -np.asarray(a.signal))
    np.testing.assert_allclose(np.asarray(c.noise), -np.asarray(a.noise))


def test_no_noise_stays_null():
    a, b = _es(noise=False), _es(noise=False)
    for out in (a + b, a * b, a ** 2, -a, a / 3.0, a.conj()):
        assert out.noise is NULL


# ------------------------------------------------------------- FFT / domains
def test_call_w_t_roundtrip_with_noise():
    gv(sps=8, R=1e9, N=8)
    a = _es()
    back = a("w")("t")
    np.testing.assert_allclose(np.asarray(back.signal),
                               np.asarray(a.signal), atol=1e-5)
    np.testing.assert_allclose(np.asarray(back.noise),
                               np.asarray(a.noise), atol=1e-5)


def test_call_invalid_domain():
    with pytest.raises(ValueError):
        _es()("q")


# ------------------------------------------------------- reductions / shapes
def test_abs_modes():
    a = _es()
    s, n = np.asarray(a.signal), np.asarray(a.noise)
    np.testing.assert_allclose(np.asarray(a.abs("signal")), np.abs(s),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a.abs("noise")), np.abs(n),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a.abs("all")), np.abs(s + n),
                               rtol=1e-6)


def test_power_w_and_dbm():
    a = _es()
    p_w = a.power("W")
    total = np.asarray(a.signal) + np.asarray(a.noise)
    np.testing.assert_allclose(p_w, np.mean(np.abs(total) ** 2), rtol=1e-5)
    np.testing.assert_allclose(a.power("dBm"),
                               10 * np.log10(p_w * 1e3), rtol=1e-5)


def test_normalize_power_unit():
    a = _es(noise=False)
    np.testing.assert_allclose(a.normalize("power").power("W"), 1.0,
                               rtol=1e-5)


def test_slicing_preserves_noise():
    a = _es(n=32)
    c = a[4:12]
    assert c.size == 8
    np.testing.assert_allclose(np.asarray(c.noise),
                               np.asarray(a.noise)[4:12])


def test_len_and_array_protocol():
    a = _es(n=24)
    assert len(a) == 24
    arr = np.asarray(a)
    np.testing.assert_allclose(
        arr, np.asarray(a.signal) + np.asarray(a.noise))


def test_comparison_yields_binary_sequence():
    x = ElectricalSignal(np.array([0.1, 0.9, 0.4, 0.8]))
    bits = x > 0.5
    assert isinstance(bits, BinarySequence)
    np.testing.assert_array_equal(bits.data, [0, 1, 0, 1])
    bits_lt = x < 0.5
    np.testing.assert_array_equal(bits_lt.data, [1, 0, 1, 0])


def test_mean_std_sum_conj():
    a = _es()
    s = np.asarray(a.signal)
    np.testing.assert_allclose(np.asarray(a.conj().signal), s.conj())
    np.testing.assert_allclose(np.asarray(a.sum().signal), s.sum(),
                               rtol=1e-5)


# ------------------------------------------------------------------- optical
def test_optical_mul_keeps_polarized_shape():
    x = (rng.normal(size=(2, 32)) + 1j * rng.normal(size=(2, 32))
         ).astype(np.complex64)
    op = OpticalSignal(x, n_pol=2)
    h = np.exp(1j * 0.3)
    out = op * h
    assert out.n_pol == 2 and out.shape == (2, 32)
    np.testing.assert_allclose(np.asarray(out.signal), x * h, rtol=1e-6)


def test_optical_1pol_input_shapes():
    op = OpticalSignal(np.ones(16))
    assert op.n_pol == 1
    # a (1, N) input duplicates to 2 pols when n_pol is unspecified
    # (reference typing.py:2176-2182)
    op2 = OpticalSignal(np.ones((1, 16)))
    assert op2.n_pol == 2 and op2.shape == (2, 16)
    # ... and collapses to 1-D when n_pol=1 is explicit
    op3 = OpticalSignal(np.ones((1, 16)), n_pol=1)
    assert op3.n_pol == 1 and op3.shape == (16,)


def test_optical_comparison_disabled():
    op = OpticalSignal(np.ones(8))
    with pytest.raises(TypeError):
        op > 0.5
    with pytest.raises(TypeError):
        op < 0.5


# ---------------------------------------------------------------- validation
def test_binary_sequence_rejects_non_binary():
    with pytest.raises(ValueError):
        BinarySequence([0, 1, 2])


def test_binary_sequence_str_formats():
    np.testing.assert_array_equal(BinarySequence("1,0,1").data, [1, 0, 1])
    np.testing.assert_array_equal(BinarySequence("1 0 1").data, [1, 0, 1])


def test_es_noise_shape_mismatch():
    with pytest.raises(ValueError):
        ElectricalSignal(np.ones(8), np.ones(4))
