"""Signal container algebra tests — including the noise-propagation
identities that the photodetector model depends on
(behavior spec: reference opticomlib/typing.py:1306-1470)."""
import jax
import numpy as np
import pytest

from opticomlib_tpu import (
    NULL, BinarySequence, ElectricalSignal, OpticalSignal,
    binary_sequence, electrical_signal, optical_signal,
)


# ---------------------------------------------------------------- NULL
def test_null_absorbing():
    x = np.arange(3.0)
    assert (x + NULL is x) or np.all((x + NULL) == x)
    assert NULL + 5 == 5
    assert NULL * x is NULL
    assert -NULL is NULL
    assert NULL.conj() is NULL
    assert not NULL


# ---------------------------------------------------------- binary_sequence
def test_binary_sequence_parse():
    for src in ["1 0 1", "101", "1,0,1", [1, 0, 1], (1, 0, 1),
                np.array([1, 0, 1])]:
        b = BinarySequence(src)
        np.testing.assert_array_equal(b.data, [1, 0, 1])
        assert b.dtype == np.uint8

    with pytest.raises(ValueError):
        BinarySequence([0, 2, 1])


def test_binary_sequence_ops():
    a = BinarySequence("1100")
    b = BinarySequence("1010")
    np.testing.assert_array_equal((~a).data, [0, 0, 1, 1])
    np.testing.assert_array_equal((a & b).data, [1, 0, 0, 0])
    np.testing.assert_array_equal((a | b).data, [1, 1, 1, 0])
    np.testing.assert_array_equal((a ^ b).data, [0, 1, 1, 0])
    # + concatenates, * repeats (reference semantics)
    np.testing.assert_array_equal((a + b).data, [1, 1, 0, 0, 1, 0, 1, 0])
    np.testing.assert_array_equal((a * 2).data, [1, 1, 0, 0, 1, 1, 0, 0])
    assert a.hamming_distance(b) == 2
    assert a[1] == 1
    np.testing.assert_array_equal(a[1:3].data, [1, 0])


# -------------------------------------------------------- electrical_signal
def test_es_init_and_props():
    x = ElectricalSignal([1.0, 2.0, 3.0])
    assert x.size == 3 and x.ndim == 1
    assert x.noise is NULL
    y = ElectricalSignal([1, 2, 3], [0.1, 0.1, 0.1])
    assert y.noise is not NULL
    np.testing.assert_allclose(y.to_numpy(), [1.1, 2.1, 3.1])


def test_es_add_sub():
    a = ElectricalSignal([1.0, 2.0], [0.1, 0.2])
    b = ElectricalSignal([3.0, 4.0], [0.3, 0.4])
    c = a + b
    np.testing.assert_allclose(c.signal, [4, 6])
    np.testing.assert_allclose(c.noise, [0.4, 0.6])
    d = a - b
    np.testing.assert_allclose(d.signal, [-2, -2])
    np.testing.assert_allclose(d.noise, [-0.2, -0.2])
    # scalar
    e = a + 1
    np.testing.assert_allclose(e.signal, [2, 3])
    # NULL noise stays NULL through addition of noiseless signals
    f = ElectricalSignal([1.0]) + ElectricalSignal([2.0])
    assert f.noise is NULL


def test_es_mul_noise_bilinear():
    """(s1,n1)*(s2,n2) -> noise = s1*n2 + n1*s2 + n1*n2
    (reference typing.py:1337-1344)."""
    s1, n1 = np.array([2.0, 3.0]), np.array([0.1, 0.2])
    s2, n2 = np.array([5.0, 7.0]), np.array([0.3, 0.4])
    c = ElectricalSignal(s1, n1) * ElectricalSignal(s2, n2)
    np.testing.assert_allclose(c.signal, s1 * s2)
    np.testing.assert_allclose(c.noise, s1 * n2 + n1 * s2 + n1 * n2)
    # total must equal (s1+n1)*(s2+n2)
    np.testing.assert_allclose(c.to_numpy(), (s1 + n1) * (s2 + n2))


def test_es_pow2_identity():
    """(s,n)**2 -> noise = 2*s*n + n**2 (reference typing.py:1400-1419)."""
    s, n = np.array([2.0, -3.0]), np.array([0.5, 0.25])
    c = ElectricalSignal(s, n) ** 2
    np.testing.assert_allclose(c.signal, s**2)
    np.testing.assert_allclose(c.noise, 2 * s * n + n**2)
    np.testing.assert_allclose(c.to_numpy(), (s + n) ** 2)

    c0 = ElectricalSignal(s, n) ** 0
    np.testing.assert_allclose(c0.signal, 1.0)
    assert c0.noise is NULL


def test_es_div():
    a = ElectricalSignal([2.0, 4.0], [0.2, 0.4])
    b = a / 2
    np.testing.assert_allclose(b.signal, [1, 2])
    np.testing.assert_allclose(b.noise, [0.1, 0.2])
    with pytest.raises(ZeroDivisionError):
        a / 0
    with pytest.raises(TypeError):
        a / "x"


def test_es_comparison_gives_bits():
    x = ElectricalSignal([0.1, 0.9, 0.4], [0.0, 0.0, 0.2])
    bits = x > 0.5
    assert isinstance(bits, BinarySequence)
    np.testing.assert_array_equal(bits.data, [0, 1, 1])


def test_es_fft_roundtrip():
    rng = np.random.default_rng(1)
    x = ElectricalSignal(rng.normal(size=64) + 1j * rng.normal(size=64))
    np.testing.assert_allclose(x("w")("t").signal, x.signal, atol=1e-12)
    # Parseval
    X = x("w")
    np.testing.assert_allclose(np.sum(np.abs(X.signal) ** 2) / 64,
                               np.sum(np.abs(x.signal) ** 2), rtol=1e-10)


def test_es_power_abs_phase():
    x = ElectricalSignal(np.array([3.0 + 4j, 3.0 + 4j]))
    np.testing.assert_allclose(x.abs("signal"), [5, 5])
    np.testing.assert_allclose(x.power("W"), 25.0)
    np.testing.assert_allclose(x.power("dBm"), 10 * np.log10(25e3))
    y = ElectricalSignal(np.exp(1j * np.linspace(0, 6 * np.pi, 100)))
    ph = y.phase()
    assert np.all(np.diff(ph) > 0)  # unwrapped


def test_es_real_imag_wrapped():
    x = ElectricalSignal(np.array([1 + 2j]), np.array([0.5 - 1j]))
    r = x.real
    assert isinstance(r, ElectricalSignal)
    np.testing.assert_allclose(r.signal, [1.0])
    np.testing.assert_allclose(r.noise, [0.5])


def test_es_filter_fir():
    import scipy.signal as sg
    rng = np.random.default_rng(2)
    x = rng.normal(size=256)
    h = rng.normal(size=31)
    got = ElectricalSignal(x).filter(h).signal
    ref = sg.fftconvolve(x, h, mode="same")
    np.testing.assert_allclose(got, ref, atol=1e-9)


# ---------------------------------------------------------- optical_signal
def test_os_pol_normalization():
    x1 = OpticalSignal(np.ones(8))
    assert x1.n_pol == 1 and x1.shape == (8,)

    x2 = OpticalSignal(np.ones(8), n_pol=2)
    assert x2.n_pol == 2 and x2.shape == (2, 8)
    np.testing.assert_allclose(x2.signal[1], x2.signal[0])  # duplicated

    x3 = OpticalSignal(np.ones((2, 8)))
    assert x3.n_pol == 2

    with pytest.raises(ValueError):
        OpticalSignal(np.ones((3, 8)))


def test_os_power_per_pol():
    x = OpticalSignal(np.stack([2 * np.ones(4), np.zeros(4)]))
    p = x.power("W")
    np.testing.assert_allclose(p, [4.0, 0.0])


def test_os_comparison_disabled():
    x = OpticalSignal(np.ones(4))
    with pytest.raises(TypeError):
        x > 0.5
    with pytest.raises(TypeError):
        x < 0.5


# ------------------------------------------------------------------ pytree
def test_signals_are_pytrees():
    x = ElectricalSignal(np.ones(4), 0.1 * np.ones(4))
    leaves = jax.tree_util.tree_leaves(x)
    assert len(leaves) == 2

    def f(sig):
        return sig * sig  # bilinear product inside jit

    y = jax.jit(f)(x)
    assert isinstance(y, ElectricalSignal)
    np.testing.assert_allclose(np.asarray(y.signal), 1.0)
    np.testing.assert_allclose(np.asarray(y.noise), 2 * 0.1 + 0.01,
                               rtol=1e-6)

    o = OpticalSignal(np.ones((2, 4)), n_pol=2)
    o2 = jax.jit(lambda s: s + s)(o)
    assert isinstance(o2, OpticalSignal) and o2.n_pol == 2


# ------------------------------------------------- small parity methods
def test_binary_sequence_ones_zeros_flip():
    # reference typing.py:797-808 (ones/zeros properties), 938-948 (flip)
    s = BinarySequence("1 0 1 1 0")
    assert s.ones == 3
    assert s.zeros == 2
    f = s.flip()
    np.testing.assert_array_equal(f.data, [0, 1, 0, 0, 1])
    np.testing.assert_array_equal((~s).data, f.data)


def test_electrical_signal_index_property():
    # reference typing.py:1466-1468
    x = ElectricalSignal(np.arange(5.0))
    np.testing.assert_array_equal(x.index, np.arange(5))
    o = OpticalSignal(np.ones((2, 8)), n_pol=2)
    assert o.index.shape == (o.size,)
