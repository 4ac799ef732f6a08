"""NumPy protocol integration on the signal classes (round 2, VERDICT
item 6): __array_ufunc__ / __array_function__ / ndarray attribute
delegation re-wrapping results — reference typing.py:518-692 (binary)
and 1224-1306 (electrical/optical)."""
import numpy as np
import pytest

from opticomlib_tpu.signals import (
    NULL, BinarySequence, ElectricalSignal, OpticalSignal,
)


class TestElectricalUfuncs:
    def test_np_abs_rewraps(self):
        sig = ElectricalSignal([3.0, -4.0, 5.0])
        out = np.abs(sig)
        assert isinstance(out, ElectricalSignal)
        np.testing.assert_array_equal(out.signal, [3.0, 4.0, 5.0])

    def test_np_exp_rewraps(self):
        sig = ElectricalSignal([0.0, 1.0])
        out = np.exp(sig)
        assert isinstance(out, ElectricalSignal)
        np.testing.assert_allclose(out.signal, np.exp([0.0, 1.0]))

    def test_ufunc_acts_on_signal_plus_noise(self):
        sig = ElectricalSignal([1.0, 2.0], noise=[0.5, 0.5])
        out = np.abs(sig)
        np.testing.assert_allclose(np.asarray(out), [1.5, 2.5])

    def test_np_add_preserves_noise_algebra(self):
        """ndarray + signal routes through the bilinear __add__ (noise
        track kept separate), not plain elementwise add."""
        sig = ElectricalSignal([1.0, 2.0], noise=[0.1, 0.2])
        out = np.add(np.array([10.0, 20.0]), sig)
        assert isinstance(out, ElectricalSignal)
        np.testing.assert_allclose(out.signal, [11.0, 22.0])
        np.testing.assert_allclose(out.noise, [0.1, 0.2])

    def test_np_multiply_bilinear(self):
        sig = ElectricalSignal([1.0, 2.0], noise=[0.1, 0.2])
        out = np.multiply(np.array([2.0, 3.0]), sig)
        assert isinstance(out, ElectricalSignal)
        np.testing.assert_allclose(out.signal, [2.0, 6.0])
        # noise = s1*n2 + n1*s2 + n1*n2 with n1=NULL: 2*0.1, 3*0.2
        np.testing.assert_allclose(out.noise, [0.2, 0.6])

    def test_np_subtract_reflected(self):
        sig = ElectricalSignal([1.0, 2.0])
        out = np.subtract(np.array([10.0, 10.0]), sig)
        assert isinstance(out, ElectricalSignal)
        np.testing.assert_allclose(np.asarray(out), [9.0, 8.0])

    def test_scalar_results_pass_through(self):
        sig = ElectricalSignal([1.0, 2.0, 3.0])
        assert float(np.mean(sig)) == pytest.approx(2.0)


class TestElectricalArrayFunctions:
    def test_concatenate_rewraps(self):
        a = ElectricalSignal([1.0, 2.0])
        b = ElectricalSignal([3.0, 4.0])
        out = np.concatenate([a, b])
        assert isinstance(out, ElectricalSignal)
        np.testing.assert_array_equal(np.asarray(out), [1, 2, 3, 4])

    def test_roll_rewraps(self):
        a = ElectricalSignal([1.0, 2.0, 3.0])
        out = np.roll(a, 1)
        assert isinstance(out, ElectricalSignal)
        np.testing.assert_array_equal(np.asarray(out), [3, 1, 2])

    def test_fft_rewraps(self):
        a = ElectricalSignal(np.ones(8))
        out = np.fft.fft(a)
        assert isinstance(out, ElectricalSignal)
        assert np.asarray(out)[0] == pytest.approx(8.0)


class TestAttributeDelegation:
    def test_var_max_cumsum(self):
        sig = ElectricalSignal([1.0, 2.0, 3.0], noise=[0.0, 0.0, 0.0])
        assert sig.var() == pytest.approx(np.var([1, 2, 3]))
        assert sig.max() == 3.0
        np.testing.assert_array_equal(sig.cumsum(), [1, 3, 6])

    def test_existing_members_not_shadowed(self):
        sig = ElectricalSignal([1.0, 2.0], noise=[0.5, 0.5])
        # .sum() is the class's own (wrapped, noise-separate) method
        out = sig.sum()
        assert isinstance(out, ElectricalSignal)
        # .mean() is the class's own (acts on signal+noise)
        assert sig.mean() == pytest.approx(2.0)

    def test_missing_attribute_raises(self):
        sig = ElectricalSignal([1.0])
        with pytest.raises(AttributeError):
            sig.definitely_not_an_attribute


class TestOpticalWrapping:
    def test_np_abs_two_pol(self):
        x = OpticalSignal(np.ones((2, 8), complex) * (3 + 4j))
        out = np.abs(x)
        assert isinstance(out, OpticalSignal)
        assert out.n_pol == 2
        np.testing.assert_allclose(np.asarray(out.signal), 5.0)

    def test_np_multiply_optical(self):
        x = OpticalSignal(np.ones(8, complex))
        out = np.multiply(np.full(8, 2.0), x)
        assert isinstance(out, OpticalSignal)


class TestBinarySequenceProtocol:
    def test_np_add_is_concatenation(self):
        seq = BinarySequence("101")
        out = np.add(np.array([0, 0, 0], dtype=np.uint8), seq)
        assert isinstance(out, BinarySequence)
        np.testing.assert_array_equal(out.data, [0, 0, 0, 1, 0, 1])

    def test_np_roll_rewraps(self):
        seq = BinarySequence("100")
        out = np.roll(seq, 1)
        assert isinstance(out, BinarySequence)
        np.testing.assert_array_equal(out.data, [0, 1, 0])

    def test_np_concatenate(self):
        out = np.concatenate([BinarySequence("10"), BinarySequence("01")])
        assert isinstance(out, BinarySequence)
        np.testing.assert_array_equal(out.data, [1, 0, 0, 1])

    def test_nonbinary_result_falls_back_to_ndarray(self):
        seq = BinarySequence("111")
        out = np.add(seq, seq)  # 1+1=2 -> not binary -> raw ndarray
        # np.add with BOTH binary_sequence falls into the rhs-__radd__
        # concatenation shortcut (reference semantics)
        assert isinstance(out, BinarySequence)
        assert out.size == 6
        out2 = np.multiply(seq.data, 3)  # plain ndarray path
        assert isinstance(out2, np.ndarray)

    def test_delegation(self):
        seq = BinarySequence("1011")
        assert seq.sum() == 3
        assert seq.max() == 1
        np.testing.assert_array_equal(seq.cumsum(), [1, 1, 2, 3])

    def test_counts_not_shadowed(self):
        seq = BinarySequence("1011")
        assert seq.ones == 3 and seq.zeros == 1


class TestUfuncOperandOrder:
    """Round-3 review fixes: the ufunc overrides must keep their semantics
    no matter which side of the call the wrapped object sits on."""

    def test_np_add_signal_lhs_preserves_noise(self):
        es = ElectricalSignal([1.0, 2.0], noise=[0.1, 0.2])
        out = np.add(es, np.ones(2))
        np.testing.assert_allclose(out.signal, [2.0, 3.0])
        np.testing.assert_allclose(out.noise, [0.1, 0.2])
        # mirror: array on the left
        out2 = np.add(np.ones(2), es)
        np.testing.assert_allclose(out2.signal, out.signal)
        np.testing.assert_allclose(out2.noise, out.noise)

    def test_np_subtract_signal_lhs(self):
        es = ElectricalSignal([3.0, 4.0], noise=[0.1, 0.2])
        out = np.subtract(es, np.ones(2))
        np.testing.assert_allclose(out.signal, [2.0, 3.0])
        np.testing.assert_allclose(out.noise, [0.1, 0.2])

    def test_np_multiply_signal_lhs_bilinear(self):
        es = ElectricalSignal([1.0, 2.0], noise=[0.5, 0.5])
        out = np.multiply(es, np.full(2, 2.0))
        ref = es * np.full(2, 2.0)
        np.testing.assert_allclose(out.signal, ref.signal)
        np.testing.assert_allclose(out.noise, ref.noise)

    def test_np_add_sequence_lhs_concatenates(self):
        s = BinarySequence([1, 0, 1])
        out = np.add(s, np.array([0, 1, 0]))
        np.testing.assert_array_equal(out.data, [1, 0, 1, 0, 1, 0])
        out2 = np.add(np.array([0, 1, 0]), s)
        np.testing.assert_array_equal(out2.data, [0, 1, 0, 1, 0, 1])

    def test_np_multiply_sequence_lhs_tiles(self):
        s = BinarySequence([1, 0])
        out = np.multiply(s, 2)
        np.testing.assert_array_equal(out.data, [1, 0, 1, 0])
        out2 = np.multiply(2, s)
        np.testing.assert_array_equal(out2.data, [1, 0, 1, 0])

    def test_ne_elementwise(self):
        a = ElectricalSignal([1.0, 2.0, 3.0])
        b = ElectricalSignal([1.0, 2.0, 4.0])
        ne = a != b
        np.testing.assert_array_equal(np.asarray(ne), [False, False, True])
