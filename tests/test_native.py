"""Native (C++) runtime helper tests.

The native LFSR is the independent oracle for the vectorized O(log n)
PRBS generator — the two implementations must agree bit-for-bit,
including the continuation state.
"""
import numpy as np
import pytest

from opticomlib_tpu import native
from opticomlib_tpu.ops.prbs import PRBS_TAPS, prbs


def test_native_builds():
    assert native.available(), "g++ toolchain expected in this environment"


@pytest.mark.parametrize("order", sorted(PRBS_TAPS))
def test_lfsr_matches_vectorized_prbs(order):
    n = min(2 ** order - 1, 4096)
    bits_vec, state_vec = prbs(order, length=n)
    bits_nat, state_nat = native.lfsr_prbs(order, (1 << order) - 1, n)
    np.testing.assert_array_equal(bits_vec, bits_nat)
    # continuation: generating n more bits from the returned states agrees
    more_vec, _ = prbs(order, length=64, seed=state_vec)
    more_nat, _ = native.lfsr_prbs(order, state_nat, 64)
    np.testing.assert_array_equal(more_vec, more_nat)


def test_lfsr_full_period(order=11):
    """Full period 2^order - 1, then the stream repeats."""
    n = 2 ** order - 1
    bits, state = native.lfsr_prbs(order, (1 << order) - 1, n)
    assert int(bits.sum()) == 2 ** (order - 1)  # balance property
    again, _ = native.lfsr_prbs(order, state, n)
    np.testing.assert_array_equal(bits, again)


def test_bit_error_count():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 2, 10_001).astype(np.uint8)
    b = a.copy()
    flips = rng.choice(a.size, 137, replace=False)
    b[flips] ^= 1
    assert native.bit_error_count(a, b) == 137
    assert native.bit_error_count(a, a) == 0


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(1)
    for n in (1, 7, 8, 9, 4097):
        bits = rng.integers(0, 2, n).astype(np.uint8)
        packed = native.pack_bits(bits)
        assert packed.size == (n + 7) // 8
        np.testing.assert_array_equal(native.unpack_bits(packed, n), bits)
        # matches numpy's little-endian packbits convention
        np.testing.assert_array_equal(
            packed, np.packbits(bits, bitorder="little"))
