"""PRBS generator tests: golden vectors, periodicity, seed continuation
(spec data from reference tests/devices_test.py:46-80)."""
import numpy as np
import pytest

from opticomlib_tpu.devices import PRBS
from opticomlib_tpu.ops.prbs import prbs

# First 20 bits for default (all-ones) seed — published spec data of the
# reference implementation (tests/devices_test.py:55-69).
GOLDEN_20 = {
    7:  [1,0,0,0,0,0,0,1,0,0,0,0,0,1,1,0,0,0,0,1],
    9:  [1,0,0,0,0,0,1,1,1,1,0,1,1,1,1,1,0,0,0,1],
    11: [1,0,0,0,0,0,0,0,0,0,1,1,0,0,0,0,0,0,0,1],
    15: [1,0,0,0,0,0,0,0,0,0,0,0,0,0,0,1,0,0,0,0],
    20: [1,0,0,0,1,1,1,0,0,0,1,1,1,0,0,0,1,1,1,0],
    23: [1,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,1],
    31: [1,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0],
}


@pytest.mark.parametrize("order", sorted(GOLDEN_20))
def test_golden_vectors(order):
    out = PRBS(order=order, len=20)
    assert len(out) == 20
    np.testing.assert_array_equal(out.data, GOLDEN_20[order])


def test_validation():
    with pytest.raises(TypeError):
        PRBS(order=15, len="20")
    with pytest.raises(ValueError):
        PRBS(order=8)
    with pytest.raises(ValueError):
        PRBS(order=7, len=0)


def test_zero_seed_coerced():
    with pytest.warns(UserWarning):
        out = PRBS(7, len=10, seed=0)
    np.testing.assert_array_equal(out.data, [1, 0, 0, 0, 0, 0, 1, 1, 0, 0])


def test_periodicity():
    """PRBS7 has period 127: two periods == one period repeated
    (reference tests/devices_test.py:71)."""
    np.testing.assert_array_equal(
        PRBS(7, len=2 * 127).data, (PRBS(7, len=127) * 2).data)


@pytest.mark.parametrize("order", [7, 9, 15, 23])
def test_full_period_balance(order):
    """A maximal-length sequence of period 2^n - 1 has 2^(n-1) ones."""
    bits, _ = prbs(order)
    assert bits.size == 2**order - 1
    assert int(bits.sum()) == 2 ** (order - 1)
    # every nonzero state visited exactly once -> sequence of length period
    # has no repetition of the first (order) bits pattern aligned at 0
    assert not np.array_equal(bits[:order], bits[1:order + 1])


def test_seed_continuation():
    """return_seed allows resuming the stream exactly
    (reference devices.py:180-182)."""
    a, state = PRBS(9, len=100, return_seed=True)
    b = PRBS(9, len=100, seed=state)
    full = PRBS(9, len=200)
    np.testing.assert_array_equal(
        np.concatenate([a.data, b.data]), full.data)


def test_custom_seed_reproducible():
    x = PRBS(7, len=10, seed=124)
    np.testing.assert_array_equal(x.data, [0, 0, 0, 0, 0, 1, 0, 0, 0, 0])


def test_large_length_fast():
    """2^22 bits must generate in well under a second (the reference's
    per-bit Python loop takes minutes at this size)."""
    import time
    t0 = time.time()
    bits, _ = prbs(31, length=2**22)
    assert bits.size == 2**22
    assert time.time() - t0 < 2.0
    # spot-check against the serial LFSR on a window
    from opticomlib_tpu.ops.prbs import _bootstrap
    serial, _ = _bootstrap(31, (1 << 31) - 1, 2000)
    np.testing.assert_array_equal(bits[:2000], serial)
