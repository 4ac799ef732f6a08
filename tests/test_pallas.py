"""Pallas kernel tests (interpreter mode on the CPU backend).

Oracles are plain NumPy implementations of the same math; the kernels are
the TPU-compiled path for the SSFM pointwise stages, streaming FIR, ADC
quantization and eye histogramming.
"""
import numpy as np
import pytest

from opticomlib_tpu.ops import pallas_kernels as pk


rng = np.random.default_rng(7)


def _planar(a):
    a = np.asarray(a, np.complex64)
    return (np.ascontiguousarray(a.real, np.float32),
            np.ascontiguousarray(a.imag, np.float32))


class TestNLHalfstep:
    def test_matches_complex_exponential(self):
        n = 3000  # deliberately not a multiple of the block size
        A = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
        c = 0.37
        re, im = _planar(A)
        bre, bim, hre, him = pk.nl_halfstep(re, im, c)
        expect = A * np.exp(1j * c * np.abs(A) ** 2)
        got = np.asarray(bre) + 1j * np.asarray(bim)
        np.testing.assert_allclose(got, expect, rtol=2e-5, atol=2e-5)
        # rotation factors are exactly (cos, sin) of the phase
        phi = c * np.abs(A) ** 2
        np.testing.assert_allclose(np.asarray(hre), np.cos(phi), atol=2e-5)
        np.testing.assert_allclose(np.asarray(him), np.sin(phi), atol=2e-5)

    def test_zero_coeff_is_identity(self):
        A = (rng.normal(size=256) + 1j * rng.normal(size=256)).astype(np.complex64)
        re, im = _planar(A)
        bre, bim, _, _ = pk.nl_halfstep(re, im, 0.0)
        np.testing.assert_allclose(np.asarray(bre), A.real, atol=1e-6)
        np.testing.assert_allclose(np.asarray(bim), A.imag, atol=1e-6)


class TestCmul:
    def test_matches_numpy(self):
        n = 5000
        A = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
        B = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
        are, aim = _planar(A)
        bre, bim = _planar(B)
        ore, oim = pk.cmul(are, aim, bre, bim)
        got = np.asarray(ore) + 1j * np.asarray(oim)
        np.testing.assert_allclose(got, A * B, rtol=2e-5, atol=2e-5)


class TestFIR:
    @pytest.mark.parametrize("taps,n,block", [(7, 1000, 256), (33, 4096, 512)])
    def test_streaming_matches_convolve(self, taps, n, block):
        x = rng.normal(size=n).astype(np.float32)
        h = rng.normal(size=taps).astype(np.float32)
        y = np.asarray(pk.fir_filter(x, h, block=block))
        expect = np.convolve(x, h)[:n]
        np.testing.assert_allclose(y, expect, rtol=1e-4, atol=1e-4)

    def test_matmul_path_matches_convolve(self):
        n, taps = 3000, 65
        x = rng.normal(size=n).astype(np.float32)
        h = rng.normal(size=taps).astype(np.float32)
        y = np.asarray(pk.fir_filter_matmul(x, h, block=512))
        expect = np.convolve(x, h)[:n]
        np.testing.assert_allclose(y, expect, rtol=1e-3, atol=1e-3)

    def test_delta_filter_is_identity(self):
        x = rng.normal(size=777).astype(np.float32)
        h = np.zeros(11, np.float32)
        h[0] = 1.0
        np.testing.assert_allclose(np.asarray(pk.fir_filter(x, h, block=128)),
                                   x, atol=1e-6)


class TestADC:
    def test_round_matches_numpy(self):
        x = rng.normal(size=2000).astype(np.float32)
        lo, hi, nbits = -2.0, 2.0, 4
        y = np.asarray(pk.adc_quantize(x, lo, hi, nbits))
        step = (hi - lo) / (2**nbits - 1)
        # kernel rounds half-up (deterministic across backends)
        expect = lo + np.clip(np.floor((x - lo) / step + 0.5),
                              0, 2**nbits - 1) * step
        # off-by-one-level allowed only at f32 tie boundaries (backend
        # division rounding); with random normals that fraction is ~0
        mismatch = np.mean(np.abs(y - expect) > 1e-5)
        assert mismatch < 1e-3, mismatch

    def test_stochastic_on_grid_and_unbiased(self):
        x = np.full(200_000, 0.30, np.float32)
        lo, hi, nbits = 0.0, 1.0, 2   # levels at 0, 1/3, 2/3, 1
        try:
            y = np.asarray(pk.adc_quantize(x, lo, hi, nbits,
                                           stochastic=True, seed=3))
        except Exception as e:  # interpreter may lack the TPU PRNG
            pytest.skip(f"TPU PRNG unavailable in interpret mode: {e}")
        step = (hi - lo) / (2**nbits - 1)
        # every output on the quantizer grid
        q = y / step
        np.testing.assert_allclose(q, np.round(q), atol=1e-4)
        # unbiased: mean preserved to ~3 sigma of the dither variance
        assert abs(float(y.mean()) - 0.30) < 3 * step / np.sqrt(12 * len(x))


class TestHistogram2D:
    def test_matches_numpy_histogram(self):
        n, nt, ny = 20_000, 32, 64
        ti = rng.integers(0, nt, n)
        yi = rng.integers(0, ny, n)
        counts = np.asarray(pk.histogram2d(ti, yi, nt, ny, chunk=4096))
        expect = np.zeros((nt, ny))
        np.add.at(expect, (ti, yi), 1.0)
        np.testing.assert_array_equal(counts, expect)

    def test_out_of_range_dropped(self):
        ti = np.array([0, 5, -1, 99])
        yi = np.array([0, 1, 2, 3])
        counts = np.asarray(pk.histogram2d(ti, yi, 8, 8, chunk=4096))
        assert counts.sum() == 2  # only the two in-range pairs land
