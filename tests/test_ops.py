"""DSP kernel tests against scipy oracles: upfir, FFT resampling,
zero-phase Bessel filtering, SSFM physics invariants."""
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal as sg

from opticomlib_tpu.ops import filters, pulses, ssfm


# ------------------------------------------------------------- convolution
def test_fft_convolve_same_matches_scipy():
    rng = np.random.default_rng(0)
    for n, m in [(256, 33), (100, 7), (64, 64), (128, 1)]:
        x = rng.normal(size=n)
        h = rng.normal(size=m)
        got = np.asarray(pulses.fft_convolve_same(x, h))
        ref = sg.fftconvolve(x, h, mode="same")
        np.testing.assert_allclose(got, ref, atol=1e-9)


def test_fft_convolve_complex_and_2d():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 128)) + 1j * rng.normal(size=(2, 128))
    h = rng.normal(size=17)
    got = np.asarray(pulses.fft_convolve_same(x, h))
    for p in range(2):
        ref = sg.fftconvolve(x[p], h, mode="same")
        np.testing.assert_allclose(got[p], ref, atol=1e-9)


def test_upfir_matches_reference_semantics():
    """upfir = zero-stuff at offset up//2 + fftconvolve same
    (reference utils.py:1949-1981)."""
    rng = np.random.default_rng(2)
    x = rng.integers(0, 2, 32).astype(float)
    h = rng.normal(size=65)
    up = 8
    xu = np.zeros(x.size * up)
    xu[up // 2::up] = x
    ref = sg.fftconvolve(xu, h, mode="same")
    got = np.asarray(pulses.upfir(x, h, up=up))
    np.testing.assert_allclose(got, ref, atol=1e-9)


def test_jax_path_matches_numpy_path():
    rng = np.random.default_rng(3)
    x = rng.normal(size=64).astype(np.float32)
    h = rng.normal(size=9).astype(np.float32)
    a = np.asarray(pulses.fft_convolve_same(x, h))
    b = np.asarray(pulses.fft_convolve_same(jnp.asarray(x), jnp.asarray(h)))
    np.testing.assert_allclose(a, b, atol=1e-4)


# -------------------------------------------------------------- resampling
@pytest.mark.parametrize("n,num", [(128, 256), (128, 512), (256, 128),
                                   (100, 250), (128, 96)])
def test_resample_fft_matches_scipy(n, num):
    rng = np.random.default_rng(4)
    x = rng.normal(size=n)
    got = np.asarray(pulses.resample_fft(x, num))
    ref = sg.resample(x, num)
    np.testing.assert_allclose(got, ref, atol=1e-9)


def test_resample_complex():
    rng = np.random.default_rng(5)
    x = rng.normal(size=64) + 1j * rng.normal(size=64)
    got = np.asarray(pulses.resample_fft(x, 128))
    ref = sg.resample(x, 128)
    np.testing.assert_allclose(got, ref, atol=1e-9)


# ------------------------------------------------------------ pulse shapes
def test_rcos_pulse_properties():
    h = pulses.rcos_pulse(0.25, 6, 16, shape="normal")
    assert h.size == 6 * 16 + 1
    assert np.isclose(h[h.size // 2], 1.0)  # peak = 1 at t=0
    # zero crossings at integer symbol offsets
    for k in (1, 2):
        assert abs(h[h.size // 2 + k * 16]) < 1e-10

    h0 = pulses.rcos_pulse(0.0, 6, 16)
    np.testing.assert_allclose(
        h0, np.sinc(np.linspace(-3, 3, 97)), atol=1e-12)

    hs = pulses.rcos_pulse(0.5, 6, 16, shape="sqrt")
    # RRC self-convolved ~ RC at symbol spacing: check peak normalization
    assert np.isfinite(hs).all()

    with pytest.raises(ValueError):
        pulses.rcos_pulse(1.5, 6, 16)


def test_gauss_pulse_fwhm():
    sps = 64
    h = np.abs(pulses.gauss_pulse(span=8, sps=sps, T=1))
    half = h >= 0.5
    width = half.sum() / sps  # FWHM in slots
    assert np.isclose(width, 1.0, atol=2 / sps)


def test_nrz_pulse():
    h = pulses.nrz_pulse(span=4, sps=8, T=1)
    assert h.sum() == 8  # T*sps samples high
    assert set(np.unique(h)) == {0.0, 1.0}


# ---------------------------------------------------------------- filters
def test_bessel_zero_phase_matches_sosfiltfilt():
    """FFT-domain |H|^2 filtering ~ sosfiltfilt away from the edges."""
    fs = 16e9
    BW = 2e9
    rng = np.random.default_rng(6)
    # periodic-ish band-limited signal to minimize edge transients
    t = np.arange(2048) / fs
    x = np.sin(2 * np.pi * 0.5e9 * t) + 0.3 * np.sin(2 * np.pi * 3e9 * t)
    got = np.asarray(filters.bessel_lpf(x, BW, fs)).real
    sos = sg.bessel(4, BW, btype="low", fs=fs, output="sos", norm="mag")
    ref = sg.sosfiltfilt(sos, x)
    # compare central region (edge handling differs by design)
    sl = slice(200, -200)
    np.testing.assert_allclose(got[sl], ref[sl], atol=5e-3)


def test_bessel_dc_gain_unity():
    fs = 16e9
    x = np.ones(1024)
    y = np.asarray(filters.bessel_lpf(x, 1e9, fs)).real
    np.testing.assert_allclose(y, 1.0, atol=1e-9)


def test_bessel_minus6db_at_cutoff():
    """filtfilt doubles the attenuation: |H(BW)|^2 = -6 dB for norm='mag'."""
    fs = 64e9
    BW = 8e9
    H2 = filters.bessel_filtfilt_response(4, BW, fs, 4096)
    f = np.fft.fftfreq(4096, 1 / fs)
    i = np.argmin(np.abs(f - BW))
    # H2 is the amplitude transfer of the zero-phase (squared) filter
    assert np.isclose(20 * np.log10(H2[i]), -6.02, atol=0.1)


# ------------------------------------------------------------------- SSFM
def _wgrid(n, fs):
    return 2 * np.pi * np.fft.fftfreq(n) * fs


def test_ssfm_attenuation_law():
    """Pout = Pin * exp(-alpha_lin * L) to rtol 1e-3
    (oracle: reference tests/devices_test.py:263-269)."""
    n = 4096
    fs = 16e9
    A = np.ones(n, dtype=np.complex64)
    out = np.asarray(ssfm.ssfm_propagate(A, _wgrid(n, fs), length=10,
                                         alpha=0.2))
    alpha_lin = 0.2 / 4.343
    np.testing.assert_allclose(np.mean(np.abs(out) ** 2),
                               np.exp(-alpha_lin * 10), rtol=1e-3)


def test_ssfm_linear_matches_analytic_dispersion():
    """gamma=0: SSFM == analytic exp(j beta2/2 w^2 L) all-pass."""
    n = 4096
    fs = 64e9
    rng = np.random.default_rng(7)
    A = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    A *= 0.01
    w = _wgrid(n, fs)
    out = np.asarray(ssfm.ssfm_propagate(A, w, length=80, beta_2=-20))
    H = np.exp(1j * (-20) / 2 * (w * 1e-12) ** 2 * 80)
    ref = np.fft.ifft(np.fft.fft(A) * H)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_ssfm_dbp_roundtrip():
    """DBP(FIBER(x)) ~ x including nonlinearity
    (oracle: reference tests/devices_test.py:271-277)."""
    n = 4096
    fs = 160e9
    t = np.arange(n) / fs
    A = (0.1 * np.exp(-((t - t.mean()) / 50e-12) ** 2)).astype(np.complex64)
    w = _wgrid(n, fs)
    kw = dict(length=50, alpha=0.2, beta_2=-20, gamma=2.0, phi_max=0.003)
    fwd = np.asarray(ssfm.ssfm_propagate(A, w, **kw))
    back = np.asarray(ssfm.ssfm_propagate(
        fwd, w, length=50, alpha=-0.2, beta_2=20, gamma=-2.0, phi_max=0.003))
    np.testing.assert_allclose(back, A, atol=1e-3)


def test_ssfm_energy_conserved_lossless():
    n = 2048
    fs = 160e9
    rng = np.random.default_rng(8)
    A = (0.05 * (rng.normal(size=n) + 1j * rng.normal(size=n))
         ).astype(np.complex64)
    w = _wgrid(n, fs)
    out = np.asarray(ssfm.ssfm_propagate(A, w, length=20, beta_2=-20,
                                         gamma=1.5, phi_max=0.01))
    np.testing.assert_allclose(np.sum(np.abs(out) ** 2),
                               np.sum(np.abs(A) ** 2), rtol=1e-4)


def test_ssfm_fixed_step_schedule():
    hs = ssfm.ssfm_step_schedule(10.0, 3.0)
    np.testing.assert_allclose(hs, [3, 3, 3, 1], rtol=1e-6)
    hs2 = ssfm.ssfm_step_schedule(9.0, 3.0)
    np.testing.assert_allclose(hs2, [3, 3, 3], rtol=1e-6)


def test_ssfm_return_steps_trajectory():
    n = 1024
    fs = 16e9
    A = 0.1 * np.ones(n, dtype=np.complex64)
    z, A_z = ssfm.ssfm_propagate(A, _wgrid(n, fs), length=10, alpha=0.2,
                                 beta_2=-20, gamma=1.0, h=2.5,
                                 return_steps=True)
    assert z[0] == 0 and np.isclose(z[-1], 10)
    assert A_z.shape[0] == z.size
    assert A_z.shape[1] == n


def test_shortest_int_hist_matches_sort_estimator():
    """Round-4: the histogram-quantile shortest-interval estimator (no
    global sort; powers the sharded in-graph ADC) agrees with the exact
    sorted-sample estimator to within one bin width."""
    import numpy as np

    from opticomlib_tpu.ops.eyeana import shortest_int_hist
    from opticomlib_tpu.utils.analysis import shortest_int

    rng = np.random.default_rng(11)
    nbins = 8192
    for percent in (50.0, 99.99):
        for data in (rng.normal(0.0, 1.0, 20000),
                     np.concatenate([rng.normal(-2, 0.2, 10000),
                                     rng.normal(3, 0.5, 10000)]),
                     rng.standard_cauchy(20000)):
            lo_h, hi_h = (float(x) for x in shortest_int_hist(
                np.float32(data), percent, nbins=nbins))
            lo_s, hi_s = shortest_int(data, percent)
            bw = (data.max() - data.min()) / nbins
            # width-optimal to within bin resolution (the exact argmin
            # can sit anywhere on a flat width plateau, so the BOUNDS
            # need not coincide — the WIDTH and the coverage must)
            assert (hi_h - lo_h) <= (hi_s - lo_s) + 2 * bw + 1e-6, percent
            cover = np.mean((data >= lo_h) & (data <= hi_h))
            assert cover >= percent / 100.0 - 2e-3, (percent, cover)


def test_shortest_int_hist_batched():
    """Leading axes are independent channels."""
    import numpy as np

    from opticomlib_tpu.ops.eyeana import shortest_int_hist

    rng = np.random.default_rng(12)
    y = np.stack([rng.normal(0, 1, 4096), rng.normal(10, 0.1, 4096)])
    lo, hi = shortest_int_hist(np.float32(y), 99.99)
    assert lo.shape == hi.shape == (2,)
    assert -5 < lo[0] < -2 and 2 < hi[0] < 5
    assert 9 < lo[1] < 10 and 10 < hi[1] < 11
