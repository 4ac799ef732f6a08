"""SimParams / gv reconciliation tests (behavior spec:
reference opticomlib/typing.py:306-386 and tests/typing_test.py:28-83)."""
import numpy as np
import pytest

from opticomlib_tpu import SimParams, gv


def test_defaults():
    p = SimParams()
    assert p.sps == 16
    assert p.R == 1e9
    assert p.fs == 16e9
    assert p.N == 128
    assert p.dt == 1 / 16e9
    assert np.isclose(p.f0, 299792458.0 / 1550e-9)
    assert p.nsamples == 128 * 16


def test_reconciliation_sps_R():
    p = SimParams.create(sps=8, R=10e9, _warn=False)
    assert p.sps == 8 and p.R == 10e9 and p.fs == 80e9


def test_reconciliation_sps_fs():
    p = SimParams.create(sps=8, fs=80e9, _warn=False)
    assert p.R == 10e9


def test_reconciliation_R_fs():
    p = SimParams.create(R=10e9, fs=80e9, _warn=False)
    assert p.sps == 8


def test_reconciliation_only_sps_uses_default_R():
    p = SimParams.create(sps=32, _warn=False)
    assert p.R == 1e9 and p.fs == 32e9


def test_reconciliation_only_fs_uses_default_R():
    p = SimParams.create(fs=64e9, _warn=False)
    assert p.R == 1e9 and p.sps == 64


def test_axes():
    p = SimParams.create(sps=4, R=1e9, N=8, _warn=False)
    n = 32
    assert p.t.shape == (n,)
    assert p.t[0] == 0.0
    assert np.isclose(p.t[-1], n / p.fs)
    assert p.w.shape == (n,)
    # fftshift(fftfreq) layout (reference typing.py:359)
    ref = 2 * np.pi * np.fft.fftshift(np.fft.fftfreq(n)) * p.fs
    np.testing.assert_allclose(p.w, ref)
    assert np.isclose(p.dw, 2 * np.pi * p.fs / n)


def test_gv_facade_and_custom_vars():
    gv(sps=8, R=10e9, N=100)
    assert gv.sps == 8 and gv.fs == 80e9 and gv.N == 100
    assert gv.t.size == 800

    gv(alpha_custom=0.5)
    assert gv.alpha_custom == 0.5

    gv.default()
    assert gv.sps == 16 and gv.R == 1e9
    with pytest.raises(AttributeError):
        _ = gv.alpha_custom


def test_gv_params_immutable_snapshot():
    gv(sps=8, R=10e9)
    p = gv.params
    gv(sps=16, R=1e9)
    assert p.sps == 8  # snapshot unaffected by later gv() calls
    assert hash(p) is not None  # hashable -> usable as jit static arg


class TestTopLevelConvenienceExports:
    """Reference drop-in names (`from opticomlib import gv, np, plt`,
    `gv(verbose=DEBUG)`, physical constants, fft helpers, sizeof —
    reference opticomlib/typing.py:12-18, docstring examples)."""

    def test_logging_levels_and_constants(self):
        import opticomlib_tpu as ot
        assert ot.DEBUG < ot.INFO < ot.WARNING
        assert abs(ot.c - 299792458.0) < 1
        assert 1.6e-19 < ot.e < 1.7e-19
        assert 6.6e-34 < ot.h < 6.7e-34
        assert 1.3e-23 < ot.kB < 1.4e-23
        assert ot.pi == np.pi

    def test_fft_helpers_and_ndarray(self):
        import opticomlib_tpu as ot
        x = np.arange(8.0)
        np.testing.assert_allclose(ot.ifft(ot.fft(x)).real, x, atol=1e-12)
        assert ot.fftshift(ot.fftfreq(4))[0] == -0.5
        assert ot.ndarray is np.ndarray
        assert ot.np is np

    def test_sizeof_counts_array_buffers(self):
        import opticomlib_tpu as ot
        a = np.zeros(1000, dtype=np.float64)
        assert ot.sizeof(a) >= a.nbytes
        sig = ot.electrical_signal(np.zeros(256))
        assert ot.sizeof(sig) >= 256 * 8


def test_gv_incremental_update_preserves_rates():
    """Round-3 review fix: gv(N=...) (or any call omitting members of the
    (sps, R, fs) triple) keeps the currently-configured values, as the
    reference does — it must not reset to factory defaults."""
    from opticomlib_tpu import gv

    try:
        gv(sps=32, R=10e9)
        gv(N=1000)                      # only N: rates untouched
        assert gv.sps == 32 and gv.R == 10e9 and gv.N == 1000
        assert gv.fs == 32 * 10e9

        gv(sps=8)                       # sps only: current R kept
        assert gv.R == 10e9 and gv.fs == 8 * 10e9

        gv(R=5e9)                       # R only: current sps kept
        assert gv.sps == 8 and gv.fs == 8 * 5e9

        gv(fs=80e9)                     # fs only: current R kept
        assert gv.R == 5e9 and gv.sps == 16
    finally:
        gv.default()
