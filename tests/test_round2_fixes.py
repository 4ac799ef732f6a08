"""Round-2 regression tests: timer-stack balance on early-return paths,
show_progress, and namespace parity (VERDICT items 6/8, ADVICE round 1)."""
import numpy as np
import pytest

from opticomlib_tpu import gv
from opticomlib_tpu.devices import DM, FBG, FIBER, LPF
from opticomlib_tpu.signals import ElectricalSignal, OpticalSignal
from opticomlib_tpu.utils.analysis import _timer


@pytest.fixture(autouse=True)
def _reset_gv():
    gv.default()
    gv(sps=16, R=10e9, N=64)
    yield


def _pulse(n=1024):
    return OpticalSignal(
        (np.exp(-np.linspace(-3, 3, n) ** 2) * 0.1).astype(complex))


class TestTimerStackBalance:
    """tic()/toc() must stay balanced on retH / return_steps early returns
    (round-1 VERDICT weak item 2: a leaked tic corrupts the *enclosing*
    device's execution_time)."""

    def test_dm_reth(self):
        depth0 = len(_timer._stack)
        out, H = DM(_pulse(), 100, retH=True)
        assert len(_timer._stack) == depth0
        assert out.execution_time > 0
        assert H.shape == (1024,)

    def test_fiber_return_steps(self):
        depth0 = len(_timer._stack)
        z, A_z = FIBER(_pulse(), 2.0, alpha=0.2, beta_2=-21.0, gamma=1.3,
                       h=0.5, return_steps=True)
        assert len(_timer._stack) == depth0
        assert z[0] == 0.0 and z[-1] == pytest.approx(2.0)

    def test_lpf_reth(self):
        depth0 = len(_timer._stack)
        out, H = LPF(ElectricalSignal(np.random.default_rng(0).normal(
            size=1024)), 5e9, retH=True)
        assert len(_timer._stack) == depth0
        assert out.execution_time > 0

    def test_fbg_reth(self):
        depth0 = len(_timer._stack)
        gv(sps=32, R=10e9, N=128)
        out, H = FBG(_pulse(4096), fc=gv.f0, vdneff=1e-4, kL=2.0,
                     print_params=False, retH=True)
        assert len(_timer._stack) == depth0
        assert out.execution_time > 0
        assert H.shape == (4096,)


class TestShowProgress:
    def test_fiber_show_progress_runs(self, capsys):
        # On CPU, jax.debug.callback is supported -> real tqdm path.
        depth0 = len(_timer._stack)
        out = FIBER(_pulse(), 2.0, alpha=0.2, beta_2=-21.0, gamma=1.3,
                    h=0.5, show_progress=True)
        assert out.size == 1024
        assert len(_timer._stack) == depth0

    def test_progress_matches_silent(self):
        a = FIBER(_pulse(), 2.0, beta_2=-21.0, gamma=1.3, h=0.5)
        b = FIBER(_pulse(), 2.0, beta_2=-21.0, gamma=1.3, h=0.5,
                  show_progress=True)
        np.testing.assert_allclose(a.to_numpy(), b.to_numpy(), atol=0)


class TestNamespaceParity:
    """Names reference drop-in scripts import from ook/ppm/lab
    (reference ook.py:16-18, ppm.py:21-23, lab.py:26-36)."""

    def test_ppm_array_like(self):
        from opticomlib_tpu.ppm import Array_Like
        assert isinstance([], Array_Like)

    def test_lab_numeric_abcs(self):
        from opticomlib_tpu.lab import IntegerNumber, Iterable, RealNumber
        assert isinstance(3, IntegerNumber)
        assert isinstance(3.5, RealNumber)
        assert Iterable is not None

    def test_ook_star_export(self):
        import opticomlib_tpu.ook as m
        for name in ("gv", "Q", "tic", "toc", "binary_sequence",
                     "electrical_signal", "eye", "GET_EYE", "LPF", "SAMPLER"):
            assert name in m.__all__, name

    def test_ppm_star_export(self):
        import opticomlib_tpu.ppm as m
        for name in ("gv", "Q", "dec2bin", "str2array", "Array_Like"):
            assert name in m.__all__, name
