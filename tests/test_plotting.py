"""Plotting smoke tests (assert no exception, as the reference does —
reference tests/typing_test.py:730-737 and 1264-1277).

All figures render on the Agg backend; no display required.
"""
import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

from opticomlib_tpu import gv  # noqa: E402
from opticomlib_tpu.devices import DAC, GET_EYE, PRBS  # noqa: E402
from opticomlib_tpu.eyediag import eyediagram  # noqa: E402
from opticomlib_tpu.signals import (  # noqa: E402
    BinarySequence, ElectricalSignal, OpticalSignal,
)
from opticomlib_tpu.utils.analysis import bode  # noqa: E402


@pytest.fixture(autouse=True)
def _close_figs():
    yield
    plt.close("all")


def _noisy_nrz(n_bits=256, sps=16):
    gv(sps=sps, R=1e9, N=n_bits)
    rng = np.random.default_rng(5)
    bits = BinarySequence(rng.integers(0, 2, n_bits))
    sig = DAC(bits, Vpp=1.0)
    return sig + ElectricalSignal(
        np.zeros(sig.size), noise=0.05 * rng.normal(size=sig.size))


def test_binary_sequence_plot():
    BinarySequence("1 0 1 1 0").plot()


def test_electrical_signal_plot_and_psd():
    sig = _noisy_nrz()
    sig.plot("-", n=500, xlabel="t", ylabel="V", grid=True)
    sig.psd("-", kind="linear")
    sig.psd("-", kind="log")


def test_electrical_signal_plot_eye():
    sig = _noisy_nrz()
    sig.plot_eye()


def test_optical_signal_plot_both_pols():
    gv(sps=8, R=1e9, N=64)
    x = np.exp(1j * np.linspace(0, 4 * np.pi, 512)).astype(np.complex64)
    osig = OpticalSignal(np.stack([x, 0.5 * x]), n_pol=2)
    osig.plot("-")


def test_eye_object_plot_and_print():
    sig = _noisy_nrz()
    eye_obj = GET_EYE(sig, nslots=128)
    eye_obj.print("smoke")
    eye_obj.plot()


def test_eyediagram_styles():
    sig = _noisy_nrz()
    y = np.real(np.asarray(sig.signal))
    for style in ("density", "line"):
        eyediagram(y, sps=gv.sps, style=style)
        plt.close("all")


def test_bode_plot():
    gv(sps=16, R=1e9, N=64)
    fs = 4e9
    f = np.fft.fftfreq(512, d=1 / fs)
    H = 1.0 / (1 + 1j * f / 1e9)
    bode(H, fs, f0=193.4e12, show=False)


def test_prbs_then_plot_chain():
    gv(sps=8, R=1e9, N=127)
    seq = PRBS(order=7)
    DAC(seq, Vpp=1.0).plot()


def test_eye_plot_annotated_options(tmp_path):
    """Round 2: reference-parity Eye.plot knobs (typing.py:2577-2798) —
    annotation flags, hlines/vlines, histogram panel, light style,
    savefig, external ax."""
    from opticomlib_tpu import gv
    from opticomlib_tpu.devices import DAC, GET_EYE, PRBS
    from opticomlib_tpu.eyediag import EyeShowOptions

    gv(sps=16, R=1e9, N=256)
    sig = DAC(PRBS(order=7, len=256), Vpp=1.0, pulse_shape="gaussian")
    eye_obj = GET_EYE(sig, nslots=256)

    opts = EyeShowOptions(all_none=True)
    assert opts.averages and opts.histogram and opts.cross_points
    out = tmp_path / "eye.png"
    eye_obj.plot(show_options=opts, hlines=[0.5], vlines=[0.0],
                 style="light", smooth=True, title="t", savefig=str(out))
    assert out.exists() and out.stat().st_size > 0
    plt.close("all")

    # non-smooth per-trace rendering + external ax
    fig, ax = plt.subplots()
    eye_obj.plot(show_options=EyeShowOptions(t_opt=True), smooth=False,
                 ax=ax)
    plt.close("all")

    # bad style rejected; empty object rejected
    import pytest as _pytest
    from opticomlib_tpu.eyediag import Eye
    with _pytest.raises(TypeError):
        eye_obj.plot(style="neon")
    with _pytest.raises(ValueError):
        Eye({}).plot()
    gv.default()


def test_eye_plot_trace_window_uses_resampled_sps():
    """With sps_resamp, the per-trace renderer must fold windows at the
    TRACE sampling (round-3 fix: windows at the signal sps drew only
    half the eye)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.collections import LineCollection

    from opticomlib_tpu import gv
    from opticomlib_tpu.devices import DAC, GET_EYE, PRBS

    gv(sps=16, R=10e9, N=256)
    v = DAC(PRBS(order=9, len=256), Vpp=1, pulse_shape="gaussian")
    e = GET_EYE(v, nslots=128, sps_resamp=64)
    fig, ax = plt.subplots()
    e.plot(smooth=False, ax=ax)
    lcs = [c for c in ax.collections if isinstance(c, LineCollection)]
    assert lcs, "per-trace path must add a LineCollection"
    segs = np.concatenate([np.asarray(c.get_segments()) for c in lcs])
    xs = segs[..., 0]
    assert xs.min() <= -0.9 and xs.max() >= 0.9, (xs.min(), xs.max())
    plt.close(fig)


def test_partial_eye_plot_tolerates_missing_fields():
    """Round-3 review fix: a partially-filled Eye dict (only some moments
    present, crossing amplitudes at exactly 0.0) still renders."""
    import numpy as np

    from opticomlib_tpu.eyediag import Eye

    sps = 16
    rng = np.random.default_rng(1)
    y = np.repeat(rng.integers(0, 2, 64), sps) + 0.0
    t = np.kron(np.ones(32), np.linspace(-1, 1 - 1 / sps, 2 * sps))

    # only mu0 set; mu1/s0/s1/t_span absent -> None via __getattr__
    partial = Eye({"y": y, "t": t, "sps": sps, "mu0": 0.1, "t_opt": 0.0})
    partial.plot()
    plt.close("all")

    # crossing amplitude exactly 0.0 must still draw the cross markers
    full = Eye({"y": y, "t": t, "sps": sps, "t_opt": 0.0, "t_left": -0.5,
                "t_right": 0.5, "y_left": 0.0, "y_right": 0.0,
                "threshold": 0.5, "mu0": 0.0, "mu1": 1.0,
                "s0": 0.05, "s1": 0.05})
    from opticomlib_tpu.eyediag import EyeShowOptions
    full.plot(show_options=EyeShowOptions(cross_points=True))
    plt.close("all")
