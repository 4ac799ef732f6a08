"""Bessel vs ideal brick-wall noise filtering
(reference examples/noise_filtering_comparison.py).

Passes white Gaussian noise of a set spectral density through (a) the
zero-phase 4th-order Bessel LPF device and (b) an ideal square filter of
the same cutoff, then compares the output powers against the
noise-equivalent-bandwidth prediction and the Welch PSDs in the
passband.  The Bessel |H|^2 response integrates to a slightly different
NEB than the brick wall — the printed ratio quantifies it.

Run:  python examples/noise_filtering_comparison.py [--show]
"""
try:  # running from a source checkout without an install
    import opticomlib_tpu  # noqa: F401
except ModuleNotFoundError:
    import os as _os, sys as _sys
    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
import sys

import numpy as np
import scipy.signal as sg

from opticomlib_tpu import gv, idbm, dbm
from opticomlib_tpu.devices import LPF
from opticomlib_tpu.signals import electrical_signal

gv(sps=16, R=10e9, N=100_000)

noise_power = -150  # dBm/Hz
rng = np.random.default_rng(5)
noise = electrical_signal(rng.normal(
    0, np.sqrt(idbm(noise_power) * gv.fs), gv.N * gv.sps))

noise_bessel = LPF(noise, BW=gv.R)


def ideal_square_filter(signal, BW):
    X = np.fft.fft(np.asarray(signal.signal))
    df = gv.fs / signal.size
    cutoff_bin = int(BW / df)
    Y = np.zeros_like(X)
    Y[:cutoff_bin] = X[:cutoff_bin]
    Y[-cutoff_bin:] = X[-cutoff_bin:]
    return electrical_signal(np.fft.ifft(Y).real)


noise_square = ideal_square_filter(noise, BW=gv.R)

P_b = float(noise_bessel.power())
P_s = float(noise_square.power())
P_pred = idbm(noise_power) * 2 * gv.R  # two-sided brick wall
print(f"input density: {noise_power} dBm/Hz, cutoff {gv.R/1e9:.0f} GHz")
print(f"  brick-wall output power: {dbm(P_s):7.2f} dBm "
      f"(prediction {dbm(P_pred):7.2f} dBm)")
print(f"  Bessel output power:     {dbm(P_b):7.2f} dBm "
      f"(NEB ratio {P_b / P_s:.3f})")
assert abs(dbm(P_s) - dbm(P_pred)) < 0.3

if "--show" in sys.argv:
    import matplotlib.pyplot as plt
    nperseg = 512
    for sig, label in ((noise, "AWG noise"),
                       (noise_bessel, "Bessel filtered"),
                       (noise_square, "ideal square filtered")):
        f, psd = sg.welch(np.asarray(sig.signal).real, fs=gv.fs,
                          nperseg=nperseg, return_onesided=False,
                          noverlap=int(0.75 * nperseg),
                          scaling="density", detrend=False, window="hann")
        plt.plot(np.fft.fftshift(f) / 1e9,
                 dbm(np.fft.fftshift(psd)), lw=2, label=label)
    plt.xlabel("Frequency (GHz)")
    plt.ylabel("PSD (dBm/Hz)")
    plt.ylim(noise_power - 10, noise_power + 2)
    plt.xlim(-20, 20)
    plt.legend()
    plt.grid(alpha=0.3)
    plt.show()
