"""Laser linewidth demo: the PSD of a CW laser with Wiener phase noise is
Lorentzian with FWHM = linewidth (reference examples/laser_linewidth_demo.py).

Run:  python examples/laser_linewidth_demo.py [--show]
"""
try:  # running from a source checkout without an install
    import opticomlib_tpu  # noqa: F401
except ModuleNotFoundError:
    import os as _os, sys as _sys
    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
import sys

import numpy as np

from opticomlib_tpu import dbm, get_psd, gv
from opticomlib_tpu.devices import LASER

gv(sps=32, R=1e9, N=100_000)
np.random.seed(0)

nperseg = 4 * 2048
for lw in (20e6, 100e6):
    laser = LASER(P0=0, lw=lw)
    f, psd = get_psd(np.asarray(laser.signal), fs=gv.fs, nperseg=nperseg)
    # measured FWHM of the Lorentzian line
    half = psd.max() / 2
    above = f[psd > half]
    fwhm = above.max() - above.min()
    print(f"lw = {lw/1e6:5.0f} MHz  ->  measured FWHM = {fwhm/1e6:6.1f} MHz")
    if "--show" in sys.argv:
        import matplotlib.pyplot as plt
        plt.plot(f * 1e-6, dbm(psd), label=f"{lw/1e6:.0f} MHz", lw=2)

if "--show" in sys.argv:
    import matplotlib.pyplot as plt
    plt.xlabel("Frequency [MHz]")
    plt.ylabel("PSD [dBm]")
    plt.xlim(-300, 300)
    plt.legend()
    plt.show()
