"""Raised-cosine pulse shaping eye diagram
(reference examples/rcos.py).

Shapes a PRBS-9 with a beta=0.5 raised-cosine FIR through DAC and runs
the blind eye metrology on the result; prints the estimated eye
parameters (the RC pulse's zero-ISI property shows up as level means at
0/1 with tiny sigmas).

Run:  python examples/rcos_pulse_eye.py [--show]
"""
try:  # running from a source checkout without an install
    import opticomlib_tpu  # noqa: F401
except ModuleNotFoundError:
    import os as _os, sys as _sys
    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
import sys

import numpy as np

from opticomlib_tpu import gv
from opticomlib_tpu.devices import DAC, GET_EYE, PRBS

beta = 0.5
gv(sps=32, R=10e9, N=511)

tx = PRBS(order=9)
v = DAC(tx, pulse_shape="rcos", beta=beta, rcos_type="normal")

eye = GET_EYE(v, nslots=gv.N)
print(f"raised cosine (beta={beta}) eye:")
print(f"  mu0/mu1 = {eye.mu0:.3f}/{eye.mu1:.3f}  "
      f"s0/s1 = {eye.s0:.3f}/{eye.s1:.3f}")
print(f"  eye height = {eye.eye_h:.3f}, threshold = {eye.threshold:.3f}")

# zero-ISI sanity: mid-slot samples sit on the bit values
mid = np.asarray(v.signal).real[gv.sps // 2::gv.sps]
err = np.max(np.abs(np.round(mid) - tx.data[:mid.size]))
print(f"  max mid-slot deviation from bits: {err:.3f}")

if "--show" in sys.argv:
    import matplotlib.pyplot as plt
    v.plot_eye(title=f"Raised Cosine Pulse (beta={beta})")
    plt.ylim(-0.3, 1.3)
    plt.show()
