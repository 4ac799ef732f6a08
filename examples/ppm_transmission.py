"""M=8 PPM transmission with matched optical filtering and soft-decision
decoding (BASELINE config 3).

Run:  python examples/ppm_transmission.py
"""
try:  # running from a source checkout without an install
    import opticomlib_tpu  # noqa: F401
except ModuleNotFoundError:
    import os as _os, sys as _sys
    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
import numpy as np

from opticomlib_tpu import gv
from opticomlib_tpu.devices import BPF, DAC, LASER, MZM, PD, PRBS
from opticomlib_tpu.models import ppm

gv(sps=32, R=10e9, wavelength=1550e-9, N=2**10).print()
np.random.seed(0)

M = 8  # slots per symbol (3 bits/symbol)
k = int(np.log2(M))

# gv.N is the total SLOT count of the frame: N/M symbols -> k*N/M bits
tx_bits = PRBS(order=9, len=(gv.N // M) * k)
ppm_slots = ppm.PPM_ENCODER(tx_bits, M)

v = DAC(ppm_slots, Vpp=5, offset=-2.5, pulse_shape="gaussian")
laser = LASER(P0=8)
mod = MZM(laser, v, bias=-2.5, Vpi=5, loss_dB=3, ER_dB=26,
          BW=1.5 * gv.R)  # matched optical band-pass
pd_out = PD(mod, BW=0.75 * gv.R, include_noise="all")

for decision in ("hard", "soft"):
    rx_bits = ppm.DSP(pd_out, M, decision=decision)
    ber = ppm.BER_analizer("counter", Tx=tx_bits, Rx=rx_bits)
    print(f"{decision}-decision BER: {ber:.2e} "
          f"({ber * tx_bits.size:.0f} errors / {tx_bits.size} bits)")
