"""Fused end-to-end OOK link: the whole TX -> channel -> RX chain as ONE
XLA program (round-2 flagship; compare the staged equivalent in
examples/ook_transmission_fiber_simulation.py, which mirrors the
reference's canonical script).

Run: python examples/fused_link.py
"""
try:  # running from a source checkout without an install
    import opticomlib_tpu  # noqa: F401
except ModuleNotFoundError:
    import os as _os, sys as _sys
    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
import numpy as np

from opticomlib_tpu import gv
from opticomlib_tpu.link import EDFASpec, FiberSpec, LinkSpec, build_link

gv(sps=32, R=10e9, wavelength=1550e-9, N=2**14)

spec = LinkSpec(
    # TX: gaussian pulse shaping, MZM at quadrature
    pulse_shape="gaussian", Vpp=5, offset=-2.5, bias=-2.5, Vpi=5,
    P0=5, lw=100e3, rin=-150,          # laser: 100 kHz linewidth, RIN
    loss_dB=3, ER_dB=26,
    # channel: 50 km NLSE fiber + EDFA with physical ASE
    stages=(FiberSpec(length=50, alpha=0.2, beta_2=-21.0, gamma=1.3),
            EDFASpec(G=10, NF=5)),
    # RX: PIN PD with thermal+shot noise, 7.5 GHz Bessel LPF
    pd_BW=7.5e9,
)

prog = build_link(spec, n_bits=gv.N)      # compiles the whole chain once
res = prog.run(seed=42)                   # PRBS -> ... -> RX, reproducible

print(f"n = {prog.n} samples in one program")
print(f"BER (eye-threshold decision): {res.ber():.2e}")

# the output is a normal ElectricalSignal: host DSP/plotting just works
from opticomlib_tpu import ook  # noqa: E402

rx, eye_obj, rth = ook.DSP(res.v)
print(f"ook.DSP threshold = {rth:.3f},  ER = {eye_obj.er:.1f} dB")
print("BER via ook stack:",
      ook.BER_analizer("counter", Tx=res.tx, Rx=rx))

# same seed -> bit-identical waveform
res2 = prog.run(seed=42)
assert np.array_equal(res.v.to_numpy(), res2.v.to_numpy())
print("reproducibility: OK")
