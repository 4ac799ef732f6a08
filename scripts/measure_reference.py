"""Measure the reference (armando-palacio/opticomlib) FIBER throughput on
this host's CPU — the comparison baseline for bench.py (the reference
publishes no numbers; BASELINE.md mandates measuring locally).

Writes BASELINE_MEASURED.json with samples/s for the bench config.
"""
import json
import sys
import time
import types

sys.path.insert(0, "/root/reference")
# pympler is absent in this image; the reference only uses it for a
# pretty-printed sizeof, so a zero stub is behavior-neutral here.
m = types.ModuleType("pympler")
a = types.ModuleType("pympler.asizeof")
a.asizeof = lambda x: 0
m.asizeof = a
sys.modules["pympler"] = m
sys.modules["pympler.asizeof"] = a

import numpy as np  # noqa: E402
from opticomlib import gv, optical_signal  # noqa: E402
from opticomlib.devices import FIBER  # noqa: E402

# Bench config (BASELINE.json config 2 flavor): 2^24-sample OOK waveform,
# 50 km NLSE with dispersion + Kerr + attenuation, adaptive steps.
N_BITS = 2**18
SPS = 64
N = N_BITS * SPS  # 2^24 samples
CFG = dict(length=50.0, alpha=0.2, beta_2=-21.0, gamma=1.3, phi_max=0.01)
PEAK_W = 0.02  # 20 mW peak -> ~130 adaptive steps


def make_input():
    gv(sps=SPS, R=10e9, N=N_BITS)
    rng = np.random.default_rng(42)
    bits = rng.integers(0, 2, N_BITS)
    x = np.repeat(bits, SPS).astype(np.float32) * np.sqrt(PEAK_W)
    return optical_signal(x.astype(np.complex64))


def main():
    op = make_input()
    n_rep = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    # warmup-free: the reference has no compilation stage
    times = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        out = FIBER(op, **CFG)
        times.append(time.perf_counter() - t0)
    best = min(times)
    result = {
        "what": "reference opticomlib FIBER, NumPy CPU backend",
        "config": CFG,
        "n_samples": N,
        "peak_power_W": PEAK_W,
        "wall_s": best,
        "samples_per_s": N / best,
        "host": "bench container CPU",
    }
    print(json.dumps(result))
    with open("/root/repo/BASELINE_MEASURED.json", "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
