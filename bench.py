"""Headline benchmark: SSFM throughput on a 2^24-sample OOK link
(BASELINE.json metric).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` is the speedup over the locally measured reference
(armando-palacio/opticomlib) NumPy FIBER on this container's CPU
(BASELINE_MEASURED.json, produced by scripts/measure_reference.py — the
reference publishes no numbers, see BASELINE.md).

Identical physics config to the reference measurement: 50 km NLSE
(alpha=0.2 dB/km, beta2=-21 ps^2/km, gamma=1.3 /W/km), adaptive split-step
with phi_max=0.01, 20 mW peak OOK input -> ~130 steps of 2 FFTs each.

All device boundaries are planar float32 (re, im) — this runtime cannot
transfer complex arrays host<->device.  Timing is synchronized by an
int32 step-count readback (block_until_ready is unreliable on the axon
tunnel), which costs one scalar round-trip per rep.
"""
import json
import os
import time

import numpy as np


N_BITS = 2**18
SPS = 64
N = N_BITS * SPS  # 2^24 samples
CFG = dict(length=50.0, alpha=0.2, beta_2=-21.0, gamma=1.3, phi_max=0.01)
PEAK_W = 0.02


def main():
    import jax
    import jax.numpy as jnp

    from opticomlib_tpu.ops import ssfm

    rng = np.random.default_rng(42)
    bits = rng.integers(0, 2, N_BITS)
    A = (np.repeat(bits, SPS) * np.sqrt(PEAK_W)).astype(np.complex64)
    w = 2 * np.pi * np.fft.fftfreq(N) * 10e9 * SPS
    phi_w = ssfm.dispersion_phase(w, CFG["beta_2"], 0.0)
    a_km = ssfm.alpha_per_km(CFG["alpha"])

    Are = jax.device_put(np.ascontiguousarray(A.real))
    Aim = jax.device_put(np.ascontiguousarray(A.imag))
    phi_w = jax.device_put(phi_w)

    maxP0 = float(np.max(A.real**2 + A.imag**2))
    h0 = min(CFG["phi_max"] / (CFG["gamma"] * maxP0), CFG["length"])

    def run():
        re, im, steps = ssfm._ssfm_loop(
            Are, Aim, phi_w, CFG["length"], CFG["gamma"],
            CFG["phi_max"], h0, a_km, adaptive=True)
        return int(steps)  # scalar readback = synchronization point

    n_steps = run()  # warmup (compile)

    reps = 3
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)

    samples_per_s = N / best

    vs = 0.0
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BASELINE_MEASURED.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            ref = json.load(f)
        if ref.get("samples_per_s"):
            vs = samples_per_s / ref["samples_per_s"]

    print(json.dumps({
        "metric": "ssfm_2e24_ook_throughput",
        "value": round(samples_per_s, 1),
        "unit": "samples/s/chip",
        "vs_baseline": round(vs, 2),
        "detail": {"n_steps": n_steps, "wall_s": round(best, 3)},
    }))


if __name__ == "__main__":
    main()
