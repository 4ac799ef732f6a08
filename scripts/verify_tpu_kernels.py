"""On-hardware verification of every Pallas kernel (run on the real TPU).

The default test suite exercises these kernels through the Pallas
interpreter on CPU (tests/test_pallas.py); this harness runs the compiled
TPU path.  Fresh remote compiles take minutes per kernel through the axon
tunnel — set JAX_COMPILATION_CACHE_DIR to make reruns fast.

Known hardware-vs-NumPy divergence (not a bug): the deterministic ADC
computes ``floor((x-lo)/step + 0.5)`` with TPU FMA rounding; samples whose
scaled value lands exactly on a .5 tie can quantize one level away from
the NumPy oracle.  The check below allows a one-level difference at ties
only (measured: 1 sample in 2^18 standard-normal draws).
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

# runnable as `python scripts/verify_tpu_kernels.py` without installing;
# PYTHONPATH can't be used (it would displace the axon sitecustomize)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opticomlib_tpu.ops import pallas_kernels as pk  # noqa: E402


def check(name, ok, t0):
    status = "ok" if ok else "FAIL"
    print(f"{name:16s} {status}   ({time.time() - t0:.1f}s)", flush=True)
    return ok


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    n = 1 << 18
    re = rng.standard_normal(n).astype(np.float32) * 0.1
    im = rng.standard_normal(n).astype(np.float32) * 0.1
    results = []

    t0 = time.time()
    br, bi, hr, hi = pk.nl_halfstep(jnp.asarray(re), jnp.asarray(im), 0.37)
    phi = 0.37 * (re**2 + im**2)
    exp = (re + 1j * im) * np.exp(1j * phi)
    results.append(check("nl_halfstep", (
        np.allclose(np.asarray(br), exp.real, atol=2e-6)
        and np.allclose(np.asarray(bi), exp.imag, atol=2e-6)
        and np.allclose(np.asarray(hr), np.cos(phi), atol=2e-6)), t0))

    t0 = time.time()
    or_, oi_ = pk.cmul(jnp.asarray(re), jnp.asarray(im),
                       jnp.asarray(im), jnp.asarray(re))
    expc = (re + 1j * im) * (im + 1j * re)
    results.append(check("cmul", (
        np.allclose(np.asarray(or_), expc.real, atol=2e-6)
        and np.allclose(np.asarray(oi_), expc.imag, atol=2e-6)), t0))

    h = rng.standard_normal(63).astype(np.float32)
    x = rng.standard_normal(n).astype(np.float32)
    yref = np.convolve(x, h)[:n]

    t0 = time.time()
    y = np.asarray(pk.fir_filter(jnp.asarray(x), h))
    results.append(check("fir_filter", np.allclose(y, yref, atol=1e-3), t0))

    t0 = time.time()
    y2 = np.asarray(pk.fir_filter_matmul(jnp.asarray(x), h))
    results.append(check("fir_matmul", np.allclose(y2, yref, atol=1e-3), t0))

    lo, hi_, nbits = -3.0, 3.0, 6
    levels = 2 ** nbits
    step = (hi_ - lo) / (levels - 1)

    t0 = time.time()
    q = np.asarray(pk.adc_quantize(jnp.asarray(x), lo, hi_, nbits))
    qref = lo + np.clip(np.floor((x - lo) / step + 0.5), 0, levels - 1) * step
    bad = q != qref
    # one-level flips allowed only where the scaled value sits on a .5 tie
    frac = np.abs(((x[bad] - lo) / step + 0.5) % 1.0)
    tie = np.minimum(frac, 1.0 - frac) < 1e-5
    lvl = np.abs(q[bad] - qref[bad]) <= step + 1e-6
    results.append(check("adc_quantize", bool(np.all(tie & lvl)), t0))

    t0 = time.time()
    qs = np.asarray(pk.adc_quantize(jnp.asarray(x), lo, hi_, nbits,
                                    stochastic=True, seed=7))
    inside = (x > lo) & (x < hi_)
    results.append(check("adc_stochastic", bool(
        np.all(np.abs(qs[inside] - x[inside]) <= step + 1e-5)), t0))

    t0 = time.time()
    ti = rng.integers(0, 64, 1 << 16).astype(np.float32)
    yi = rng.integers(0, 128, 1 << 16).astype(np.float32)
    H = np.asarray(pk.histogram2d(jnp.asarray(ti), jnp.asarray(yi), 64, 128))
    Href, *_ = np.histogram2d(
        ti, yi, bins=[np.arange(65) - 0.5, np.arange(129) - 0.5])
    results.append(check("histogram2d", np.array_equal(H, Href), t0))

    print("ALL OK" if all(results) else "FAILURES", flush=True)
    return 0 if all(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
