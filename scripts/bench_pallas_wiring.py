"""Measure-then-wire study for the Pallas kernel layer (round 2,
VERDICT item 4): on the real chip, compare each kernel in
ops/pallas_kernels.py against the production alternative at realistic
sizes, so each one is either wired in behind a measured win or rejected
with numbers (docs/performance.md records the outcome).

Run: python scripts/bench_pallas_wiring.py  (real TPU; ~2-4 min)
"""
import json
import time

import numpy as np


def _sync(x):
    # scalar readback only — np.asarray would pull the whole array
    # through the tunnel and dominate the measurement
    return float(x.ravel()[123])


def timeit(fn, reps=5):
    fn()  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def bench_fir():
    """DAC-realistic FIR: n=2^22 waveform, tap counts 257/513/2049."""
    import jax
    import jax.numpy as jnp

    from opticomlib_tpu.ops import pallas_kernels as pk
    from opticomlib_tpu.ops.pulses import fft_convolve_same

    n = 2**22
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.normal(size=n).astype(np.float32))

    results = {}
    for taps in (257, 513, 2049):
        h = np.hanning(taps).astype(np.float32)
        h_j = jax.device_put(h)

        fft_conv = jax.jit(lambda a, hh=jnp.asarray(h): fft_convolve_same(a, hh))
        # circular spectrum multiply (what the fused link uses)
        buf = np.zeros(n, np.float32)
        buf[:taps] = h
        Hc = np.fft.fft(np.roll(buf, -((taps - 1) // 2)))
        Hre = jax.device_put(Hc.real.astype(np.float32))
        Him = jax.device_put(Hc.imag.astype(np.float32))

        @jax.jit
        def circ(a, hr=Hre, hi=Him):
            H = jax.lax.complex(hr, hi)
            return jnp.fft.ifft(jnp.fft.fft(a) * H).real

        row = {
            "fft_conv_same_ms": timeit(lambda: _sync(fft_conv(x))) * 1e3,
            "circular_fft_ms": timeit(lambda: _sync(circ(x))) * 1e3,
        }
        import os
        if os.environ.get("TRY_PALLAS_DMA_FIR"):
            # measured 2026-08: the axon remote compiler returns HTTP 500
            # (tpu_compile_helper crash) or hangs on this kernel's
            # make_async_copy pattern — rejected as toolchain-unsupported
            try:
                row["pallas_dma_fir_ms"] = timeit(
                    lambda: _sync(pk.fir_filter(x, h))) * 1e3
            except Exception as exc:
                row["pallas_dma_fir_ms"] = f"FAIL: {str(exc)[:80]}"
        else:
            row["pallas_dma_fir_ms"] = \
                "SKIPPED: remote compiler HTTP 500/hang (TRY_PALLAS_DMA_FIR=1 to retry)"
        try:
            mm = jax.jit(lambda a: pk.fir_filter_matmul(a, h))
            row["matmul_fir_ms"] = timeit(lambda: _sync(mm(x))) * 1e3
        except Exception as exc:
            row["matmul_fir_ms"] = f"FAIL: {str(exc)[:80]}"
        results[f"taps_{taps}"] = row
    return results


def bench_adc():
    """ADC-realistic quantization: n=2^22, 8 bits."""
    import jax
    import jax.numpy as jnp

    from opticomlib_tpu.ops import pallas_kernels as pk

    n = 2**22
    rng = np.random.default_rng(1)
    x_host = rng.normal(size=n).astype(np.float32)
    x = jax.device_put(x_host)
    lo, hi, nbits = -3.0, 3.0, 8
    levels = 2**nbits
    step = (hi - lo) / (levels - 1)

    @jax.jit
    def xla_quant(a):
        q = jnp.floor((a - lo) / step + 0.5)
        q = jnp.clip(q, 0.0, float(levels - 1))
        return lo + q * step

    def host_quant():
        dig = np.round((x_host - lo) / (hi - lo) * (levels - 1))
        return (dig / (levels - 1) * (hi - lo) + lo)[0]

    out = {
        "xla_quant_ms": timeit(lambda: _sync(xla_quant(x))) * 1e3,
        "host_numpy_ms": timeit(host_quant) * 1e3,
    }
    try:
        out["pallas_quant_ms"] = timeit(
            lambda: _sync(pk.adc_quantize(x, lo, hi, nbits))) * 1e3
        out["pallas_stochastic_ms"] = timeit(
            lambda: _sync(pk.adc_quantize(x, lo, hi, nbits,
                                          stochastic=True))) * 1e3
    except Exception as exc:
        out["pallas_quant_ms"] = f"FAIL: {str(exc)[:80]}"
    return out


def bench_hist():
    """Eye-density-realistic 2-D histogram: 2^21 (t, y) pairs, 256x256."""
    import jax
    import jax.numpy as jnp

    from opticomlib_tpu.ops import pallas_kernels as pk

    n, nt, ny = 2**21, 256, 256
    rng = np.random.default_rng(2)
    t_host = rng.integers(0, nt, n).astype(np.float32)
    y_host = rng.integers(0, ny, n).astype(np.float32)
    t = jax.device_put(t_host)
    y = jax.device_put(y_host)

    @jax.jit
    def xla_hist(ti, yi):
        flat = ti.astype(jnp.int32) * ny + yi.astype(jnp.int32)
        counts = jnp.zeros((nt * ny,), jnp.float32)
        return counts.at[flat].add(1.0).reshape(nt, ny)

    def host_hist():
        H, _, _ = np.histogram2d(t_host, y_host, bins=(nt, ny),
                                 range=((0, nt), (0, ny)))
        return H[0, 0]

    out = {
        "xla_scatter_add_ms": timeit(lambda: _sync(xla_hist(t, y))) * 1e3,
        "host_numpy_ms": timeit(host_hist) * 1e3,
    }
    try:
        out["pallas_mxu_hist_ms"] = timeit(
            lambda: _sync(pk.histogram2d(t, y, nt, ny))) * 1e3
    except Exception as exc:
        out["pallas_mxu_hist_ms"] = f"FAIL: {str(exc)[:80]}"
    return out


def main():
    import jax
    print("backend:", jax.default_backend())
    res = {"fir": bench_fir(), "adc": bench_adc(), "hist": bench_hist()}
    print(json.dumps(res, indent=1, default=str))


if __name__ == "__main__":
    main()
