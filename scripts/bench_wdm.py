"""WDM batching study: SSFM throughput of one 2^24 window vs 16 x 2^20
channels batched on the leading axis (same total samples, batched FFTs).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

K = 10


def make(body, *args):
    @jax.jit
    def fn(re, im):
        def it(_, c):
            return body(*c, *args)
        r, i = jax.lax.fori_loop(0, K, it, (re, im))
        return r.ravel()[0]
    return fn


def step(re, im, phi_w):
    # full SSFM step: NL half, linear, NL half (frozen NL, as the engine)
    phi = jnp.float32(0.01) * (re * re + im * im)
    c, s = jnp.cos(phi), jnp.sin(phi)
    A = jax.lax.complex(re * c - im * s, re * s + im * c)
    E = jax.lax.complex(jnp.cos(phi_w), jnp.sin(phi_w))
    A = jnp.fft.ifft(jnp.fft.fft(A, axis=-1) * E, axis=-1)
    return A.real * c - A.imag * s, A.real * s + A.imag * c


def timeit(fn, *args, reps=2):
    float(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / K


rng = np.random.default_rng(0)
for shape in [(2**24,), (16, 2**20), (64, 2**18), (16, 2**22)]:
    n = int(np.prod(shape))
    re = jax.device_put(rng.standard_normal(n).astype(np.float32).reshape(shape) * 0.1)
    im = jax.device_put(rng.standard_normal(n).astype(np.float32).reshape(shape) * 0.1)
    phi_w = jax.device_put(rng.standard_normal(shape[-1]).astype(np.float32) * 1e-3)
    t = timeit(make(step, phi_w), re, im)
    print(f"{str(shape):14s} {t*1e3:8.3f} ms/step  ({n/t/1e6:8.1f} Msamp/s)", flush=True)
