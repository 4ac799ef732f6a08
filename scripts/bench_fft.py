"""Microbench: XLA 1D FFT at 2^24 vs manual four-step decomposition.

Each timed fn runs K iterations inside one jit call (fori_loop) to amortize
the ~24 ms axon-tunnel round-trip; reported time is per iteration.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

N = 2**24
R = 4096
C = N // R
K = 10

rng = np.random.default_rng(0)
re = jax.device_put(rng.standard_normal(N).astype(np.float32) * 0.01)
im = jax.device_put(rng.standard_normal(N).astype(np.float32) * 0.01)

r_idx = np.arange(R, dtype=np.float64)[:, None]
c_idx = np.arange(C, dtype=np.float64)[None, :]
ang = -2.0 * np.pi * r_idx * c_idx / N
tw = np.exp(1j * ang).astype(np.complex64)
tw_re = jax.device_put(np.ascontiguousarray(tw.real))
tw_im = jax.device_put(np.ascontiguousarray(tw.imag))
phi_np = (np.random.default_rng(1).standard_normal(N) * 1e-3).astype(np.float32)
phi_w = jax.device_put(phi_np)
phi_2d = jax.device_put(phi_np.reshape(C, R).T.copy())  # permuted for 4-step order


def loopify(body):
    @jax.jit
    def fn(re, im):
        def it(_, carry):
            return body(*carry)
        re2, im2 = jax.lax.fori_loop(0, K, it, (re, im))
        return re2[0]
    return fn


def b_xla_pair(re, im):
    A = jax.lax.complex(re, im)
    B = jnp.fft.ifft(jnp.fft.fft(A))
    return B.real, B.imag


def b_xla_linstep(re, im):
    # full linear step: fft, *exp(i phi), ifft
    A = jax.lax.complex(re, im)
    F = jnp.fft.fft(A)
    E = jax.lax.complex(jnp.cos(phi_w), jnp.sin(phi_w))
    B = jnp.fft.ifft(F * E)
    return B.real, B.imag


def b_fourstep_linstep(re, im):
    # forward 4-step (output in transposed digit order), apply permuted
    # phase, inverse 4-step back to natural order. Mathematically exact if
    # the phase mask is permuted to match — here we just use phi_2d for cost.
    A = jax.lax.complex(re, im).reshape(R, C)
    A = jnp.fft.fft(A, axis=0)
    A = A * jax.lax.complex(tw_re, tw_im)
    A = jnp.fft.fft(A, axis=1)            # A[k1, k2] ~ X[k1 + R k2] -> (R,C)?
    # apply phase in this order
    E = jax.lax.complex(jnp.cos(phi_2d.T.reshape(R, C)), jnp.sin(phi_2d.T.reshape(R, C)))
    A = A * E
    # inverse: ifft rows, conj twiddle, ifft cols
    A = jnp.fft.ifft(A, axis=1)
    A = A * jax.lax.complex(tw_re, -tw_im)
    A = jnp.fft.ifft(A, axis=0)
    B = A.reshape(-1)
    return B.real, B.imag


def b_nl(re, im):
    phi = jnp.float32(0.01) * (re * re + im * im)
    c, s = jnp.cos(phi), jnp.sin(phi)
    return re * c - im * s, re * s + im * c


def b_full_step(re, im):
    r2, i2 = b_nl(re, im)
    r3, i3 = b_xla_linstep(r2, i2)
    return b_nl(r3, i3)


def b_maxP(re, im):
    m = jnp.max(re * re + im * im)
    return re * (m * 0 + 1), im


def timeit(fn, *args, reps=2):
    float(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / K


for name, body in [("fft+ifft", b_xla_pair),
                   ("linstep(xla)", b_xla_linstep),
                   ("linstep(4step)", b_fourstep_linstep),
                   ("nl_pointwise", b_nl),
                   ("maxP_reduce", b_maxP),
                   ("full_ssfm_step", b_full_step)]:
    t = timeit(loopify(body), re, im)
    import sys; sys.stdout.flush()
    print(f"{name:16s} {t*1e3:8.3f} ms/iter   ({N/t/1e6:7.1f} Msamp/s)")
