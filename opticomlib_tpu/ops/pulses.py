"""Pulse shaping and FFT-based resampling/convolution kernels.

TPU-native DSP primitives replacing the reference's scipy pipeline:

* pulse shapes   (reference opticomlib/utils.py:1791-1946)
* ``upfir``      (reference opticomlib/utils.py:1949-1981; zero-stuff
  upsampling + fftconvolve(mode='same'))
* FFT resampling (scipy.signal.resample semantics, used by reference
  devices.py:1745 GET_EYE and devices.py:1616 ADC)

The convolutions run as XLA FFTs (jnp) so the TX chain jits end-to-end;
the (tiny) filter taps are built host-side with NumPy and become constants
under jit.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "nrz_pulse", "gauss_pulse", "rcos_pulse",
    "fft_convolve_same", "upsample_zero_stuff", "upfir", "resample_fft",
]


# ---------------------------------------------------------------------------
# pulse shapes (host-side constants; reference utils.py:1791-1946)
# ---------------------------------------------------------------------------
def nrz_pulse(span: int, sps: int, T: float = 1) -> np.ndarray:
    """Rectangular pulse of width ``T`` slots over ``span`` slots."""
    N = span * sps
    t = np.linspace(-span / 2, span / 2, N + 1)
    return np.where((t >= -T / 2) & (t < T / 2), 1.0, 0.0)


def gauss_pulse(span: int, sps: int, T: float = 1, m: int = 1,
                c: float = 0.0) -> np.ndarray:
    """(Super-)Gaussian pulse of FWHM ``T`` slots, order ``m``, chirp ``c``.

    NOTE reference parity quirk (utils.py:1918-1921): the chirp factor
    ``(1+1j*c)`` sits *inside* the ``**(2*m)`` power, so the magnitude
    depends on ``c`` and diverges for ``|c| >= 1`` (the textbook chirped
    Gaussian is ``exp(-(1+ic)(at)^(2m))`` with chirp-independent
    magnitude).  Kept bit-for-bit for drop-in equivalence; pass a custom
    ``h`` to DAC for the textbook form."""
    N = span * sps
    t = np.linspace(-span / 2, span / 2, N + 1)
    alpha = 2 * np.sqrt(np.log(2)) / T
    return np.exp(-((alpha * (1 + 1j * c) * t) ** (2 * m)))


def rcos_pulse(beta: float, span: int, sps: int,
               shape: str = "sqrt") -> np.ndarray:
    """Raised-cosine / root-raised-cosine impulse response (MATLAB
    ``rcosdesign`` semantics; behavioral spec: reference utils.py:1791-1878).

    Evaluated through singularity-free sinc identities instead of the
    textbook rational forms, so no limit special-casing is needed anywhere
    (``np.sinc`` handles its own removable zero):

    * **RC.**  ``cos(pi b t) / (1 - (2 b t)^2)`` decomposes by partial
      fractions into ``(pi/4) * [sinc(b t + 1/2) + sinc(b t - 1/2)]``,
      giving ``h(t) = sinc(t) * (pi/4) * [sinc(bt+1/2) + sinc(bt-1/2)]``.
    * **RRC.**  Integrating the square-root spectrum
      (flat to ``(1-b)/2``, cosine roll-off to ``(1+b)/2``) band by band
      and folding the roll-off integrals with product-to-sum identities
      yields ``h(t) = (1-b) sinc((1-b) t)
      + b [sinc(bt - 1/4) cos(pi t - pi/4) - sinc(bt + 1/4) sin(pi t - pi/4)]``.

    Both collapse to ``sinc(t)`` at ``beta = 0`` with no branch, and agree
    with the rational forms (and their L'Hopital limits at ``t = 0``,
    ``1/(2 beta)``, ``1/(4 beta)``) to float64 round-off.
    """
    if not (0 <= beta <= 1):
        raise ValueError("beta must be in [0, 1]")
    shape = shape.lower()
    if shape not in ("sqrt", "normal"):
        raise ValueError("shape must be 'sqrt' or 'normal'")

    t = np.linspace(-span / 2, span / 2, span * sps + 1)
    if beta == 0:
        return np.sinc(t)

    if shape == "normal":
        return (np.sinc(t) * (np.pi / 4)
                * (np.sinc(beta * t + 0.5) + np.sinc(beta * t - 0.5)))

    a = np.pi * t - np.pi / 4
    return ((1 - beta) * np.sinc((1 - beta) * t)
            + beta * (np.sinc(beta * t - 0.25) * np.cos(a)
                      - np.sinc(beta * t + 0.25) * np.sin(a)))


# ---------------------------------------------------------------------------
# FFT convolution / upsampling (XLA path)
# ---------------------------------------------------------------------------
def _next_fast_len(n: int) -> int:
    """Next 5-smooth length >= n (FFT-friendly)."""
    if n <= 2:
        return n
    best = 1 << (n - 1).bit_length()  # fallback: next pow2
    p5 = 1
    while p5 < best:
        p35 = p5
        while p35 < best:
            x = p35
            while x < n:
                x *= 2
            if x < best:
                best = x
            p35 *= 3
        p5 *= 5
    return best


def _xp(*arrays):
    """Array namespace dispatch: jnp when any input is a jax array (keeps
    the op jit-traceable / device-resident), NumPy float64 otherwise (host
    parity path for the device-compatibility layer)."""
    return jnp if any(isinstance(a, jax.Array) for a in arrays) else np


def fft_convolve_same(x, h):
    """Linear convolution of ``x`` (last axis) with 1-D kernel ``h``,
    returning the central ``len(x)`` samples (scipy ``mode='same'``)."""
    xp = _xp(x, h)
    x = xp.asarray(x)
    h = xp.asarray(h)
    n = x.shape[-1]
    m = h.shape[-1]
    if xp is jnp and jax.default_backend() == "tpu":
        # XLA's TPU FFT strongly prefers powers of two: measured 32 ms vs
        # 420 ms for the same convolution padded to 2^23 vs the 5-smooth
        # 4_199_040 at n=2^22 (scripts/bench_pallas_wiring.py study)
        nfft = 1 << (n + m - 2).bit_length()
    else:
        nfft = _next_fast_len(n + m - 1)

    complex_out = np.iscomplexobj(x) or np.iscomplexobj(h)
    if complex_out:
        y = xp.fft.ifft(xp.fft.fft(x, nfft, axis=-1)
                        * xp.fft.fft(h, nfft), axis=-1)
    else:
        y = xp.fft.irfft(xp.fft.rfft(x, nfft, axis=-1)
                         * xp.fft.rfft(h, nfft), nfft, axis=-1)
    start = (m - 1) // 2
    return y[..., start:start + n]


def upsample_zero_stuff(x, up: int):
    """Insert ``up-1`` zeros between samples, with the reference's phase
    offset of ``up//2`` (reference utils.py:1975-1977)."""
    xp = _xp(x)
    x = xp.asarray(x)
    n = x.shape[-1]
    if xp is jnp:
        dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.inexact) else jnp.float32
        xu = jnp.zeros(x.shape[:-1] + (n, up), dtype=dtype)
        xu = xu.at[..., :, up // 2].set(x)
    else:
        dtype = x.dtype if np.issubdtype(x.dtype, np.inexact) else np.float64
        xu = np.zeros(x.shape[:-1] + (n, up), dtype=dtype)
        xu[..., :, up // 2] = x
    return xu.reshape(x.shape[:-1] + (n * up,))


def upfir(x, h, up: int = 1):
    """Zero-stuff upsample by ``up`` then FIR filter (mode='same').

    MATLAB ``upfirdn``-style (reference utils.py:1949-1981)."""
    xu = upsample_zero_stuff(x, up) if up > 1 else x
    return fft_convolve_same(xu, h)


def resample_fft(x, num: int):
    """FFT-domain resampling with ``scipy.signal.resample`` semantics
    (Nyquist-bin splitting on even lengths).  Real input -> real output."""
    xp = _xp(x)
    x = xp.asarray(x)
    n = x.shape[-1]
    if num == n:
        return x
    was_real = not np.iscomplexobj(x)
    X = xp.fft.fft(x, axis=-1)
    N = min(num, n)
    nyq = N // 2 + 1
    if xp is jnp:
        Y = jnp.zeros(x.shape[:-1] + (num,), dtype=X.dtype)
        Y = Y.at[..., :nyq].set(X[..., :nyq])
        if N > 2:
            Y = Y.at[..., num - (N - nyq):].set(X[..., n - (N - nyq):])
        if N % 2 == 0:
            if num < n:
                Y = Y.at[..., N // 2].add(X[..., n - N // 2])
            else:
                Y = Y.at[..., N // 2].multiply(0.5)
                Y = Y.at[..., num - N // 2].set(Y[..., N // 2])
    else:
        Y = np.zeros(x.shape[:-1] + (num,), dtype=X.dtype)
        Y[..., :nyq] = X[..., :nyq]
        if N > 2:
            Y[..., num - (N - nyq):] = X[..., n - (N - nyq):]
        if N % 2 == 0:
            if num < n:
                Y[..., N // 2] += X[..., n - N // 2]
            else:
                Y[..., N // 2] *= 0.5
                Y[..., num - N // 2] = Y[..., N // 2]
    y = xp.fft.ifft(Y, axis=-1) * (num / n)
    return y.real if was_real else y
