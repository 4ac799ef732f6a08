"""Config-4 (20x80 km + DBP) o4 calibration: self-consistent round trip
against an ABSOLUTE target, cross-checked by an independent forward
oracle.

Config 4's operational metric is the **round-trip residual**: per-span
DBP inverts the amplified link, and ``||out - in|| / ||in||`` is the
scheme's self-inversion fidelity (the reference's own test oracle,
reference tests/devices_test.py:271-277).  Round-4 advisor finding: the
old acceptance ("o4 rt <= parity rt") was vacuous because the parity
scheme's residual is 1.41 — fully decorrelated, i.e. the parity scheme
CANNOT invert this link at its bench settings at all.  This script
therefore:

1. records the parity scheme's residual as the honest capability gap
   (it is not a calibration target);
2. accepts the largest o4 step whose round-trip residual meets the
   ABSOLUTE target ``RT_TARGET`` (1e-2 — comfortably below any
   decision-relevant level);
3. cross-checks against an INDEPENDENT accuracy oracle: the forward
   20-span output of the *local-error* scheme (adaptive true-Strang +
   Richardson — a different discretization family) at tol=1e-5, and
   records each candidate's forward error vs that truth, so the chosen
   h is justified by solution accuracy, not only self-inversion.

Merges a ``config4`` entry into EQUAL_ACCURACY.json for bench.py's
``config4_dbp_o4_roundtrip`` row.  All programs keep ``h`` traced so
ONE compile serves the whole grid.

Usage: python scripts/calibrate_dbp_o4.py
"""
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N = 2**20
SPS = 16
R = 10e9
N_SPANS = 20
SPAN_KM = 80.0
ALPHA, BETA2, GAMMA = 0.2, -21.0, 1.3
PHI_MAX = 0.05
PEAK_W = 0.005
RT_TARGET = 1e-2  # absolute round-trip residual target (round-5)


def main():
    import jax
    import jax.numpy as jnp

    import opticomlib_tpu  # noqa: F401  (enables the compile cache)
    from opticomlib_tpu.ops import ssfm

    rng = np.random.default_rng(4)
    bits = rng.integers(0, 2, N // SPS)
    A = (np.repeat(bits, SPS) * np.sqrt(PEAK_W)).astype(np.complex64)
    w = 2 * np.pi * np.fft.fftfreq(N) * R * SPS
    phi_w = jax.device_put(ssfm.dispersion_phase(w, BETA2, 0.0))
    a_km = ssfm.alpha_per_km(ALPHA)
    Are = jax.device_put(np.ascontiguousarray(A.real))
    Aim = jax.device_put(np.ascontiguousarray(A.imag))
    gain = np.float32(10 ** (ALPHA * SPAN_KM / 20))

    from functools import partial

    @jax.jit
    def rt_parity(re, im, phi_w):
        """Forward 20 spans (adaptive parity scheme) + 20 DBP spans."""
        def span(carry, _, sgn):
            A, nst = carry
            if sgn < 0:
                A = A / gain
            maxP0 = jnp.max(A.real**2 + A.imag**2)
            h0 = jnp.minimum(jnp.float32(PHI_MAX) / (GAMMA * maxP0),
                             jnp.float32(SPAN_KM))
            A, s = ssfm.ssfm_while_inside(
                A, sgn * phi_w, SPAN_KM, sgn * GAMMA, PHI_MAX, h0,
                sgn * a_km, adaptive=True)
            if sgn > 0:
                A = A * gain
            return (A, nst + s), None

        A0 = jax.lax.complex(re, im)
        (A1, nst), _ = jax.lax.scan(partial(span, sgn=1.0),
                                    (A0, jnp.int32(0)), None,
                                    length=N_SPANS)
        (A2, nst), _ = jax.lax.scan(partial(span, sgn=-1.0),
                                    (A1, nst), None, length=N_SPANS)
        return A2.real, A2.imag, nst

    @jax.jit
    def rt_o4(re, im, phi_w, h):
        """Same chain with fixed-step o4 spans (h traced: one compile
        for the whole grid).  fft+ifft pairs = 3 * steps."""
        w1 = jnp.float32(ssfm._W1)
        w0 = jnp.float32(ssfm._W0)
        L = jnp.float32(SPAN_KM)
        h_floor = L * jnp.float32(1.5e-7)

        def o4_span(A, sgn):
            pw = sgn * phi_w
            g = jnp.float32(sgn * GAMMA)
            al = jnp.float32(sgn * a_km)

            def cond(c):
                return jnp.logical_and(c[1] < L,
                                       c[2] < jnp.int32(400_000))

            def body(c):
                x, z, k = c
                hh = jnp.maximum(jnp.minimum(h, L - z), h_floor)
                for wgt in (w1, w0, w1):
                    x = ssfm._strang_step(x, pw, al, hh * wgt, g)
                return x, z + hh, k + 1

            A, _, k = jax.lax.while_loop(
                cond, body, (A, jnp.float32(0.0), jnp.int32(0)))
            return A, k

        def span(carry, _, sgn):
            A, nst = carry
            if sgn < 0:
                A = A / gain
            A, k = o4_span(A, sgn)
            if sgn > 0:
                A = A * gain
            return (A, nst + k), None

        A0 = jax.lax.complex(re, im)
        (A1, nst), _ = jax.lax.scan(partial(span, sgn=1.0),
                                    (A0, jnp.int32(0)), None,
                                    length=N_SPANS)
        (A2, nst), _ = jax.lax.scan(partial(span, sgn=-1.0),
                                    (A1, nst), None, length=N_SPANS)
        return A2.real, A2.imag, nst

    # ---- independent FORWARD truth: 20 amplified spans with the
    # local-error scheme (different discretization family) ----
    @jax.jit
    def fwd_le(re, im, phi_w):
        def span(A, _):
            A, _steps = ssfm.ssfm_local_error_inside(
                A, phi_w, jnp.float32(SPAN_KM), jnp.float32(GAMMA),
                jnp.float32(1e-5), jnp.float32(SPAN_KM / 20),
                jnp.float32(a_km))
            return A * gain, None

        A0 = jax.lax.complex(re, im)
        A1, _ = jax.lax.scan(span, A0, None, length=N_SPANS)
        return A1.real, A1.imag

    @jax.jit
    def fwd_o4(re, im, phi_w, h):
        """Forward-only o4 chain (first half of rt_o4) for the forward-
        error cross-check."""
        w1 = jnp.float32(ssfm._W1)
        w0 = jnp.float32(ssfm._W0)
        L = jnp.float32(SPAN_KM)
        h_floor = L * jnp.float32(1.5e-7)

        def span(A, _):
            def cond(c):
                return jnp.logical_and(c[1] < L, c[2] < jnp.int32(400_000))

            def body(c):
                x, z, k = c
                hh = jnp.maximum(jnp.minimum(h, L - z), h_floor)
                for wgt in (w1, w0, w1):
                    x = ssfm._strang_step(x, phi_w, jnp.float32(a_km),
                                          hh * wgt, jnp.float32(GAMMA))
                return x, z + hh, k + 1

            A, _, _ = jax.lax.while_loop(
                cond, body, (A, jnp.float32(0.0), jnp.int32(0)))
            return A * gain, None

        A0 = jax.lax.complex(re, im)
        A1, _ = jax.lax.scan(span, A0, None, length=N_SPANS)
        return A1.real, A1.imag

    def rel_rt_err(re, im):
        out = np.asarray(re) + 1j * np.asarray(im)
        return float(np.linalg.norm(out - A) / np.linalg.norm(A))

    def rel_err_vs(re, im, ref):
        out = np.asarray(re) + 1j * np.asarray(im)
        return float(np.linalg.norm(out - ref) / np.linalg.norm(ref))

    t0 = time.perf_counter()
    tre, tim = fwd_le(Are, Aim, phi_w)
    fwd_truth = np.asarray(tre) + 1j * np.asarray(tim)
    print(f"[dbp-cal] forward truth (local_error tol=1e-5 x {N_SPANS} "
          f"spans): {time.perf_counter() - t0:.1f} s", flush=True)

    t0 = time.perf_counter()
    re, im, nst = rt_parity(Are, Aim, phi_w)
    e_par = rel_rt_err(re, im)
    n_par = int(nst)
    print(f"[dbp-cal] parity (phi_max={PHI_MAX}): {n_par} steps "
          f"({n_par} fft-pairs), rt err {e_par:.4g} "
          f"{'(CANNOT invert at this setting)' if e_par > 0.5 else ''}, "
          f"{time.perf_counter() - t0:.1f} s", flush=True)

    match = None
    for h in (20.0, 16.0, 10.0, 8.0, 5.0, 4.0, 2.5, 2.0, 1.0):
        t0 = time.perf_counter()
        re, im, nst = rt_o4(Are, Aim, phi_w, jnp.float32(h))
        e = rel_rt_err(re, im)
        fre, fim = fwd_o4(Are, Aim, phi_w, jnp.float32(h))
        e_fwd = rel_err_vs(fre, fim, fwd_truth)
        pairs = 3 * int(nst)
        print(f"[dbp-cal] o4 h={h}: {pairs} fft-pairs, rt err {e:.4g}, "
              f"fwd err vs local_error truth {e_fwd:.4g}, "
              f"{time.perf_counter() - t0:.1f} s", flush=True)
        if e <= RT_TARGET:
            match = {"h": h, "rt_error": e, "fwd_error": e_fwd,
                     "fft_pairs": pairs}
            break

    path = os.path.join(ROOT, "EQUAL_ACCURACY.json")
    data = json.load(open(path)) if os.path.exists(path) else {}
    data["config4"] = {
        "metric": "self-consistent DBP round trip vs ABSOLUTE target "
                  f"{RT_TARGET} (reference oracle "
                  "devices_test.py:271-277); fwd_error = forward chain "
                  "vs an independent local_error tol=1e-5 truth",
        "rt_target": RT_TARGET,
        "parity": {"phi_max": PHI_MAX, "rt_error": e_par,
                   "fft_pairs": n_par,
                   "note": "the parity scheme does NOT invert this link "
                           "at its bench settings (residual ~sqrt(2) = "
                           "decorrelated); recorded as the capability "
                           "gap, NOT used as a calibration target"},
        "o4": match,
    }
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    print(f"[dbp-cal] wrote config4 entry -> {path}")


if __name__ == "__main__":
    main()
