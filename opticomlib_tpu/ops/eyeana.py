"""Eye-diagram metrology as vectorized reductions.

TPU-native re-design of the reference's ``GET_EYE`` estimation pipeline
(reference: opticomlib/devices.py:1635-1868), which leans on
``sklearn.cluster.KMeans`` and ``scipy.stats.gaussian_kde``.  Here every
statistical kernel is re-derived as dependency-free vectorized reductions:

* 2-cluster 1-D KMeans  -> fixed-point Lloyd iterations on a threshold
  (deterministic min/max-quantile init instead of sklearn's random restarts);
* 2-cluster 2-D KMeans on the crossing band -> same Lloyd iterations with
  left/right deterministic init;
* shortest-interval level estimation -> sort + lag-window min (identical
  estimator to reference utils.py:1497-1537);
* ``gaussian_kde`` threshold -> explicit Gaussian-kernel density evaluated on
  a 500-point grid with Scott's-rule bandwidth (same rule scipy uses).

Outputs carry the same field names/meanings as the reference's eye dict so
downstream DSP (threshold estimation, BER estimators) is drop-in.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.analysis import shortest_int
from .pulses import resample_fft

__all__ = ["kmeans2_1d", "kmeans2_2d", "kde_min_threshold", "eye_metrics"]


def kmeans2_1d(y: np.ndarray, iters: int = 32):
    """Two-cluster Lloyd's algorithm on scalars.

    Deterministic initialization at the 10/90 percentiles; for bimodal eye
    amplitude data this converges to the same partition as sklearn's
    multi-restart KMeans (which the reference uses at devices.py:1757-1760).
    Returns (c0, c1) cluster centers, c0 <= c1.
    """
    y = np.asarray(y, dtype=np.float64).ravel()
    c0, c1 = np.quantile(y, 0.1), np.quantile(y, 0.9)
    if c0 == c1:
        return c0, c1
    for _ in range(iters):
        mid = 0.5 * (c0 + c1)
        lo = y <= mid
        n_lo = lo.sum()
        if n_lo == 0 or n_lo == y.size:
            break
        c0n = y[lo].mean()
        c1n = y[~lo].mean()
        if c0n == c0 and c1n == c1:
            break
        c0, c1 = c0n, c1n
    return float(c0), float(c1)


def kmeans2_2d(pts: np.ndarray, init: np.ndarray, iters: int = 32):
    """Two-cluster Lloyd's algorithm in 2-D (used on the (t, y) crossing
    band, reference devices.py:1782-1798).  Returns (2, 2) centers."""
    pts = np.asarray(pts, dtype=np.float64)
    centers = np.asarray(init, dtype=np.float64).copy()
    for _ in range(iters):
        d = ((pts[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
        lab = d.argmin(1)
        new = centers.copy()
        for k in (0, 1):
            sel = lab == k
            if sel.any():
                new[k] = pts[sel].mean(0)
        if np.allclose(new, centers):
            break
        centers = new
    return centers


def kde_min_threshold(y: np.ndarray, mu0: float, mu1: float,
                      npts: int = 500, nbins: int = 4096) -> Optional[float]:
    """Decision threshold at the minimum of the amplitude density between
    the two levels (reference devices.py:1852-1859).

    Bandwidth: Scott's rule ``n**(-1/5) * std(y)`` — the same default rule
    as ``scipy.stats.gaussian_kde``.  Instead of the reference's exact
    O(npts*n) KDE evaluation, the density is computed from a fine histogram
    convolved with the Gaussian kernel (O(n + nbins log nbins)) — identical
    argmin location up to the bin width.
    """
    y = np.asarray(y, dtype=np.float64).ravel()
    if y.size < 2 or not np.all(np.isfinite([mu0, mu1])) or mu0 == mu1:
        return None
    bw = y.std() * y.size ** (-1 / 5)
    if bw <= 0:
        return None

    lo_g, hi_g = min(mu0, mu1), max(mu0, mu1)
    lo = min(y.min(), lo_g) - 5 * bw
    hi = max(y.max(), hi_g) + 5 * bw
    hist, edges = np.histogram(y, bins=nbins, range=(lo, hi))
    centers = 0.5 * (edges[:-1] + edges[1:])
    db_ = edges[1] - edges[0]

    # Gaussian smoothing of the histogram = KDE sampled at bin centers
    half = int(np.ceil(5 * bw / db_))
    k = np.exp(-0.5 * (np.arange(-half, half + 1) * db_ / bw) ** 2)
    pdf_bins = np.convolve(hist.astype(np.float64), k, mode="same")

    grid = np.linspace(mu0, mu1, npts)
    pdf = np.interp(grid, centers, pdf_bins)
    return float(grid[int(pdf.argmin())])


def _find_nearest(levels: np.ndarray, value):
    levels = np.asarray(levels)
    return levels[np.abs(levels - value).argmin()]


def eye_metrics(input_samples: np.ndarray, sps: int, nslots: int = 4096,
                sps_resamp: Optional[int] = None) -> dict:
    """Estimate all eye-diagram parameters of a sampled waveform.

    Mirrors the reference pipeline step by step
    (reference devices.py:1635-1868):

    1.  truncate to a multiple of ``2*sps`` slots, cap at ``nslots``, roll by
        ``-sps//2 + 1`` to center the eye;
    2.  optional FFT resampling to ``sps_resamp`` samples/slot;
    3.  2-means split of the amplitudes -> inter-level midpoint ``vm``;
    4.  shortest-50%-interval means above/below ``vm`` -> level LMS
        estimates ``state_1`` / ``state_0``;
    5.  25-75% crossing band -> 2-means on (t, y) -> ``t_left``/``t_right``/
        ``t_opt``;
    6.  +-5%-of-eye-width window at ``t_opt`` -> ``mu0/mu1/s0/s1``;
    7.  KDE minimum between the levels -> ``threshold``;
    8.  extinction ratio and eye height.
    """
    y_in = np.asarray(input_samples).real.astype(np.float64).ravel()
    out: dict = {"sps": sps}

    # 1. truncation and centering (devices.py:1731-1740)
    rem = y_in.size % (2 * sps)
    if rem:
        y_in = y_in[:-rem]
    nslots = min(int(y_in.size // sps), nslots)
    y_in = y_in[: nslots * sps]
    y_in = np.roll(y_in, -sps // 2 + 1)
    y_set = np.unique(y_in)

    # 2. optional resampling (devices.py:1744-1751; host numpy — metrology
    # is not on the throughput path)
    if sps_resamp:
        y = np.asarray(resample_fft(y_in, nslots * sps_resamp),
                       dtype=np.float64)
        out["sps_resamp"] = sps_resamp
        t = np.kron(np.ones(nslots // 2),
                    np.linspace(-1, 1 - 1 / sps_resamp, 2 * sps_resamp))
    else:
        y = y_in
        t = np.kron(np.ones(nslots // 2),
                    np.linspace(-1, 1 - 1 / sps, 2 * sps))
    out["y"] = y
    out["t"] = t

    # 3. amplitude bi-level split (devices.py:1757-1760)
    c0, c1 = kmeans2_1d(y)
    vm = 0.5 * (c0 + c1)

    # 4. level estimates (devices.py:1763-1769)
    top = y[y > vm]
    bot = y[y < vm]
    out["top_int"] = top_int = (shortest_int(top, 50) if top.size > 2
                                else np.array([vm, vm]))
    out["bot_int"] = bot_int = (shortest_int(bot, 50) if bot.size > 2
                                else np.array([vm, vm]))
    state_1 = float(np.mean(top_int))
    state_0 = float(np.mean(bot_int))
    d01 = state_1 - state_0
    v75 = state_1 - 0.25 * d01
    v25 = state_0 + 0.25 * d01
    t_set = np.unique(t)

    # 5. crossing times (devices.py:1782-1798)
    cond = (y > v25) & (y < v75)
    try:
        if cond.sum() < 2:
            raise ValueError("no crossing samples")
        ty = np.stack([t[cond], y[cond]], axis=1)
        init = np.array([[t.min(), 0.5 * (state_0 + state_1)],
                         [t.max(), 0.5 * (state_0 + state_1)]])
        ty_c = kmeans2_2d(ty, init)
        left = int(ty_c[:, 0].argmin())
        right = int(ty_c[:, 0].argmax())
        out["t_left"] = t_left = float(_find_nearest(t_set, ty_c[left, 0]))
        out["t_right"] = t_right = float(_find_nearest(t_set, ty_c[right, 0]))
        out["t_opt"] = t_center = float(_find_nearest(t_set, ty_c[:, 0].mean()))
        out["y_left"] = float(_find_nearest(y_set, ty_c[left, 1]))
        out["y_right"] = float(_find_nearest(y_set, ty_c[right, 1]))
        y_25_75 = y.copy()
        y_25_75[~cond] = np.nan
        out["y_25_75"] = y_25_75
    except ValueError:
        out["t_left"] = t_left = -0.5
        out["t_right"] = t_right = 0.5
        out["t_opt"] = t_center = 0.0
        out["y_left"] = None
        out["y_right"] = None

    # 6. center-window statistics (devices.py:1800-1849)
    out["t_dist"] = t_dist = t_right - t_left
    out["t_span0"] = t_span0 = t_center - 0.05 * t_dist
    out["t_span1"] = t_span1 = t_center + 0.05 * t_dist
    y_center = _find_nearest(y_set, 0.5 * (state_0 + state_1))

    if sps_resamp:
        instant = int(np.abs(t - t_center).argmin()) - sps_resamp // 2 + 1
        instant = int(instant / sps_resamp * sps)
    else:
        instant = int(np.abs(t - t_center).argmin()) - sps // 2 + 1
    out["i"] = instant

    window = (t_span0 < t) & (t < t_span1)
    top_sel = (y > y_center) & window
    bot_sel = (y < y_center) & window

    y_top = np.where(top_sel, y, np.nan)
    y_bot = np.where(bot_sel, y, np.nan)
    out["y_top"] = y_top
    out["y_bot"] = y_bot

    out["mu1"] = mu1 = float(np.nanmean(y_top)) if top_sel.any() else np.nan
    out["s1"] = s1 = float(np.nanstd(y_top)) if top_sel.any() else np.nan
    out["mu0"] = mu0 = float(np.nanmean(y_bot)) if bot_sel.any() else np.nan
    out["s0"] = s0 = float(np.nanstd(y_bot)) if bot_sel.any() else np.nan

    # 7. KDE threshold (devices.py:1852-1859)
    y_win = y[window]
    out["threshold"] = (kde_min_threshold(y_win, mu0, mu1)
                        if np.isfinite([mu0, mu1]).all() else None)

    # 8. ER and eye opening (devices.py:1862-1865)
    out["er"] = (10 * np.log10(mu1 / mu0) if mu0 > 0
                 else np.inf if mu0 == 0 else np.nan)
    out["eye_h"] = mu1 - 3 * s1 - mu0 - 3 * s0
    return out
