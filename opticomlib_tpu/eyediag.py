"""Eye-diagram result object and rendering.

Parity with the reference ``eye`` class (reference opticomlib/
typing.py:2469-2809) and the ``eyediagram`` helper (utils.py:1593-1787):
stores trace arrays + estimated parameters, renders a density-colored eye
with optional annotations.  All rendering is host-side matplotlib; the
density histogram itself is a vectorized 2-D histogram + Gaussian smoothing.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from .utils.analysis import si

__all__ = ["eye", "Eye", "EyeShowOptions", "eyediagram"]


@dataclass
class EyeShowOptions:
    """Flag bundle for eye plot annotations (reference typing.py:2440-2456)."""
    means: bool = True
    crossings: bool = True
    t_opt: bool = True
    threshold: bool = True
    legend: bool = True


class Eye:
    """Eye-diagram parameters and metrics.

    Attributes (same names/meanings as the reference): ``t``, ``y`` traces,
    ``t_left/t_right/t_opt`` crossing times, ``mu0/mu1/s0/s1`` level stats,
    ``er`` extinction ratio [dB], ``eye_h`` eye opening, ``threshold``
    optimal decision threshold, ``i`` optimum sampling instant, ``sps``.
    """

    def __init__(self, params: Optional[dict] = None, **kwargs):
        params = dict(params or {})
        params.update(kwargs)
        self.__dict__.update(params)
        self.execution_time = params.get("execution_time", 0.0)

    def __getattr__(self, name):
        # undefined metrology fields read as None (reference tolerates
        # partially-filled eye dicts, e.g. tests/ook_test.py MockEye)
        if name.startswith("__"):
            raise AttributeError(name)
        return None

    def __str__(self, title: Optional[str] = None):
        title = title or "eye diagram parameters"
        head = 3 * "*" + f"    {title}    " + 3 * "*"
        sub = len(head) * "-"

        def fmt(v):
            if v is None:
                return "None"
            if isinstance(v, float):
                return f"{v:.4e}"
            return str(v)

        fields = ["t_left", "t_right", "t_opt", "t_dist", "mu0", "mu1",
                  "s0", "s1", "er", "eye_h", "threshold", "i", "sps"]
        body = "\n".join(f"\t{k:10s}:  {fmt(getattr(self, k))}"
                         for k in fields)
        return f"\n{sub}\n{head}\n{sub}\n{body}\n"

    def print(self, msg: Optional[str] = None):
        if msg:
            print(msg)
        print(self)
        return self

    def plot(self, medias_=None, legend_=None, show_=None, save_=None,
             style: str = "dark", cmap: str = "inferno", title: str = "",
             options: Optional[EyeShowOptions] = None,
             **kwargs):  # pragma: no cover - host plotting
        import matplotlib.pyplot as plt

        options = options or EyeShowOptions()
        t = np.asarray(self.t)
        y = np.asarray(self.y)

        fig, ax = plt.subplots(figsize=(8, 5))
        eyediagram_density(t, y, ax=ax, cmap=cmap)

        if options.means and self.mu0 is not None:
            ax.axhline(self.mu1, color="w", ls=":", lw=1, label=r"$\mu_1$")
            ax.axhline(self.mu0, color="w", ls=":", lw=1, label=r"$\mu_0$")
        if options.threshold and self.threshold is not None:
            ax.axhline(self.threshold, color="c", ls="--", lw=1,
                       label="threshold")
        if options.t_opt and self.t_opt is not None:
            ax.axvline(self.t_opt, color="r", ls="--", lw=1, label=r"$t_{opt}$")
        if options.legend:
            ax.legend(loc="upper right", fontsize=8)
        ax.set_xlabel("t / T_slot")
        ax.set_ylabel("Amplitude")
        if title:
            ax.set_title(title)
        return self

    def show(self):  # pragma: no cover
        import matplotlib.pyplot as plt
        plt.show()
        return self


def eyediagram_density(t, y, ax=None, nbins: int = 256, sigma: float = 2.0,
                       cmap: str = "inferno"):  # pragma: no cover - plotting
    """Density-colored eye rendering: 2-D histogram + Gaussian smoothing
    (reference utils.py:1593-1787 'density' style)."""
    import matplotlib.pyplot as plt
    from scipy.ndimage import gaussian_filter

    t = np.asarray(t).ravel()
    y = np.asarray(y).ravel()
    ok = np.isfinite(t) & np.isfinite(y)
    H, xe, ye = np.histogram2d(t[ok], y[ok], bins=nbins)
    H = gaussian_filter(H, sigma)
    if ax is None:
        _, ax = plt.subplots()
    ax.imshow(H.T, origin="lower", aspect="auto", cmap=cmap,
              extent=[xe[0], xe[-1], ye[0], ye[-1]])
    return ax


def eyediagram(y, sps, n_traces=None, cmap="viridis", N_grid_bins=200,
               grid_sigma=5, style="dot", ax=None,
               **plot_kw):  # pragma: no cover - host plotting
    """Standalone eye plot of a waveform (reference utils.py:1593-1787)."""
    import matplotlib.pyplot as plt

    y = np.asarray(y).real.ravel()
    n = (y.size // (2 * sps)) * 2 * sps
    y = y[:n]
    ntr = n // (2 * sps)
    if n_traces:
        ntr = min(ntr, n_traces)
    traces = y[: ntr * 2 * sps].reshape(ntr, 2 * sps)
    t = np.linspace(-1, 1 - 1 / sps, 2 * sps)
    if ax is None:
        _, ax = plt.subplots()
    if style == "density":
        eyediagram_density(np.tile(t, ntr), traces.ravel(), ax=ax,
                           nbins=N_grid_bins, sigma=grid_sigma, cmap=cmap)
    else:
        fmt = "." if style == "dot" else "-"
        ax.plot(t, traces.T, fmt, ms=1, alpha=0.3, **plot_kw)
    ax.set_xlabel("t / T_slot")
    return ax


# reference-compatible lowercase alias
eye = Eye
