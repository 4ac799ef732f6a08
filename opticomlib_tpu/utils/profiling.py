"""Profiling hooks: the TPU-native upgrade of the reference's homemade
wall-clock timers (reference utils.py:293-340 — ``tic``/``toc`` brackets
every device and stores ``execution_time`` on results, which this package
keeps for API parity).

Adds structured device-level tracing via ``jax.profiler`` so hot paths
can be inspected in TensorBoard / Perfetto instead of eyeballing
wall-clock numbers.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

__all__ = ["trace", "annotate", "DeviceTimer"]


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a device trace for the enclosed block.

    View with TensorBoard (``tensorboard --logdir <logdir>``) or load the
    .trace files into Perfetto.  Falls back to a no-op if the runtime
    cannot trace (e.g. some remote backends).
    """
    import jax

    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Name the enclosed region in the device trace
    (``jax.profiler.TraceAnnotation``); no-op outside a trace."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class DeviceTimer:
    """Wall-clock timer with a forced device sync at both ends.

    On this runtime ``block_until_ready`` does not reliably synchronize;
    the sync point is a scalar readback of a jitted reduction, which is
    what `bench.py` uses.  Use as a context manager::

        with DeviceTimer() as t:
            out_re, out_im = my_jitted(x_re, x_im)
            t.sync(out_re)
        print(t.elapsed)
    """

    def __init__(self):
        self.elapsed: Optional[float] = None
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    @staticmethod
    def sync(arr) -> float:
        """Force completion of the program producing ``arr``."""
        import jax.numpy as jnp

        return float(jnp.sum(arr))

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        return False
