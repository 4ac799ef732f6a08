"""Native (C++) runtime helpers, built on demand.

The shared library is compiled from ``_native.cpp`` with ``g++ -O3`` on
first use into the package directory (content-hashed filename, so edits
rebuild automatically) and bound through :mod:`ctypes`.  Every entry point
has a NumPy fallback — environments without a toolchain lose speed, not
functionality.

Public API
----------
``available()``            — True if the native library loaded.
``lfsr_prbs(order, seed, n)``      — bit-serial PRBS (oracle for ops/prbs).
``bit_error_count(a, b)``          — #(a[i] != b[i]) over uint8 arrays.
``pack_bits(bits)`` / ``unpack_bits(bytes, n)`` — bitstream packing.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import warnings
from typing import Optional, Tuple

import numpy as np

__all__ = ["available", "lfsr_prbs", "bit_error_count", "pack_bits",
           "unpack_bits"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "_native.cpp")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _tried
    if _tried:
        return _lib
    _tried = True
    try:
        with open(_SRC, "rb") as f:
            tag = hashlib.sha256(f.read()).hexdigest()[:16]
        so_path = os.path.join(_HERE, f"_native_{tag}.so")
        if not os.path.exists(so_path):
            tmp = so_path + f".tmp{os.getpid()}"
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 _SRC, "-o", tmp],
                check=True, capture_output=True, timeout=120)
            os.replace(tmp, so_path)  # atomic: safe under concurrent builds
        lib = ctypes.CDLL(so_path)
        lib.lfsr_prbs.restype = ctypes.c_uint64
        lib.lfsr_prbs.argtypes = [ctypes.c_int, ctypes.c_int,
                                  ctypes.c_uint64, ctypes.c_int64,
                                  ctypes.c_void_p]
        lib.bit_error_count.restype = ctypes.c_int64
        lib.bit_error_count.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                        ctypes.c_int64]
        lib.pack_bits.restype = None
        lib.pack_bits.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                  ctypes.c_void_p]
        lib.unpack_bits.restype = None
        lib.unpack_bits.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                    ctypes.c_void_p]
        return lib
    except Exception as e:  # pragma: no cover - toolchain-dependent
        warnings.warn(f"opticomlib_tpu.native: build/load failed ({e}); "
                      "using NumPy fallbacks.", RuntimeWarning)
        return None


def _get() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None:
        _lib = _build_and_load()
    return _lib


def available() -> bool:
    """True when the compiled native library is loaded."""
    return _get() is not None


def lfsr_prbs(order: int, seed: int, n: int) -> Tuple[np.ndarray, int]:
    """Bit-serial Galois LFSR: ``n`` output bits + continuation state.

    Semantics identical to :func:`opticomlib_tpu.ops.prbs._bootstrap`
    (and the reference's per-bit loop, reference devices.py:170-175) —
    this is the independent native oracle for the vectorized generator.
    """
    from ..ops.prbs import PRBS_TAPS
    if order not in PRBS_TAPS:
        raise ValueError(f"unsupported PRBS order {order}")
    tap2 = PRBS_TAPS[order][1]
    out = np.empty(int(n), dtype=np.uint8)
    lib = _get()
    if lib is not None:
        state = lib.lfsr_prbs(int(order), int(tap2), int(seed), int(n),
                              out.ctypes.data_as(ctypes.c_void_p))
        return out, int(state)
    from ..ops.prbs import _bootstrap
    return _bootstrap(order, seed, int(n))


def bit_error_count(a: np.ndarray, b: np.ndarray) -> int:
    """Number of positions where ``a != b`` (uint8 byte-per-bit arrays)."""
    a = np.ascontiguousarray(a, dtype=np.uint8)
    b = np.ascontiguousarray(b, dtype=np.uint8)
    if a.shape != b.shape:
        raise ValueError("a and b must have the same shape")
    lib = _get()
    if lib is not None:
        return int(lib.bit_error_count(
            a.ctypes.data_as(ctypes.c_void_p),
            b.ctypes.data_as(ctypes.c_void_p), a.size))
    return int(np.sum(a != b))


def pack_bits(bits: np.ndarray) -> np.ndarray:
    """Pack byte-per-bit uint8 -> bitstream bytes (LSB-first)."""
    bits = np.ascontiguousarray(bits, dtype=np.uint8)
    out = np.zeros((bits.size + 7) // 8, dtype=np.uint8)
    lib = _get()
    if lib is not None:
        lib.pack_bits(bits.ctypes.data_as(ctypes.c_void_p), bits.size,
                      out.ctypes.data_as(ctypes.c_void_p))
        return out
    return np.packbits(bits, bitorder="little")


def unpack_bits(data: np.ndarray, n_bits: int) -> np.ndarray:
    """Unpack bitstream bytes (LSB-first) -> byte-per-bit uint8."""
    data = np.ascontiguousarray(data, dtype=np.uint8)
    out = np.empty(int(n_bits), dtype=np.uint8)
    lib = _get()
    if lib is not None:
        lib.unpack_bits(data.ctypes.data_as(ctypes.c_void_p), int(n_bits),
                        out.ctypes.data_as(ctypes.c_void_p))
        return out
    return np.unpackbits(data, count=int(n_bits), bitorder="little")
