"""Pallas-TPU kernels for the hot pointwise / streaming stages.

The SSFM propagation step is ``NL -> FFT -> linear phase -> IFFT -> NL``
(reference: opticomlib/devices.py:1172-1196).  The FFTs lower to XLA's
native TPU FFT; everything between them is bandwidth-bound pointwise work
that these kernels fuse explicitly:

* :func:`nl_halfstep` — fused ``|A|^2 -> phi -> (cos, sin) -> A*e^{i phi}``
  half-step nonlinear rotation.  Emits the rotation factors so the
  post-IFFT half-step reuses them (one transcendental pass per step
  instead of two, the same strength reduction XLA's fuser applies — here
  made explicit and guaranteed).
* :func:`cmul` — planar complex multiply (the post-IFFT half-step).
* :func:`fir_filter` — streaming time-domain FIR (overlap-save blocks with
  in-kernel halo handling) for short-to-medium taps where an
  O(N log N) full-length FFT convolution wastes HBM bandwidth.
* :func:`adc_quantize` — ADC uniform quantizer with optional stochastic
  rounding using the TPU-native PRNG (``pltpu.prng_random_bits``).
* :func:`histogram2d` — eye-diagram density accumulation as an MXU
  one-hot matmul (the TPU-native replacement for the reference's
  ``np.histogram2d`` + Gaussian smoothing pipeline, devices.py:1757ff /
  utils.py:1593-1787).

All kernels take/return **planar float32** (re, im) pairs — complex64
cannot cross program boundaries on this runtime, and planar is the layout
XLA prefers around its FFT anyway.

Kernels run compiled on TPU; on CPU (tests, ``JAX_PLATFORMS=cpu``) they
run through the Pallas interpreter (``interpret=True`` is selected
automatically from the default backend).

**Status (round-2 measure-then-wire study, scripts/bench_pallas_wiring.py
on the real chip — see docs/performance.md for the numbers): no
production device calls these kernels.**  ``fir_filter`` crashes the
remote Pallas compile path; ``fir_filter_matmul`` loses to power-of-two
circular FFT convolution at every realistic tap count; ``adc_quantize``
loses ~19x to the fused XLA pointwise quantizer; ``histogram2d`` fails
Mosaic verification on this backend and loses to XLA scatter-add
anyway; ``nl_halfstep``/``cmul`` were rejected in round 1 (the SSFM step
is ~90 % FFT and XLA fuses the rest).  They remain in-tree as tested
reference kernels for future toolchains.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["nl_halfstep", "cmul", "fir_filter", "adc_quantize",
           "histogram2d"]

# f32 native tile is (8, 128); use generous VMEM blocks to amortize grid
# overhead on bandwidth-bound kernels.
_LANES = 128
_BLOCK_ROWS = 512  # (512, 128) f32 block = 256 KiB/operand


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _as_rows(x: jnp.ndarray) -> Tuple[jnp.ndarray, int]:
    """View flat length-N f32 array as (rows, 128), padding to a whole
    number of (BLOCK_ROWS, 128) blocks."""
    n = x.shape[-1]
    per_block = _BLOCK_ROWS * _LANES
    n_pad = (-n) % per_block
    if n_pad:
        x = jnp.pad(x, (0, n_pad))
    return x.reshape(-1, _LANES), n


# ----------------------------------------------------------------------
# fused nonlinear half-step
# ----------------------------------------------------------------------

def _nl_kernel(c_ref, re_ref, im_ref, bre_ref, bim_ref, hre_ref, him_ref):
    re = re_ref[:]
    im = im_ref[:]
    phi = c_ref[0, 0] * (re * re + im * im)
    c = jnp.cos(phi)
    s = jnp.sin(phi)
    hre_ref[:] = c
    him_ref[:] = s
    bre_ref[:] = re * c - im * s
    bim_ref[:] = re * s + im * c


@jax.jit
def nl_halfstep(re: jnp.ndarray, im: jnp.ndarray, coeff: jnp.ndarray):
    """Fused nonlinear half-step ``B = A * exp(i * coeff * |A|^2)``.

    Parameters
    ----------
    re, im : float32 arrays, flat
        Planar field.
    coeff : scalar float32
        ``gamma * h / 2`` [1/W] (reference devices.py:1145/1172).

    Returns
    -------
    (bre, bim, hre, him)
        Rotated field and the rotation factors ``(cos phi, sin phi)`` for
        reuse by the post-IFFT half-step (:func:`cmul`).
    """
    rows_re, n = _as_rows(re)
    rows_im, _ = _as_rows(im)
    c2d = jnp.asarray(coeff, jnp.float32).reshape(1, 1)
    nrows = rows_re.shape[0]
    grid = (nrows // _BLOCK_ROWS,)
    spec = pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _nl_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec, spec],
        out_specs=(spec, spec, spec, spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((nrows, _LANES), jnp.float32)
            for _ in range(4)),
        interpret=_interpret(),
    )(c2d, rows_re, rows_im)
    return tuple(o.reshape(-1)[:n] for o in out)


# ----------------------------------------------------------------------
# planar complex multiply
# ----------------------------------------------------------------------

def _cmul_kernel(are_ref, aim_ref, bre_ref, bim_ref, ore_ref, oim_ref):
    ar, ai = are_ref[:], aim_ref[:]
    br, bi = bre_ref[:], bim_ref[:]
    ore_ref[:] = ar * br - ai * bi
    oim_ref[:] = ar * bi + ai * br


@jax.jit
def cmul(are, aim, bre, bim):
    """Planar complex multiply ``(are + i aim) * (bre + i bim)``."""
    ra, n = _as_rows(are)
    ia, _ = _as_rows(aim)
    rb, _ = _as_rows(bre)
    ib, _ = _as_rows(bim)
    nrows = ra.shape[0]
    grid = (nrows // _BLOCK_ROWS,)
    spec = pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _cmul_kernel,
        grid=grid,
        in_specs=[spec] * 4,
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((nrows, _LANES), jnp.float32),
                   jax.ShapeDtypeStruct((nrows, _LANES), jnp.float32)),
        interpret=_interpret(),
    )(ra, ia, rb, ib)
    return tuple(o.reshape(-1)[:n] for o in out)


# ----------------------------------------------------------------------
# streaming FIR (overlap-save)
# ----------------------------------------------------------------------

def _fir_kernel(h_ref, x_hbm, y_ref, scratch, sems, *, taps: int,
                block: int, n_blocks: int):
    """Double-buffered streaming overlap-save FIR.

    Block ``i`` needs the window ``x[i*block : i*block + taps-1+block]``
    — overlapping windows are not expressible as a blocked ``BlockSpec``
    (index maps are block-granular), so ``x`` stays in HBM and each grid
    step DMAs its window into a VMEM slot, prefetching the next window
    while computing the current one (guide pattern: double buffering).
    """
    i = pl.program_id(0)
    win = taps - 1 + block

    def get_dma(slot, blk_idx):
        return pltpu.make_async_copy(
            x_hbm.at[0, pl.ds(blk_idx * block, win)],
            scratch.at[slot],
            sems.at[slot],
        )

    @pl.when(i == 0)
    def _():
        get_dma(0, 0).start()

    slot = jax.lax.rem(i, 2)
    next_slot = jax.lax.rem(i + 1, 2)

    @pl.when(i + 1 < n_blocks)
    def _():
        get_dma(next_slot, i + 1).start()

    get_dma(slot, i).wait()
    x = scratch[slot]               # (win,) window in VMEM

    # taps is static: unroll the MAC loop over *static* window slices —
    # Mosaic TPU cannot lower lax.dynamic_slice on a loaded value, and
    # static shifted slices are cheap lane relayouts
    y = jnp.zeros((block,), jnp.float32)
    for j in range(taps):
        y = y + h_ref[0, j] * x[taps - 1 - j:taps - 1 - j + block]
    y_ref[:] = y.reshape(y_ref.shape)


def fir_filter(x: jnp.ndarray, h: np.ndarray, block: int = 16384):
    """Causal FIR ``y[n] = sum_j h[j] x[n-j]`` via overlap-save Pallas
    blocks (zero-padded edges, 'same' length).

    TPU-native alternative to full-length FFT convolution
    (reference utils.py:1975-1981) for tap counts where streaming VPU
    multiply-accumulate beats two giant FFTs on HBM bandwidth.  The input
    stays in HBM; each grid step double-buffers its overlapping window
    into VMEM with async DMA.
    """
    h = jnp.asarray(h, jnp.float32)
    taps = int(h.shape[0])
    n = int(x.shape[-1])
    lanes = _LANES
    block = max(lanes, (block // lanes) * lanes)
    n_blocks = -(-n // block)
    n_pad = n_blocks * block - n

    # window layout: [taps-1 halo | data]; pad the head with zeros and the
    # tail so the last window's DMA stays in bounds
    xp = jnp.pad(jnp.asarray(x, jnp.float32), (taps - 1, n_pad))
    h2d = h.reshape(1, taps)

    win = taps - 1 + block
    kern = functools.partial(_fir_kernel, taps=taps, block=block,
                             n_blocks=n_blocks)
    y = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),      # stays in HBM
        ],
        out_specs=pl.BlockSpec((1, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_blocks * block), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, win), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_interpret(),
    )(h2d, xp.reshape(1, -1))
    return y.reshape(-1)[:n]


def fir_filter_matmul(x: jnp.ndarray, h: np.ndarray,
                      block: int = 4096) -> jnp.ndarray:
    """Causal FIR as blocked im2col + MXU matmul (compiled TPU path).

    For tap count T the filter becomes a (T, 1) operand against a
    (block, T) sliding-window patch matrix; XLA lowers the gather-free
    window construction to cheap shifts and the contraction to the MXU.
    """
    h = jnp.asarray(h, jnp.float32)
    taps = int(h.shape[0])
    n = int(x.shape[-1])
    n_blocks = -(-n // block)
    n_pad = n_blocks * block - n
    xp = jnp.pad(jnp.asarray(x, jnp.float32), (taps - 1, n_pad))

    def one_block(i):
        w = jax.lax.dynamic_slice(xp, (i * block,), (block + taps - 1,))
        # patches[n, j] = window[n + (taps-1) - j] = x[i*block + n - j];
        # built from static shifted slices (a gather here lowers to a
        # catastrophically slow scalar loop on TPU)
        patches = jnp.stack(
            [w[taps - 1 - j:taps - 1 - j + block] for j in range(taps)],
            axis=1)                            # (block, taps)
        return patches @ h                     # MXU contraction

    y = jax.lax.map(one_block, jnp.arange(n_blocks))
    return y.reshape(-1)[:n]


# ----------------------------------------------------------------------
# ADC quantizer
# ----------------------------------------------------------------------

def _adc_kernel(lo_ref, step_ref, seed_ref, x_ref, y_ref, *, levels: int,
                stochastic: bool):
    x = x_ref[:]
    lo = lo_ref[0, 0]
    step = step_ref[0, 0]
    q = (x - lo) / step
    if stochastic:
        pltpu.prng_seed(seed_ref[0])
        rbits = pltpu.prng_random_bits(q.shape)
        # uniform [0,1) from the top 24 bits
        u = (rbits >> 8).astype(jnp.float32) * jnp.float32(2.0**-24)
        q = jnp.floor(q + u)
    else:
        # explicit round-half-up: deterministic across backends (jnp.round's
        # half-to-even tie-break can flip per-backend at f32 boundaries)
        q = jnp.floor(q + jnp.float32(0.5))
    q = jnp.clip(q, 0.0, float(levels - 1))
    y_ref[:] = lo + q * step


def adc_quantize(x: jnp.ndarray, lo: float, hi: float, nbits: int,
                 stochastic: bool = False, seed: int = 0) -> jnp.ndarray:
    """Uniform ``nbits`` quantizer over [lo, hi] (reference ADC core,
    devices.py:1616-1627), optionally with stochastic rounding driven by
    the TPU-native PRNG."""
    levels = 2 ** int(nbits)
    step = (hi - lo) / (levels - 1)
    rows, n = _as_rows(jnp.asarray(x, jnp.float32))
    nrows = rows.shape[0]
    grid = (nrows // _BLOCK_ROWS,)
    spec = pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    kern = functools.partial(_adc_kernel, levels=levels,
                             stochastic=stochastic)
    y = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((nrows, _LANES), jnp.float32),
        interpret=_interpret(),
    )(jnp.float32(lo).reshape(1, 1), jnp.float32(step).reshape(1, 1),
      jnp.asarray([seed], jnp.int32), rows)
    return y.reshape(-1)[:n]


# ----------------------------------------------------------------------
# 2-D histogram via one-hot MXU matmul
# ----------------------------------------------------------------------

def _hist_kernel(t_ref, y_ref, out_ref, *, nt: int, ny: int, chunk: int):
    """Accumulate histogram of (t, y) pairs into out (nt, ny).

    one_hot_t: (chunk, nt), one_hot_y: (chunk, ny);
    counts += one_hot_t^T @ one_hot_y — an MXU contraction over the
    sample axis."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    t = t_ref[:].reshape(chunk, 1)
    y = y_ref[:].reshape(chunk, 1)
    cols_t = jax.lax.broadcasted_iota(jnp.float32, (chunk, nt), 1)
    cols_y = jax.lax.broadcasted_iota(jnp.float32, (chunk, ny), 1)
    oh_t = (t == cols_t).astype(jnp.float32)
    oh_y = (y == cols_y).astype(jnp.float32)
    out_ref[:] += jax.lax.dot_general(
        oh_t, oh_y, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def histogram2d(t_idx: jnp.ndarray, y_idx: jnp.ndarray, nt: int, ny: int,
                chunk: int = 8192) -> jnp.ndarray:
    """Counts[i, j] = #{k : t_idx[k] == i and y_idx[k] == j}.

    Bin indices are precomputed float32 (integer-valued); out-of-range
    indices fall outside every one-hot column and are silently dropped —
    pass nt/ny-clipped indices to keep edge bins.  MXU-contracted
    replacement for ``np.histogram2d`` in the eye-density renderer
    (reference utils.py:1593-1787).
    """
    n = t_idx.shape[-1]
    n_pad = (-n) % chunk
    # pad with -1 -> matches no bin
    t_p = jnp.pad(jnp.asarray(t_idx, jnp.float32), (0, n_pad),
                  constant_values=-1.0)
    y_p = jnp.pad(jnp.asarray(y_idx, jnp.float32), (0, n_pad),
                  constant_values=-1.0)
    n_chunks = t_p.shape[-1] // chunk
    kern = functools.partial(_hist_kernel, nt=nt, ny=ny, chunk=chunk)
    in_spec = pl.BlockSpec((1, chunk), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[in_spec, in_spec],
        out_specs=pl.BlockSpec((nt, ny), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt, ny), jnp.float32),
        interpret=_interpret(),
    )(t_p.reshape(1, -1), y_p.reshape(1, -1))
