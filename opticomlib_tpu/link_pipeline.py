"""Pipelined fused link: TX + span-pipelined channel + fused receivers
as ONE XLA program over a ``('span',)`` device mesh.

The third parallel axis of the runtime (SURVEY §2.6: the per-span
FIBER+EDFA chain of reference
examples/ook_transmission_fiber_simulation.py:42-46 is the PP analogue),
exposed through the public link vocabulary: ``build_link(spec, n_bits,
span_mesh=mesh)`` compiles

* **TX** — per-channel DAC -> LASER -> MZM/PM, channel-sharded over the
  span mesh (data-parallel, no communication; the stages-less twin of
  the fused link program);
* **channel** — the heterogeneous stage pipeline
  (:func:`opticomlib_tpu.parallel.pipeline.pipeline_stages_core`):
  device ``d`` owns segments ``[d*K, (d+1)*K)`` of the flattened
  FIBER/DBP/EDFA/DM chain, microbatches (channels) stream through over
  ``ppermute`` ring buffers, keyed 2-pol ASE;
* **RX** — PD (square-law + keyed thermal/shot) -> zero-phase Bessel
  LPF -> in-graph GET_EYE -> THRESHOLD_EST -> slicer -> BER, again
  channel-local on each channel's owner device —

into one jitted program with scalars-only readback (``dsp_wdm``).

Noise-stream note: the laser draws bit-match ``LinkProgram.dsp_wdm``
(seed + c per channel); ASE keys are functions of (channel, segment) —
a *different stream* from the fused program's sequential key chain
(same physics, pipelined == sequential bit-identical for the SAME
pipelined program; tested), and PD noise draws from a dedicated
fold_in of the channel seed.
"""
from __future__ import annotations

import math
from dataclasses import replace
from types import SimpleNamespace
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from scipy.constants import e, k as kB

from .link import (LinkProgram, LinkSpec, _adc_quantize, _ook_rx_ingraph,
                   _ppm_hard_rx_ingraph)
from .params import SimParams
from .parallel.pipeline import pipeline_stages_core

__all__ = ["PipelinedLinkProgram"]


class PipelinedLinkProgram:
    """A fused link whose channel stages run pipelined over a span mesh.

    Use :meth:`dsp_wdm` — ``n_channels`` (a multiple of the span count)
    independent TX->RX chains whose channel-stage propagation streams
    through the pipeline; per-channel BER/threshold/eye scalars return.
    """

    def __init__(self, spec: LinkSpec, n_bits: int, params: SimParams,
                 mesh: Mesh, span_axis: str = "span"):
        self.spec = spec
        self.n_bits = int(n_bits)
        self.params = params
        self.mesh = mesh
        self.span_axis = span_axis
        self.S = mesh.shape[span_axis]
        self.n = self.n_bits * params.sps

        # TX twin: the stages-less fused program with PD noise disabled
        # (its v/slots outputs are discarded; only the modulated field
        # is used).  Keys consumed: laser only — PD noise is drawn in
        # the RX section below from a dedicated subkey.
        tx_spec = replace(spec, stages=(), include_thermal=False,
                          include_shot=False)
        self._tx = LinkProgram(tx_spec, n_bits, params, return_field=True)
        self.consts = self._tx.consts
        self._dsp_cache = {}

    def _build_prog(self, B: int, rx_one):
        """Compile TX -> pipelined channel -> per-channel ``rx_one(v_c,
        slots_c, info_c, seed_c)`` into one jitted program.  ``rx_one``
        receives the filtered PD voltage and slot samples (both
        channel-local) and returns a tuple of per-channel scalars.  The
        ASE seed is a traced argument, so seed sweeps reuse the
        compiled program (round-5 advisor fix)."""
        spec, params = self.spec, self.params
        sps, fs, n = params.sps, params.fs, self.n
        mesh, span_axis = self.mesh, self.span_axis
        run, any_ase, pol_shape = pipeline_stages_core(
            mesh, fs, spec.stages, n=n, B=B, f0=params.f0,
            span_axis=span_axis)
        ch_spec = NamedSharding(mesh, P(span_axis, None))
        field_spec = NamedSharding(
            mesh, P(span_axis, *(None,) * len(pol_shape)))
        S_T = (4 * kB * spec.pd_T * fs / 2
               * 10 ** (spec.pd_Fn / 10) / spec.pd_R_load
               if spec.include_thermal else 0.0)
        instant = (spec.sampler_instant
                   if spec.sampler_instant is not None else sps // 2)

        def prog(bits, info, seeds, seed_u32, consts):
            # --- TX (channel-parallel, stages-less fused twin) ---
            def tx_one(b, s, consts):
                out = self._tx.fn(b, s, consts)
                return out[2], out[3]

            fr, fi = jax.vmap(tx_one, in_axes=(0, 0, None))(bits, seeds,
                                                            consts)
            f = jax.lax.complex(fr, fi)
            if any_ase:
                f = jnp.stack([f, jnp.zeros_like(f)], axis=1)
            f = jax.lax.with_sharding_constraint(f, field_spec)

            # --- channel: the span pipeline (shard_map inside this jit)
            f = run(f, seed_u32)
            f = jax.lax.with_sharding_constraint(f, field_spec)

            # --- RX front end (channel-local PD + LPF) + receiver ---
            def rx_front(f_c, info_c, seed_c):
                Pw = f_c.real ** 2 + f_c.imag ** 2
                if Pw.ndim == 2:
                    Pw = Pw.sum(axis=0)
                i_ph = jnp.float32(spec.pd_r) * Pw
                i = i_ph
                if spec.include_thermal or spec.include_shot:
                    i = i + jnp.float32(spec.i_dark)
                k_pd = jax.random.fold_in(jax.random.PRNGKey(seed_c),
                                          0x5044)
                k_T, k_N = jax.random.split(k_pd)
                if spec.include_thermal:
                    i = i + jnp.float32(S_T ** 0.5) * jax.random.normal(
                        k_T, (n,), dtype=jnp.float32)
                if spec.include_shot:
                    mean_i = jnp.mean(i_ph)
                    S_N = (2 * jnp.float32(e)
                           * (mean_i + jnp.float32(spec.i_dark))
                           * jnp.float32(fs / 2))
                    i = i + jnp.sqrt(S_N) * jax.random.normal(
                        k_N, (n,), dtype=jnp.float32)
                v = jnp.fft.ifft(
                    jnp.fft.fft(i * jnp.float32(spec.pd_R_load))
                    * consts["H2_pd"]).real
                if spec.adc_bits is not None:
                    # channel-local, same shared operator as the fused
                    # link (link._adc_quantize)
                    v = _adc_quantize(v, int(spec.adc_bits))
                return rx_one(v, v[instant::sps], info_c, seed_c)

            return jax.vmap(rx_front, in_axes=(0, 0, 0))(f, info, seeds)

        return jax.jit(prog), ch_spec

    def _build_dsp(self, B: int, nslots: int, sps_resamp: Optional[int]):
        sps = self.params.sps

        def rx_one(v, slots, bits_c, seed_c):
            m, rth, n_err = _ook_rx_ingraph(v, slots, bits_c, sps,
                                            nslots, sps_resamp)
            return (m["mu0"], m["mu1"], m["s0"], m["s1"], m["er"],
                    m["eye_h"], rth, n_err)

        return self._build_prog(B, rx_one)

    def dsp_wdm(self, n_channels: int, bits=None, seed: int = 0,
                prbs_order: int = 15, nslots: int = 8192,
                sps_resamp: Optional[int] = None):
        """WDM sweep with the channel stages PIPELINED over the span
        mesh: ``n_channels`` (multiple of the span count) chains, one
        XLA program, per-channel scalars back (the pipelined twin of
        :meth:`LinkProgram.dsp_wdm`)."""
        if n_channels < 1 or n_channels % self.S:
            raise ValueError(
                f"n_channels must be a positive multiple of the span "
                f"count {self.S}, got {n_channels}")
        if bits is None:
            from .ops.prbs import prbs as _prbs
            b, _ = _prbs(prbs_order, length=n_channels * self.n_bits)
            bits = np.asarray(b.data, np.uint8).reshape(
                n_channels, self.n_bits)
        bits = np.asarray(bits)
        if bits.shape != (n_channels, self.n_bits):
            raise ValueError(
                f"bits must have shape {(n_channels, self.n_bits)}, got "
                f"{bits.shape}")

        key = (n_channels, nslots, sps_resamp)
        if key not in self._dsp_cache:
            self._dsp_cache[key] = self._build_dsp(
                n_channels, nslots, sps_resamp)
        prog, ch_spec = self._dsp_cache[key]

        seeds = np.arange(n_channels, dtype=np.uint32) + np.uint32(seed)
        bits_d = jax.device_put(
            jnp.asarray(bits.astype(np.float32)), ch_spec)
        seeds_d = jax.device_put(
            jnp.asarray(seeds),
            NamedSharding(self.mesh, P(self.span_axis)))
        mu0, mu1, s0, s1, er, eye_h, rth, n_err = (
            np.asarray(a) for a in jax.device_get(
                prog(bits_d, bits_d, seeds_d, jnp.uint32(seed),
                     self.consts)))
        n_err = n_err.astype(np.int64)
        return SimpleNamespace(
            ber=n_err / self.n_bits, n_errors=n_err,
            threshold=rth, mu0=mu0, mu1=mu1, s0=s0, s1=s1, er=er,
            eye_h=eye_h, n_channels=n_channels, tx=bits.astype(np.uint8))

    def dsp_wdm_ppm(self, n_channels: int, M: int, decision: str = "soft",
                    bits=None, seed: int = 0, prbs_order: int = 15,
                    nslots: int = 8192, sps_resamp: Optional[int] = None):
        """M-PPM WDM sweep with the channel stages pipelined: the PPM
        twin of :meth:`dsp_wdm` (soft SDD argmax, or hard via eye
        metrology + keyed HDD — :func:`opticomlib_tpu.link.
        _ppm_hard_rx_ingraph`)."""
        from .models.ppm import (PPM_ENCODER, positions_to_bits_jax,
                                 sdd_positions_jax)

        decision = decision.lower()
        if decision not in ("soft", "hard"):
            raise ValueError('`decision` must be "hard" or "soft"')
        if n_channels < 1 or n_channels % self.S:
            raise ValueError(
                f"n_channels must be a positive multiple of the span "
                f"count {self.S}, got {n_channels}")
        if M & (M - 1) != 0 or M < 2:
            raise ValueError("`M` must be a power of 2.")
        if self.n_bits % M != 0:
            raise ValueError(
                f"link carries {self.n_bits} slots, not a multiple of "
                f"M={M}")
        k = int(math.log2(M))
        n_sym = self.n_bits // M
        if bits is None:
            from .ops.prbs import prbs as _prbs
            b, _ = _prbs(prbs_order, length=n_channels * n_sym * k)
            bits = np.asarray(b.data, np.uint8).reshape(n_channels,
                                                        n_sym * k)
        bits = np.asarray(bits)
        if bits.shape != (n_channels, n_sym * k):
            raise ValueError(
                f"bits must have shape {(n_channels, n_sym * k)}, got "
                f"{bits.shape}")
        slots_tx = np.stack([
            np.asarray(PPM_ENCODER(bits[c], M).data, np.float32)
            for c in range(n_channels)])

        key = ("ppm", n_channels, M, decision, nslots, sps_resamp)
        if key not in self._dsp_cache:
            sps = self.params.sps

            def rx_one(v, slots, info_c, seed_c):
                if decision == "soft":
                    pos = sdd_positions_jax(slots, M)
                    rb = positions_to_bits_jax(pos, M)
                    n_err = jnp.sum(rb != info_c.astype(jnp.uint8))
                    return jnp.full((), jnp.nan, jnp.float32), n_err
                _, rth, n_err = _ppm_hard_rx_ingraph(
                    v, slots, info_c, M, sps, nslots, sps_resamp, seed_c)
                return rth, n_err

            self._dsp_cache[key] = self._build_prog(n_channels, rx_one)
        prog, ch_spec = self._dsp_cache[key]

        seeds = np.arange(n_channels, dtype=np.uint32) + np.uint32(seed)
        slots_d = jax.device_put(jnp.asarray(slots_tx), ch_spec)
        info_d = jax.device_put(
            jnp.asarray(bits.astype(np.float32)), ch_spec)
        seeds_d = jax.device_put(
            jnp.asarray(seeds),
            NamedSharding(self.mesh, P(self.span_axis)))
        rth, n_err = jax.device_get(prog(slots_d, info_d, seeds_d,
                                         jnp.uint32(seed), self.consts))
        n_err = np.asarray(n_err).astype(np.int64)
        rth = np.asarray(rth, np.float64)
        return SimpleNamespace(
            ber=n_err / (n_sym * k), n_errors=n_err, M=M,
            decision=decision, n_channels=n_channels,
            threshold=(None if np.isnan(rth).all() else rth),
            tx=bits.astype(np.uint8))
