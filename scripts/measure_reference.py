"""Measure the reference (armando-palacio/opticomlib) FIBER throughput on
this host's CPU — the comparison baseline for bench.py (the reference
publishes no numbers; BASELINE.md mandates measuring locally).

Writes BASELINE_MEASURED.json with samples/s for the bench config.
"""
import json
import sys
import time
import types

sys.path.insert(0, "/root/reference")
# pympler is absent in this image; the reference only uses it for a
# pretty-printed sizeof, so a zero stub is behavior-neutral here.
m = types.ModuleType("pympler")
a = types.ModuleType("pympler.asizeof")
a.asizeof = lambda x: 0
m.asizeof = a
sys.modules["pympler"] = m
sys.modules["pympler.asizeof"] = a

import numpy as np  # noqa: E402
from opticomlib import gv, optical_signal  # noqa: E402
from opticomlib.devices import FIBER  # noqa: E402

# Bench config (BASELINE.json config 2 flavor): 2^24-sample OOK waveform,
# 50 km NLSE with dispersion + Kerr + attenuation, adaptive steps.
N_BITS = 2**18
SPS = 64
N = N_BITS * SPS  # 2^24 samples
CFG = dict(length=50.0, alpha=0.2, beta_2=-21.0, gamma=1.3, phi_max=0.01)
PEAK_W = 0.02  # 20 mW peak -> ~130 adaptive steps


def make_input():
    gv(sps=SPS, R=10e9, N=N_BITS)
    rng = np.random.default_rng(42)
    bits = rng.integers(0, 2, N_BITS)
    x = np.repeat(bits, SPS).astype(np.float32) * np.sqrt(PEAK_W)
    return optical_signal(x.astype(np.complex64))


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def measure_config2():
    op = make_input()
    wall = _timed(lambda: FIBER(op, **CFG))
    return {"what": "FIBER 50 km NLSE adaptive", "n_samples": N,
            "wall_s": wall, "samples_per_s": N / wall}


def measure_config1():
    """Back-to-back full chain at bench.py's config-1 size (2^18 bits x
    64 sps): PRBS->DAC->LASER->MZM->PD(LPF) — the reference's staged
    pipeline, no fiber (examples/ook_transmission_fiber_simulation.py
    without the FIBER stage)."""
    from opticomlib.devices import DAC, LASER, MZM, PD, PRBS

    gv(sps=SPS, R=10e9, N=N_BITS)

    def run():
        tx = PRBS(order=15, len=N_BITS)
        v = DAC(tx, Vpp=5, offset=-2.5, pulse_shape="gaussian")
        mod = MZM(LASER(P0=16), v, bias=-2.5, Vpi=5, loss_dB=3, ER_dB=26)
        PD(mod, BW=gv.R * 0.75, include_noise="all")

    wall = _timed(run)
    return {"what": "b2b chain PRBS->DAC->LASER->MZM->PD", "n_samples": N,
            "wall_s": wall, "samples_per_s": N / wall}


def measure_config3(n_sym=2**15, M=8, sps=32):
    """PPM M=8 chain at bench.py's config-3 size: encoder->DAC->
    20 km FIBER->PD->soft DSP."""
    from opticomlib import binary_sequence
    from opticomlib.devices import DAC, PD
    from opticomlib.ppm import DSP, PPM_ENCODER

    n_slots = n_sym * M
    gv(sps=sps, R=10e9, N=n_slots, M=M)
    rng = np.random.default_rng(3)
    bits = binary_sequence(rng.integers(0, 2, n_sym * 3))

    def run():
        tx = PPM_ENCODER(bits, M)
        v = DAC(tx, Vpp=1, pulse_shape="gaussian")
        # ~20 mW peak launch — the SAME power as bench.py's config-3 TPU
        # chain (P0=16 dBm, 3 dB MZM loss), so the adaptive step counts
        # match and the ratio compares equal work
        x = optical_signal(np.asarray(v.signal) * np.sqrt(0.02))
        y = FIBER(x, length=20, alpha=0.2, beta_2=-21.0, gamma=1.3)
        pd = PD(y, BW=gv.R * 0.75, include_noise="all")
        DSP(pd, M, decision="soft")

    wall = _timed(run)
    n = n_slots * sps
    return {"what": "PPM8 chain encoder->DAC->FIBER 20km->PD->soft DSP, "
                    "20 mW launch (matches the TPU chain)",
            "n_samples": n, "wall_s": wall, "samples_per_s": n / wall}


def measure_config4(n=2**20, sps=16, n_spans=20, span_km=80.0):
    """20x80 km + per-span DBP at bench.py's config-4 size."""
    from opticomlib.devices import DBP

    gv(sps=sps, R=10e9, N=n // sps)
    rng = np.random.default_rng(4)
    bits = rng.integers(0, 2, n // sps)
    A = (np.repeat(bits, sps) * np.sqrt(0.005)).astype(np.complex64)
    gain = 10 ** (0.2 * span_km / 20)

    def run():
        x = optical_signal(A)
        for _ in range(n_spans):
            x = FIBER(x, length=span_km, alpha=0.2, beta_2=-21.0,
                      gamma=1.3, phi_max=0.05)
            x = optical_signal(np.asarray(x.signal) * gain)
        for _ in range(n_spans):
            x = optical_signal(np.asarray(x.signal) / gain)
            x = DBP(x, length=span_km, alpha=0.2, beta_2=-21.0,
                    gamma=1.3, phi_max=0.05)

    wall = _timed(run)
    return {"what": f"{n_spans}x{span_km:.0f} km + per-span DBP",
            "n_samples": n, "wall_s": wall, "samples_per_s": n / wall}


def measure_config5(n_ch=16, n_bits=2**18, sps=16, n_measured=4):
    """16-channel WDM sweep at bench.py's config-5 per-chip size and
    WORK: per channel, the same receiver-complete chain bench.py's
    `dsp_wdm` runs (PRBS bits -> DAC -> LASER 16 dBm -> MZM -> 50 km
    adaptive FIBER -> PD -> ook.DSP).  The reference has no batch axis —
    channels run as a host loop, embarrassingly independent — so
    ``n_measured`` channels are timed and scaled to ``n_ch`` (recorded
    in "what")."""
    from opticomlib.devices import DAC, LASER, MZM, PD, PRBS
    from opticomlib import ook

    gv(sps=sps, R=10e9, N=n_bits)

    def run():
        for c in range(n_measured):
            tx = PRBS(order=15, len=n_bits)
            v = DAC(tx, Vpp=5, offset=-2.5, pulse_shape="gaussian")
            mod = MZM(LASER(P0=16), v, bias=-2.5, Vpi=5, loss_dB=3,
                      ER_dB=26)
            y = FIBER(mod, length=50.0, alpha=0.2, beta_2=-21.0,
                      gamma=1.3)
            pd = PD(y, BW=gv.R * 0.75, include_noise="all")
            ook.DSP(pd)

    wall = _timed(run) * (n_ch / n_measured)
    n = n_bits * sps
    return {"what": f"16x WDM receiver-complete chains (matches dsp_wdm "
                    f"work); {n_measured} of {n_ch} independent channels "
                    "timed and scaled",
            "n_samples": n_ch * n, "wall_s": wall,
            "samples_per_s": n_ch * n / wall}


def main():
    run_all = "--all" in sys.argv
    result = {
        "what": "reference opticomlib FIBER, NumPy CPU backend",
        "config": CFG,
        "n_samples": N,
        "peak_power_W": PEAK_W,
        "host": "bench container CPU",
    }
    if run_all:
        configs = {}
        for name, fn in [("config1_b2b_chain", measure_config1),
                         ("config3_ppm8_chain", measure_config3),
                         ("config4_dbp_20x80", measure_config4),
                         ("config5_wdm16_per_chip", measure_config5),
                         ("config2_ssfm_only", measure_config2)]:
            print(f"measuring {name} ...", flush=True)
            configs[name] = fn()
            print(json.dumps(configs[name]), flush=True)
        result["configs"] = configs
        result["wall_s"] = configs["config2_ssfm_only"]["wall_s"]
        result["samples_per_s"] = \
            configs["config2_ssfm_only"]["samples_per_s"]
    else:
        c2 = measure_config2()
        result["wall_s"] = c2["wall_s"]
        result["samples_per_s"] = c2["samples_per_s"]
    print(json.dumps(result))
    with open("/root/repo/BASELINE_MEASURED.json", "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
