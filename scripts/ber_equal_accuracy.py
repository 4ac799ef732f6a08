"""BER-level equal-accuracy evidence for the o4 headline (round-5,
VERDICT weakness 2: "no BER-level evidence that the matched-error run
decides the same bits").

Launch-power sweep on a config-2-shaped link (50 km NLSE + EDFA(ASE) +
PD(thermal+shot)), run twice per power with IDENTICAL noise (same seed;
the fused key stream does not depend on the fiber scheme):

* reference scheme (phi_max = 0.01 adaptive — the bench headline), and
* o4 at the calibrated matched-error step from EQUAL_ACCURACY.json.

For each power: decide every bit with each scheme's own estimated
threshold and count cross-scheme disagreements, plus each scheme's
measured BER and eye Q = (mu1-mu0)/(s1+s0).  The claim "matched-error
o4 decides the same bits" is supported when disagreements are zero (or
a handful of threshold-straddling bits at high-BER powers) and the Q
values agree within the seed-to-seed confidence interval.

Writes EQUAL_ACCURACY.json["ber_check"].

Usage: python scripts/ber_equal_accuracy.py [--bits 15] [--sps 64]
"""
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

R = 10e9
CFG = dict(length=50.0, alpha=0.2, beta_2=-21.0, gamma=1.3)
PHI_MAX = 0.01
POWERS_DBM = [-9.0, -6.0, 2.0, 7.0, 12.0, 16.0]
# the two negative powers push the thermal-limited link into the
# measurable-BER regime (Q ~ 2-4), so the cross-scheme comparison also
# covers decisions that actually flip on noise


def main():
    import jax.numpy as jnp

    import opticomlib_tpu  # noqa: F401  (enables the compile cache)
    from opticomlib_tpu.link import EDFASpec, FiberSpec, LinkSpec, \
        build_link
    from opticomlib_tpu.ops.prbs import prbs as _prbs
    from opticomlib_tpu.params import SimParams

    n_bits = 2 ** 15
    sps = 64
    if "--bits" in sys.argv:
        n_bits = 2 ** int(sys.argv[sys.argv.index("--bits") + 1])
    if "--sps" in sys.argv:
        sps = int(sys.argv[sys.argv.index("--sps") + 1])

    cal_path = os.path.join(ROOT, "EQUAL_ACCURACY.json")
    with open(cal_path) as f:
        cal = json.load(f)
    h_match = float(cal["o4"]["h"])

    params = SimParams.create(sps=sps, R=R, _warn=False)
    bits_seq, _ = _prbs(15, length=n_bits)
    bits = np.asarray(bits_seq.data, np.uint8)

    def spec_for(P0, method):
        fib = (FiberSpec(phi_max=PHI_MAX, **CFG) if method == "reference"
               else FiberSpec(method="o4", h=h_match, **CFG))
        return LinkSpec(Vpp=5, offset=-2.5, bias=-2.5, Vpi=5, P0=P0,
                        pulse_shape="gaussian", loss_dB=3, ER_dB=26,
                        stages=(fib, EDFASpec(G=10, NF=5)),
                        pd_BW=0.75 * R)

    rows = []
    for P0 in POWERS_DBM:
        row = {"P0_dBm": P0}
        slots_by = {}
        for method in ("reference", "o4"):
            prog = build_link(spec_for(P0, method), n_bits, params=params)
            t0 = time.perf_counter()
            d = prog.dsp(bits=bits, seed=11, nslots=min(8192, n_bits))
            r = prog.run(bits=bits, seed=11)
            slots = np.asarray(r.slots.signal).real
            decided = (slots > d.threshold).astype(np.uint8)
            slots_by[method] = decided
            q = ((d.eye.mu1 - d.eye.mu0)
                 / max(d.eye.s1 + d.eye.s0, 1e-30))
            row[method] = {
                "ber": d.ber, "n_errors": d.n_errors,
                "threshold": round(float(d.threshold), 6),
                "q": round(float(q), 3),
                "wall_s": round(time.perf_counter() - t0, 2)}
        row["bit_disagreements"] = int(
            np.sum(slots_by["reference"] != slots_by["o4"]))
        # binomial CI half-width on BER at this n (2 sigma)
        p = max(row["reference"]["ber"], 1.0 / n_bits)
        row["ber_ci_2sigma"] = round(
            2 * np.sqrt(p * (1 - p) / n_bits), 8)
        print(f"[ber-eq] P0={P0:5.1f} dBm  "
              f"ref BER={row['reference']['ber']:.3e} "
              f"Q={row['reference']['q']:.2f}  "
              f"o4 BER={row['o4']['ber']:.3e} Q={row['o4']['q']:.2f}  "
              f"disagreements={row['bit_disagreements']}/{n_bits}",
              flush=True)
        rows.append(row)

    data = json.load(open(cal_path))
    data["ber_check"] = {
        "n_bits": n_bits, "sps": sps, "seed": 11,
        "o4_h": h_match, "reference_phi_max": PHI_MAX,
        "method": "same-noise (same seed) launch-power sweep; "
                  "cross-scheme bit-decision disagreements + measured "
                  "BER/Q per scheme",
        "rows": rows,
    }
    with open(cal_path, "w") as f:
        json.dump(data, f, indent=1)
    print(f"[ber-eq] wrote ber_check -> {cal_path}")


if __name__ == "__main__":
    main()
