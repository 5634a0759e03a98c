#!/usr/bin/env python
"""SEAS BP1 external-comparison study (VERDICT r2 next #4).

The repo's BP1 geometry follows the reference (BP1.jl:63-66): an
Lx x Ly box with the fault on the west edge and remote Dirichlet
loading u = t*Vp/2 on the east edge — NOT the canonical SEAS BP1
half-space loaded by imposed deep creep.  The published BP1-QD
recurrence (~78 yr) therefore cannot match at Lx=80; this study
quantifies the domain effect by growing the box (tan-stretched grid
keeps near-fault resolution fixed) and reporting the recurrence trend,
event count, and coseismic slip per event against the community
values.

Usage: python tools/seas_bp1_domain.py --L 80 160 320 [--N 400]
Prints one JSON line.
"""
import argparse
import json
import os
import sys
import time

os.environ.setdefault("HYBRIDSBP_PLATFORM", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np  # noqa: E402


def events_from_sol(sol, year_seconds):
    # canonical definition lives in the library (one home for every gate)
    from hybridsbp_tpu.seas.events import merged_events
    return merged_events(sol, year_seconds)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--L", type=float, nargs="+", default=[80, 160, 320])
    ap.add_argument("--N", type=int, default=400)
    ap.add_argument("--el", type=float, default=10.0)
    ap.add_argument("--years", type=float, default=1200.0)
    ap.add_argument("--canonical", action="store_true",
                    help="canonical SEAS BP1 configuration: imposed "
                         "creep below Wf=40 km and Dc=0.008 m (the "
                         "reference variant has friction everywhere "
                         "and Dc=0.016)")
    a = ap.parse_args()

    from hybridsbp_tpu.seas import bp1
    from hybridsbp_tpu.seas.bp1 import YEAR_SECONDS

    out = {"N": a.N, "el": a.el, "years": a.years,
           "canonical": a.canonical, "runs": {}}
    extra = ({"Wf": 40.0, "RSDc": 0.008} if a.canonical else {})
    for L in a.L:
        par = bp1.BP1Params(N=a.N, Lx=L, Ly=L, el=a.el,
                            sim_years=a.years, **extra)
        t0 = time.time()
        prob = bp1.setup(par)
        t_setup = time.time() - t0
        t0 = time.time()
        _, sol = bp1.run(par, prob=prob, max_steps=400_000)
        t_run = time.time() - t0
        ev, coseis, lvmax = events_from_sol(sol, YEAR_SECONDS)
        rec = (float(np.median(np.diff(ev[1:]))) if len(ev) >= 3
               else (ev[1] - ev[0] if len(ev) == 2 else None))
        out["runs"][f"L{int(L)}"] = {
            "events_yr": [round(t, 1) for t in ev],
            "recurrence_yr": None if rec is None else round(rec, 1),
            "coseismic_slip_m": [round(c, 2) for c in coseis],
            "log10_vmax_peak": round(lvmax, 2),
            "setup_s": round(t_setup, 1), "run_s": round(t_run, 1),
            "accepted": int(sol.stats.naccept),
            "success": bool(sol.stats.success)}
        print(f"# L={L}: events {np.round(ev, 1)}, rec {rec}, "
              f"coseis {np.round(coseis, 2)}", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
