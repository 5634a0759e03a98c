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
    ts = np.asarray(sol.ts)
    valid = np.isfinite(ts)
    lv = np.asarray(sol.save["log10_vmax"])[valid]
    if "delta" in sol.save:
        dsta = np.asarray(sol.save["delta"])[valid]      # (steps, nsta)
    elif "delta_max" in sol.save:
        dsta = np.asarray(sol.save["delta_max"])[valid][:, None]
    else:
        dsta = None
    ts = ts[valid] / year_seconds
    seismic = lv > -3.0
    up = np.where(seismic[1:] & ~seismic[:-1])[0] + 1
    down = np.where(~seismic[1:] & seismic[:-1])[0] + 1
    starts = [ts[i] for i in up]
    merged, midx = [], []
    for t, i in zip(starts, up):
        if not merged or t - merged[-1] > 1.0:
            merged.append(t)
            midx.append(i)
    coseis = []
    if dsta is not None:
        for i in midx:
            j = down[down > i]
            j = int(j[0]) if len(j) else len(ts) - 1
            # per-station slip change over the seismic window, then max
            # (a deep creeping station's total never changes coseismically)
            coseis.append(float(np.max(dsta[j] - dsta[i])))
    return merged, coseis, float(np.max(lv))


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
