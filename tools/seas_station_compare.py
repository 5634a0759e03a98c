#!/usr/bin/env python
"""Station-level SEAS BP1-QD comparison (VERDICT r3 next #9).

The community benchmark is defined by on-fault station time series
(/root/reference/seas/BP1/BP1.jl:159-188 saves them).  The full
published series are not offline-transcribable (they live in the SEAS
database web platform); the published SCALAR values that are
confidently citable offline — recurrence ~78 yr, coseismic slip
~Vp*T=2.46 m (Erickson et al. 2020) — are already pinned in
tests/test_bp1.py and tests/test_bp1_multiblock.py.

What CAN be checked at the station level offline: the framework's TWO
independent discretizations of the canonical problem — the
single-block half-space reduction (seas/bp1.py, tan-stretched 160x160
domain) and the 194-block interior-fault mesh through the
trace-coupled hybrid solve (seas/bp1_multiblock.py, BP1_v1 geometry)
— must agree per station on every physically meaningful per-event
quantity: coseismic slip, peak slip rate, static stress drop,
pre-event stress level, and interseismic creep rate.  They share no
mesh, no operator assembly path, and no solver, so station-level
agreement is a strong mutual-consistency validation of the physics
stack (the loading/geometry agreement is already externally anchored
by the ~78-yr recurrence both reproduce).

Prints one JSON line per station + a summary; a compact version of
this comparison is gated in tests (slow).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np  # noqa: E402


def station_event_metrics(t_yr, delta, log10V, tau, *, threshold=-3.0,
                          merge_window_yr=1.0, window_yr=2.0):
    """Per-event station quantities from one station's time series.

    Events = groups of SEAS-threshold up-crossings merged within
    ``merge_window_yr`` (near the VW edge a station re-crosses the
    threshold in bursts — same convention as seas.events).  Per event:
    onset time, coseismic slip and minimum stress over a fixed
    ``window_yr`` post-onset window (robust to down-crossing-time
    resolution differences), peak log10 V, pre-event stress, static
    stress drop.  The late-interseismic log10 V is sampled at the TIME
    midway between the last two onsets (an index-space midpoint lands
    inside an event: the adaptive integrator piles samples there).
    """
    seismic = log10V > threshold
    up = np.where(seismic[1:] & ~seismic[:-1])[0] + 1
    groups = []
    for i in up:
        if not groups or t_yr[i] - t_yr[groups[-1][0]] > merge_window_yr:
            groups.append([i])
        else:
            groups[-1].append(i)
    events = []
    for g in groups:
        i = g[0]
        j = int(np.searchsorted(t_yr, t_yr[i] + window_yr))
        j = min(j, len(t_yr) - 1)
        events.append({
            "onset_yr": float(t_yr[i]),
            "coseis_m": float(delta[j] - delta[i]),
            "peak_log10V": float(log10V[i:j + 1].max()),
            "tau_pre_MPa": float(tau[max(i - 1, 0)]),
            "stress_drop_MPa": float(tau[max(i - 1, 0)]
                                     - tau[i:j + 1].min()),
        })
    inter = None
    if len(events) >= 2:
        tmid = 0.5 * (events[-2]["onset_yr"] + events[-1]["onset_yr"])
        mid = int(np.searchsorted(t_yr, tmid))
        inter = float(log10V[min(mid, len(t_yr) - 1)])
    return events, inter


def collect(sol, year_seconds, depths, want_depths):
    """Station metric rows for the stations nearest each wanted depth."""
    ts = np.asarray(sol.ts)
    valid = np.isfinite(ts)
    t_yr = ts[valid] / year_seconds
    delta = np.asarray(sol.save["delta"])[valid]
    V = np.asarray(sol.save["V"])[valid]
    tau = np.asarray(sol.save["tau"])[valid]
    lv = np.log10(np.abs(V) + 1e-40)
    rows = {}
    for d in want_depths:
        j = int(np.argmin(np.abs(np.asarray(depths) - d)))
        ev, inter = station_event_metrics(t_yr, delta[:, j], lv[:, j],
                                          tau[:, j])
        rows[d] = {"grid_depth": float(np.asarray(depths)[j]),
                   "events": ev, "log10V_inter": inter}
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--years", type=float, default=360.0)
    ap.add_argument("--N-single", type=int, default=200)
    ap.add_argument("--N-multi", type=int, default=16)
    ap.add_argument("--depths", type=float, nargs="*",
                    default=[0.0, 7.5, 12.5, 17.5, 25.0])
    a = ap.parse_args()

    from hybridsbp_tpu.seas import bp1, bp1_multiblock as mb
    from hybridsbp_tpu.seas.bp1 import YEAR_SECONDS, BP1Params

    t0 = time.time()
    par1 = BP1Params(N=a.N_single, Lx=160, Ly=160, el=10.0,
                     sim_years=a.years, Wf=40.0, RSDc=0.008)
    prob1, sol1 = bp1.run(par1, max_steps=400_000)
    d1 = sol1.meta["station_depths"]
    print(f"# single-block canonical N={a.N_single}: "
          f"{time.time() - t0:.0f}s", file=sys.stderr)

    t0 = time.time()
    par2 = BP1Params(N=a.N_multi, RSDc=0.008, sim_years=a.years)
    mp = mb.setup(par=par2, N=a.N_multi)
    sol2 = mb.run(mp, sim_years=a.years, max_steps=400_000, rtol=1e-4)
    nominal2, _ = mb.default_stations(mp)
    print(f"# multiblock canonical N={a.N_multi}: "
          f"{time.time() - t0:.0f}s", file=sys.stderr)

    r1 = collect(sol1, YEAR_SECONDS, d1, a.depths)
    r2 = collect(sol2, YEAR_SECONDS, nominal2, a.depths)

    summary = {"max_abs": {}}
    for d in a.depths:
        e1, e2 = r1[d]["events"], r2[d]["events"]
        row = {"depth_km": d, "n_events": (len(e1), len(e2))}
        if e1 and e2:
            # compare the LAST event at this station (cycle-converged;
            # onset phases differ between discretizations, quantities
            # should not)
            l1, l2 = e1[-1], e2[-1]
            for k in ("coseis_m", "peak_log10V", "tau_pre_MPa",
                      "stress_drop_MPa"):
                row[k] = (round(l1[k], 4), round(l2[k], 4))
                summary["max_abs"].setdefault(k, 0.0)
                summary["max_abs"][k] = max(summary["max_abs"][k],
                                            abs(l1[k] - l2[k]))
            # recurrence at this station
            if len(e1) >= 2 and len(e2) >= 2:
                rec1 = e1[-1]["onset_yr"] - e1[-2]["onset_yr"]
                rec2 = e2[-1]["onset_yr"] - e2[-2]["onset_yr"]
                row["recurrence_yr"] = (round(rec1, 2), round(rec2, 2))
                summary["max_abs"].setdefault("recurrence_yr", 0.0)
                summary["max_abs"]["recurrence_yr"] = max(
                    summary["max_abs"]["recurrence_yr"], abs(rec1 - rec2))
        row["log10V_interseismic"] = (
            None if r1[d]["log10V_inter"] is None
            else round(r1[d]["log10V_inter"], 3),
            None if r2[d]["log10V_inter"] is None
            else round(r2[d]["log10V_inter"], 3))
        print(json.dumps(row))
    summary["max_abs"] = {k: round(v, 4)
                          for k, v in summary["max_abs"].items()}
    print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()
