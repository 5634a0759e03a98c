#!/usr/bin/env python
"""Does the Neumaier-compensated f32 state fix the serving mode's
event-timing drift? (round-5 follow-up to the on-chip finding that the
f32 STATE drifts individual late recurrences by 20-28 yr at canonical
Dc=0.008 — artifacts/bp1mb_onchip_r5.json.)

Canonical multiblock BP1-QD (194-block BP1_v1 mesh, Dc=0.008, N=16,
700 yr, rtol=1e-4) in three configurations on one platform:
  f64 state + f64 Newton           — truth
  f32 state + f32 Newton           — plain serving mode
  f32 state + f32 Newton + comp    — compensated serving mode
Reports the event series of each and the max |dt| against truth.

Usage: python tools/probe_compensated_state.py [--platform cpu]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None,
                    help="cpu forces the CPU backend (default: whatever "
                         "the environment provides)")
    ap.add_argument("--years", type=float, default=700.0)
    ap.add_argument("--N", type=int, default=16)
    ap.add_argument("--rtol", type=float, default=1e-4)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "artifacts",
        "compensated_state_r5.json"))
    a = ap.parse_args()
    if a.platform:
        os.environ["HYBRIDSBP_PLATFORM"] = a.platform

    import jax
    import jax.numpy as jnp

    from hybridsbp_tpu.seas import bp1_multiblock as mb
    from hybridsbp_tpu.seas.bp1 import YEAR_SECONDS, BP1Params
    from hybridsbp_tpu.seas.events import merged_events

    backend = jax.default_backend()
    par = BP1Params(N=a.N, RSDc=0.008)
    out = {"backend": backend, "N": a.N, "Dc": 0.008,
           "sim_years": a.years, "rtol": a.rtol}

    configs = [
        ("f64", jnp.float64, jnp.float64, False),
        ("f32_plain", jnp.float32, jnp.float32, False),
        ("f32_comp", jnp.float32, jnp.float32, True),
    ]
    series = {}
    for tag, sdt, ndt, comp in configs:
        t0 = time.time()
        mp = mb.setup(par=par, N=a.N, dtype=sdt)
        fns = mb.make_cycle_fns(mp, newton_dtype=ndt)
        sol = mb.run(mp, sim_years=a.years, rtol=a.rtol,
                     max_steps=400_000, _fns=fns, compensated=comp)
        wall = time.time() - t0
        ev, coseis, maxlv = merged_events(sol, YEAR_SECONDS)
        series[tag] = np.asarray(ev)
        out[tag] = {
            "wall_s": round(wall, 1),
            "steps": int(sol.stats.naccept) + int(sol.stats.nreject),
            "events": len(ev),
            "event_times_yr": [round(float(e), 3) for e in ev],
            "late_recurrence_yr": [round(float(r), 3)
                                   for r in np.diff(ev)[1:]],
            "coseismic_m": [round(float(c), 4) for c in coseis],
            "max_log10_v": round(maxlv, 3),
            "success": bool(sol.stats.success)}
        print(json.dumps({tag: out[tag]}), flush=True)

    for tag in ("f32_plain", "f32_comp"):
        if len(series[tag]) == len(series["f64"]):
            out[f"{tag}_max_dt_yr"] = round(float(
                np.max(np.abs(series[tag] - series["f64"]))), 3)
        else:
            out[f"{tag}_max_dt_yr"] = None   # event count differs
    os.makedirs(os.path.dirname(a.out), exist_ok=True)
    with open(a.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
