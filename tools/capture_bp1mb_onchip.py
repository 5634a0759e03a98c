#!/usr/bin/env python
"""On-chip canonical multiblock BP1-QD cycle capture (VERDICT r4 next #7).

bench's ``bp1_cycle_s`` times the single-block variant; the externally
validated physics path — the 194-block BP1_v1 mesh with canonical
Dc=0.008, coupled through the hybrid trace solve (RESULTS.md round 4:
78.4-yr recurrence vs published ~78) — had no TPU wall number.  This
captures it: host setup once (Kff unit-slip solves through the hybrid
solver), then the full 700-yr cycle at the gate's tolerance
(rtol=1e-4) integrated warm on chip in both friction-Newton dtypes
(f64 = fidelity default, f32 = the compensated pure-f32 serving mode).

Ref: /root/reference/seas/BP1/BP1.jl:159-161 (the cycle loop the
reference integrates host-side).

Usage: python tools/capture_bp1mb_onchip.py [--years 700] [--repeat 3]
Writes artifacts/bp1mb_onchip_r5.json and prints one JSON line.
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
    ap.add_argument("--years", type=float, default=700.0)
    ap.add_argument("--N", type=int, default=16)
    ap.add_argument("--rtol", type=float, default=1e-4)
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--max-steps", type=int, default=400_000)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "float64"],
                    help="state/Kff dtype (float64 = full-fidelity "
                         "canonical series, emulated f64 on TPU)")
    ap.add_argument("--newton", default="both",
                    choices=["both", "float32", "float64"])
    ap.add_argument("--compensated", action="store_true",
                    help="carry the Neumaier state low word (the f32 "
                         "serving mode's event-fidelity fix)")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "artifacts",
        "bp1mb_onchip_r5.json"))
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hybridsbp_tpu.seas import bp1_multiblock as mb
    from hybridsbp_tpu.seas.bp1 import YEAR_SECONDS, BP1Params
    from hybridsbp_tpu.seas.events import merged_events

    backend = jax.default_backend()
    print(f"backend: {backend}", flush=True)

    state_dt = {"float32": jnp.float32, "float64": jnp.float64}[a.dtype]
    t0 = time.time()
    par = BP1Params(N=a.N, RSDc=0.008)       # canonical SEAS BP1-QD
    mp = mb.setup(par=par, N=a.N, dtype=state_dt, verbose=True)
    setup_s = time.time() - t0
    print(f"setup ({mp.n_fault} fault dofs): {setup_s:.1f}s", flush=True)

    out = {"backend": backend, "N": a.N, "Dc": 0.008,
           "sim_years": a.years, "rtol": a.rtol, "state_dtype": a.dtype,
           "compensated": bool(a.compensated),
           "n_fault": int(mp.n_fault), "setup_s": round(setup_s, 1)}

    configs = [("newton_f64", jnp.float64), ("newton_f32", jnp.float32)]
    if a.newton == "float64":
        configs = [("newton_f64", jnp.float64)]
    elif a.newton == "float32":
        configs = [("newton_f32", jnp.float32)]

    for tag, ndt in configs:
        fns = mb.make_cycle_fns(mp, newton_dtype=ndt)
        t0 = time.time()
        sol = mb.run(mp, sim_years=a.years, rtol=a.rtol,
                     max_steps=a.max_steps, _fns=fns,
                     compensated=a.compensated)
        float(sol.t_final)                   # scalar fetch = real sync
        cold_s = time.time() - t0
        walls = []
        for _ in range(a.repeat):
            t0 = time.time()
            sol = mb.run(mp, sim_years=a.years, rtol=a.rtol,
                         max_steps=a.max_steps, _fns=fns,
                         compensated=a.compensated)
            float(sol.t_final)
            walls.append(time.time() - t0)
        warm = float(np.median(walls))
        nacc = int(sol.stats.naccept)
        nrej = int(sol.stats.nreject)
        steps = nacc + nrej
        ev, coseis, maxlv = merged_events(sol, YEAR_SECONDS)
        recs = np.diff(ev)[1:] if len(ev) > 2 else np.diff(ev)
        out[tag] = {
            "cold_s": round(cold_s, 1),
            "warm_s": round(warm, 3),
            "warm_walls_s": [round(w, 3) for w in walls],
            "steps": steps, "naccept": nacc, "nreject": nrej,
            "ms_per_step": round(warm * 1e3 / max(steps, 1), 4),
            "sim_years_per_s": round(a.years / warm, 1),
            "events": len(ev),
            "event_times_yr": [round(float(e), 2) for e in ev],
            "late_recurrence_yr": [round(float(r), 2) for r in recs],
            "coseismic_m": [round(float(c), 3) for c in coseis],
            "max_log10_v": round(maxlv, 3),
            "success": bool(sol.stats.success),
        }
        print(json.dumps({tag: out[tag]}), flush=True)

    os.makedirs(os.path.dirname(a.out), exist_ok=True)
    with open(a.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
