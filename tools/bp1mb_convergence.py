#!/usr/bin/env python
"""Multiblock BP1 event-series resolution study (VERDICT r2 next #5):
run the BP1_v1 interior-fault cycle at increasing per-block N (f64)
and report the merged seismic event times, to find the resolution where
the event series converges; optionally an f32-Newton run at one N for
the f32-acceptability criterion.

Usage: python tools/bp1mb_convergence.py --N 16 32 64 [--years 1000]
       [--f32-at 32]
Prints one JSON line; per-N progress on stderr.
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


def merged_events(sol, year_seconds):
    # canonical definition lives in the library (one home for every gate)
    from hybridsbp_tpu.seas.events import merged_events as _me
    ev, _, _ = _me(sol, year_seconds)
    return [round(t, 2) for t in ev]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, nargs="+", default=[16, 32, 64])
    ap.add_argument("--years", type=float, default=1000.0)
    ap.add_argument("--f32-at", type=int, default=None)
    a = ap.parse_args()

    import jax.numpy as jnp
    from hybridsbp_tpu.seas import bp1_multiblock as mb
    from hybridsbp_tpu.seas.bp1 import YEAR_SECONDS

    out = {"years": a.years, "runs": {}}
    for N in a.N:
        t0 = time.time()
        mp = mb.setup(N=N)
        t_setup = time.time() - t0
        print(f"# N={N}: setup {t_setup:.0f}s ({mp.n_fault} fault dofs)",
              file=sys.stderr, flush=True)
        t0 = time.time()
        sol = mb.run(mp, sim_years=a.years, max_steps=200_000)
        t_run = time.time() - t0
        ev = merged_events(sol, YEAR_SECONDS)
        out["runs"][f"N{N}"] = {
            "events": ev, "n_events": len(ev),
            "n_fault": int(mp.n_fault),
            "setup_s": round(t_setup, 1), "run_s": round(t_run, 1),
            "accepted": int(sol.stats.naccept),
            "success": bool(sol.stats.success)}
        print(f"# N={N}: run {t_run:.0f}s, events {ev}",
              file=sys.stderr, flush=True)
        if a.f32_at == N:
            mp32 = mb.setup(N=N, dtype=jnp.float32)
            sol32 = mb.run(mp32, sim_years=a.years, max_steps=200_000,
                           newton_dtype=jnp.float32)
            ev32 = merged_events(sol32, YEAR_SECONDS)
            out["runs"][f"N{N}_f32"] = {"events": ev32,
                                        "n_events": len(ev32)}
            print(f"# N={N} f32: events {ev32}", file=sys.stderr,
                  flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
