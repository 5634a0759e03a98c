#!/usr/bin/env python
"""On-chip capture: bf16-inner refined flagship solve (VERDICT r4 #4).

The r4 whole-chunk-upcast kernel fix made the bf16 chunked-flat apply
683.5 us vs 1100.6 us f32 (1.61x) at the flagship shape — but no
end-to-end solve number realized it.  This harness loads the flagship
cache (p=6 N=136, 1.05M DOF — the reference's finest level,
square_circle.jl:22,40,209), times

  (a) the plain f32 Woodbury-FCG displacements solve (the bench
      ``hybrid_flagship_chained_ms`` baseline, ~119.8 ms r4), and
  (b) ``tpu.refine.make_fixed_refined`` configurations — inner FCG on
      the consistently-bf16 operator + full-precision residual sweeps,
      one jitted program,

with chained (RTT-free) device timing, and reports each solution's max
error against the cached host f64 direct solution.  A config "wins" if
it beats the baseline chained time at the same error class (~8.5e-4).
Record the result either way (RESULTS.md; negative results are kept).
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "drivers"))


def main():
    ap = argparse.ArgumentParser()
    # CPU probe (r5, p=4 N=16): contraction ~0.15-0.17/sweep at
    # inner_tol <= 1e-3 (bf16-perturbation limited; tighter inner tol
    # buys nothing) — so the interesting flagship frontier is few
    # cheap sweeps (error class vs time) and 1e-2 inner sweeps (1
    # outer each)
    ap.add_argument("--configs", default="2:1e-3,3:1e-3,4:1e-3,5:1e-2",
                    help="comma list of sweeps:inner_tol")
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--inner-maxiter", type=int, default=60)
    ap.add_argument("--skip-baseline", action="store_true")
    ap.add_argument("--json-out", default=None)
    a = ap.parse_args()

    import jax  # noqa: F401

    from square_circle import load_flagship_problem

    from hybridsbp_tpu.tpu.multiblock import make_jit_solver
    from hybridsbp_tpu.tpu.refine import make_fixed_refined
    from hybridsbp_tpu.utils.profiling import chained_time

    bp, ti, gb, gd, u_host, meta = load_flagship_problem()
    umax = np.abs(u_host).max()
    E = meta["E"]
    out = {"nvol": meta["nvol"]}

    def rel_err(x):
        xe = np.asarray(x, dtype=np.float64)[:E].ravel()
        return float(np.abs(xe - u_host).max() / umax)

    if not a.skip_baseline:
        sj = make_jit_solver(bp, trace_inv=ti, tol=a.tol, maxiter=200)
        t0 = time.time()
        res = sj(gb, gd)
        res.x.block_until_ready()
        rn = float(res.resnorm)
        t_first = time.time() - t0
        rel = rel_err(res.x)
        tc = chained_time(lambda g_, ar, gd_: sj.fn(ar, g_, gd_).x,
                          (gb, sj.arrs, gd), k2=3)
        out["f32"] = dict(iters=int(res.iters), resnorm=rn,
                          rel_err=rel, chained_ms=tc * 1e3,
                          t_first_s=t_first)
        print(f"baseline f32: {int(res.iters)} iters, resnorm {rn:.2e}, "
              f"rel err {rel:.2e}, chained {tc * 1e3:.1f} ms "
              f"(first {t_first:.1f}s)", flush=True)

    for cfg in a.configs.split(","):
        s_str, tol_str = cfg.split(":")
        sweeps, itol = int(s_str), float(tol_str)
        solve = make_fixed_refined(bp, ti, sweeps=sweeps, inner_tol=itol,
                                   inner_maxiter=a.inner_maxiter)
        t0 = time.time()
        x, rn = solve(gb, gd)
        x.block_until_ready()
        rn = float(rn)
        t_first = time.time() - t0
        rel = rel_err(x)
        tc = chained_time(
            lambda g_, lo, hi, gd_: solve.fn(lo, hi, g_, gd_)[0],
            (gb, solve.arrs["lo"], solve.arrs["hi"], gd), k2=3)
        key = f"refined_s{sweeps}_t{tol_str}"
        out[key] = dict(sweeps=sweeps, inner_tol=itol, resnorm=rn,
                        rel_err=rel, chained_ms=tc * 1e3,
                        t_first_s=t_first)
        print(f"refined bf16 (sweeps={sweeps}, inner_tol={itol}): "
              f"resnorm {rn:.2e}, rel err {rel:.2e}, "
              f"chained {tc * 1e3:.1f} ms (first {t_first:.1f}s)",
              flush=True)

    print(json.dumps(out))
    if a.json_out:
        with open(a.json_out, "w") as fh:
            json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
