#!/usr/bin/env python
"""Measured sweep of the Woodbury inner-sweep length (and banded-B CG
count) using chained RTT-free timing — picks the fastest CONVERGED
config for the hybrid device solve at reference scale.

The preconditioner cost per outer iteration is dominated by TWO
fixed-length fastdiag-CG inner sweeps (profile_solve.py: 2 x 2.75 ms of
a 5.7 ms Woodbury apply at N=68), so inner_iters trades per-outer cost
against outer count; binv_iters is the banded trace-inverse CG count
inside each Woodbury apply (profiled cheap: 474 us at 32).

Usage: python tools/tune_inner.py [--p 6] [--N 68] [--method
         displacements] [--inner 4,6,8,12] [--binv 16,32]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "drivers"))


def _log(msg):
    print(f"# [{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p", type=int, default=6)
    ap.add_argument("--N", type=int, default=68)
    ap.add_argument("--method", default="displacements")
    ap.add_argument("--inner", default="4,6,8,12",
                    help="sweep lengths; a 'k:k2' entry sets the "
                         "trace-correction sweep (inner_iters2) "
                         "separately")
    ap.add_argument("--binv", default="32")
    ap.add_argument("--precond-bf16", action="store_true",
                    help="bf16 coefficient stacks inside the Woodbury "
                         "inner sweeps (outer matvec stays exact)")
    ap.add_argument("--trace-inner-tol", default=None,
                    help="comma-separated inner_tol values for "
                         "method=trace (default: tol*0.2, the measured "
                         "optimum); each is a separate config")
    ap.add_argument("--check-host", action="store_true",
                    help="also report rel err vs the host f64 direct "
                         "solve (required when loosening the trace "
                         "inner tol — inexact inner solves perturb the "
                         "final reconstruction, TODO.md r2 lesson)")
    ap.add_argument("--tol", type=float, default=1e-6)
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from square_circle import assemble_level
    from hybridsbp_tpu.tpu import build_blocked, make_jit_solver
    from hybridsbp_tpu.tpu import multiblock as mb

    backend = jax.default_backend()
    _log(f"backend={backend}; assembling p={a.p} N={a.N}")
    prob, g, gd = assemble_level(a.p, a.N)[:3]
    bp = build_blocked(prob, dtype=jnp.float32)
    gb, gdf = mb.blocked_rhs_from_host(prob, g, gd)
    gb, gdf = jnp.asarray(gb, jnp.float32), jnp.asarray(gdf, jnp.float32)
    u_host = None
    if a.check_host:
        _log("host f64 direct solve (error oracle)")
        u_host, _ = prob.solve(g, gd, method="trace")

    def parse_inner(s):
        k, _, k2 = s.partition(":")
        return int(k), (int(k2) if k2 else None)

    itols = ([None] if a.trace_inner_tol is None
             else [float(x) for x in a.trace_inner_tol.split(",")])
    if a.method == "trace":
        # the trace method's inner solves are tol-driven (solve_trace);
        # inner_iters/inner_iters2/--precond-bf16 only shape the
        # displacements-path Woodbury preconditioner — sweeping them
        # here would emit identical solvers under different labels
        if a.inner != "8" or a.precond_bf16:
            _log("method=trace ignores inner_iters/--precond-bf16 "
                 "(tol-driven inner solves); sweeping only "
                 "--trace-inner-tol")
        a.inner = "8"
    results = []
    for bi in [int(x) for x in a.binv.split(",")]:
        ti = mb.build_woodbury_banded(bp, prob, iters=bi)
        for (ii, ii2), itol in [(parse_inner(x), it)
                                for x in a.inner.split(",")
                                for it in itols]:
            try:
                _log(f"inner_iters={ii}:{ii2} binv={bi} itol={itol}: "
                     "compile + chain")
                sj = make_jit_solver(
                    bp, method=a.method, trace_inv=ti,
                    tol=a.tol, maxiter=200,
                    inner_iters=ii, inner_iters2=ii2,
                    trace_inner_tol=itol,
                    precond_coef_dtype=(jnp.bfloat16 if a.precond_bf16
                                        else None))

                from hybridsbp_tpu.utils.profiling import chained_time
                dt = chained_time(
                    lambda g_, a_, gd_, sj=sj: sj.fn(a_, g_, gd_).x,
                    (gb, sj.arrs, gdf))
                res = sj(gb, gdf)
                outers = int(res.iters)
                conv = bool(res.converged)
                row = {"inner_iters": ii, "inner_iters2": ii2,
                       "binv_iters": bi, "inner_tol": itol,
                       "outers": outers, "converged": conv,
                       "t_chained_ms": round(dt * 1e3, 2),
                       "backend": backend}
                if u_host is not None:
                    err = np.abs(np.asarray(res.x).ravel()
                                 - u_host).max()
                    row["rel_err"] = float(
                        f"{err / np.abs(u_host).max():.3g}")
                results.append(row)
                print(json.dumps(row), flush=True)
            except Exception as e:                        # noqa: BLE001
                _log(f"config ({ii},{bi}) FAILED: "
                     f"{type(e).__name__}: {str(e)[:200]}")

    ok = [r for r in results if r["converged"]]
    best = min(ok, key=lambda r: r["t_chained_ms"]) if ok else None
    print(json.dumps({"best": best, "method": a.method, "p": a.p,
                      "N": a.N}), flush=True)


if __name__ == "__main__":
    main()
