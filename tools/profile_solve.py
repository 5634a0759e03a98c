#!/usr/bin/env python
"""On-chip breakdown of the hybrid device solve's per-iteration cost.

The flagship solve (p=6 N=136) runs 4 outer FCG iterations in ~190 ms,
but the DIA matvec inside it totals only ~25 ms — this tool times each
composition piece (chained two-point fit, operator arrays as jit
ARGUMENTS per the HTTP-413 lesson) so optimization targets are measured,
not guessed:

  dia          local stencil apply (stencil='auto')
  coupled      full displacement matvec (dia + banded face coupling)
  fastdiag     batched fastdiag block preconditioner apply
  inner_sweep  cg_fixed(inner_iters) fastdiag-CG block sweep
  banded_mv    one banded trace matvec (TraceBanded block einsum)
  traceinv     apply_traceinv on the banded B (iters-step block-CG)
  woodbury     one full Woodbury preconditioner application
  solve_*      full jitted solves (displacements + trace), ms and
               ms/outer-iteration

Prints one JSON line per piece (partial runs still yield data).

Usage: python tools/profile_solve.py [--p 6] [--N 68] [--inner-iters 8]
         [--binv-iters 32] [--skip-solves] [--only dia,coupled,...]
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

os.environ.setdefault("HYBRIDSBP_X64", "1")


def _log(msg):
    print(f"# [{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p", type=int, default=6)
    ap.add_argument("--N", type=int, default=68)
    ap.add_argument("--inner-iters", type=int, default=8)
    ap.add_argument("--binv-iters", type=int, default=32)
    ap.add_argument("--iters", type=int, nargs=2, default=(20, 60))
    ap.add_argument("--skip-solves", action="store_true")
    ap.add_argument("--only", default=None)
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from square_circle import assemble_level
    from hybridsbp_tpu.tpu import build_blocked
    from hybridsbp_tpu.tpu import multiblock as mb

    backend = jax.default_backend()
    _log(f"backend={backend}; host assembly p={a.p} N={a.N}")
    t0 = time.time()
    prob, g, gdelta = assemble_level(a.p, a.N)[:3]
    _log(f"assembled {len(prob.lops)} blocks in {time.time() - t0:.0f}s")
    bp = build_blocked(prob, dtype=jnp.float32)
    ti = mb.build_woodbury_banded(bp, prob, iters=a.binv_iters)
    gb, gd = mb.blocked_rhs_from_host(prob, g, gdelta)
    gb, gd = jnp.asarray(gb, jnp.float32), jnp.asarray(gd, jnp.float32)
    E = bp.nblocks
    arrs = mb.bp_arrays(bp)
    arrs["Binv"] = mb.traceinv_arrays(ti)
    _log(f"device form ready: E={E}, grid {bp.grid_shape}, "
         f"nfaces={bp.Dinv.shape[0]}, nif={len(ti.faceids)}, "
         f"K={ti.nbr.shape[1]}, L={bp.Dinv.shape[1]}")

    rng = np.random.default_rng(0)
    u0 = jnp.asarray(rng.standard_normal(gb.shape), jnp.float32)
    t0f = jnp.asarray(rng.standard_normal(bp.Dinv.shape), jnp.float32)
    tc0 = jnp.asarray(rng.standard_normal((len(ti.faceids),)
                                          + bp.Dinv.shape[-1:]),
                      jnp.float32)

    def norm(y):
        return y / (jnp.max(jnp.abs(y)) + 1e-30)

    def chain_time(fn, x0, k1, k2):
        """Two-point chained fit; operator arrays enter as jit args.

        Deliberately NOT utils.profiling.chained_time: raw operator
        pieces (dia, coupled, fastdiag, ...) are unbounded maps whose
        chains diverge, so each link here max-abs NORMALIZES its
        output; the shared helper serializes without normalizing and
        is for solve-like bounded maps."""
        @jax.jit
        def runner(ar, x, iters):
            body = lambda i, v: norm(fn(ar, v))  # noqa: E731
            x = jax.lax.fori_loop(0, iters, body, x, unroll=1)
            return jnp.sum(x)

        def timed(iters, repeats=5):
            kk = jnp.asarray(iters, jnp.int32)
            s = float(runner(arrs, x0, kk))
            assert np.isfinite(s), "chain diverged"
            ts = []
            for _ in range(repeats):
                t1 = time.perf_counter()
                float(runner(arrs, x0, kk))
                ts.append(time.perf_counter() - t1)
            return float(np.median(ts))

        k1t, k2t = timed(k1), timed(k2)
        return (k2t - k1t) / (k2 - k1)

    from hybridsbp_tpu.tpu.cg import cg_fixed
    from hybridsbp_tpu.tpu.fastdiag import fastdiag_apply

    def with_bp(fn):
        def f(ar, v):
            return fn(mb.bp_with(bp, ar), v)
        return f

    def fd_of(ar):
        fd = ar["fd"]
        return lambda r: jax.vmap(fastdiag_apply)(fd, r)

    def inner_sweep(ar, r):
        bp2 = mb.bp_with(bp, ar)
        return cg_fixed(lambda u: mb._dia_apply_batched(bp2, u, "auto"),
                        r, a.inner_iters, precond=fd_of(ar))

    def traceinv(ar, t):
        return mb.apply_traceinv(mb.traceinv_with(ti, ar["Binv"]), t)

    def banded_mv(ar, t):
        return mb._banded_matvec(mb.traceinv_with(ti, ar["Binv"]), t)

    def woodbury(ar, r):
        bp2 = mb.bp_with(bp, ar)
        M = mb.woodbury_precond(bp2, mb.traceinv_with(ti, ar["Binv"]),
                                inner_iters=a.inner_iters)
        return M(r)

    pieces = {
        "dia": (with_bp(lambda b2, v:
                        mb._dia_apply_batched(b2, v, "auto")), u0),
        "coupled": (with_bp(mb.displacement_matvec), u0),
        "fastdiag": (lambda ar, v: fd_of(ar)(v), u0),
        "inner_sweep": (inner_sweep, u0),
        "banded_mv": (banded_mv, tc0),
        "traceinv": (traceinv, t0f),
        "woodbury": (woodbury, u0),
    }
    only = set(a.only.split(",")) if a.only else None
    k1, k2 = a.iters
    results = {}
    for name, (fn, x0) in pieces.items():
        if only and name not in only:
            continue
        try:
            _log(f"{name}: compiling + timing")
            kk1, kk2 = (k1, k2)
            if name in ("inner_sweep", "woodbury", "traceinv"):
                kk1, kk2 = max(2, k1 // 4), max(6, k2 // 4)
            dt = chain_time(fn, x0, kk1, kk2)
            results[name] = round(dt * 1e6, 1)
            print(json.dumps({"piece": name, "t_us": round(dt * 1e6, 1),
                              "backend": backend}), flush=True)
        except Exception as e:                                # noqa: BLE001
            _log(f"{name} FAILED: {type(e).__name__}: {str(e)[:200]}")
            print(json.dumps({"piece": name, "error": str(e)[:200]}),
                  flush=True)

    if not a.skip_solves and (only is None or "solve" in only):
        for method in ("displacements", "trace"):
            try:
                _log(f"solve[{method}]: compiling + timing")
                sj = mb.make_jit_solver(bp, method=method, trace_inv=ti,
                                        tol=1e-6, maxiter=200,
                                        inner_iters=a.inner_iters)
                res = sj(gb, gd)
                res.x.block_until_ready()
                iters = int(res.iters)
                ts = []
                for _ in range(5):
                    t1 = time.perf_counter()
                    r2 = sj(gb, gd)
                    float(r2.resnorm)
                    ts.append(time.perf_counter() - t1)
                wall = float(np.median(ts))
                results[f"solve_{method}"] = round(wall * 1e3, 1)
                print(json.dumps({
                    "piece": f"solve_{method}", "t_ms": round(wall * 1e3, 1),
                    "iters": iters,
                    "ms_per_outer": round(wall * 1e3 / max(iters, 1), 2),
                    "converged": bool(res.converged),
                    "backend": backend}), flush=True)
            except Exception as e:                            # noqa: BLE001
                _log(f"solve[{method}] FAILED: "
                     f"{type(e).__name__}: {str(e)[:200]}")

    print(json.dumps({"summary": results, "backend": backend,
                      "p": a.p, "N": a.N,
                      "inner_iters": a.inner_iters,
                      "binv_iters": a.binv_iters}), flush=True)


if __name__ == "__main__":
    main()
