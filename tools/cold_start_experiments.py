#!/usr/bin/env python
"""Cold-start experiments (VERDICT r2 next #8): can a fresh process
reach its first result in < 60 s despite ~100 s of remote compiles?

Two mitigations are measured (each in its own stage; run when the
tunnel is healthy, results go to stderr + one JSON line):

  1. parallel-compile — the axon remote-compile path is a network
     service; if it accepts concurrent compiles, a process that needs
     k programs (solver + preconditioner + RHS builder ...) can
     compile them in k threads and pay ~max instead of ~sum.
     Measured: two DISTINCT mid-size chained-stencil programs compiled
     sequentially vs in two threads.

  2. compact-first — `dia_apply_compact` (scan over a traced offset
     array) has ~10x smaller HLO than the unrolled stencil at p=6.
     If remote compile time tracks program size, a serving process can
     compile the compact program first (fast first result, 3.5x slower
     steady-state) and swap in the unrolled program when its
     background compile lands.  Measured: compile+first-result time of
     the compact vs unrolled form of the same p=6 chained apply.

Usage: python tools/cold_start_experiments.py [--stages 1 2]
"""
import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.environ.setdefault("HYBRIDSBP_X64", "0")


def _log(msg):
    print(f"# [{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", type=int, nargs="+", default=[1, 2])
    ap.add_argument("--N", type=int, default=128)
    ap.add_argument("--E", type=int, default=8)
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hybridsbp_tpu.tpu.stencil import (DiaOperator, dia_apply_compact,
                                           to_dia)
    from hybridsbp_tpu.mesh import create_metrics
    from hybridsbp_tpu.ops2d import locoperator
    from hybridsbp_tpu.tpu.pallas_stencil import dia_apply_batched

    backend = jax.default_backend()
    _log(f"backend = {backend}")
    out = {"backend": backend}

    # p=6 curved-metric block operator (the expensive program family)
    N = a.N
    p = 6

    def xt(r, s):
        return (r + 0.05 * np.sin(np.pi * s) * (1 - r ** 2),
                1 - 0.1 * np.sin(np.pi * s) * r,
                0.05 * np.pi * np.cos(np.pi * s) * (1 - r ** 2))

    def yt(r, s):
        return (s + 0.05 * np.sin(np.pi * r) * (1 - s ** 2),
                0.05 * np.pi * np.cos(np.pi * r) * (1 - s ** 2),
                1 - 0.1 * np.sin(np.pi * r) * s)

    metrics = create_metrics(p, N, N, xt, yt)
    lop = locoperator(p, N, N, metrics)
    op = to_dia(lop.M, N + 1, N + 1, dtype=jnp.float32)
    noff = len(op.offsets)
    _log(f"built p={p} N={N} operator: {noff} planes")

    # operator arrays enter the jitted programs as ARGUMENTS — closure
    # arrays serialize into the HLO as literal constants (remote-compile
    # HTTP 413; TODO.md environment constraints)
    coefs = jnp.asarray(
        np.tile(np.asarray(op.coefs)[None], (a.E, 1, 1, 1)),
        dtype=jnp.float32)
    u = jnp.zeros((a.E, N + 1, N + 1), jnp.float32) \
        .at[:, N // 2, N // 2].set(1.0)
    k = jnp.asarray(8, jnp.int32)

    def chained_unrolled(variant):
        # `variant` perturbs the program so each compile is distinct
        # (no executable-cache hits between the seq/par arms)
        @jax.jit
        def runner(c, x, iters):
            def step(v):
                y = dia_apply_batched(c, op.offsets, v, use_pallas=False)
                return y / (jnp.max(jnp.abs(y)) + np.float32(variant))
            return jnp.sum(jax.lax.fori_loop(
                0, iters, lambda i, v: step(v), x, unroll=1))
        return runner

    if 1 in a.stages:
        _log("stage 1: sequential vs parallel remote compile "
             "(2 distinct programs)")
        t0 = time.time()
        for variant in (1e-30, 2e-30):
            float(chained_unrolled(variant)(coefs, u, k))
        t_seq = time.time() - t0
        _log(f"  sequential 2-program compile+run: {t_seq:.1f}s")

        results = {}

        def compile_one(variant):
            t = time.time()
            float(chained_unrolled(variant)(coefs, u, k))
            results[variant] = time.time() - t

        t0 = time.time()
        threads = [threading.Thread(target=compile_one, args=(v,))
                   for v in (3e-30, 4e-30)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        t_par = time.time() - t0
        _log(f"  parallel 2-program compile+run: {t_par:.1f}s "
             f"(each: {[round(v, 1) for v in results.values()]})")
        out["seq_2prog_s"] = round(t_seq, 1)
        out["par_2prog_s"] = round(t_par, 1)
        out["parallel_speedup"] = round(t_seq / t_par, 2)

    if 2 in a.stages:
        _log("stage 2: compact-first vs unrolled compile+first-result")

        @jax.jit
        def compact_runner(c, x, iters):
            def step(v):
                o = DiaOperator(coefs=c, offsets=op.offsets)
                y = jax.vmap(lambda ue: dia_apply_compact(o, ue))(v)
                return y / (jnp.max(jnp.abs(y)) + 1e-30)
            return jnp.sum(jax.lax.fori_loop(
                0, iters, lambda i, v: step(v), x, unroll=1))

        c1 = jnp.asarray(np.asarray(op.coefs), jnp.float32)
        t0 = time.time()
        float(compact_runner(c1, u, k))
        t_compact = time.time() - t0
        _log(f"  compact compile+first-result: {t_compact:.1f}s")

        t0 = time.time()
        float(chained_unrolled(5e-30)(coefs, u, k))
        t_unrolled = time.time() - t0
        _log(f"  unrolled compile+first-result: {t_unrolled:.1f}s")
        out["compact_first_s"] = round(t_compact, 1)
        out["unrolled_first_s"] = round(t_unrolled, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
