#!/usr/bin/env python
"""Measure the flagship-mesh DIA apply on-chip and calibrate the
multi-chip strong-scaling model's t_apply term (VERDICT r2 next #9,
"measured calibration" follow-up).

The batched per-block apply time depends only on SHAPES (E blocks,
noff offset planes, (Nsp, Nrp) block size), not coefficient values, so
this tool:

  1. assembles the 56-block square_circle mesh at a COARSE N to read
     the union DIA offset pattern the real solver uses
     (build_blocked(...).offsets — 133 planes for fully-curved p=6,
     crs != 0),
  2. synthesizes random coefficients at the flagship shape
     (E, noff, N+1, N+1) ON the device (no 560 MB tunnel transfer),
  3. times dia_apply_batched with the chained two-point fit
     (bench.py methodology: traced trip count, scalar fetch,
     median-of-5 per fit point),
  4. prints one JSON line with the measured t_apply_us and the
     scaling-model rows recomputed from it (vs the roofline-default
     rows in tools/scaling_model.py).

Usage: python tools/calibrate_scaling.py [--p 6] [--N 136] [--coarse 16]
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

os.environ.setdefault("HYBRIDSBP_X64", "0")


def _log(msg):
    print(f"# [{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p", type=int, default=6)
    ap.add_argument("--N", type=int, default=136,
                    help="flagship per-block N (reference finest level)")
    ap.add_argument("--coarse", type=int, default=16,
                    help="coarse N used only to extract the offset "
                         "pattern (host assembly stays cheap)")
    ap.add_argument("--iters", type=int, nargs=2, default=(30, 90),
                    help="two-point fit chain lengths")
    ap.add_argument("--E", type=int, default=None,
                    help="override the block count (default: the "
                         "56-block square_circle mesh) — isolates "
                         "batch-size effects on the apply kernel")
    ap.add_argument("--flat", action="store_true",
                    help="time the 1D raveled-diagonal layout "
                         "(stencil.dia_apply_flat) instead of the 2D "
                         "plane layout — no lane-dim tile padding")
    ap.add_argument("--coef-dtype", default=None,
                    help="narrower coefficient storage dtype (e.g. "
                         "bfloat16) — measures whether the layout "
                         "realizes the halved coefficient stream "
                         "(the r2 plane layout did NOT: +3%%)")
    ap.add_argument("--sym", action="store_true",
                    help="with --flat: symmetric flat layout — store "
                         "only o >= 0 diagonals (operator symmetry "
                         "pairs the rest), HALVING the coefficient "
                         "stream at equal VPU cost")
    ap.add_argument("--pallas-flat", action="store_true",
                    help="with --flat: time the Pallas streaming kernel "
                         "(dia_apply_flat_stream — double-buffered "
                         "strip DMA + resident field) instead of XLA")
    ap.add_argument("--ko", type=int, default=8,
                    help="with --pallas-flat: offsets per DMA strip")
    ap.add_argument("--echunk", type=int, default=None,
                    help="with --flat: apply in lax.scan chunks of "
                         "this many blocks (tests whether bounding "
                         "the fusion working set stops XLA re-reading "
                         "the shifted field per offset at large E)")
    a = ap.parse_args()
    if a.sym and not a.flat:
        ap.error("--sym measures the symmetric FLAT layout: add --flat")
    if a.pallas_flat and not a.flat:
        ap.error("--pallas-flat requires --flat")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from square_circle import assemble_level
    from hybridsbp_tpu.tpu import build_blocked
    from hybridsbp_tpu.tpu.pallas_stencil import dia_apply_batched

    backend = jax.default_backend()
    _log(f"backend = {backend}")

    _log(f"coarse assembly p={a.p} N={a.coarse} for the offset pattern")
    prob, *_ = assemble_level(a.p, a.coarse)
    bp = build_blocked(prob, dtype=jnp.float32, with_fastdiag=False)
    offsets = tuple(tuple(int(x) for x in o) for o in np.asarray(bp.offsets))
    E, noff = len(prob.lops), len(offsets)
    if a.E is not None:
        E = a.E
    Np = a.N + 1
    _log(f"E={E} blocks, noff={noff} planes, block {Np}x{Np}")

    # synthesize the flagship-shape operand set on-device: the apply
    # streams coefs + u regardless of values; scale keeps the chain
    # finite (normalize by the plane count)
    key = jax.random.PRNGKey(0)
    if a.flat:
        from hybridsbp_tpu.tpu.stencil import (dia_apply_flat,
                                               dia_apply_flat_sym)
        flat_offs = tuple(sorted({ds * Np + dr for ds, dr in offsets}))
        if a.sym:
            flat_offs = tuple(o for o in flat_offs if o >= 0)
        noff = len(flat_offs)
        coefs = jax.jit(lambda k: jax.random.normal(
            k, (E, noff, Np * Np), dtype=jnp.float32) / noff)(key)
        u = jax.jit(lambda k: jax.random.normal(
            k, (E, Np * Np), dtype=jnp.float32))(jax.random.PRNGKey(1))
        _log(f"flat layout: {noff} "
             f"{'symmetric (o>=0) ' if a.sym else ''}linear offsets")
    else:
        coefs = jax.jit(lambda k: jax.random.normal(
            k, (E, noff, Np, Np), dtype=jnp.float32) / noff)(key)
        u = jax.jit(lambda k: jax.random.normal(
            k, (E, Np, Np), dtype=jnp.float32))(jax.random.PRNGKey(1))
    if a.coef_dtype:
        coefs = jax.jit(lambda c: c.astype(a.coef_dtype))(coefs)
        _log(f"coefficient storage dtype: {a.coef_dtype}")
    jnp.sum(u).block_until_ready()

    # coefs enters as a jit ARGUMENT — closure arrays serialize into
    # the HLO as literal constants (560 MB at flagship shape -> remote-
    # compile HTTP 413; see TODO.md environment constraints)
    K = a.echunk
    if K:
        assert a.flat and E % K == 0, "--echunk requires --flat and K | E"

    @jax.jit
    def runner(c, x, iters):
        def body(_, v):
            if a.flat and a.pallas_flat:
                from hybridsbp_tpu.tpu.pallas_stencil import (
                    dia_apply_flat_stream)
                y = dia_apply_flat_stream(c, flat_offs, v, KO=a.ko,
                                          sym=a.sym)
            elif a.flat and K:
                ap_one = dia_apply_flat_sym if a.sym else dia_apply_flat
                cc = c.reshape(E // K, K, *c.shape[1:])
                vv = v.reshape(E // K, K, v.shape[-1])
                y = jax.lax.map(
                    lambda cv: ap_one(cv[0], flat_offs, cv[1]),
                    (cc, vv)).reshape(v.shape)
            elif a.flat and a.sym:
                y = dia_apply_flat_sym(c, flat_offs, v)
            elif a.flat:
                y = dia_apply_flat(c, flat_offs, v)
            else:
                y = dia_apply_batched(c, bp.offsets, v, use_pallas=False)
            return y / (jnp.max(jnp.abs(y)) + 1e-30)
        x = jax.lax.fori_loop(0, iters, body, x, unroll=1)
        return jnp.sum(x)

    def timed(iters, repeats=5):
        k = jnp.asarray(iters, dtype=jnp.int32)
        s = float(runner(coefs, u, k))
        assert np.isfinite(s), "chain diverged"
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(runner(coefs, u, k))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    k1, k2 = a.iters
    _log(f"timing chained apply (fit points {k1}, {k2})")
    t1 = timed(k1)
    t2 = timed(k2)
    t_apply_us = (t2 - t1) / (k2 - k1) * 1e6
    _log(f"t_apply = {t_apply_us:.1f} us "
         f"({t1*1e3:.1f} ms @ {k1}, {t2*1e3:.1f} ms @ {k2})")

    # roofline at (noff+2) f32 planes streamed per block
    roof_us = E * (noff + 2) * Np * Np * 4 / 819e9 * 1e6
    # recompute the scaling-model rows with the measured t_apply
    from scaling_model import MESHES, model
    m = MESHES["square_circle_p6"]
    rows = []
    for n in (1, 2, 4, 8, 16):
        t_iter, eff = model(m["E"], m["ifaces"], m["L"],
                            t_apply_us * 1e-6, n, 100.0, 1.0)
        rows.append({"chips": n, "t_iter_us": round(t_iter * 1e6, 1),
                     "efficiency": round(eff, 3)})
        _log(f"  n={n}: {t_iter*1e6:8.1f} us/iter, eff {eff:.2f}")

    print(json.dumps({
        "backend": backend, "p": a.p, "N": a.N, "E": E, "noff": noff,
        "layout": (("flat" if a.flat else "planes")
                   + ("+sym" if a.sym else "")
                   + ("+pallas" if a.pallas_flat else "")),
        "echunk": a.echunk, "coef_dtype": a.coef_dtype or "float32",
        "t_apply_us": round(t_apply_us, 1),
        "roofline_us": round(roof_us, 1),
        "pct_roofline": round(100 * roof_us / t_apply_us, 1),
        "calibrated_rows": rows}))


if __name__ == "__main__":
    main()
