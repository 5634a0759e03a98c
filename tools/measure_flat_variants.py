#!/usr/bin/env python
"""One-process sweep of the flat-layout apply variants at the flagship
shape (56 blocks, p=6 fully-curved offsets, 137x137 f32) — the r3-late
kernel matrix: XLA flat / chunked, SYMMETRIC flat (half the coefficient
stream, stencil.flatten_dia_sym), the Pallas streaming kernel
(full + sym), and bf16 storage on the winners.

Prints one JSON line per variant (and a final summary line) so a
partial run still yields data if the tunnel drops mid-sweep.  Order is
chosen cheapest-compile-first, Pallas LAST (a Mosaic crash can wedge
the worker — everything XLA is already captured by then).

Usage: python tools/measure_flat_variants.py [--N 136] [--E 56]
         [--iters 30 90] [--skip-pallas] [--only sym,sym_chunk,...]
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
    ap.add_argument("--N", type=int, default=136)
    ap.add_argument("--E", type=int, default=56)
    ap.add_argument("--coarse", type=int, default=16)
    ap.add_argument("--iters", type=int, nargs=2, default=(30, 90))
    ap.add_argument("--ko", type=int, default=8)
    ap.add_argument("--eb", type=int, default=None,
                    help="blocks per Pallas program (sublane packing; "
                         "default: auto = largest pow2 divisor <= 8)")
    ap.add_argument("--echunk", type=int, default=8)
    ap.add_argument("--skip-pallas", action="store_true")
    ap.add_argument("--interpret", action="store_true",
                    help="run the Pallas variants in interpreter mode "
                         "(CPU smoke of the sweep harness)")
    ap.add_argument("--only", default=None,
                    help="comma-separated variant names to run")
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from square_circle import assemble_level
    from hybridsbp_tpu.tpu import build_blocked
    from hybridsbp_tpu.tpu.stencil import dia_apply_flat, dia_apply_flat_sym

    backend = jax.default_backend()
    _log(f"backend = {backend}")
    _log(f"coarse assembly p={a.p} N={a.coarse} for the offset pattern")
    prob, *_ = assemble_level(a.p, a.coarse)
    bp0 = build_blocked(prob, dtype=jnp.float32, with_fastdiag=False,
                        flat=False)
    offsets = tuple(tuple(int(x) for x in o) for o in np.asarray(bp0.offsets))
    E, Np = a.E, a.N + 1
    Nvol = Np * Np
    offs_full = tuple(sorted({ds * Np + dr for ds, dr in offsets}))
    offs_sym = tuple(o for o in offs_full if o >= 0)
    _log(f"E={E}, {len(offs_full)} flat offsets ({len(offs_sym)} sym), "
         f"block {Np}x{Np}")

    key = jax.random.PRNGKey(0)
    cf_full = jax.jit(lambda k: jax.random.normal(
        k, (E, len(offs_full), Nvol), dtype=jnp.float32)
        / len(offs_full))(key)
    cf_sym = jax.jit(lambda c: c[:, :len(offs_sym)])(cf_full)
    u = jax.jit(lambda k: jax.random.normal(
        k, (E, Nvol), dtype=jnp.float32))(jax.random.PRNGKey(1))
    float(jnp.sum(u))   # sync probe

    K = a.echunk

    def chunked(ap_one, offs):
        def f(c, v):
            cc = c.reshape(E // K, K, *c.shape[1:])
            vv = v.reshape(E // K, K, v.shape[-1])
            return jax.lax.map(
                lambda cv: ap_one(cv[0], offs, cv[1]),
                (cc, vv)).reshape(v.shape)
        return f

    def pallas(offs, sym):
        from hybridsbp_tpu.tpu.pallas_stencil import dia_apply_flat_stream

        def f(c, v):
            return dia_apply_flat_stream(c, offs, v, KO=a.ko, EB=a.eb,
                                         sym=sym, interpret=a.interpret)
        return f

    # name -> (coefs, apply(c, v))
    variants = {
        "flat": (cf_full,
                 lambda c, v: dia_apply_flat(c, offs_full, v)),
        "flat_chunk": (cf_full, chunked(dia_apply_flat, offs_full)),
        "sym": (cf_sym,
                lambda c, v: dia_apply_flat_sym(c, offs_sym, v)),
        "sym_chunk": (cf_sym, chunked(dia_apply_flat_sym, offs_sym)),
        "sym_chunk_bf16": (cf_sym.astype(jnp.bfloat16),
                           chunked(dia_apply_flat_sym, offs_sym)),
        "pallas": (cf_full, pallas(offs_full, False)),
        "pallas_bf16": (cf_full.astype(jnp.bfloat16),
                        pallas(offs_full, False)),
        "pallas_sym": (cf_sym, pallas(offs_sym, True)),
        "pallas_sym_bf16": (cf_sym.astype(jnp.bfloat16),
                            pallas(offs_sym, True)),
    }
    order = ["flat_chunk", "sym", "sym_chunk", "sym_chunk_bf16", "flat",
             "pallas", "pallas_bf16", "pallas_sym", "pallas_sym_bf16"]
    if a.skip_pallas:
        order = [n for n in order if not n.startswith("pallas")]
    if a.only:
        keep = set(a.only.split(","))
        order = [n for n in order if n in keep]

    k1, k2 = a.iters
    results = {}
    for name in order:
        coefs, ap_one = variants[name]

        @jax.jit
        def runner(c, x, iters, ap_one=ap_one):
            def body(_, v):
                y = ap_one(c, v)
                return y / (jnp.max(jnp.abs(y)) + 1e-30)
            return jnp.sum(jax.lax.fori_loop(0, iters, body, x, unroll=1))

        def timed(iters, repeats=5):
            kk = jnp.asarray(iters, dtype=jnp.int32)
            s = float(runner(coefs, u, kk))
            assert np.isfinite(s), f"{name}: chain diverged"
            ts = []
            for _ in range(repeats):
                t0 = time.perf_counter()
                float(runner(coefs, u, kk))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        try:
            _log(f"{name}: compiling + timing")
            t1, t2 = timed(k1), timed(k2)
            t_us = (t2 - t1) / (k2 - k1) * 1e6
            nplanes = coefs.shape[1]
            bytes_coef = E * nplanes * Nvol * coefs.dtype.itemsize
            results[name] = round(t_us, 1)
            print(json.dumps({
                "variant": name, "t_apply_us": round(t_us, 1),
                "planes": nplanes, "coef_MB": round(bytes_coef / 1e6, 1),
                "GBs_effective": round(bytes_coef / (t_us * 1e-6) / 1e9, 1),
                "backend": backend}), flush=True)
        except Exception as e:                                # noqa: BLE001
            _log(f"{name} FAILED: {type(e).__name__}: {str(e)[:300]}")
            results[name] = None
            print(json.dumps({"variant": name, "error": str(e)[:200]}),
                  flush=True)

    print(json.dumps({"summary": results, "backend": backend, "E": E,
                      "N": a.N, "nflat": len(offs_full),
                      "nsym": len(offs_sym)}), flush=True)


if __name__ == "__main__":
    main()
