#!/usr/bin/env python
"""Probe why per-block bf16 DIA stacks don't realize the halved HBM
stream (one-off investigation; r2 measured only ~3% vs f32 at E=64,
N=257 where the 2x coefficient-traffic cut predicts ~1.6x).

Hypotheses probed with synthetic data (no host assembly):
  H1: raw bf16 streaming bandwidth is lower than f32's (axpy probe)
  H2: the lane/sublane padding of 257-wide arrays penalizes bf16 more
      ((16,128) tiles vs f32's (8,128)) -> compare N=256 vs 257
  H3: the upcast multiply defeats fusion only in the *batched* layout
      -> compare batched vs shared at the same shapes
"""
import sys
import time

sys.path.insert(0, ".")
import bench  # noqa: E402  (backend probe + timing infra)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def t(name, fn, init, k1=50, k2=200):
    dt = bench.per_iter_time(fn, init, k1=k1, k2=k2)
    print(f"{name:34s} {dt * 1e6:9.1f} us", flush=True)
    return dt


def main():
    print(f"backend={jax.default_backend()}", flush=True)

    # H1: streaming bandwidth, 512 MB working sets
    n = 128 * 1024 * 1024
    xf = jnp.ones((n,), jnp.float32)
    xb = jnp.ones((n,), jnp.bfloat16)
    d32 = t("axpy f32 (512MB rd + 512MB wr)", lambda v: 0.999999 * v + 1e-7,
            xf, k1=10, k2=40)
    d16 = t("axpy bf16 (256MB rd + 256MB wr)",
            lambda v: jnp.bfloat16(0.999999) * v + jnp.bfloat16(1e-7),
            xb, k1=10, k2=40)
    print(f"  -> bf16/f32 element rate ratio {d32 / d16:.2f} "
          f"(2.0 = full bandwidth win)", flush=True)
    del xf, xb

    # H2/H3: synthetic 9-plane stencil at N=256 (aligned) and 257
    offs = tuple((ds, dr) for ds in (-1, 0, 1) for dr in (-1, 0, 1))
    E = 64
    for N1 in (256, 257):
        key = jax.random.PRNGKey(0)
        u = jax.random.normal(key, (E, N1, N1), jnp.float32)
        cf = jax.random.normal(key, (E, 9, N1, N1), jnp.float32) * 0.1
        cb = cf.astype(jnp.bfloat16)
        c1f, c1b = cf[0], cb[0]

        def batched(coefs):
            def f(v):
                vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1)))
                out = jnp.zeros_like(v)
                for k, (ds, dr) in enumerate(offs):
                    out = out + coefs[:, k] * jax.lax.slice(
                        vp, (0, 1 + ds, 1 + dr), (E, 1 + ds + N1, 1 + dr + N1))
                return out
            return f

        def shared(coefs):
            def f(v):
                vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1)))
                out = jnp.zeros_like(v)
                for k, (ds, dr) in enumerate(offs):
                    out = out + coefs[k][None] * jax.lax.slice(
                        vp, (0, 1 + ds, 1 + dr), (E, 1 + ds + N1, 1 + dr + N1))
                return out
            return f

        print(f"-- N={N1} (E={E}, 9 planes)", flush=True)
        db32 = t("batched f32", batched(cf), u)
        db16 = t("batched bf16", batched(cb), u)
        t("shared f32", shared(c1f), u)
        t("shared bf16", shared(c1b), u)
        print(f"  -> batched bf16 speedup {db32 / db16:.2f} "
              f"(roofline predicts ~1.69)", flush=True)
        del u, cf, cb


if __name__ == "__main__":
    main()
