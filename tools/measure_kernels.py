#!/usr/bin/env python
"""On-chip measurement of the DIA-apply representations (one-off tool).

Times the four coefficient-storage representations of the headline
bench workload (p=2 BP1-metric operator, E x (N+1)^2 blocks, f32
fields) with bench.py's tunnel-hardened two-point chained-loop fit:

  per-block f32   — the general case (r1 headline, ~roofline)
  per-block bf16  — half coefficient traffic, ~4e-3 operator error
  shared f32      — one stack for all blocks (exact; auto-detected)
  shared bf16     — both

Usage: python tools/measure_kernels.py [E] [N]
"""
import sys

sys.path.insert(0, ".")  # repo root
import bench  # noqa: E402  (runs the backend probe)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main(E=64, N=256):
    from hybridsbp_tpu.mesh import create_metrics
    from hybridsbp_tpu.ops2d import locoperator
    from hybridsbp_tpu.seas.bp1 import BP1Params, tan_stretch_maps
    from hybridsbp_tpu.tpu import to_dia
    from hybridsbp_tpu.tpu.pallas_stencil import (
        dia_apply_batched,
        dia_apply_shared,
    )

    print(f"backend={jax.default_backend()}  E={E} N={N}", flush=True)
    par = BP1Params(N=N, el=10.0)
    xt, yt = tan_stretch_maps(par)
    lop = locoperator(2, N, N, create_metrics(2, N, N, xt, yt))
    op = to_dia(lop.M, N + 1, N + 1, dtype=jnp.float32)
    offs = tuple(op.offsets)
    noff = len(offs)
    scale = np.float32(1.0 / abs(lop.M).sum(axis=1).max())

    c1 = jnp.asarray(np.asarray(op.coefs), dtype=jnp.float32)
    c1_bf = c1.astype(jnp.bfloat16)
    coefs = jax.jit(lambda c: jnp.tile(c[None], (E, 1, 1, 1)))(c1)
    coefs_bf = jax.jit(lambda c: jnp.tile(c[None], (E, 1, 1, 1)))(c1_bf)
    u = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(0), (E, N + 1, N + 1), dtype=jnp.float32))()

    # accuracy of the bf16 representation on this operator
    y = dia_apply_batched(coefs, offs, u, use_pallas=False)
    yb = dia_apply_batched(coefs_bf, offs, u, use_pallas=False)
    rel = float(jnp.max(jnp.abs(yb - y)) / jnp.max(jnp.abs(y)))
    print(f"bf16 apply max rel err = {rel:.3e}", flush=True)

    dofs = E * (N + 1) ** 2
    cases = {
        "per-block f32": lambda v: scale * dia_apply_batched(
            coefs, offs, v, use_pallas=False),
        "per-block bf16": lambda v: scale * dia_apply_batched(
            coefs_bf, offs, v, use_pallas=False),
        "shared f32": lambda v: scale * dia_apply_shared(c1, v, offs),
        "shared bf16": lambda v: scale * dia_apply_shared(c1_bf, v, offs),
    }
    results = {}
    for name, fn in cases.items():
        dt = bench.per_iter_time(fn, u)
        results[name] = dt
        print(f"{name:16s} {dt * 1e6:8.1f} us/apply "
              f"{dofs / dt / 1e9:7.2f} GDOF/s", flush=True)

    bw = bench.measure_hbm_bw()
    print(f"HBM bw {bw / 1e9:.0f} GB/s; f32 per-block roofline "
          f"{bw / ((noff + 2) * 4) / 1e9:.2f} GDOF/s "
          f"(noff={noff})", flush=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
