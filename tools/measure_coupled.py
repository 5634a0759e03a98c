#!/usr/bin/env python
"""On-chip measurement of the coupled displacement matvec and the full
56-block square_circle device solve (one-off tool) — validates the
banded face-coupling representation's win over the r1/r2 dense form.

Times, on the real square_circle mesh (curved blocks, jump faces):
  - pure DIA apply (no face terms)        <- unchanged by the rework
  - coupled displacement matvec            <- face terms now banded
  - full fastdiag-CG displacement solve (f32, tol 1e-5)

r2 pre-banded baseline (RESULTS.md): solve 3.0 s warm at p=2 N=32;
the dense face tensors were an estimated 50-70%% of matvec traffic.

Usage: python tools/measure_coupled.py [p] [N]
"""
import sys
import time

sys.path.insert(0, ".")
import bench  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main(p=2, N=32):
    sys.path.insert(0, "drivers")
    from square_circle import assemble_level

    from hybridsbp_tpu.tpu import build_blocked, solve_displacements
    from hybridsbp_tpu.tpu.multiblock import (
        _dia_apply_batched,
        blocked_rhs_from_host,
        displacement_matvec,
    )

    print(f"backend={jax.default_backend()}  p={p} N={N}", flush=True)
    t0 = time.time()
    prob, g, gdelta = assemble_level(p, N)[:3]
    print(f"host assembly {time.time() - t0:.0f} s "
          f"({len(prob.lops)} blocks)", flush=True)
    bp = build_blocked(prob, dtype=jnp.float32, with_fastdiag=True)
    gb, gd = blocked_rhs_from_host(prob, g, gdelta)
    gb = jnp.asarray(gb, jnp.float32)
    gd = jnp.asarray(gd, jnp.float32)
    E = bp.nblocks
    noff = len(bp.offsets)
    nband = {lf: len(bp.faces.offs[lf]) for lf in range(4)}
    print(f"noff={noff} nband={nband}", flush=True)

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(gb.shape), jnp.float32)
    # normalize each chained application so the f32 chain stays finite
    amp = float(jnp.max(jnp.abs(displacement_matvec(bp, u)))
                / jnp.max(jnp.abs(u)))
    scale = np.float32(0.5 / amp)
    print(f"op amp ~{amp:.1e}; chain scale {scale:.1e}", flush=True)

    dt_dia = bench.per_iter_time(
        lambda v: scale * _dia_apply_batched(bp, v, "unrolled"), u)
    print(f"pure DIA apply      {dt_dia * 1e6:9.1f} us", flush=True)
    dt_mv = bench.per_iter_time(
        lambda v: scale * displacement_matvec(bp, v, stencil='unrolled'), u)
    print(f"coupled matvec      {dt_mv * 1e6:9.1f} us "
          f"(face overhead {100 * (dt_mv - dt_dia) / dt_mv:.0f}%)",
          flush=True)

    def solve():
        res = solve_displacements(bp, gb, gd, tol=1e-5, maxiter=1200)
        return int(res.iters), float(res.resnorm)

    iters, rn = solve()
    ts = []
    for _ in range(3):
        t1 = time.perf_counter()
        solve()
        ts.append(time.perf_counter() - t1)
    wall = float(np.median(ts))
    print(f"solve: {iters} iters, resnorm {rn:.2e}, "
          f"{wall:.3f} s warm ({wall / max(iters, 1) * 1e3:.2f} ms/iter)",
          flush=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
