#!/usr/bin/env python
"""MULTIBLOCK material inversion demo: recover a two-material field
through the trace-coupled hybrid solve (VERDICT r3 next #5).

The square_circle mesh is the natural testbed — its 56 blocks split
into the circle interior and exterior domains
(/root/reference/square_circle.jl:100-110), so the truth is a
two-material field mu_e = mu_in inside, 1 outside.  The forward model
scales the background BlockedHybrid exactly (the SBP-SAT operator is
degree-1 homogeneous in its coefficient planes — see
inverse.MBMaterialInversion) and differentiates through the coupled
implicit solve; jax.grad is the multiblock adjoint-state method.

Typical run (CPU f64, ~2-4 min):
  python drivers/invert_material_mb.py                 # square_circle
  python drivers/invert_material_mb.py --N 12 --steps 150
  python drivers/invert_material_mb.py --mesh-blocks 4 # virtual mesh
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p", type=int, default=2)
    ap.add_argument("--N", type=int, default=16)
    ap.add_argument("--K", type=int, default=4, help="number of sources")
    ap.add_argument("--per", type=int, default=2,
                    help="stations per block axis (per^2 per block)")
    ap.add_argument("--mu-in", type=float, default=2.0,
                    help="true material inside the circle (outside: 1)")
    ap.add_argument("--steps", type=int, default=250)
    ap.add_argument("--lr", type=float, default=0.1)
    ap.add_argument("--smooth", type=float, default=1e-6)
    ap.add_argument("--noise", type=float, default=0.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--mesh-blocks", type=int, default=None,
                    help="run the forward through an n-device 'block' "
                         "mesh (virtual on CPU)")
    ap.add_argument("--out", default=None, help="PNG path for the figure")
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from square_circle import assemble_level

    from hybridsbp_tpu.inverse import (invert_material_mb,
                                       make_material_inversion_mb)

    t0 = time.time()
    prob, g, gdelta, delta, FTods, EToDomain, conn = assemble_level(a.p,
                                                                    a.N)
    E = len(prob.lops)
    N = a.N
    print(f"square_circle p={a.p} N={a.N}: {E} blocks "
          f"({time.time() - t0:.1f}s host assembly)")

    mesh = None
    if a.mesh_blocks:
        from jax.sharding import Mesh
        mesh = Mesh(np.array(jax.devices()[:a.mesh_blocks]), ("block",))
        print(f"forward through a {a.mesh_blocks}-device 'block' mesh "
              f"({jax.default_backend()})")

    inv = make_material_inversion_mb(prob, per=a.per, smooth=a.smooth,
                                     tol=1e-11, maxiter=3000, mesh=mesh)

    # truth: two-material field by domain (EToDomain==1 inside circle)
    inside = (np.asarray(EToDomain) == 1)
    th_true = jnp.asarray(np.where(inside, np.log(a.mu_in), 0.0))
    print(f"truth: mu={a.mu_in} on {int(inside.sum())} interior blocks, "
          f"1.0 on {int((~inside).sum())}")

    # JH-weighted Gaussian volume sources spread around the circle
    rng = np.random.default_rng(a.seed)
    srcs = np.zeros((a.K, E, N + 1, N + 1))
    ang = 2 * np.pi * np.arange(a.K) / a.K
    for k in range(a.K):
        cx, cy = 1.6 * np.cos(ang[k]), 1.6 * np.sin(ang[k])
        for e in range(E):
            lop = prob.lops[e]
            x, y = lop.coord
            f = np.exp(-((x - cx) ** 2 + (y - cy) ** 2) / 0.25)
            srcs[k, e] = lop.JH.reshape(N + 1, N + 1) * f
    srcs = jnp.asarray(srcs)

    t0 = time.time()
    d_obs = inv.forward(th_true, srcs)
    print(f"synthetic data: {d_obs.shape[1]} stations x {a.K} sources "
          f"({time.time() - t0:.1f}s, first coupled solves + compile)")
    if a.noise > 0:
        d_obs = d_obs + a.noise * float(jnp.std(d_obs)) * jnp.asarray(
            rng.standard_normal(d_obs.shape))

    t0 = time.time()
    res = invert_material_mb(inv, srcs, d_obs, steps=a.steps, lr=a.lr)
    wall = time.time() - t0
    th = np.asarray(res.theta)
    err = np.abs(th - np.asarray(th_true))
    mu_in_rec = float(np.exp(th[inside].mean()))
    mu_out_rec = float(np.exp(th[~inside].mean()))
    print(f"inversion: {a.steps} Adam steps in {wall:.1f}s "
          f"(loss {float(res.losses[0]):.3e} -> "
          f"{float(res.losses[-1]):.3e})")
    print(f"recovered mu_in = {mu_in_rec:.4f} (true {a.mu_in}), "
          f"mu_out = {mu_out_rec:.4f} (true 1.0)")
    print(f"max |log-mu error| = {err.max():.4f}, "
          f"mean = {err.mean():.4f}")

    if a.out:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(1, 2, figsize=(9, 4), sharey=True)
        for ax, th_plot, title in ((axes[0], np.asarray(th_true), "true"),
                                   (axes[1], th, "recovered")):
            for e in range(E):
                x, y = prob.lops[e].coord
                ax.pcolormesh(x, y, np.full_like(x, np.exp(th_plot[e])),
                              vmin=0.8, vmax=a.mu_in * 1.1,
                              cmap="viridis")
            ax.set_title(f"{title} mu")
            ax.set_aspect("equal")
        fig.tight_layout()
        fig.savefig(a.out, dpi=110)
        print(f"wrote {a.out}")

    ok = err.max() < 0.1
    print("PASS" if ok else "FAIL (log-mu error > 0.1)")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
