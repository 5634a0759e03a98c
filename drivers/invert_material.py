#!/usr/bin/env python
"""Material-field inversion demo: recover mu(x, y) from sparse station
observations by gradient descent through the device solve.

Beyond-reference capability (no counterpart in /root/reference): the
differentiable forward pipeline — on-device SBP-SAT assembly
(tpu/assemble_device.py) + implicitly-differentiated CG
(tpu/cg.py cg_solve) — makes d(misfit)/d(material field) one jax.grad
call (the adjoint-state method), and the whole inversion compiles to a
single lax.scan program.  See hybridsbp_tpu/inverse.py.

Typical run (CPU f64, ~30 s):
  python drivers/invert_material.py                 # 2.2% recovery
  python drivers/invert_material.py --noise 0.01    # 1% data noise
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
    ap.add_argument("--N", type=int, default=24)
    ap.add_argument("--K", type=int, default=6, help="number of sources")
    ap.add_argument("--nsta", type=int, default=8,
                    help="station lattice extent (nsta^2 stations)")
    ap.add_argument("--ctrl", type=int, default=7,
                    help="control-grid extent for the mu parameterization")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--lr", type=float, default=0.2)
    ap.add_argument("--smooth", type=float, default=None,
                    help="theta smoothness weight (default: 1e-5 clean, "
                         "1e-4 with noise)")
    ap.add_argument("--noise", type=float, default=0.0,
                    help="relative std of observation noise")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--uq", action="store_true",
                    help="Laplace (Gauss-Newton) posterior at the MAP: "
                         "pointwise std of mu + resolution matrix")
    ap.add_argument("--out", default=None, help="PNG path for the figure")
    a = ap.parse_args()

    from hybridsbp_tpu.inverse import (demo_problem, invert_material,
                                       make_material_inversion,
                                       material_posterior)

    smooth = a.smooth if a.smooth is not None else (
        1e-4 if a.noise > 0 else 1e-5)
    print(f"problem: p={a.p} N={a.N} ({(a.N + 1) ** 2} dof/solve), "
          f"{a.K} sources, {a.nsta ** 2} stations, "
          f"{a.ctrl ** 2} control parameters, noise={a.noise}")
    mu_true, sources, d_obs, d_clean = demo_problem(
        a.p, a.N, K=a.K, nsta=a.nsta, noise=a.noise, seed=a.seed,
        return_clean=True)
    inv = make_material_inversion(a.p, a.N, nsta=a.nsta, ctrl=a.ctrl,
                                  smooth=smooth)
    t0 = time.time()
    res = invert_material(inv, sources, d_obs, steps=a.steps, lr=a.lr)
    res.losses.block_until_ready()
    dt = time.time() - t0

    mu_rec = np.asarray(res.mu)
    rel = np.linalg.norm(mu_rec - mu_true) / np.linalg.norm(mu_true)
    print(f"inversion: {a.steps} Adam steps "
          f"({2 * a.K * a.steps} PDE solves) in {dt:.1f} s")
    print(f"loss {float(res.losses[0]):.3e} -> {float(res.losses[-1]):.3e}")
    print(f"recovered mu range [{mu_rec.min():.2f}, {mu_rec.max():.2f}] "
          f"(true [{mu_true.min():.2f}, {mu_true.max():.2f}])")
    print(f"relative L2 recovery error: {rel:.3f}")

    std_mu = None
    if a.uq:
        # noise std actually injected (relative to the clean data)
        sigma = (a.noise * float(np.abs(np.asarray(d_clean)).std())
                 if a.noise > 0 else 1e-8)
        t0 = time.time()
        mu_map, std_mu, resol, U = material_posterior(
            inv, res.theta, sources, d_obs, sigma=sigma)
        r = np.asarray(inv.forward(res.theta, sources)) - np.asarray(d_obs)
        chi2 = float(np.sum(r ** 2) / sigma ** 2 / r.size)
        print(f"Laplace posterior ({inv.ctrl ** 2} jacfwd tangents) in "
              f"{time.time() - t0:.1f} s; chi2/dof {chi2:.2f}, "
              f"mean resolution {np.diag(resol).mean():.2f}")
        if a.noise > 0:
            # calibration vs the RECOVERABLE (resolution-filtered) truth:
            # the posterior quantifies noise; smoothing bias is what the
            # resolution matrix removes (see DESIGN.md §8)
            th_best, *_ = np.linalg.lstsq(U, np.log(mu_true).ravel(),
                                          rcond=None)
            mu_reach = np.exp(U @ (resol @ th_best)).reshape(mu_true.shape)
            z = np.abs(mu_map - mu_reach) / np.maximum(std_mu, 1e-12)
            print(f"bias-aware calibration: {100 * np.mean(z < 2):.0f}% "
                  f"of grid within 2 sigma of the recoverable field")

    if a.out:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        si, ri = inv.stations
        ncol = 4 if std_mu is not None else 3
        fig, axes = plt.subplots(1, ncol, figsize=(4.3 * ncol, 4))
        vmin, vmax = mu_true.min(), mu_true.max()
        for ax, fld, ttl in ((axes[0], mu_true, "true $\\mu$"),
                             (axes[1], mu_rec, "recovered $\\mu$")):
            im = ax.imshow(fld, origin="lower", vmin=vmin, vmax=vmax)
            ax.set_title(ttl)
            ax.plot(ri, si, "k.", ms=3)
            fig.colorbar(im, ax=ax, shrink=0.8)
        if std_mu is not None:
            im = axes[2].imshow(std_mu, origin="lower")
            axes[2].set_title("posterior std of $\\mu$")
            axes[2].plot(ri, si, "k.", ms=3)
            fig.colorbar(im, ax=axes[2], shrink=0.8)
        axes[-1].semilogy(np.asarray(res.losses))
        axes[-1].set_title("loss")
        axes[-1].set_xlabel("Adam step")
        fig.tight_layout()
        fig.savefig(a.out, dpi=120)
        print(f"figure: {a.out}")

    assert rel < 0.10, f"recovery error {rel:.3f} exceeds 10%"
    print("PASS")


if __name__ == "__main__":
    main()
