#!/usr/bin/env python
"""Fault-slip inversion on the flower network: recover the slip
distribution on all 18 intersecting fault faces from interior "GPS
station" displacements, through the coupled multiblock device solve.

Beyond-reference capability (no counterpart in /root/reference): the
slip -> stations map is linear — host-probed RHS columns
(inverse.probe_slip_rhs_map) contracted with the slip vector, then the
adjoint-carrying coupled solve (tpu.solve_displacements_implicit,
lax.custom_linear_solve) — so jax.linear_transpose gives the exact
adjoint and inverse.invert_linear solves the regularized normal
equations by CG: each iteration is one forward + one adjoint coupled
solve (Woodbury-preconditioned, O(1) outer iterations each).

Typical run (CPU f64, ~1 min):
  python drivers/invert_slip.py
  python drivers/invert_slip.py --noise 0.01 --lam 1e-6
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from hybridsbp_tpu import BC_DIRICHLET, BC_JUMP_INTERFACE, BC_NEUMANN  # noqa: E402,E501
from hybridsbp_tpu.hybrid import build_problem  # noqa: E402
from hybridsbp_tpu.mesh import read_inp_2d  # noqa: E402

MESH = os.path.join(os.path.dirname(__file__), "..", "meshes",
                    "flower_v2.inp")


def build_flower_problem(p, N):
    bc_map = [BC_DIRICHLET, BC_NEUMANN, 3, 4, 5, 6, BC_JUMP_INTERFACE]
    verts, EToV, EToF, FToB, _ = read_inp_2d(MESH, bc_map=bc_map)
    Narr = np.full(EToV.shape[1], N)
    prob, _ = build_problem(p, verts, EToV, EToF, FToB, Narr, Narr)
    return prob


def true_slip(inv):
    """A per-face Gaussian slip profile (amplitude varies per face,
    every profile ~vanishing at the face ends — tip-compatible)."""
    delta = np.zeros(inv.nf)
    for k, f in enumerate(inv.fault_faces):
        s0, s1 = int(inv.FTods[f]), int(inv.FTods[f + 1])
        t = np.linspace(-1.0, 1.0, s1 - s0)
        amp = 0.5 + 0.5 * np.cos(1.7 * k)        # deterministic variety
        delta[s0:s1] = amp * np.exp(-t * t / 0.18)
    return delta


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p", type=int, default=2)
    ap.add_argument("--N", type=int, default=8)
    ap.add_argument("--per", type=int, default=3,
                    help="stations per block axis (per^2 per block)")
    ap.add_argument("--lam", type=float, default=None,
                    help="smoothness weight (default 1e-8, 1e-5 noisy)")
    ap.add_argument("--noise", type=float, default=0.0)
    ap.add_argument("--maxiter", type=int, default=300)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--uq", action="store_true",
                    help="exact Gauss-Newton + posterior uncertainty "
                         "via the dense Jacobian (batched solves)")
    ap.add_argument("--f32", action="store_true",
                    help="mixed precision: f32 inner CGNE (accelerator "
                         "dtype) + f64 outer refinement; needs a "
                         "well-conditioned --lam (>= ~1e-4)")
    ap.add_argument("--out", default=None, help="PNG path")
    a = ap.parse_args()

    import jax.numpy as jnp  # noqa: F811

    from hybridsbp_tpu.inverse import (dense_jacobian, invert_linear,
                                       invert_linear_refined,
                                       linear_posterior,
                                       make_slip_inversion)

    lam = a.lam if a.lam is not None else (
        1e-4 if a.f32 else 1e-5 if a.noise > 0 else 1e-8)
    t0 = time.time()
    prob = build_flower_problem(a.p, a.N)
    if a.f32:
        inv = make_slip_inversion(prob, per=a.per, tol=3e-6, maxiter=400,
                                  dtype=jnp.float32)
    else:
        inv = make_slip_inversion(prob, per=a.per)
    print(f"flower: {len(prob.lops)} blocks, {len(inv.fault_faces)} fault "
          f"faces, {inv.nf} slip unknowns, {len(inv.stations[0])} stations "
          f"(setup {time.time() - t0:.1f} s)")

    # observations from the forward model + optional noise
    d_true = true_slip(inv)
    d_obs = inv.forward(jnp.asarray(d_true, dtype=inv.Rmat.dtype))
    if a.noise > 0:
        rng = np.random.default_rng(a.seed)
        d_obs = d_obs + a.noise * float(jnp.abs(d_obs).std()) \
            * rng.standard_normal(d_obs.shape)

    std = None
    t0 = time.time()
    if a.uq:
        # exact Gauss-Newton + linear-Gaussian posterior: nf is small,
        # so the dense Jacobian is ~nf/batch batched coupled solves
        J = dense_jacobian(None, inv.nf, batch=16,
                           forward_with=inv.forward_with, arrs=inv.arrs)
        sigma = (a.noise * float(jnp.abs(d_obs).std())
                 if a.noise > 0 else 1e-8)
        rec, std, resol = linear_posterior(J, d_obs, lam=lam,
                                           Rmat=inv.Rmat, sigma=sigma)
        dt = time.time() - t0
        rel = np.linalg.norm(rec - d_true) / np.linalg.norm(d_true)
        z = np.abs(rec - d_true) / np.maximum(std, 1e-12)
        print(f"exact GN (dense J {J.shape}) in {dt:.1f} s")
        print(f"relative L2 slip recovery error: {rel:.4f}")
        if a.noise > 0:
            # the posterior is a NOISE covariance: calibration is only
            # meaningful when the data actually carry noise
            print(f"posterior calibration: {100 * np.mean(z < 2):.0f}% "
                  f"of dofs within 2 sigma; mean resolution "
                  f"{np.diag(resol).mean():.2f}")
    elif a.f32:
        rec, resn = invert_linear_refined(inv, d_obs, lam=lam, tol=1e-5,
                                          maxiter=a.maxiter, refine=3)
        dt = time.time() - t0
        rel = np.linalg.norm(rec - d_true) / np.linalg.norm(d_true)
        print(f"f32 refined GN: 3 steps, normal-residual "
              f"{resn[0]:.2e} -> {resn[-1]:.2e} in {dt:.1f} s")
        print(f"relative L2 slip recovery error: {rel:.4f}")
    else:
        res = invert_linear(None, d_obs, inv.nf, lam=lam, tol=1e-10,
                            maxiter=a.maxiter,
                            forward_with=inv.forward_with, arrs=inv.arrs)
        rec = np.asarray(res.x)
        dt = time.time() - t0
        rel = np.linalg.norm(rec - d_true) / np.linalg.norm(d_true)
        print(f"normal-equation CG: {int(res.iters)} iterations "
              f"({2 * int(res.iters)} coupled solves) in {dt:.1f} s")
        print(f"relative L2 slip recovery error: {rel:.4f}")

    if a.out:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(10, 4))
        ax.plot(d_true, "k-", lw=1.5, label="true slip")
        ax.plot(rec, "r--", lw=1.2, label="recovered")
        if std is not None:
            x = np.arange(len(rec))
            ax.fill_between(x, rec - 2 * std, rec + 2 * std,
                            color="r", alpha=0.15, label="±2σ")
        for f in inv.fault_faces:
            ax.axvline(int(inv.FTods[f]), color="0.85", lw=0.5)
        ax.set_xlabel("slip dof (per-face segments)")
        ax.legend()
        fig.tight_layout()
        fig.savefig(a.out, dpi=120)
        print(f"figure: {a.out}")

    if a.noise == 0:
        if a.f32:
            # recovery at the f32-required lam (>=1e-4) is SMOOTHING-
            # limited, not precision-limited (f64 at the same lam gives
            # the same ~0.26 — tests/test_inverse.py gates the f32-vs-
            # exact-oracle error at 1e-2), so the plateau gate applies
            # to both the refined-CGNE and the exact-GN (--uq) branch;
            # the refinement-residual gate only exists in the former
            if not a.uq:
                assert resn[-1] < 1e-2 * resn[0], "refinement did not bite"
            assert rel < 0.35, f"f32 recovery {rel:.3f} off the lam=1e-4 " \
                               "smoothing plateau"
        else:
            assert rel < 0.08, f"slip recovery error {rel:.3f} exceeds 8%"
    else:
        assert np.mean(np.abs(rec - d_true)
                       <= 3 * np.maximum(std, 1e-12)) > 0.9 \
            if a.uq else rel < 0.5, "noisy recovery uncalibrated"
    print("PASS")


if __name__ == "__main__":
    main()
