#!/usr/bin/env python
"""Local-operator spectral validation.

Reference parity: local_op_eigenvalues.jl — two studies:

1. SPD property: min eigenvalue of the SAT-penalized block operator M
   under random SPD coefficient fields (fixed seed 777), for p in
   {2, 4, 6} and two bc mixes (all-Dirichlet; Dirichlet+3 Neumann).
2. tau-scale sweep: min/max eigenvalues of M as the SAT penalty scale
   sweeps 10^[-2, 2].

Usage: python drivers/local_op_eigenvalues.py [--samples 1000] [--plot out.png]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hybridsbp_tpu import BC_DIRICHLET, BC_NEUMANN  # noqa: E402
from hybridsbp_tpu.mesh import create_metrics  # noqa: E402
from hybridsbp_tpu.ops2d import locoperator  # noqa: E402

ORDERS = (2, 4, 6)


def random_spd_coeffs(rng, shape, aniso=1e-4):
    lam1 = rng.random(shape)
    lam2 = rng.random(shape) * aniso
    q = np.pi * rng.random(shape)
    crr = lam1 * np.cos(q) ** 2 + lam2 * np.sin(q) ** 2
    css = lam1 * np.sin(q) ** 2 + lam2 * np.cos(q) ** 2
    crs = (lam2 - lam1) * np.cos(q) * np.sin(q)
    return crr, css, crs


def spd_study(samples, seed=777):
    rng = np.random.default_rng(seed)
    Ns = {p: 3 * (i + 3) - 1 for i, p in enumerate(ORDERS)}
    metrics = {p: create_metrics(p, Ns[p], Ns[p]) for p in ORDERS}
    min_eig = np.zeros((len(ORDERS), 2, samples))
    for k in range(samples):
        if k % 50 == 0:
            print(f"sample {k + 1} of {samples}")
        for i, p in enumerate(ORDERS):
            N = Ns[p]
            crr, css, crs = random_spd_coeffs(rng, (N + 1, N + 1))
            for j, bcs in enumerate([
                    (BC_DIRICHLET,) * 4,
                    (BC_DIRICHLET, BC_NEUMANN, BC_NEUMANN, BC_NEUMANN)]):
                lop = locoperator(p, N, N, metrics[p], bcs, tau_scale=1.0,
                                  crr=crr, css=css, crs=crs)
                w = np.linalg.eigvalsh(lop.M.toarray())
                min_eig[i, j, k] = w.min()
                if w.min() < 0:
                    print(f"  NEGATIVE: p={p} bc={j} sample={k}: {w.min()}")
    for i, p in enumerate(ORDERS):
        for j, name in enumerate(["dirichlet", "mixed"]):
            m = min_eig[i, j]
            print(f"p={p} {name}: min eig over {samples} samples: "
                  f"[{m.min():.3e}, {m.max():.3e}]  all positive: "
                  f"{bool((m > 0).all())}")
    assert (min_eig > 0).all(), "SPD property violated"
    return min_eig


def tau_sweep(n_tau=40, seed=777):
    rng = np.random.default_rng(seed + 1)
    taus = np.logspace(-2, 2, n_tau)
    out = np.zeros((len(ORDERS), n_tau, 2))
    for i, p in enumerate(ORDERS):
        N = 3 * (i + 3) - 1
        metrics = create_metrics(p, N, N)
        crr, css, crs = random_spd_coeffs(rng, (N + 1, N + 1), aniso=1.0)
        for k, ts in enumerate(taus):
            lop = locoperator(p, N, N, metrics, tau_scale=ts,
                              crr=crr, css=css, crs=crs)
            w = np.linalg.eigvalsh(lop.M.toarray())
            out[i, k] = (w.min(), w.max())
        print(f"p={p}: min-eig range over tau sweep "
              f"[{out[i, :, 0].min():.3e}, {out[i, :, 0].max():.3e}]")
    return taus, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=1000)
    ap.add_argument("--plot", default=None)
    a = ap.parse_args()
    min_eig = spd_study(a.samples)
    taus, sweep = tau_sweep()
    if a.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(1, 3, figsize=(14, 4))
        for i, p in enumerate(ORDERS):
            ax[0].plot(min_eig[i, 0], label=f"p={p}")
            ax[1].plot(min_eig[i, 1], label=f"p={p}")
            ax[2].semilogx(taus, sweep[i, :, 0], label=f"p={p} min")
        ax[0].set(title="min eig (Dirichlet)", xlabel="realization")
        ax[1].set(title="min eig (mixed)", xlabel="realization")
        ax[2].set(title="min eig vs tau scale", xlabel="tau")
        for x in ax:
            x.legend()
        fig.savefig(a.plot, dpi=130)
        print(f"wrote {a.plot}")
    print("PASS")


if __name__ == "__main__":
    main()
