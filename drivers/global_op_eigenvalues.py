#!/usr/bin/env python
"""Global-operator spectral validation on the inline 2-element mesh.

Reference parity: global_op_eigenvalues.jl — for random SPD coefficient
fields (seed 777) and p in {2, 4, 6} compares the spectra of

  A: the full KKT system [blkdiag(M) FbarT'; FbarT diag(D)]
  B: the Schur complement in M (assembled trace matrix; asserted equal to
     diag(D) - FbarT A11^{-1} FbarT')
  C: the Schur complement in D (eliminated displacements)

Usage: python drivers/global_op_eigenvalues.py [--samples 1000]
"""
import argparse
import os
import sys

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hybridsbp_tpu import BC_DIRICHLET, BC_LOCKED_INTERFACE  # noqa: E402
from hybridsbp_tpu.hybrid import HybridProblem  # noqa: E402
from hybridsbp_tpu.mesh import connectivityarrays, create_metrics  # noqa: E402
from hybridsbp_tpu.ops2d import locoperator  # noqa: E402

VERTS = np.array([[-1.0, 0.0, 1.0, -1.0, 0.0, 1.0],
                  [0.0, 0.0, 0.0, 1.0, 1.0, 1.0]])
ETOV = np.array([[0, 1], [1, 2], [3, 4], [4, 5]])
ETOF = np.array([[0, 1], [1, 4], [2, 5], [3, 6]])
ORDERS = (2, 4, 6)


def random_spd_coeffs(rng, shape):
    lam1 = rng.random(shape)
    lam2 = rng.random(shape) / 10000
    q = np.pi * rng.random(shape)
    return (lam1 * np.cos(q) ** 2 + lam2 * np.sin(q) ** 2,
            lam1 * np.sin(q) ** 2 + lam2 * np.cos(q) ** 2,
            (lam2 - lam1) * np.cos(q) * np.sin(q))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=1000)
    a = ap.parse_args()

    FToB = np.full(7, BC_DIRICHLET, dtype=np.int64)
    FToB[1] = BC_LOCKED_INTERFACE
    FToE, FToLF, EToO, EToS = connectivityarrays(ETOV, ETOF)
    rng = np.random.default_rng(777)

    stats = {p: {"A": [], "B": [], "C": []} for p in ORDERS}
    for k in range(a.samples):
        if k % 50 == 0:
            print(f"sample {k + 1} of {a.samples}")
        for p in ORDERS:
            N = 3 * p - 1
            lops = {}
            for e in range(2):
                m = create_metrics(p, N, N)
                crr, css, crs = random_spd_coeffs(rng, (N + 1, N + 1))
                lops[e] = locoperator(p, N, N, m, tuple(FToB[ETOF[:, e]]),
                                      tau_scale=1.0, crr=crr, css=css,
                                      crs=crs)
            prob = HybridProblem.build(
                lops, (ETOF, FToB, FToE, FToLF, EToO, EToS))
            A11 = sp.block_diag([lops[0].M, lops[1].M]).toarray()
            Fd = prob.FbarT.toarray()
            A = np.block([[A11, Fd.T], [Fd, np.diag(prob.D)]])
            B = prob.B.toarray()
            B_direct = np.diag(prob.D) - Fd @ np.linalg.solve(A11, Fd.T)
            assert np.allclose(B, B_direct, atol=1e-8), \
                "Schur identity violated"
            C = A11 - Fd.T @ np.diag(1.0 / prob.D) @ Fd

            stats[p]["A"].append(np.linalg.eigvalsh(A))
            stats[p]["B"].append(np.linalg.eigvalsh(B))
            stats[p]["C"].append(np.linalg.eigvalsh(C))

    for p in ORDERS:
        evA = np.concatenate(stats[p]["A"])
        evB = np.concatenate(stats[p]["B"])
        evC = np.concatenate(stats[p]["C"])
        print(f"p={p}: full system A eig range "
              f"[{evA.min():.3e}, {evA.max():.3e}] "
              f"positive-definite: {bool(evA.min() > 0)}")
        print(f"      Schur-in-M B: [{evB.min():.3e}, {evB.max():.3e}] "
              f"SPD: {bool(evB.min() > 0)}")
        print(f"      Schur-in-D C: [{evC.min():.3e}, {evC.max():.3e}] "
              f"SPD: {bool(evC.min() > 0)}")
        assert evB.min() > 0 and evC.min() > 0
    print("PASS")


if __name__ == "__main__":
    main()
