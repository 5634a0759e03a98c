#!/usr/bin/env python
"""Flower fault-network solve (multiblock stress test of the trace solver).

The reference ships ``meshes/flower_v2.inp`` (67 blocks, a flower-shaped
network of intersecting faults; side sets per flower_v2.jou: 1 =
displacement, 2 = free surface, 7 = fault) but no driver for it
(SURVEY §2 note).  This driver exercises the full hybrid machinery on it:
a prescribed uniform slip on every fault face, homogeneous outer BCs,
solved with the trace method; it verifies the computed displacement
field's jump across each fault face matches the prescribed slip.

Note: uniform slip on an *intersecting* fault network induces stress
singularities at fault tips and junctions (no smooth exact solution),
so the pointwise jump error plateaus with refinement — the smooth
closed-circle jump of square_circle is the convergence gate; this
driver is the topology/robustness stress case.

Usage: python drivers/flower.py [--N 8] [--p 2] [--method trace]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hybridsbp_tpu import BC_DIRICHLET, BC_JUMP_INTERFACE, BC_NEUMANN  # noqa: E402
from hybridsbp_tpu.hybrid import build_problem  # noqa: E402
from hybridsbp_tpu.hybrid.assemble import bcstarts  # noqa: E402
from hybridsbp_tpu.mesh import read_inp_2d  # noqa: E402
from hybridsbp_tpu.ops2d import locbcarray  # noqa: E402

MESH = os.path.join(os.path.dirname(__file__), "..", "meshes",
                    "flower_v2.inp")


def run(p=2, N=8, method="trace", slip=1.0, verbose=True):
    bc_map = [BC_DIRICHLET, BC_NEUMANN, 3, 4, 5, 6, BC_JUMP_INTERFACE]
    verts, EToV, EToF, FToB, EToBlock = read_inp_2d(MESH, bc_map=bc_map)
    nelems, nfaces = EToV.shape[1], len(FToB)
    nfault = int(np.sum(FToB == BC_JUMP_INTERFACE))
    if verbose:
        print(f"flower mesh: {nelems} blocks, {nfaces} faces, "
              f"{nfault} fault faces")

    Narr = np.full(nelems, N)
    prob, (FToE, FToLF, EToO, EToS) = build_problem(
        p, verts, EToV, EToF, FToB, Narr, Narr)
    lops, vstarts, FToLs = prob.lops, prob.vstarts, prob.FToLstarts
    FTods = bcstarts(FToB, FToE, FToLF, [BC_JUMP_INTERFACE], lops)

    delta = np.full(int(FTods[-1]), slip)

    def in_jump(lf, x, y, e):
        f = EToF[lf, e]
        d = delta[FTods[f]:FTods[f + 1]]
        if EToS[lf, e] == 0:
            return -d
        return d if EToO[lf, e] else d[::-1]

    g = np.zeros(int(vstarts[-1]))
    gdelta = np.zeros(int(FToLs[-1]))
    for e in range(nelems):
        ge, gde = locbcarray(
            lops[e], lops[e].bctype,
            lambda lf, x, y: np.zeros_like(x),
            lambda lf, x, y, nx, ny: np.zeros_like(x),
            lambda lf, x, y, e=e: in_jump(lf, x, y, e))
        g[vstarts[e]:vstarts[e + 1]] = ge
        for lf in range(4):
            if gde[lf] is not None:
                prob.scatter_face(gdelta, EToF[lf, e], gde[lf], e, lf, EToO)

    u, lam = prob.solve(g, gdelta, method=method)

    # verify jump across every fault face ~= prescribed slip
    worst = 0.0
    for f in range(nfaces):
        if FToB[f] != BC_JUMP_INTERFACE:
            continue
        (e1, e2), (lf1, lf2) = FToE[:, f], FToLF[:, f]
        lop1, lop2 = lops[e1], lops[e2]
        Nrp1 = lop1.Nr + 1
        idx1 = _face_indices(lop1, lf1)
        idx2 = _face_indices(lop2, lf2)
        u1 = u[vstarts[e1]:vstarts[e1 + 1]][idx1]
        u2 = u[vstarts[e2]:vstarts[e2 + 1]][idx2]
        if not EToO[lf2, e2]:
            u2 = u2[::-1]
        jump = u2 - u1
        # interior fault points (closure rows are O(h^p) accurate)
        worst = max(worst, np.abs(jump[2:-2] - slip).max())
    if verbose:
        print(f"max |[[u]] - slip| on fault interiors: {worst:.3e}")
    return prob, u, lam, worst


def _face_indices(lop, lf):
    Nrp, Nsp = lop.Nr + 1, lop.Ns + 1
    if lf == 0:
        return np.arange(Nsp) * Nrp
    if lf == 1:
        return np.arange(Nsp) * Nrp + (Nrp - 1)
    if lf == 2:
        return np.arange(Nrp)
    return (Nsp - 1) * Nrp + np.arange(Nrp)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--p", type=int, default=2)
    ap.add_argument("--N", type=int, default=8)
    ap.add_argument("--method", default="trace",
                    choices=["trace", "monolithic", "displacements"])
    a = ap.parse_args()
    _, _, _, worst = run(p=a.p, N=a.N, method=a.method)
    assert worst < 0.2, "fault jump not reproduced"
    print("PASS")
