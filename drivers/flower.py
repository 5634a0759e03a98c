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
from hybridsbp_tpu.hybrid.assemble import assemble_jump_rhs, bcstarts  # noqa: E402,E501
from hybridsbp_tpu.mesh import read_inp_2d  # noqa: E402

MESH = os.path.join(os.path.dirname(__file__), "..", "meshes",
                    "flower_v2.inp")

# local face -> (a=-1 corner, a=+1 corner) in z-order local vertices,
# matching hybrid.builder.corner_edges' parametrization
_LF_CORNERS = ((0, 2), (1, 3), (0, 1), (2, 3))


def make_arc_override(verts, EToV, EToF, FToB, frac=0.1):
    """Bend every fault face into a circular arc (sagitta = ``frac`` x
    chord length), canonically defined from the face's global vertex
    ids (bulge to the left of the lo-id -> hi-id direction) so both
    adjacent elements install the *same* physical curve and their face
    grid points coincide (conformity) — the flower analogue of
    square_circle's circle arcs (square_circle.jl:244-274).  The arcs
    carry no analytic derivatives: pair with
    ``build_problem(..., use_sbp_blend=True)``, which differentiates
    the edges with the SBP D1 operator (global_curved.jl:53-64)."""

    def override(e, ex, exa, ey, eya):
        for lf in range(4):
            if FToB[EToF[lf, e]] != BC_JUMP_INTERFACE:
                continue
            ca, cb = _LF_CORNERS[lf]
            va, vb = int(EToV[ca, e]), int(EToV[cb, e])
            lo, hi = (va, vb) if va < vb else (vb, va)
            P, Q = verts[:, lo], verts[:, hi]
            chord = Q - P
            L = float(np.hypot(*chord))
            sag = frac * L
            R = L * L / (8 * sag) + sag / 2
            n = np.array([-chord[1], chord[0]]) / L       # left of lo->hi
            C = (P + Q) / 2 + (R - sag) * n
            thP = float(np.arctan2(P[1] - C[1], P[0] - C[0]))
            thQ = float(np.arctan2(Q[1] - C[1], Q[0] - C[0]))
            dth = (thQ - thP + np.pi) % (2 * np.pi) - np.pi  # minor arc
            # local param: a=-1 -> va, a=+1 -> vb
            th0, th1 = ((thP, thP + dth) if va == lo
                        else (thP + dth, thP))

            def fx(a, C0=C[0], R=R, t0=th0, t1=th1):
                return C0 + R * np.cos(t0 + (np.asarray(a) + 1)
                                       * (t1 - t0) / 2)

            def fy(a, C1=C[1], R=R, t0=th0, t1=th1):
                return C1 + R * np.sin(t0 + (np.asarray(a) + 1)
                                       * (t1 - t0) / 2)

            ex[lf], ey[lf] = fx, fy

    return override


def run(p=2, N=8, method="trace", slip=1.0, verbose=True, curved=0.0,
        device=False, profile=None):
    bc_map = [BC_DIRICHLET, BC_NEUMANN, 3, 4, 5, 6, BC_JUMP_INTERFACE]
    verts, EToV, EToF, FToB, EToBlock = read_inp_2d(MESH, bc_map=bc_map)
    nelems, nfaces = EToV.shape[1], len(FToB)
    nfault = int(np.sum(FToB == BC_JUMP_INTERFACE))
    if verbose:
        print(f"flower mesh: {nelems} blocks, {nfaces} faces, "
              f"{nfault} fault faces"
              + (f", fault arcs sagitta={curved:.2f}x" if curved else ""))

    Narr = np.full(nelems, N)
    override = (make_arc_override(verts, EToV, EToF, FToB, frac=curved)
                if curved else None)
    prob, (FToE, FToLF, EToO, EToS) = build_problem(
        p, verts, EToV, EToF, FToB, Narr, Narr,
        edge_override=override, use_sbp_blend=bool(curved))
    lops, vstarts = prob.lops, prob.vstarts
    FTods = bcstarts(FToB, FToE, FToLF, [BC_JUMP_INTERFACE], lops)

    fault_faces = np.where(FToB == BC_JUMP_INTERFACE)[0]
    if profile == "smooth":
        # smooth compatible slip, ~zero at every fault TIP and
        # JUNCTION: a single-valued δ(x, y) is junction-compatible (a
        # loop around a junction crosses each through-going fault
        # twice with opposite sign), but generic smooth slip still
        # excites corner singularities AT tips/junctions (measured:
        # the uniform- and Gaussian-slip jump errors plateau at
        # junction-adjacent faces while the median face converges).
        # Multiplying in a C^∞ bump factor 1 - exp(-d²/2s²) per
        # singular point (endpoint vertices shared by != 2 fault
        # faces) makes the data vanish there, removing the
        # singularities — this is the convergence-gate configuration
        # (VERDICT r2 next #6); uniform slip stays the topology/
        # robustness stress case.
        ends, lengths = [], []
        for f in fault_faces:
            e, lf = FToE[0, f], FToLF[0, f]
            fx = np.asarray(lops[e].facecoord[0][lf])
            fy = np.asarray(lops[e].facecoord[1][lf])
            ends.append(((fx[0], fy[0]), (fx[-1], fy[-1])))
            lengths.append(float(np.hypot(fx[-1] - fx[0], fy[-1] - fy[0])))
        from collections import Counter
        cnt = Counter()
        for a, b in ends:
            for q in (a, b):
                cnt[(round(float(q[0]), 6), round(float(q[1]), 6))] += 1
        sing = np.array([pt for pt, c in cnt.items() if c != 2])
        s = 0.25 * float(np.median(lengths))     # geometry-fixed width

        def slip_profile(x, y):
            x, y = np.asarray(x), np.asarray(y)
            v = np.full_like(x, slip, dtype=float)
            for sx, sy in sing:
                d2 = (x - sx) ** 2 + (y - sy) ** 2
                v = v * (1.0 - np.exp(-d2 / (2 * s * s)))
            return v
    elif profile is None:
        slip_profile = None
    else:
        raise ValueError(f"unknown profile {profile!r}")

    delta = np.full(int(FTods[-1]), slip)
    if slip_profile is not None:
        for f in fault_faces:
            e, lf = FToE[0, f], FToLF[0, f]      # minus side: face order
            delta[FTods[f]:FTods[f + 1]] = slip_profile(
                lops[e].facecoord[0][lf], lops[e].facecoord[1][lf])

    g, gdelta = assemble_jump_rhs(prob, delta, FTods)

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
        dref = delta[FTods[f]:FTods[f + 1]]      # minus-side ordering
        # interior fault points (closure rows are O(h^p) accurate)
        worst = max(worst, np.abs(jump[2:-2] - dref[2:-2]).max())
    if verbose:
        print(f"max |[[u]] - slip| on fault interiors: {worst:.3e}")

    if device:
        # the 67-block fault network through the f32 device path
        # (make_jit_solver: one jitted program; B is assembled by
        # HybridProblem.build, so the Woodbury preconditioner is
        # always available)
        import time

        import jax.numpy as jnp

        from hybridsbp_tpu.tpu import (build_blocked, build_woodbury,
                                       make_jit_solver)
        from hybridsbp_tpu.tpu.multiblock import blocked_rhs_from_host

        bp = build_blocked(prob, dtype=jnp.float32)
        gb, gd = blocked_rhs_from_host(prob, g, gdelta)
        gb, gd = gb.astype(jnp.float32), gd.astype(jnp.float32)
        ti = build_woodbury(bp, prob) if prob.B is not None else None
        dev_method = "displacements" if method == "monolithic" else method
        sj = make_jit_solver(bp, method=dev_method, trace_inv=ti,
                             tol=1e-6, maxiter=2000)

        def dsolve():
            res = sj(gb, gd)
            res.x.block_until_ready()
            float(res.resnorm)
            return res

        t0 = time.time()
        res = dsolve()
        t_first = time.time() - t0
        t0 = time.time()
        res = dsolve()
        t_warm = time.time() - t0
        derr = np.abs(np.asarray(res.x[:nelems]).ravel() - u).max() \
            / max(np.abs(u).max(), 1e-30)
        if verbose:
            print(f"device ({dev_method}, f32): "
                  f"{int(res.iters)} iters, converged="
                  f"{bool(res.converged)}, first {t_first:.2f}s, "
                  f"warm {t_warm * 1e3:.0f} ms, rel err vs host "
                  f"{derr:.3e}")
        assert derr < 1e-3, f"device vs host mismatch {derr}"

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
    ap.add_argument("--curved", type=float, default=0.0, metavar="FRAC",
                    help="bend fault faces into arcs (sagitta = FRAC x "
                         "chord; SBP-differentiated edge metric)")
    ap.add_argument("--device", action="store_true",
                    help="also solve through the f32 device path and "
                         "compare against the host solve")
    ap.add_argument("--profile", choices=("smooth",), default=None,
                    help="smooth compatible slip profile (convergence-"
                         "gate configuration) instead of uniform slip")
    a = ap.parse_args()
    _, _, _, worst = run(p=a.p, N=a.N, method=a.method, curved=a.curved,
                         device=a.device, profile=a.profile)
    assert worst < 0.2, "fault jump not reproduced"
    print("PASS")
