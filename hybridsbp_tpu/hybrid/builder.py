"""Convenience builder: mesh arrays -> local operators -> HybridProblem.

Mirrors the per-element setup loop every reference driver repeats
(square_circle.jl:221-289, BP1.jl:55-79): corner transfinite blending by
default, with optional per-element curved-edge overrides (as used for the
circle/flower fault arcs).
"""
from typing import Callable, Dict, Optional


from ..mesh import (
    connectivityarrays,
    create_metrics,
    transfinite_blend,
    transfinite_blend_sbp,
)
from ..ops2d import locoperator
from .solve import HybridProblem


def corner_edges(xs, ys):
    """Edge callables (e1..e4, with derivatives) for straight edges
    between the 4 corners (z-order: v1=(-1,-1), v2=(+1,-1), v3=(-1,+1),
    v4=(+1,+1))."""
    x1, x2, x3, x4 = xs
    y1, y2, y3, y4 = ys
    ex = [lambda a, p=x1, q=x3: p * (1 - a) / 2 + q * (1 + a) / 2,
          lambda a, p=x2, q=x4: p * (1 - a) / 2 + q * (1 + a) / 2,
          lambda a, p=x1, q=x2: p * (1 - a) / 2 + q * (1 + a) / 2,
          lambda a, p=x3, q=x4: p * (1 - a) / 2 + q * (1 + a) / 2]
    exa = [lambda a, p=x1, q=x3: (q - p) / 2 + 0 * a,
           lambda a, p=x2, q=x4: (q - p) / 2 + 0 * a,
           lambda a, p=x1, q=x2: (q - p) / 2 + 0 * a,
           lambda a, p=x3, q=x4: (q - p) / 2 + 0 * a]
    ey = [lambda a, p=y1, q=y3: p * (1 - a) / 2 + q * (1 + a) / 2,
          lambda a, p=y2, q=y4: p * (1 - a) / 2 + q * (1 + a) / 2,
          lambda a, p=y1, q=y2: p * (1 - a) / 2 + q * (1 + a) / 2,
          lambda a, p=y3, q=y4: p * (1 - a) / 2 + q * (1 + a) / 2]
    eya = [lambda a, p=y1, q=y3: (q - p) / 2 + 0 * a,
           lambda a, p=y2, q=y4: (q - p) / 2 + 0 * a,
           lambda a, p=y1, q=y2: (q - p) / 2 + 0 * a,
           lambda a, p=y3, q=y4: (q - p) / 2 + 0 * a]
    return ex, exa, ey, eya


def build_block_operators(p, verts, EToV, EToF, FToB, Nr, Ns, *,
                          tau_scale=2.0,
                          edge_override: Optional[Callable] = None,
                          use_sbp_blend=False) -> Dict:
    """Create metrics + locoperator for every element.

    ``edge_override(e, ex, exa, ey, eya)`` may modify the edge callables
    in place (e.g. install circular-arc fault faces).
    Nr/Ns are arrays of per-element grid sizes.

    ``use_sbp_blend=True`` builds the metric with
    :func:`..mesh.transfinite_blend_sbp` — edge *positions* only, edge
    derivatives approximated by the SBP D1 operator
    (global_curved.jl:53-64) — for curved edges without analytic
    derivatives; the ``exa``/``eya`` callables are then ignored.
    """
    nelems = EToV.shape[1]
    lops = {}
    for e in range(nelems):
        xs = verts[0, EToV[:, e]]
        ys = verts[1, EToV[:, e]]
        ex, exa, ey, eya = corner_edges(xs, ys)
        if edge_override is not None:
            edge_override(e, ex, exa, ey, eya)

        if use_sbp_blend:
            def xt(r, s):
                return transfinite_blend_sbp(ex[0], ex[1], ex[2], ex[3],
                                             r, s, p)

            def yt(r, s):
                return transfinite_blend_sbp(ey[0], ey[1], ey[2], ey[3],
                                             r, s, p)
        else:
            def xt(r, s):
                return transfinite_blend(ex[0], ex[1], ex[2], ex[3],
                                         exa[0], exa[1], exa[2], exa[3],
                                         r, s)

            def yt(r, s):
                return transfinite_blend(ey[0], ey[1], ey[2], ey[3],
                                         eya[0], eya[1], eya[2], eya[3],
                                         r, s)

        metrics = create_metrics(p, int(Nr[e]), int(Ns[e]),
                                 lambda r, s: xt(r, s),
                                 lambda r, s: yt(r, s))
        lops[e] = locoperator(p, int(Nr[e]), int(Ns[e]), metrics,
                              tuple(FToB[EToF[:, e]]), tau_scale=tau_scale)
    return lops


def build_problem(p, verts, EToV, EToF, FToB, Nr, Ns, *, tau_scale=2.0,
                  edge_override=None, factorization=None,
                  use_sbp_blend=False):
    """Full pipeline: local ops + connectivity + hybrid assembly."""
    FToE, FToLF, EToO, EToS = connectivityarrays(EToV, EToF)
    lops = build_block_operators(p, verts, EToV, EToF, FToB, Nr, Ns,
                                 tau_scale=tau_scale,
                                 edge_override=edge_override,
                                 use_sbp_blend=use_sbp_blend)
    prob = HybridProblem.build(
        lops, (EToF, FToB, FToE, FToLF, EToO, EToS),
        factorization=factorization)
    return prob, (FToE, FToLF, EToO, EToS)


def build_problem_light(p, verts, EToV, EToF, FToB, Nr, Ns, *,
                        tau_scale=2.0, edge_override=None,
                        use_sbp_blend=False):
    """:func:`build_problem` WITHOUT the two host-side scaling walls:
    the per-block sparse LU factorizations and the assembled trace
    Schur matrix B (+ its factorization) — together ~20-32 min at the
    flagship p=6 N=136 level on a 1-vCPU host and super-linearly worse
    beyond.  The result carries everything the DEVICE path needs
    end-to-end (``tpu.build_blocked(assemble_on_device=True)`` +
    ``tpu.multiblock.banded_from_device``): lops, D, FbarT,
    FToLstarts, connectivity.  Host ``solve()`` / ``solve_many()`` are
    NOT available on the result (``store.factors`` are None, ``B`` is
    None) — this is the builder for problem sizes where the host
    direct pipeline is out of reach (e.g. p=6 N=272, ~4.2M DOF; the
    reference's refinement ladder stops at N=136,
    square_circle.jl:207-210)."""
    FToE, FToLF, EToO, EToS = connectivityarrays(EToV, EToF)
    lops = build_block_operators(p, verts, EToV, EToF, FToB, Nr, Ns,
                                 tau_scale=tau_scale,
                                 edge_override=edge_override,
                                 use_sbp_blend=use_sbp_blend)
    from .assemble import local_global_operators
    store, FbarT, D, vstarts, FToLstarts = local_global_operators(
        lops, FToB, FToE, FToLF, EToO, EToS,
        factorization=lambda M: None)
    prob = HybridProblem(lops=lops, store=store, FbarT=FbarT, D=D,
                         vstarts=vstarts, FToLstarts=FToLstarts,
                         EToF=EToF, FToB=FToB, FToE=FToE, FToLF=FToLF,
                         EToO=EToO, EToS=EToS)
    return prob, (FToE, FToLF, EToO, EToS)
