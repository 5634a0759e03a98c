"""Mixed block-shape device path via shape bucketing (SURVEY §7 risk
item; reference parity: per-element Nr[e], Ns[e] in locoperator,
global_curved.jl:211).

Blocks are grouped by (Nr, Ns) into shape buckets; each bucket is a
stacked :class:`~hybridsbp_tpu.tpu.multiblock.BlockedHybrid` (one
static-shape DIA batch + face tensors), and all buckets exchange face
traces through one common (nfaces, L) trace layout with
L = max over buckets of max(Nrp, Nsp).  Fields live as *tuples of
per-bucket arrays* (a pytree), so the generic CG drives the coupled
solve unchanged — the matvec is: per-bucket DIA apply, per-bucket face
traces scattered into the global trace array, one global combination,
per-bucket correction scatter.

The SBP discretization itself requires conforming faces (equal trace
lengths across a shared face, global_curved.jl:528), so different-shape
buckets only ever share faces whose extents agree; non-conforming
meshes are rejected at build time.
"""
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .cg import cg
from .multiblock import (
    BlockedHybrid,
    _dia_apply_batched,
    block_traces,
    build_blocked,
    face_scatter,
)


class _SubProb:
    """Restriction of a host HybridProblem to one shape bucket's
    elements (face-level metadata stays global)."""

    def __init__(self, prob, ids):
        self.lops = {i: prob.lops[e] for i, e in enumerate(ids)}
        self.FToB = prob.FToB
        self.FToLstarts = prob.FToLstarts
        self.D = prob.D
        self.FToE = prob.FToE
        self.FToLF = prob.FToLF
        self.EToF = np.asarray(prob.EToF)[:, ids]
        self.EToO = np.asarray(prob.EToO)[:, ids]


class Bucketed(NamedTuple):
    buckets: Tuple[BlockedHybrid, ...]
    elem_ids: Tuple[np.ndarray, ...]   # global element ids per bucket
    nelems: int
    Dinv: jnp.ndarray                  # (nfaces, L) global
    interior: np.ndarray
    FToE: np.ndarray
    FToLF: np.ndarray
    flip_global: np.ndarray            # (4, nelems) plus-side flips
    perm_face: np.ndarray              # (nfaces, L) reversal perms


def build_bucketed(prob, dtype=jnp.float64, with_fastdiag=True,
                   assemble_on_device=False, flat_sym=False) -> Bucketed:
    E = len(prob.lops)
    shapes = [(prob.lops[e].Nr, prob.lops[e].Ns) for e in range(E)]
    order = sorted(set(shapes))
    groups = [np.array([e for e in range(E) if shapes[e] == sh])
              for sh in order]
    L = max(max(Nr, Ns) + 1 for Nr, Ns in order)

    # conformity check: both sides of an interior face must carry the
    # same trace length
    Lf_of = lambda e, lf: (shapes[e][1] if lf < 2 else shapes[e][0]) + 1
    FToE, FToLF = np.asarray(prob.FToE), np.asarray(prob.FToLF)
    nfaces = FToE.shape[1]
    for f in range(nfaces):
        if FToE[1, f] >= 0:
            lm = Lf_of(FToE[0, f], FToLF[0, f])
            lp = Lf_of(FToE[1, f], FToLF[1, f])
            if lm != lp:
                raise ValueError(
                    f"non-conforming face {f}: trace lengths {lm} != {lp}")

    buckets = tuple(build_blocked(_SubProb(prob, ids), dtype=dtype,
                                  with_fastdiag=with_fastdiag, L=L,
                                  assemble_on_device=assemble_on_device,
                                  flat_sym=flat_sym)
                    for ids in groups)

    # global per-face reversal perms (plus-side face length)
    perm_face = np.tile(np.arange(L), (nfaces, 1))
    for f in range(nfaces):
        side = 1 if FToE[1, f] >= 0 else 0
        Lf = Lf_of(FToE[side, f], FToLF[side, f])
        perm_face[f, :Lf] = np.arange(Lf - 1, -1, -1)

    flip_global = ~np.asarray(prob.EToO, dtype=bool)
    b0 = buckets[0]
    return Bucketed(buckets=buckets, elem_ids=tuple(groups), nelems=E,
                    Dinv=b0.Dinv, interior=b0.interior,
                    FToE=FToE, FToLF=FToLF, flip_global=flip_global,
                    perm_face=perm_face)


# ---------------------------------------------------------------------------
# trace pipeline over buckets
# ---------------------------------------------------------------------------
def gather_traces(bk: Bucketed, us):
    """Per-bucket face traces assembled into the global (nelems, 4, L)
    array (element-local ordering)."""
    L = bk.Dinv.shape[1]
    dtype = jax.tree_util.tree_leaves(us)[0].dtype
    t_all = jnp.zeros((bk.nelems, 4, L), dtype=dtype)
    for b, ids, u in zip(bk.buckets, bk.elem_ids, us):
        t_all = t_all.at[ids].set(block_traces(b, u))
    return t_all


def combine_global(bk: Bucketed, t_all):
    """Global-face combination with orientation flips, scaled by D^{-1}
    (the bucketed form of multiblock.combine_traces)."""
    FToE, FToLF = bk.FToE, bk.FToLF
    nfaces = FToE.shape[1]
    em, fm = FToE[0], FToLF[0]
    ep, fp = FToE[1].copy(), FToLF[1].copy()
    has_plus = ep >= 0
    ep[~has_plus] = 0
    fp[~has_plus] = 0
    t_m = t_all[em, fm]
    t_p = t_all[ep, fp]
    pflip = bk.flip_global[fp, ep]
    t_rev = t_p[np.arange(nfaces)[:, None], bk.perm_face]
    t_p = jnp.where(jnp.asarray(pflip)[:, None], t_rev, t_p)
    t_p = jnp.where(jnp.asarray(has_plus)[:, None], t_p, 0.0)
    t = t_m + t_p
    mask = jnp.asarray(bk.interior)[:, None]
    return jnp.where(mask, t, 0.0) * bk.Dinv


def fbar(bk: Bucketed, us):
    """Raw Fbar u in the (nfaces, L) layout (no D^{-1} scaling)."""
    t = combine_global(bk, gather_traces(bk, us))
    return t / jnp.where(bk.Dinv == 0, 1.0, bk.Dinv)


def fbarT(bk: Bucketed, w):
    """Per-bucket adjoint scatter of a global face array (tuple out)."""
    return tuple(face_scatter(b, w, 0, b.nblocks)
                 for b in bk.buckets)


def displacement_matvec(bk: Bucketed, us, *, stencil="auto"):
    """C u = M u - Fbar' D^{-1} Fbar u over the bucket tuple."""
    w = combine_global(bk, gather_traces(bk, us))
    corr = fbarT(bk, w)
    return tuple(_dia_apply_batched(b, u, stencil) - c
                 for b, u, c in zip(bk.buckets, us, corr))


def _precond(bk: Bucketed):
    from .fastdiag import fastdiag_apply

    def M(rs):
        outs = []
        for b, r in zip(bk.buckets, rs):
            if b.fd is not None:
                outs.append(jax.vmap(fastdiag_apply)(b.fd, r))
            else:
                outs.append(r / b.coefs[:, b.offsets.index((0, 0))])
        return tuple(outs)

    return M


def build_woodbury_bucketed(bk: Bucketed, prob, dtype=None, mode="dense",
                            iters=32):
    """Trace inverse for the mixed-shape path (see
    multiblock.build_woodbury; the layout is the bucketed global
    (nfaces, L) trace array).  ``mode='banded'`` builds the
    O(nfaces·L²) banded face-block form instead of the dense nλ²
    inverse (multiblock.build_woodbury_banded)."""
    from .multiblock import banded_from_B, trace_inv_from_B

    dtype = dtype or bk.buckets[0].coefs.dtype
    if mode == "banded":
        return banded_from_B(bk.Dinv.shape, prob, dtype, iters)
    return trace_inv_from_B(bk.Dinv.shape, prob, dtype)


def woodbury_precond_bucketed(bk: Bucketed, trace_inv, inner_iters=8,
                              stencil="auto"):
    """Woodbury two-level preconditioner over shape buckets
    (multiblock.woodbury_precond on the bucket-tuple pytree):
    r -> M̃⁻¹r + M̃⁻¹Fbar' B⁻¹ Fbar M̃⁻¹r with fixed-length per-bucket
    inner fastdiag-CG sweeps.  Variable when inner_iters > 0 — use
    with a flexible outer CG."""
    from .cg import cg_fixed
    from .multiblock import make_woodbury_M

    Mpre = _precond(bk)
    if inner_iters:
        decoupled = lambda us: tuple(
            _dia_apply_batched(b, u, stencil)
            for b, u in zip(bk.buckets, us))
        minv = lambda rs: cg_fixed(decoupled, rs, inner_iters,
                                   precond=Mpre)
    else:
        minv = Mpre

    return make_woodbury_M(minv, lambda zs: fbar(bk, zs),
                           lambda y: fbarT(bk, y), trace_inv)


def solve_displacements(bk: Bucketed, gs, gdelta_faces, *, tol=1e-10,
                        maxiter=2000, stencil="auto", precond=None,
                        flexible=False):
    """CG on the eliminated SPD system over shape buckets.

    gs: tuple of (E_b, Nsp_b, Nrp_b); gdelta_faces: (nfaces, L) raw gδ.
    ``precond``: optional callable (e.g.
    :func:`woodbury_precond_bucketed` — pass ``flexible=True`` with
    its inner-CG form); default per-bucket fastdiag/Jacobi.
    """
    w0 = gdelta_faces * bk.Dinv
    corr = fbarT(bk, w0)
    b = tuple(g - c for g, c in zip(gs, corr))
    return cg(lambda us: displacement_matvec(bk, us, stencil=stencil), b,
              tol=tol, maxiter=maxiter,
              precond=precond if precond is not None else _precond(bk),
              flexible=flexible)


def solve_trace(bk: Bucketed, gs, gdelta_faces, *, tol=1e-10, maxiter=500,
                inner_tol=1e-11, inner_maxiter=400, stencil="auto"):
    """Trace (Schur) solve over shape buckets: flexible CG on B with
    batched per-bucket inner block solves (see multiblock.solve_trace).
    Returns (us tuple, lam, outer CGResult)."""
    mask = bk.Dinv > 0
    D = jnp.where(mask, 1.0 / jnp.where(mask, bk.Dinv, 1.0), 0.0)
    Mpre = _precond(bk)

    def minv(ys):
        res = cg(lambda us: tuple(
            _dia_apply_batched(b, u, stencil)
            for b, u in zip(bk.buckets, us)), ys,
            tol=inner_tol, maxiter=inner_maxiter, precond=Mpre)
        return res.x

    def bmat(lam):
        us = minv(fbarT(bk, lam))
        return D * lam - fbar(bk, us)

    b = jnp.where(mask, gdelta_faces, 0.0) - fbar(bk, minv(gs))
    res = cg(bmat, b, tol=tol, maxiter=maxiter, flexible=True,
             precond=lambda r: r * bk.Dinv)
    corr = fbarT(bk, res.x)
    us = minv(tuple(g - c for g, c in zip(gs, corr)))
    return us, res.x, res


def bucketed_rhs_from_host(bk: Bucketed, prob, g, gdelta):
    """Host stacked (g, gdelta) -> (tuple of (E_b, Nsp_b, Nrp_b),
    (nfaces, L))."""
    gs = []
    for b, ids in zip(bk.buckets, bk.elem_ids):
        Nsp, Nrp = b.grid_shape
        ge = np.zeros((len(ids), Nsp, Nrp))
        for i, e in enumerate(ids):
            ge[i] = np.asarray(
                g[prob.vstarts[e]:prob.vstarts[e + 1]]).reshape(Nsp, Nrp)
        gs.append(jnp.asarray(ge))
    nfaces, L = bk.Dinv.shape
    gd = np.zeros((nfaces, L))
    for f in range(nfaces):
        s0, s1 = prob.FToLstarts[f], prob.FToLstarts[f + 1]
        if s1 > s0:
            gd[f, :s1 - s0] = np.asarray(gdelta[s0:s1])
    return tuple(gs), jnp.asarray(gd)


def scatter_solution(bk: Bucketed, prob, us):
    """Bucket tuple -> host stacked volume vector."""
    out = np.zeros(int(prob.vstarts[-1]))
    for ids, u in zip(bk.elem_ids, us):
        ua = np.asarray(u)
        for i, e in enumerate(ids):
            out[prob.vstarts[e]:prob.vstarts[e + 1]] = ua[i].ravel()
    return out
