"""Global assembly for the hybridized (trace) solver.

Reference parity:
- ``SBPLocalOperator1``      (global_curved.jl:659-703)  -> :class:`BlockStore`
- ``gloλoperator``           (:510-565)                  -> :func:`glo_lambda_operator`
- ``LocalGlobalOperators``   (:706-712)                  -> :func:`local_global_operators`
- ``bcstarts``               (:714-728)                  -> :func:`bcstarts`
- ``LocalToGLobalRHS!``      (:730-740)                  -> :func:`local_to_global_rhs`
- ``assembleλmatrix``        (:743-797)                  -> :func:`assemble_lambda_matrix`

The trace system couples blocks only through their face traces; on device
this is the face-exchange/collective layer (see hybridsbp_tpu.tpu.sharded).
Here it is assembled sparsely for setup, validation and direct solves.
"""
from dataclasses import dataclass
from typing import Callable, Dict, List

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from .. import BC_JUMP_INTERFACE, BC_LOCKED_INTERFACE


def _default_factorization(M):
    return spla.splu(M.tocsc())


@dataclass
class BlockStore:
    """Per-block factorizations plus stacked global metadata."""
    vstarts: np.ndarray          # (nelems+1,) volume DOF offsets
    H: np.ndarray                # stacked JH quadrature diagonal
    X: np.ndarray                # stacked x coordinates
    Y: np.ndarray
    E: np.ndarray                # element id per volume DOF
    factors: List                # per-block factor objects (solve(b) method)


def block_store(lops: Dict[int, "LocalOperator"],
                factorization: Callable = _default_factorization):
    nelems = len(lops)
    vstarts = np.zeros(nelems + 1, dtype=np.int64)
    H, X, Y, E, factors = [], [], [], [], []
    for e in range(nelems):
        lop = lops[e]
        vstarts[e + 1] = vstarts[e] + lop.Np
        H.append(lop.JH)
        x, y = lop.coord
        X.append(x.ravel())
        Y.append(y.ravel())
        E.append(np.full(lop.Np, e, dtype=np.int64))
        factors.append(factorization(lop.M))
    return BlockStore(vstarts=vstarts, H=np.concatenate(H),
                      X=np.concatenate(X), Y=np.concatenate(Y),
                      E=np.concatenate(E), factors=factors)


def _is_interior(code):
    return code == BC_LOCKED_INTERFACE or code >= BC_JUMP_INTERFACE


def glo_lambda_operator(lops, vstarts, FToB, FToE, FToLF, EToO, EToS):
    """Build the trace coupling: FbarT (lambda x volume sparse map) and the
    trace diagonal D = Hf*(tau_minus + tau_plus), with orientation flips
    on the plus side when the element/face orientations disagree."""
    nfaces = len(FToB)
    FToLstarts = np.zeros(nfaces + 1, dtype=np.int64)
    IT, JT, VT = [], [], []
    VD = []
    for f in range(nfaces):
        if not _is_interior(FToB[f]):
            FToLstarts[f + 1] = FToLstarts[f]
            continue
        em, ep = FToE[:, f]
        fm, fp = FToLF[:, f]
        nl = lops[em].face_length(fm)
        assert nl == lops[ep].face_length(fp), "face trace size mismatch"
        FToLstarts[f + 1] = FToLstarts[f] + nl
        lam0 = FToLstarts[f]

        assert EToO[fm, em] and EToS[fm, em] == 0
        Fm = lops[em].F[fm].tocoo()          # (Np x nl)
        IT.append(lam0 + Fm.col)             # transpose: face row, vol col
        JT.append(vstarts[em] + Fm.row)
        VT.append(Fm.data)

        assert EToS[fp, ep] == 1
        Fp = lops[ep].F[fp].tocoo()
        tau_m = lops[em].tau[fm]
        if EToO[fp, ep]:
            IT.append(lam0 + Fp.col)
            tau_p = lops[ep].tau[fp]
        else:  # flip the plus side onto the face ordering
            IT.append(lam0 + (nl - 1 - Fp.col))
            tau_p = lops[ep].tau[fp][::-1]
        JT.append(vstarts[ep] + Fp.row)
        VT.append(Fp.data)

        VD.append(lops[em].Hf[fm] * (tau_m + tau_p))

    lamNp = int(FToLstarts[-1])
    VNp = int(vstarts[-1])
    FbarT = sp.csr_matrix(
        (np.concatenate(VT) if VT else np.zeros(0),
         (np.concatenate(IT) if IT else np.zeros(0, dtype=int),
          np.concatenate(JT) if JT else np.zeros(0, dtype=int))),
        shape=(lamNp, VNp))
    D = np.concatenate(VD) if VD else np.zeros(0)
    return FToLstarts, FbarT, D


def local_global_operators(lops, FToB, FToE, FToLF, EToO, EToS,
                           factorization: Callable = _default_factorization):
    """One-stop global setup. Returns (store, FbarT, D, vstarts, FToLstarts)."""
    store = block_store(lops, factorization)
    FToLstarts, FbarT, D = glo_lambda_operator(
        lops, store.vstarts, FToB, FToE, FToLF, EToO, EToS)
    return store, FbarT, D, store.vstarts, FToLstarts


def bcstarts(FToB, FToE, FToLF, bctypes, lops):
    """Offsets of per-face data arrays for faces whose code is in bctypes."""
    bctypes = np.atleast_1d(bctypes)
    nfaces = len(FToB)
    starts = np.zeros(nfaces + 1, dtype=np.int64)
    for f in range(nfaces):
        if FToB[f] in bctypes:
            e, lf = FToE[0, f], FToLF[0, f]
            starts[f + 1] = starts[f] + lops[e].face_length(lf)
        else:
            starts[f + 1] = starts[f]
    return starts


def assemble_jump_rhs(prob, delta, FTods, *, bc_Dirichlet=None,
                      bc_Neumann=None, extra_g=None, elements=None):
    """Host RHS assembly for jump-face data (the one home for the
    in_jump + locbcarray + scatter convention previously repeated in
    the flower/square_circle/bp1_multiblock drivers and the slip
    prober).

    ``delta``: per-dof jump values indexed by ``FTods`` (from
    :func:`bcstarts` over every jump-type (code >= BC_JUMP_INTERFACE)
    face — passing a starts array that misses a jump-coded face raises
    inside the jump callback).  The minus side (EToS 0) is
    orientation-true and contributes ``-delta``; the plus side
    contributes ``+delta`` in its own face order (EToO flip) — the
    reference's two-sided SAT data convention.

    ``bc_Dirichlet(e, lf, x, y)`` / ``bc_Neumann(e, lf, x, y, nx, ny)``:
    per-element data callbacks (default zero); ``extra_g(e) -> (Np,)``:
    optional per-element volume addition (e.g. a manufactured source);
    ``elements``: restrict assembly to these block ids (the jump map is
    block-local — the unit-slip prober passes a face's two blocks).

    Returns stacked host vectors ``(g, gdelta)``.
    """
    from ..ops2d import locbcarray

    lops, vstarts = prob.lops, prob.vstarts
    EToF, EToO, EToS = prob.EToF, prob.EToO, prob.EToS

    def in_jump(lf, x, y, e):
        f = EToF[lf, e]
        d = delta[FTods[f]:FTods[f + 1]]
        if len(d) == 0:
            raise ValueError(
                f"face {f} (code {prob.FToB[f]}) has jump-type data but "
                "no dofs in FTods — build FTods over every code >= "
                f"{BC_JUMP_INTERFACE} present in FToB")
        if EToS[lf, e] == 0:
            assert EToO[lf, e], "minus side must be orientation-true"
            return -d
        return d if EToO[lf, e] else d[::-1]

    zD = lambda e, lf, x, y: np.zeros_like(x)               # noqa: E731
    zN = lambda e, lf, x, y, nx, ny: np.zeros_like(x)       # noqa: E731
    bcD = bc_Dirichlet if bc_Dirichlet is not None else zD
    bcN = bc_Neumann if bc_Neumann is not None else zN

    g = np.zeros(int(vstarts[-1]))
    gdelta = np.zeros(int(prob.FToLstarts[-1]))
    for e in (range(len(lops)) if elements is None else elements):
        e = int(e)
        ge, gde = locbcarray(
            lops[e], lops[e].bctype,
            lambda lf, x, y, e=e: bcD(e, lf, x, y),
            lambda lf, x, y, nx, ny, e=e: bcN(e, lf, x, y, nx, ny),
            lambda lf, x, y, e=e: in_jump(lf, x, y, e))
        if extra_g is not None:
            ge = ge + extra_g(e)
        g[vstarts[e]:vstarts[e + 1]] += ge
        for lf in range(4):
            if gde[lf] is not None:
                prob.scatter_face(gdelta, EToF[lf, e], gde[lf], e, lf,
                                  EToO)
    return g, gdelta


def local_to_global_rhs(g, gdelta, store, FbarT):
    """Trace RHS b_lambda = gdelta - FbarT M^{-1} g.

    Returns (b_lambda, u_tmp) where u_tmp holds the per-block solves
    M^{-1} g (reused by the back-substitution)."""
    vstarts = store.vstarts
    u = np.zeros(int(vstarts[-1]))
    for e, fac in enumerate(store.factors):
        ge = g[vstarts[e]:vstarts[e + 1]]
        if np.abs(ge).max() > 0:
            u[vstarts[e]:vstarts[e + 1]] = fac.solve(ge)
    return gdelta - FbarT @ u, u


def assemble_lambda_matrix(FToLstarts, vstarts, EToF, FToB, store, D, FbarT):
    """Dense-enough Schur complement B = diag(D) - FbarT M^{-1} FbarT'.

    Assembled block-by-block with per-element factor solves
    (global_curved.jl:743-797); returns a CSR SPD matrix.
    """
    lamNp = int(FToLstarts[-1])
    nelems = len(vstarts) - 1
    rows_acc, cols_acc, vals_acc = [], [], []
    Fbar = FbarT.T.tocsc()
    for e in range(nelems):
        v0, v1 = vstarts[e], vstarts[e + 1]
        faces = [EToF[lf, e] for lf in range(4) if _is_interior(FToB[EToF[lf, e]])]
        if not faces:
            continue
        cols = np.concatenate([np.arange(FToLstarts[f], FToLstarts[f + 1])
                               for f in faces])
        Fe = Fbar[v0:v1, :][:, cols].toarray()
        X = store.factors[e].solve(Fe)                 # M_e^{-1} Fbar_e
        S = Fe.T @ X                                   # symmetric block
        rr, cc = np.meshgrid(cols, cols, indexing="ij")
        rows_acc.append(rr.ravel())
        cols_acc.append(cc.ravel())
        vals_acc.append(-S.ravel())
    if rows_acc:
        B = sp.coo_matrix(
            (np.concatenate(vals_acc),
             (np.concatenate(rows_acc), np.concatenate(cols_acc))),
            shape=(lamNp, lamNp)).tocsr()
    else:
        B = sp.csr_matrix((lamNp, lamNp))
    B = B + sp.diags(D) if lamNp else B
    asym = abs(B - B.T).max()
    assert asym < 1e-8 * max(1.0, abs(B).max()), f"Schur not symmetric: {asym}"
    return B
