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
