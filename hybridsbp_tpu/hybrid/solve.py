"""The three global solve paths of the hybrid framework.

Reference parity: square_circle.jl:368-394 —
  :monolithic      full KKT [blkdiag(M) FbarT'; FbarT diag(D)]
  :trace           Schur complement on the trace variables (the default)
  :displacements   eliminated-lambda SPD system C = M - FbarT' D^{-1} FbarT

``HybridProblem`` bundles everything a driver needs after local-operator
construction.  The device-side (batched/sharded CG) path lives in
``hybridsbp_tpu.tpu``; this module is the setup/validation/direct path.
"""
from dataclasses import dataclass
from typing import Dict

import numpy as np
import scipy.linalg as la
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from .assemble import (
    assemble_lambda_matrix,
    local_global_operators,
    local_to_global_rhs,
)


@dataclass
class HybridProblem:
    lops: Dict
    store: "BlockStore"
    FbarT: sp.spmatrix
    D: np.ndarray
    vstarts: np.ndarray
    FToLstarts: np.ndarray
    EToF: np.ndarray
    FToB: np.ndarray
    FToE: np.ndarray = None
    FToLF: np.ndarray = None
    EToO: np.ndarray = None
    EToS: np.ndarray = None
    B: sp.spmatrix = None          # assembled Schur complement
    _B_factor: object = None

    @classmethod
    def build(cls, lops, mesh_conn, factorization=None):
        """mesh_conn = (EToF, FToB, FToE, FToLF, EToO, EToS)."""
        EToF, FToB, FToE, FToLF, EToO, EToS = mesh_conn
        kw = {} if factorization is None else {"factorization": factorization}
        store, FbarT, D, vstarts, FToLstarts = local_global_operators(
            lops, FToB, FToE, FToLF, EToO, EToS, **kw)
        prob = cls(lops=lops, store=store, FbarT=FbarT, D=D, vstarts=vstarts,
                   FToLstarts=FToLstarts, EToF=EToF, FToB=FToB,
                   FToE=FToE, FToLF=FToLF, EToO=EToO, EToS=EToS)
        prob.B = assemble_lambda_matrix(FToLstarts, vstarts, EToF, FToB,
                                        store, D, FbarT)
        lamNp = prob.B.shape[0]
        if lamNp:
            if lamNp <= 4000:        # small trace systems: dense Cholesky
                prob._B_factor = ("dense", la.cho_factor(prob.B.toarray()))
            else:                    # large: sparse LU of the SPD B
                prob._B_factor = ("sparse", spla.splu(prob.B.tocsc()))
        return prob

    # ---- solves ---------------------------------------------------------
    def solve(self, g, gdelta, method="trace"):
        """Solve the coupled system; returns (u, lam)."""
        if method == "trace":
            blam, _ = local_to_global_rhs(g, gdelta, self.store, self.FbarT)
            if not blam.size:
                lam = np.zeros(0)
            elif self._B_factor[0] == "dense":
                lam = la.cho_solve(self._B_factor[1], blam)
            else:
                lam = self._B_factor[1].solve(blam)
            rhs = g - self.FbarT.T @ lam
            u = np.zeros_like(g)
            vs = self.vstarts
            for e, fac in enumerate(self.store.factors):
                u[vs[e]:vs[e + 1]] = fac.solve(rhs[vs[e]:vs[e + 1]])
            return u, lam
        if method == "monolithic":
            Mblk = sp.block_diag([self.lops[e].M for e in range(len(self.lops))],
                                 format="csr")
            if not self.D.size:      # no interior faces: block-diagonal
                return spla.spsolve(Mblk.tocsc(), g), np.zeros(0)
            A = sp.bmat([[Mblk, self.FbarT.T],
                         [self.FbarT, sp.diags(self.D)]])
            ulam = spla.spsolve(A.tocsc(), np.concatenate([g, gdelta]))
            return ulam[:g.size], ulam[g.size:]
        if method == "displacements":
            Mblk = sp.block_diag([self.lops[e].M for e in range(len(self.lops))],
                                 format="csc")
            if self.D.size:
                C = Mblk - self.FbarT.T @ sp.diags(1.0 / self.D) @ self.FbarT
                u = spla.spsolve(C.tocsc(),
                                 g - self.FbarT.T @ (gdelta / self.D))
                lam = (gdelta - self.FbarT @ u) / self.D
            else:
                u, lam = spla.spsolve(Mblk, g), np.zeros(0)
            return u, lam
        raise ValueError(f"unknown method {method!r}")

    def solve_many(self, G, GD, elements=None):
        """Batched trace solves: G (nvol, k), GD (nlam, k) -> (U, LAM).

        Columnwise-identical to ``solve(method='trace')``, with two
        structural exploits for probing workloads
        (seas/bp1_multiblock.setup, inverse.probe_slip_rhs_map):

        - the forward block sweep solves only the (block, column) pairs
          with nonzero data (unit-slip columns touch <= 2 blocks), and
          the cached B factorization solves all columns at once;
        - ``elements`` restricts the BACK-substitution to the listed
          blocks (rows of U outside them are returned as zero) — a
          setup that only reads fault-face tractions back-substitutes
          ~the fault-adjacent blocks instead of all of them, which is
          the dominant per-column cost on big meshes.
        """
        vs = self.vstarts
        G = np.asarray(G)
        # forward sweep without materializing the dense (nvol, k) U0:
        # subtract each nonzero block's Fbar contribution directly
        BLAM = np.array(GD, dtype=np.float64, copy=True)
        # cache the two sparse-format conversions (identical across the
        # many chunked calls a probing setup makes)
        if not hasattr(self, "_Fbar_csc"):
            self._Fbar_csc = self.FbarT.tocsc()
            self._Fbar_T_csr = self.FbarT.T.tocsr()
        Fc = self._Fbar_csc
        for e, fac in enumerate(self.store.factors):
            Ge = G[vs[e]:vs[e + 1]]
            cols = np.flatnonzero(np.abs(Ge).max(axis=0) > 0)
            if cols.size:
                BLAM[:, cols] -= Fc[:, vs[e]:vs[e + 1]] @ fac.solve(
                    Ge[:, cols])
        if not BLAM.shape[0]:
            LAM = BLAM
        elif self._B_factor[0] == "dense":
            LAM = la.cho_solve(self._B_factor[1], BLAM)
        else:
            LAM = self._B_factor[1].solve(BLAM)
        U = np.zeros_like(G)
        Ft = self._Fbar_T_csr
        which = (range(len(self.store.factors)) if elements is None
                 else sorted({int(e) for e in elements}))
        for e in which:
            rows = slice(vs[e], vs[e + 1])
            rhs_e = G[rows] - Ft[rows] @ LAM
            U[rows] = self.store.factors[e].solve(rhs_e)
        return U, LAM

    # ---- helpers --------------------------------------------------------
    def scatter_face(self, target, f, values, e, lf, EToO):
        """Accumulate face-ordered values into a global trace array with
        the orientation convention of gloλoperator."""
        rng = slice(self.FToLstarts[f], self.FToLstarts[f + 1])
        target[rng] += values if EToO[lf, e] else values[::-1]
