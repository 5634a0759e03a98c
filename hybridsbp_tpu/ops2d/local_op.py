"""Per-block 2D curvilinear SBP-SAT operator (host-side assembly).

Builds the discretization of -div(C grad u) on one logically-rectangular
block with SAT (penalty) enforcement on all four faces.  Reference parity:
``locoperator`` (global_curved.jl:211-506); same SAT penalty strengths,
face maps and Neumann modification — assembled here with vectorized
batched-einsum builders and scipy.sparse instead of per-row Julia loops.

Layout: volume vectors are C-ravels of (Ns+1, Nr+1) fields, i.e. index
``j*Nrp + i`` with i the r-index (fastest).  ``kron(S, R)`` therefore has
the s-factor first, matching the reference's ``⊗``.

The assembled sparse matrices serve setup, validation, and direct
factorization.  Device-side hot paths consume the same data through the
matrix-free/batched forms in :mod:`hybridsbp_tpu.tpu`.
"""
import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple

import numpy as np
import scipy.sparse as sp

from .. import BC_DIRICHLET, BC_JUMP_INTERFACE, BC_LOCKED_INTERFACE, BC_NEUMANN
from ..mesh.metrics import Metrics, create_metrics
from ..ops1d import build_d1, build_vard2_batched, vd2_tables

# SAT penalty constants per interior order: (l, beta, alpha) with l the
# number of grid layers entering the boundary min-eigenvalue, beta the
# borrowing constant, alpha the H-norm boundary weight
# (global_curved.jl:402-416)
_PENALTY = {
    2: (2, 0.363636363, 1 / 2),
    4: (4, 0.2505765857, 17 / 48),
    6: (7, 0.1878687080, 13649 / 43200),
}


@dataclass
class LocalOperator:
    """All per-block operator data a driver or the hybrid solver needs."""
    p: int
    Nr: int
    Ns: int
    M: sp.spmatrix                       # SPD volume operator (Np x Np)
    F: Tuple[sp.spmatrix, ...]           # face -> volume SAT maps (Np x nf)
    HfI_FT: Tuple[sp.spmatrix, ...]      # traction extraction (nf x Np)
    HfI_G: Tuple[sp.spmatrix, ...]
    tau: Tuple[np.ndarray, ...]          # SAT penalty diagonal per face
    Hf: Tuple[np.ndarray, ...]           # face quadrature diagonal
    HfI: Tuple[np.ndarray, ...]
    JH: np.ndarray                       # volume quadrature diagonal (Np,)
    coord: Tuple[np.ndarray, np.ndarray]
    facecoord: Tuple[Tuple, Tuple]
    sJ: Tuple[np.ndarray, ...]
    nx: Tuple[np.ndarray, ...]
    ny: Tuple[np.ndarray, ...]
    bctype: Tuple[int, int, int, int]
    metrics: Optional[Metrics] = field(default=None, repr=False)
    # assembly inputs recorded for the on-device re-assembly path
    # (tpu.assemble_device): the penalty scale actually used, and
    # metrics carrying the EFFECTIVE crr/css/crs (incl. any overrides)
    tau_scale: float = 2.0

    @property
    def Np(self):
        return (self.Nr + 1) * (self.Ns + 1)

    def face_length(self, lf):
        return self.Ns + 1 if lf < 2 else self.Nr + 1


def _face_restriction(Nrp, Nsp, lf):
    """Sparse restriction R: volume -> face values, in face ordering."""
    Np = Nrp * Nsp
    if lf == 0:
        rows = np.arange(Nsp); cols = rows * Nrp
    elif lf == 1:
        rows = np.arange(Nsp); cols = rows * Nrp + (Nrp - 1)
    elif lf == 2:
        rows = np.arange(Nrp); cols = rows
    else:
        rows = np.arange(Nrp); cols = (Nsp - 1) * Nrp + rows
    n = len(rows)
    return sp.csr_matrix((np.ones(n), (rows, cols)), shape=(n, Np))


def locoperator(p, Nr, Ns, metrics=None, LFToB=(BC_DIRICHLET,) * 4, *,
                tau_scale=2.0, crr=None, css=None, crs=None):
    """Assemble the SAT-penalized SPD block operator.

    ``LFToB`` gives the bc code per local face (0:west, 1:east, 2:south,
    3:north).  Coefficient overrides crr/css/crs (shape (Ns+1, Nr+1))
    support the random-coefficient spectral validations.
    """
    if p not in _PENALTY:
        raise ValueError(f"locoperator supports p in {tuple(_PENALTY)}")
    if metrics is None:
        metrics = create_metrics(p, Nr, Ns)
    crr = metrics.crr if crr is None else np.asarray(crr, dtype=np.float64)
    css = metrics.css if css is None else np.asarray(css, dtype=np.float64)
    crs = metrics.crs if crs is None else np.asarray(crs, dtype=np.float64)
    J = metrics.J

    Nrp, Nsp, Np = Nr + 1, Ns + 1, (Nr + 1) * (Ns + 1)

    Dr, HrI_m, Hr_m, _ = build_d1(p, Nr)
    Ds, HsI_m, Hs_m, _ = build_d1(p, Ns)
    Hr, HrI = np.diag(Hr_m), np.diag(HrI_m)
    Hs, HsI = np.diag(Hs_m), np.diag(HsI_m)
    Qr = sp.csr_matrix(Hr[:, None] * Dr)
    Qs = sp.csr_matrix(Hs[:, None] * Ds)

    nBS = len(vd2_tables(p)[1])

    # ---- Arr: r-direction variable-coefficient D2, one 1D operator per
    # s-level, weighted by Hs — block-diagonal in the (s, r) layout
    Ar, S0r, SNr = build_vard2_batched(p, Nr, crr)          # (Nsp, Nrp, Nrp)
    Arr = sp.block_diag([sp.csr_matrix(Hs[j] * Ar[j]) for j in range(Nsp)],
                        format="csr")
    Arr.eliminate_zeros()

    def _r_edge_rows(vals, row_i, cols_i):
        """COO for per-s-level r-boundary rows (S0/SN analogues)."""
        rows = (np.arange(Nsp) * Nrp + row_i)[:, None] * np.ones((1, nBS), int)
        cols = (np.arange(Nsp) * Nrp)[:, None] + np.asarray(cols_i)[None, :]
        return sp.csr_matrix((vals.ravel(), (rows.ravel(), cols.ravel())),
                             shape=(Np, Np))

    Sr0 = _r_edge_rows(Hs[:, None] * S0r, 0, np.arange(nBS))
    SrN = _r_edge_rows(Hs[:, None] * SNr, Nr, Nr - np.arange(nBS))

    # ---- Ass: s-direction, one 1D operator per r-column, weighted by Hr
    As, S0s, SNs = build_vard2_batched(p, Ns, css.T)        # (Nrp, Nsp, Nsp)
    ii = np.arange(Nrp)
    jj = np.arange(Nsp)
    rows = np.broadcast_to(jj[None, :, None] * Nrp + ii[:, None, None],
                           (Nrp, Nsp, Nsp))
    cols = np.broadcast_to(jj[None, None, :] * Nrp + ii[:, None, None],
                           (Nrp, Nsp, Nsp))
    vals = Hr[ii][:, None, None] * As
    Ass = sp.csr_matrix((vals.ravel(), (rows.ravel(), cols.ravel())),
                        shape=(Np, Np))
    Ass.eliminate_zeros()

    def _s_edge_rows(vals, row_j, cols_j):
        rows = (row_j * Nrp + np.arange(Nrp))[:, None] * np.ones((1, nBS), int)
        cols = (np.asarray(cols_j)[None, :] * Nrp) + np.arange(Nrp)[:, None]
        return sp.csr_matrix((vals.ravel(), (rows.ravel(), cols.ravel())),
                             shape=(Np, Np))

    Ss0 = _s_edge_rows(Hr[:, None] * S0s, 0, np.arange(nBS))
    SsN = _s_edge_rows(Hr[:, None] * SNs, Ns, Ns - np.arange(nBS))

    # ---- cross terms (global_curved.jl:352-353)
    Ir = sp.identity(Nrp, format="csr")
    Is = sp.identity(Nsp, format="csr")
    crs_diag = sp.diags(crs.ravel())
    Asr = sp.kron(Qs.T, Ir, format="csr") @ crs_diag @ sp.kron(Is, Qr, format="csr")
    Ars = sp.kron(Is, Qr.T, format="csr") @ crs_diag @ sp.kron(Qs, Ir, format="csr")

    A = Arr + Ass + Ars + Asr

    # ---- SAT penalty strengths (global_curved.jl:402-442)
    l, beta, alpha = _PENALTY[p]
    psi = (crr + css - np.sqrt((crr - css) ** 2 + 4 * crs**2)) / 2
    if psi.min() <= 0:
        raise ValueError("coefficient matrix not SPD (psi_min <= 0)")
    hr, hs = 2.0 / Nr, 2.0 / Ns
    psi1 = psi[:, :l].min(axis=1)
    psi2 = psi[:, Nrp - l:].min(axis=1)
    psi3 = psi[:l, :].min(axis=0)
    psi4 = psi[Nsp - l:, :].min(axis=0)
    tau1 = (2 * tau_scale / hr) * (crr[:, 0] ** 2 / beta + crs[:, 0] ** 2 / alpha) / psi1
    tau2 = (2 * tau_scale / hr) * (crr[:, -1] ** 2 / beta + crs[:, -1] ** 2 / alpha) / psi2
    tau3 = (2 * tau_scale / hs) * (css[0, :] ** 2 / beta + crs[0, :] ** 2 / alpha) / psi3
    tau4 = (2 * tau_scale / hs) * (css[-1, :] ** 2 / beta + crs[-1, :] ** 2 / alpha) / psi4

    # ---- face coupling matrices C~f (global_curved.jl:444-447)
    Er0 = sp.csr_matrix((np.ones(1), ([0], [0])), shape=(Nrp, Nrp))
    ErN = sp.csr_matrix((np.ones(1), ([Nr], [Nr])), shape=(Nrp, Nrp))
    Es0 = sp.csr_matrix((np.ones(1), ([0], [0])), shape=(Nsp, Nsp))
    EsN = sp.csr_matrix((np.ones(1), ([Ns], [Ns])), shape=(Nsp, Nsp))

    csr0 = sp.diags(crs[:, 0])   # west-face crs, diagonal over s
    csrN = sp.diags(crs[:, -1])
    crs0 = sp.diags(crs[0, :])   # south-face crs, diagonal over r
    crsN = sp.diags(crs[-1, :])

    C1 = (Sr0 + Sr0.T) + sp.kron(csr0 @ Qs + Qs.T @ csr0, Er0) \
        + sp.kron(sp.diags(tau1 * Hs), Er0)
    C2 = -(SrN + SrN.T) - sp.kron(csrN @ Qs + Qs.T @ csrN, ErN) \
        + sp.kron(sp.diags(tau2 * Hs), ErN)
    C3 = (Ss0 + Ss0.T) + sp.kron(Es0, crs0 @ Qr + Qr.T @ crs0) \
        + sp.kron(Es0, sp.diags(tau3 * Hr))
    C4 = -(SsN + SsN.T) - sp.kron(EsN, crsN @ Qr + Qr.T @ crsN) \
        + sp.kron(EsN, sp.diags(tau4 * Hr))

    # ---- face-to-volume maps (global_curved.jl:450-468)
    R = [_face_restriction(Nrp, Nsp, lf) for lf in range(4)]
    G1 = -R[0] @ Sr0 - sp.kron(csr0 @ Qs, sp.csr_matrix(np.eye(Nrp)[:1]))
    G2 = R[1] @ SrN + sp.kron(csrN @ Qs, sp.csr_matrix(np.eye(Nrp)[Nr:]))
    G3 = -R[2] @ Ss0 - sp.kron(sp.csr_matrix(np.eye(Nsp)[:1]), crs0 @ Qr)
    G4 = R[3] @ SsN + sp.kron(sp.csr_matrix(np.eye(Nsp)[Ns:]), crsN @ Qr)

    F1 = (G1.T - sp.kron(sp.diags(tau1 * Hs), sp.csr_matrix(np.eye(Nrp)[:, :1]))).tocsr()
    F2 = (G2.T - sp.kron(sp.diags(tau2 * Hs), sp.csr_matrix(np.eye(Nrp)[:, Nr:]))).tocsr()
    F3 = (G3.T - sp.kron(sp.csr_matrix(np.eye(Nsp)[:, :1]), sp.diags(tau3 * Hr))).tocsr()
    F4 = (G4.T - sp.kron(sp.csr_matrix(np.eye(Nsp)[:, Ns:]), sp.diags(tau4 * Hr))).tocsr()

    HfI_F1T = sp.diags(HsI) @ G1 - sp.kron(sp.diags(tau1), sp.csr_matrix(np.eye(Nrp)[:1]))
    HfI_F2T = sp.diags(HsI) @ G2 - sp.kron(sp.diags(tau2), sp.csr_matrix(np.eye(Nrp)[Nr:]))
    HfI_F3T = sp.diags(HrI) @ G3 - sp.kron(sp.csr_matrix(np.eye(Nsp)[:1]), sp.diags(tau3))
    HfI_F4T = sp.diags(HrI) @ G4 - sp.kron(sp.csr_matrix(np.eye(Nsp)[Ns:]), sp.diags(tau4))

    HfI_G = (sp.diags(HsI) @ G1, sp.diags(HsI) @ G2,
             sp.diags(HrI) @ G3, sp.diags(HrI) @ G4)

    M = (A + C1 + C2 + C3 + C4).tocsr()

    # ---- Neumann modification (global_curved.jl:478-486)
    F = (F1, F2, F3, F4)
    tau = (tau1, tau2, tau3, tau4)
    HfI = (HsI, HsI, HrI, HrI)
    for lf in range(4):
        if LFToB[lf] == BC_NEUMANN:
            M = M - F[lf] @ sp.diags(HfI[lf] / tau[lf]) @ F[lf].T
        elif not (LFToB[lf] in (BC_DIRICHLET, BC_LOCKED_INTERFACE)
                  or LFToB[lf] >= BC_JUMP_INTERFACE):
            raise ValueError(f"invalid bc {LFToB[lf]}")
    M = M.tocsc()
    M.eliminate_zeros()

    JH = J.ravel() * np.kron(Hs, Hr)

    return LocalOperator(
        p=p, Nr=Nr, Ns=Ns, M=M, F=F,
        HfI_FT=(HfI_F1T.tocsr(), HfI_F2T.tocsr(),
                HfI_F3T.tocsr(), HfI_F4T.tocsr()),
        HfI_G=tuple(g.tocsr() for g in HfI_G),
        tau=tau, Hf=(Hs, Hs, Hr, Hr), HfI=HfI, JH=JH,
        coord=metrics.coord, facecoord=metrics.facecoord,
        sJ=metrics.sJ, nx=metrics.nx, ny=metrics.ny,
        bctype=tuple(int(b) for b in LFToB),
        # store the EFFECTIVE coefficients (incl. crr/css/crs overrides)
        # so the on-device re-assembly path reproduces THIS operator
        metrics=dataclasses.replace(metrics, crr=crr, css=css, crs=crs),
        tau_scale=float(tau_scale))
