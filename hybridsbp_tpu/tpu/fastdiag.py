"""Fast-diagonalization (tensor-product) preconditioner for block solves.

Approximates the SAT-penalized block operator by its separable part

    P = DA (x) Ar + As (x) DB,

with DA/DB diagonal (norm x rank-1 coefficient fits) and Ar/As 1D
SAT-penalized operators built from rank-1 fits of crr/css (cross terms
dropped).  P is inverted exactly by the Lynch-Rice-Thomas fast
diagonalization: two symmetric eigendecompositions at setup, and per
application four small dense matmuls (MXU) plus elementwise work:

    P^{-1} b = S^{-1} (Qs (x) Qr) (Ls ⊕ Lr)^{-1} (Qs' (x) Qr') S^{-1} b.

For affine/tensor-product blocks with separable coefficients (e.g. the
BP1 tan-stretch map) the fit is exact up to the cross/penalty averaging,
so CG converges in a handful of iterations; for curved blocks it is a
strong block preconditioner.  This is the TPU-idiomatic replacement for
the reference's per-block CHOLMOD factors (SURVEY §7 risk item: direct
sparse -> CG switch needs a real preconditioner).
"""
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .. import BC_NEUMANN
from ..ops1d import build_d1, build_vard2


class FastDiag(NamedTuple):
    Qr: jnp.ndarray          # (Nrp, Nrp) eigenvectors, r direction
    Qs: jnp.ndarray          # (Nsp, Nsp)
    lam_r: jnp.ndarray       # (Nrp,)
    lam_s: jnp.ndarray       # (Nsp,)
    s_inv: jnp.ndarray       # (Nsp, Nrp) inverse sqrt scaling


def _rank1_fit(c):
    """Positive rank-1 fit c[j,i] ~ a[j] * b[i] (leading SVD pair)."""
    U, s, Vt = np.linalg.svd(c, full_matrices=False)
    a = np.abs(U[:, 0]) * np.sqrt(s[0])
    b = np.abs(Vt[0]) * np.sqrt(s[0])
    return a, b


def _sat_1d(p, N, bbar, tau_w, tau_e, bc_w, bc_e):
    """1D SAT-penalized operator A(b) + boundary closures + penalties,
    mirroring the r/s-direction structure of locoperator under the
    separable approximation."""
    _, S0, SN, _, _, M, _ = build_vard2(p, N, bbar)
    A = M + (S0 + S0.T) - (SN + SN.T)
    Np = N + 1
    e0 = np.zeros(Np); e0[0] = 1.0
    eN = np.zeros(Np); eN[N] = 1.0
    A[0, 0] += tau_w
    A[N, N] += tau_e
    if bc_w == BC_NEUMANN:
        f = -S0[0, :] - tau_w * e0
        A -= np.outer(f, f) / tau_w
    if bc_e == BC_NEUMANN:
        f = SN[N, :] - tau_e * eN
        A -= np.outer(f, f) / tau_e
    return 0.5 * (A + A.T)


def build_fastdiag(lop, dtype=jnp.float64) -> FastDiag:
    """Construct the preconditioner from an assembled LocalOperator."""
    p, Nr, Ns = lop.p, lop.Nr, lop.Ns
    m = lop.metrics
    crr, css = np.asarray(m.crr), np.asarray(m.css)
    a_rr, b_rr = _rank1_fit(crr)          # crr ~ a_rr(s) b_rr(r)
    a_ss, b_ss = _rank1_fit(css)          # css ~ a_ss(s) b_ss(r)

    Hr = np.diag(build_d1(p, Nr)[2])
    Hs = np.diag(build_d1(p, Ns)[2])

    # averaged penalties relative to the separable factor
    tau1 = np.mean(np.asarray(lop.tau[0]) / a_rr)
    tau2 = np.mean(np.asarray(lop.tau[1]) / a_rr)
    tau3 = np.mean(np.asarray(lop.tau[2]) / b_ss)
    tau4 = np.mean(np.asarray(lop.tau[3]) / b_ss)

    bt = lop.bctype
    Ar = _sat_1d(p, Nr, b_rr, tau1, tau2, bt[0], bt[1])
    As = _sat_1d(p, Ns, a_ss, tau3, tau4, bt[2], bt[3])

    DA = Hs * a_rr                        # diag, s direction
    DB = Hr * b_ss                        # diag, r direction

    Ar_t = Ar / np.sqrt(DB)[:, None] / np.sqrt(DB)[None, :]
    As_t = As / np.sqrt(DA)[:, None] / np.sqrt(DA)[None, :]
    lam_r, Qr = np.linalg.eigh(0.5 * (Ar_t + Ar_t.T))
    lam_s, Qs = np.linalg.eigh(0.5 * (As_t + As_t.T))

    s_inv = 1.0 / np.sqrt(np.outer(DA, DB))
    return FastDiag(Qr=jnp.asarray(Qr, dtype=dtype),
                    Qs=jnp.asarray(Qs, dtype=dtype),
                    lam_r=jnp.asarray(lam_r, dtype=dtype),
                    lam_s=jnp.asarray(lam_s, dtype=dtype),
                    s_inv=jnp.asarray(s_inv, dtype=dtype))


def fastdiag_apply(fd: FastDiag, b, precision=None):
    """P^{-1} b for a (..., Nsp, Nrp) field (vmappable over blocks).

    ``precision``: forwarded to the four eigenvector matmuls.  On TPU
    the default lowers f32 matmuls to bf16 MXU passes — fine for the
    preconditioner role (flexible outers), but accuracy-critical
    consumers (the banded_from_device B̃ probe, whose plain inner CG
    stagnates at the bf16-nonlinearity floor) must pass
    ``jax.lax.Precision.HIGHEST``."""
    t = b * fd.s_inv
    t = jnp.einsum("js,...sr->...jr", fd.Qs.T, t, precision=precision)
    t = jnp.einsum("...jr,ri->...ji", t, fd.Qr, precision=precision)
    denom = fd.lam_s[:, None] + fd.lam_r[None, :]
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    t = t / denom
    t = jnp.einsum("js,...sr->...jr", fd.Qs, t, precision=precision)
    t = jnp.einsum("...jr,ri->...ji", t, fd.Qr.T, precision=precision)
    return t * fd.s_inv
