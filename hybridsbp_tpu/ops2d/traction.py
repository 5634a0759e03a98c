"""Fault traction extraction on a block face.

Reference parity: ``computetraction`` (global_curved.jl:638-645) and
``computetraction_mod`` (:627-634).
"""
import numpy as np


def computetraction(lop, lf, u, lam, delta):
    """Traction using the face trace lambda (hybrid solve path).

    Accepts a single solve (1D u/lam/delta) or a batch of k solves as
    (Np, k)/(L, k)/(L, k) columns (the multi-RHS setup path)."""
    tau, sJ = lop.tau[lf], lop.sJ[lf]
    if np.ndim(u) == 2:
        tau, sJ = tau[:, None], sJ[:, None]
    return (lop.HfI_FT[lf] @ u + tau * (lam - delta / 2)) / sJ


def computetraction_mod(lop, lf, u, delta):
    """Single-block variant where the slip itself is the trace (BP1)."""
    return (lop.HfI_FT[lf] @ u + lop.tau[lf] * (delta - delta / 2)) / lop.sJ[lf]
