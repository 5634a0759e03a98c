"""Fault traction extraction on a block face.

Reference parity: ``computetraction`` (global_curved.jl:638-645) and
``computetraction_mod`` (:627-634).
"""


def computetraction(lop, lf, u, lam, delta):
    """Traction using the face trace lambda (hybrid solve path)."""
    return (lop.HfI_FT[lf] @ u + lop.tau[lf] * (lam - delta / 2)) / lop.sJ[lf]


def computetraction_mod(lop, lf, u, delta):
    """Single-block variant where the slip itself is the trace (BP1)."""
    return (lop.HfI_FT[lf] @ u + lop.tau[lf] * (delta - delta / 2)) / lop.sJ[lf]
