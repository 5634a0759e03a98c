"""Boundary-condition / source RHS construction for one block.

Reference parity: ``locbcarray_mod!`` (global_curved.jl:569-592),
``locbcarray!`` (:596-623), ``locsourcearray!`` (:648-655) — written
functionally (arrays returned, not mutated).

Callback signatures:
  bc_Dirichlet(lf, x, y, *bcargs) -> face values
  bc_Neumann(lf, x, y, nx, ny, *bcargs) -> outward normal flux values
  in_jump(lf, x, y, *bcargs) -> displacement jump across the face
"""
import numpy as np

from .. import BC_DIRICHLET, BC_JUMP_INTERFACE, BC_LOCKED_INTERFACE, BC_NEUMANN


def locbcarray_mod(lop, LFToB, bc_Dirichlet, bc_Neumann, bcargs=()):
    """Per-block RHS ge from Dirichlet/Neumann data (no jump interfaces)."""
    ge = np.zeros(lop.Np)
    xf, yf = lop.facecoord
    for lf in range(4):
        if LFToB[lf] == BC_DIRICHLET:
            vf = bc_Dirichlet(lf, xf[lf], yf[lf], *bcargs)
        elif LFToB[lf] == BC_NEUMANN:
            gN = bc_Neumann(lf, xf[lf], yf[lf], lop.nx[lf], lop.ny[lf], *bcargs)
            vf = lop.sJ[lf] * gN / lop.tau[lf]
        elif LFToB[lf] == BC_LOCKED_INTERFACE:
            continue
        else:
            raise ValueError(f"invalid bc {LFToB[lf]}")
        ge -= lop.F[lf] @ np.asarray(vf, dtype=np.float64)
    return ge


def locbcarray(lop, LFToB, bc_Dirichlet, bc_Neumann, in_jump, bcargs=()):
    """Per-block RHS with jump-interface support.

    Returns ``(ge, gde)`` where ``gde`` is a list with, for each jump
    face, the face-trace RHS contribution (to be accumulated into the
    global g-delta with the caller's orientation bookkeeping; None for
    non-jump faces).
    """
    ge = np.zeros(lop.Np)
    gde = [None] * 4
    xf, yf = lop.facecoord
    for lf in range(4):
        if LFToB[lf] == BC_DIRICHLET:
            vf = bc_Dirichlet(lf, xf[lf], yf[lf], *bcargs)
        elif LFToB[lf] == BC_NEUMANN:
            gN = bc_Neumann(lf, xf[lf], yf[lf], lop.nx[lf], lop.ny[lf], *bcargs)
            vf = lop.sJ[lf] * gN / lop.tau[lf]
        elif LFToB[lf] == BC_LOCKED_INTERFACE:
            continue
        elif LFToB[lf] >= BC_JUMP_INTERFACE:
            vf = np.asarray(in_jump(lf, xf[lf], yf[lf], *bcargs)) / 2
            gde[lf] = -(lop.Hf[lf] * lop.tau[lf] * vf)
        else:
            raise ValueError(f"invalid bc {LFToB[lf]}")
        ge -= lop.F[lf] @ np.asarray(vf, dtype=np.float64)
    return ge, gde


def locsourcearray(lop, source, volargs=()):
    """Volume source contribution JH * f(x, y)."""
    x, y = lop.coord
    return lop.JH * np.asarray(
        source(x.ravel(), y.ravel(), *volargs), dtype=np.float64)
