"""Curvilinear metric terms for one mesh block.

Reference parity: ``create_metrics`` (global_curved.jl:136-209).

Array layout convention (used framework-wide): 2D block fields have shape
``(Ns+1, Nr+1)`` with axis 0 = s and axis 1 = r, so that a C-order
``.ravel()`` runs r fastest — the layout the tensor-product (kron)
operator structure assumes, and the one that keeps the r-contiguous
stencil sweeps coalesced on device.

Faces (0-based): 0 west r=-1 (length Ns+1), 1 east r=+1, 2 south s=-1
(length Nr+1), 3 north s=+1.
"""
from dataclasses import dataclass
from typing import Tuple

import numpy as np


@dataclass
class Metrics:
    coord: Tuple[np.ndarray, np.ndarray]          # x, y: (Nsp, Nrp)
    facecoord: Tuple[Tuple, Tuple]                # ((xf0..xf3), (yf0..yf3))
    crr: np.ndarray
    css: np.ndarray
    crs: np.ndarray
    J: np.ndarray
    sJ: Tuple[np.ndarray, ...]                    # per-face surface Jacobian
    nx: Tuple[np.ndarray, ...]                    # per-face unit normal x
    ny: Tuple[np.ndarray, ...]
    rx: np.ndarray
    ry: np.ndarray
    sx: np.ndarray
    sy: np.ndarray


def _identity_x(r, s):
    return r, np.ones_like(r), np.zeros_like(r)


def _identity_y(r, s):
    return s, np.zeros_like(s), np.ones_like(s)


def create_metrics(pm, Nr, Ns, xf=_identity_x, yf=_identity_y):
    """Build grid coordinates, Jacobians, variable-coefficient arrays and
    face normals for one block.

    ``xf(r, s) -> (x, xr, xs)`` and ``yf(r, s) -> (y, yr, ys)`` supply the
    coordinate mapping and its analytic derivatives on the logical tensor
    grid (use :func:`..mesh.blend.transfinite_blend` to construct them).
    ``pm`` is accepted for interface parity with the reference (which
    reserves a higher-order metric-derivative rule for pm=6) but unused:
    derivatives here always come from the mapping callbacks.
    """
    Nrp, Nsp = Nr + 1, Ns + 1
    r1 = np.linspace(-1.0, 1.0, Nrp)
    s1 = np.linspace(-1.0, 1.0, Nsp)
    s, r = np.meshgrid(s1, r1, indexing="ij")  # (Nsp, Nrp)

    x, xr, xs = xf(r, s)
    y, yr, ys = yf(r, s)
    x, xr, xs, y, yr, ys = (np.broadcast_to(np.asarray(a, dtype=np.float64),
                                            (Nsp, Nrp)).copy()
                            for a in (x, xr, xs, y, yr, ys))

    J = xr * ys - xs * yr
    if J.min() <= 0:
        raise ValueError(f"non-positive Jacobian (min {J.min()})")

    rx = ys / J
    sx = -yr / J
    ry = -xs / J
    sy = xr / J

    crr = J * (rx * rx + ry * ry)
    crs = J * (sx * rx + sy * ry)
    css = J * (sx * sx + sy * sy)

    # face tangent/normal data; orientation gives outward unit normals
    def face(nxv, nyv):
        sJ = np.hypot(nxv, nyv)
        return sJ, nxv / sJ, nyv / sJ

    sJ1, nx1, ny1 = face(-ys[:, 0], xs[:, 0])       # west
    sJ2, nx2, ny2 = face(ys[:, -1], -xs[:, -1])     # east
    sJ3, nx3, ny3 = face(yr[0, :], -xr[0, :])       # south
    sJ4, nx4, ny4 = face(-yr[-1, :], xr[-1, :])     # north

    facecoord = ((x[:, 0], x[:, -1], x[0, :], x[-1, :]),
                 (y[:, 0], y[:, -1], y[0, :], y[-1, :]))

    return Metrics(coord=(x, y), facecoord=facecoord,
                   crr=crr, css=css, crs=crs, J=J,
                   sJ=(sJ1, sJ2, sJ3, sJ4),
                   nx=(nx1, nx2, nx3, nx4), ny=(ny1, ny2, ny3, ny4),
                   rx=rx, ry=ry, sx=sx, sy=sy)
