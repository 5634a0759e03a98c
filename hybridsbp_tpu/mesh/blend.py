"""Transfinite (Coons-patch) blending of four edge parametrizations.

Reference parity: ``transfinite_blend`` and its two convenience variants
(global_curved.jl:19-78).  Edge numbering matches the local-face
convention::

      +---4---+          edge 1: west  (r=-1), parametrized by s
      |       |          edge 2: east  (r=+1), parametrized by s
      1       2          edge 3: south (s=-1), parametrized by r
      |       |          edge 4: north (s=+1), parametrized by r
      +---3---+

All functions are pure array math (NumPy or jax.numpy agnostic) and are
vmappable when the edge callables are traceable.
"""
import numpy as np

from ..ops1d import build_d1


def transfinite_blend(e1, e2, e3, e4, e1s, e2s, e3r, e4r, r, s,
                      check_corners=True):
    """Blend with explicitly supplied edge derivative callables.

    r, s are broadcast-compatible arrays of the logical coordinates in
    [-1, 1].  Returns ``(x, xr, xs)``.
    """
    if check_corners:
        got = np.array([e1(-1.0), e2(-1.0), e1(1.0), e2(1.0)], dtype=float)
        want = np.array([e3(-1.0), e3(1.0), e4(-1.0), e4(1.0)], dtype=float)
        if not np.allclose(got, want, rtol=1e-10, atol=1e-12):
            raise ValueError(f"edge corners inconsistent: {got} vs {want}")

    c11, c21, c12, c22 = e1(-1.0), e2(-1.0), e1(1.0), e2(1.0)

    x = ((1 + r) * e2(s) / 2 + (1 - r) * e1(s) / 2
         + (1 + s) * e4(r) / 2 + (1 - s) * e3(r) / 2
         - ((1 + r) * (1 + s) * c22 + (1 - r) * (1 + s) * c12
            + (1 + r) * (1 - s) * c21 + (1 - r) * (1 - s) * c11) / 4)

    xr = (e2(s) / 2 - e1(s) / 2
          + (1 + s) * e4r(r) / 2 + (1 - s) * e3r(r) / 2
          - (+(1 + s) * c22 - (1 + s) * c12
             + (1 - s) * c21 - (1 - s) * c11) / 4)

    xs = ((1 + r) * e2s(s) / 2 + (1 - r) * e1s(s) / 2
          + e4(r) / 2 - e3(r) / 2
          - (+(1 + r) * c22 + (1 - r) * c12
             - (1 + r) * c21 - (1 - r) * c11) / 4)
    return x, xr, xs


def transfinite_blend_sbp(e1, e2, e3, e4, r, s, p):
    """Variant that differentiates the edges with the SBP D1 operator
    (global_curved.jl:53-64), for edges without analytic derivatives.

    r, s must be the full (Nsp, Nrp) tensor grids.
    """
    Nsp, Nrp = np.shape(r)
    Dr = build_d1(p, Nrp - 1)[0]
    Ds = build_d1(p, Nsp - 1)[0]
    s1 = np.linspace(-1.0, 1.0, Nsp)
    r1 = np.linspace(-1.0, 1.0, Nrp)

    de1 = Ds @ np.asarray(e1(s1), dtype=float)  # (Nsp,)
    de2 = Ds @ np.asarray(e2(s1), dtype=float)
    de3 = Dr @ np.asarray(e3(r1), dtype=float)  # (Nrp,)
    de4 = Dr @ np.asarray(e4(r1), dtype=float)

    e1s = lambda sv: de1[:, None] * np.ones_like(sv)
    e2s = lambda sv: de2[:, None] * np.ones_like(sv)
    e3r = lambda rv: de3[None, :] * np.ones_like(rv)
    e4r = lambda rv: de4[None, :] * np.ones_like(rv)
    return transfinite_blend(e1, e2, e3, e4, e1s, e2s, e3r, e4r, r, s)


def transfinite_blend_corners(v1, v2, v3, v4, r, s):
    """Bilinear blend of the four corner values (global_curved.jl:66-78).

    Corners: v1=(r=-1,s=-1), v2=(+1,-1), v3=(-1,+1), v4=(+1,+1).
    """
    e1 = lambda a: v1 * (1 - a) / 2 + v3 * (1 + a) / 2
    e2 = lambda a: v2 * (1 - a) / 2 + v4 * (1 + a) / 2
    e3 = lambda a: v1 * (1 - a) / 2 + v2 * (1 + a) / 2
    e4 = lambda a: v3 * (1 - a) / 2 + v4 * (1 + a) / 2
    e1s = lambda a: (v3 - v1) / 2 + 0 * a
    e2s = lambda a: (v4 - v2) / 2 + 0 * a
    e3r = lambda a: (v2 - v1) / 2 + 0 * a
    e4r = lambda a: (v4 - v3) / 2 + 0 * a
    return transfinite_blend(e1, e2, e3, e4, e1s, e2s, e3r, e4r, r, s)
