"""1D diagonal-norm SBP operator factory (host-side, NumPy, float64).

Builds the first-derivative (D1), constant-coefficient second-derivative
(D2), and narrow-stencil variable-coefficient second-derivative operators
with the boundary closures of:

- Gustafsson, "High order difference methods for time dependent PDE" (2008)
- Strand, JCP 110 (1994) 47-67 (order-6 D1)
- Mattsson, Svard, Shoeybi, JCP 227 (2008) (order-8 D1)
- Mattsson, Almquist, JCP 253 (2013) (order-10 operators)
- Mattsson, J Sci Comput 51 (2012) (variable-coefficient narrow-stencil D2)

The coefficient tables live in ``data/sbp_tables.npz``; they were extracted
mechanically from the reference implementation's literals (reference parity:
``diagonal_sbp.jl:67-161`` for D1, ``:203-466`` for D2, ``:474-764`` for the
variable-coefficient operator) by ``tools/extract_sbp_tables.py`` so the
values here are bit-identical to what the reference computes.

These builders return dense NumPy arrays: 1D operators are tiny (N is a few
hundred at most) and are consumed at *setup* time only.  The device-side hot
paths never materialize them; they use stencil/einsum forms built from the
same tables (see ``hybridsbp_tpu.tpu``).

API parity map (reference -> here):
- ``diagonal_sbp_D1(p, N; xc)``            -> :func:`build_d1`
- ``diagonal_sbp_D2(p, N; xc)``            -> :func:`build_d2`
- ``variable_diagonal_sbp_D2(p, N, B; xc)``-> :func:`build_vard2`
"""
from functools import lru_cache
import os

import numpy as np

D1_ORDERS = (2, 4, 6, 8, 10)
D2_ORDERS = (2, 4, 6, 8, 10)
VD2_ORDERS = (2, 4, 6)

_DATA = os.path.join(os.path.dirname(__file__), "data", "sbp_tables.npz")


@lru_cache(maxsize=1)
def _tables():
    return dict(np.load(_DATA))


def d1_tables(p):
    """(bhinv, d, bd) for the first-derivative operator of interior order p."""
    t = _tables()
    if p not in D1_ORDERS:
        raise ValueError(f"D1 operators implemented for p in {D1_ORDERS}")
    return t[f"d1_p{p}_bhinv"], t[f"d1_p{p}_d"], t[f"d1_p{p}_bd"]


def d2_tables(p):
    """(bhinv, d, bd, BS) for the constant-coefficient second derivative."""
    t = _tables()
    if p not in D2_ORDERS:
        raise ValueError(f"D2 operators implemented for p in {D2_ORDERS}")
    return (t[f"d2_p{p}_bhinv"], t[f"d2_p{p}_d"], t[f"d2_p{p}_bd"],
            t[f"d2_p{p}_BS"])


def vd2_tables(p):
    """(bhinv, BS, W0) for the variable-coefficient second derivative.

    W0 is the (m, m, nb) tensor of boundary-block coefficients:
    ``V0[i, j] = sum_k W0[i, j, k] * B[k]`` (None for p=2, which is fully
    structural).
    """
    t = _tables()
    if p not in VD2_ORDERS:
        raise ValueError(
            f"variable-coefficient D2 implemented for p in {VD2_ORDERS}")
    W0 = t.get(f"vd2_p{p}_W0")
    return t[f"vd2_p{p}_bhinv"], t[f"vd2_p{p}_BS"], W0


def build_d1(p, N, xc=(-1.0, 1.0)):
    """First-derivative SBP operator. Returns (D, HI, H, r) dense.

    Reference parity: ``diagonal_sbp.jl:67-161``.
    """
    bhinv, d, bd = d1_tables(p)
    bm, bn = bd.shape
    Np = N + 1
    if Np < 2 * bm or Np < bn:
        raise ValueError(f"grid too small for p={p}: need N+1 >= {max(bn, 2*bm)}")
    h = (xc[1] - xc[0]) / N
    assert h > 0

    D = np.zeros((Np, Np))
    half = len(d) // 2
    for i in range(bm, Np - bm):
        D[i, i - half:i + half + 1] = d
    D[:bm, :bn] = bd
    D[Np - bm:, Np - bn:] = -bd[::-1, ::-1]
    D /= h

    # for D1 the table stores H^{-1} boundary values, so the norm is
    # h/bhinv — matching diagonal_sbp.jl:136-140
    Hd = np.ones(Np)
    Hd[:bm] = 1.0 / bhinv
    Hd[Np - bm:] = 1.0 / bhinv[::-1]
    H = np.diag(h * Hd)
    HI = np.diag(1.0 / (h * Hd))
    r = np.linspace(xc[0], xc[1], Np)
    return D, HI, H, r


def build_d2(p, N, xc=(-1.0, 1.0)):
    """Constant-coefficient second-derivative SBP operator.

    Returns (D, S0, SN, HI, H, r) dense.  Reference parity:
    ``diagonal_sbp.jl:203-466``.
    """
    bhinv, d, bd, BS = d2_tables(p)
    bm, bn = bd.shape
    Np = N + 1
    if Np < 2 * bm or Np < bn:
        raise ValueError(f"grid too small for p={p}: need N+1 >= {max(bn, 2*bm)}")
    h = (xc[1] - xc[0]) / N
    assert h > 0

    D = np.zeros((Np, Np))
    half = len(d) // 2
    for i in range(bm, Np - bm):
        D[i, i - half:i + half + 1] = d
    D[:bm, :bn] = bd
    D[Np - bm:, Np - bn:] = bd[::-1, ::-1]  # same sign for even derivative
    D /= h * h

    Hd = np.ones(Np)
    Hd[:bm] = bhinv
    Hd[Np - bm:] = bhinv[::-1]
    HI = np.diag(Hd / h)
    H = np.diag(h / Hd)

    nBS = len(BS)
    S0 = np.zeros((Np, Np))
    S0[0, :nBS] = -BS / h
    SN = np.zeros((Np, Np))
    SN[N, N - nBS + 1:] = BS[::-1] / h
    r = np.linspace(xc[0], xc[1], Np)
    return D, S0, SN, HI, H, r


# Interior stencil specs for the variable-coefficient operator: each row is
# (row_start0, row_end_offset, col_offset, anchor, taps) where rows =
# arange(row_start0, N + row_end_offset), cols = rows + col_offset, and the
# value at each entry is sum(c * B[anchor_idx + off] for off, c in taps)
# with anchor_idx = cols (p=4 tables) or rows (p=6 tables).  These mirror
# the COO ranges at diagonal_sbp.jl:567-582 (p=4) and :695-727 (p=6),
# converted to 0-based indexing.
_VD2_INTERIOR = {
    4: [
        (6, -3, -2, "col", ((2, 1 / 8), (1, -1 / 6), (0, 1 / 8))),
        (6, -4, -1, "col", ((2, -1 / 6), (1, -1 / 2), (0, -1 / 2), (-1, -1 / 6))),
        (6, -5, 0, "col", ((2, 1 / 24), (1, 5 / 6), (0, 3 / 4), (-1, 5 / 6), (-2, 1 / 24))),
        (5, -5, 1, "col", ((1, -1 / 6), (0, -1 / 2), (-1, -1 / 2), (-2, -1 / 6))),
        (4, -5, 2, "col", ((0, 1 / 8), (-1, -1 / 6), (-2, 1 / 8))),
    ],
    6: [
        (9, -5, -3, "row", ((-3, -11 / 360), (-2, 1 / 40), (-1, 1 / 40), (0, -11 / 360))),
        (9, -6, -2, "row", ((-3, 1 / 20), (-2, 7 / 40), (-1, -3 / 10), (0, 7 / 40), (1, 1 / 20))),
        (9, -7, -1, "row", ((-3, -1 / 40), (-2, -3 / 10), (-1, -17 / 40), (0, -17 / 40), (1, -3 / 10), (2, -1 / 40))),
        (9, -8, 0, "row", ((-3, 1 / 180), (-2, 1 / 8), (-1, 19 / 20), (0, 101 / 180), (1, 19 / 20), (2, 1 / 8), (3, 1 / 180))),
        (8, -8, 1, "row", ((-2, -1 / 40), (-1, -3 / 10), (0, -17 / 40), (1, -17 / 40), (2, -3 / 10), (3, -1 / 40))),
        (7, -8, 2, "row", ((-1, 1 / 20), (0, 7 / 40), (1, -3 / 10), (2, 7 / 40), (3, 1 / 20))),
        (6, -8, 3, "row", ((0, -11 / 360), (1, 1 / 40), (2, 1 / 40), (3, -11 / 360))),
    ],
}


def _vard2_M_batched(p, N, Bs):
    """Unscaled stiffness part M for a batch of coefficient vectors.

    Bs has shape (batch, N+1); returns (batch, N+1, N+1).  M is the SPD
    part: the reference's 6th return value times h (scaling by 1/h is
    applied by the callers).
    """
    Bs = np.asarray(Bs, dtype=np.float64)
    batch, Np = Bs.shape
    assert Np == N + 1
    M = np.zeros((batch, Np, Np))
    if p == 2:
        M[:, 0, 0] = (Bs[:, 0] + Bs[:, 1]) / 2
        M[:, N, N] = (Bs[:, N - 1] + Bs[:, N]) / 2
        i = np.arange(N)
        off = -(Bs[:, i] + Bs[:, i + 1]) / 2
        M[:, i + 1, i] = off
        M[:, i, i + 1] = off
        j = np.arange(1, N)
        M[:, j, j] = (Bs[:, j - 1] + 2 * Bs[:, j] + Bs[:, j + 1]) / 2
        return M

    _, _, W0 = vd2_tables(p)
    m, _, nb = W0.shape
    M[:, :m, :m] += np.einsum("ijk,bk->bij", W0, Bs[:, :nb])
    Mend = np.einsum("ijk,bk->bij", W0, Bs[:, ::-1][:, :nb])
    M[:, Np - m:, Np - m:] += Mend[:, ::-1, ::-1]
    for row_start, row_end, col_off, anchor, taps in _VD2_INTERIOR[p]:
        rows = np.arange(row_start, N + row_end)
        if rows.size == 0:
            continue
        cols = rows + col_off
        base = cols if anchor == "col" else rows
        V = np.zeros((batch, rows.size))
        for off, c in taps:
            V += c * Bs[:, base + off]
        M[:, rows, cols] += V
    return M


def build_vard2_batched(p, N, Bs, xc=(-1.0, 1.0)):
    """Batched variable-coefficient D2 pieces.

    Returns (A, S0e, SNe) where A = M/h is the (batch, Np, Np) SPD
    stiffness part and S0e/SNe are the (batch, nBS) boundary-derivative
    row coefficients (S0 lives on row 0, SN on row N with reversed
    columns) — exactly the pieces ``locoperator`` consumes.
    """
    bhinv, BS, _ = vd2_tables(p)
    Np = N + 1
    bm = len(bhinv)
    if Np < 2 * bm:
        raise ValueError(f"grid too small for p={p}: need N+1 >= {2*bm}")
    h = (xc[1] - xc[0]) / N
    assert h > 0
    Bs = np.atleast_2d(np.asarray(Bs, dtype=np.float64))
    A = _vard2_M_batched(p, N, Bs) / h
    S0e = -Bs[:, :1] * BS[None, :] / h  # row 0, cols 0..nBS-1
    SNe = Bs[:, -1:] * BS[None, :] / h  # row N, cols N..N-nBS+1 (reversed)
    return A, S0e, SNe


def build_vard2(p, N, B, xc=(-1.0, 1.0)):
    """Variable-coefficient second-derivative SBP operator (dense).

    ``B`` may be a callable B(r), a scalar, or an array of length N+1.
    Returns (D, S0, SN, HI, H, M, r) with D = HI @ (-M + SN - S0),
    matching ``variable_diagonal_sbp_D2`` (diagonal_sbp.jl:474-764).
    """
    Np = N + 1
    r = np.linspace(xc[0], xc[1], Np)
    if callable(B):
        B = np.asarray(B(r), dtype=np.float64)
    B = np.broadcast_to(np.asarray(B, dtype=np.float64), (Np,))
    bhinv, BS, _ = vd2_tables(p)
    h = (xc[1] - xc[0]) / N

    M = _vard2_M_batched(p, N, B[None, :])[0] / h
    nBS = len(BS)
    S0 = np.zeros((Np, Np))
    S0[0, :nBS] = -B[0] * BS / h
    SN = np.zeros((Np, Np))
    SN[N, N - nBS + 1:] = B[N] * BS[::-1] / h

    bm = len(bhinv)
    Hd = np.ones(Np)
    Hd[:bm] = bhinv
    Hd[Np - bm:] = bhinv[::-1]
    HI = np.diag(Hd / h)
    H = np.diag(h / Hd)
    D = HI @ (-M + SN - S0)
    return D, S0, SN, HI, H, M, r
