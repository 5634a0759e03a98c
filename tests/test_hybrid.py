"""Hybrid (trace/Schur) solver gates.

- Schur identity B = diag(D) - FbarT A11^{-1} FbarT'  (the assertion at
  global_op_eigenvalues.jl:84)
- agreement of the three solve methods (square_circle.jl:368-394)
- two-block MMS convergence through a locked interface at rate ~p
"""
import numpy as np
import pytest

from hybridsbp_tpu import BC_DIRICHLET, BC_LOCKED_INTERFACE
from hybridsbp_tpu.hybrid import build_problem
from hybridsbp_tpu.ops2d import locbcarray_mod, locsourcearray

# the inline 2-element mesh of global_op_eigenvalues.jl:12-19 (0-based)
VERTS = np.array([[-1.0, 0.0, 1.0, -1.0, 0.0, 1.0],
                  [0.0, 0.0, 0.0, 1.0, 1.0, 1.0]])
ETOV = np.array([[0, 1], [1, 2], [3, 4], [4, 5]])
ETOF = np.array([[0, 1], [1, 4], [2, 5], [3, 6]])


def _ftob():
    FToB = np.full(7, BC_DIRICHLET, dtype=np.int64)
    FToB[1] = BC_LOCKED_INTERFACE
    return FToB


def _assemble_rhs(prob, uex, ux, uy, f):
    g = np.zeros(int(prob.vstarts[-1]))
    for e in range(len(prob.lops)):
        lop = prob.lops[e]
        ge = locbcarray_mod(
            lop, lop.bctype,
            lambda lf, x, y: uex(x, y),
            lambda lf, x, y, nx, ny: nx * ux(x, y) + ny * uy(x, y))
        ge += locsourcearray(lop, f)
        g[prob.vstarts[e]:prob.vstarts[e + 1]] = ge
    gdelta = np.zeros(int(prob.FToLstarts[-1]))
    return g, gdelta


@pytest.mark.parametrize("p", [2, 4, 6])
def test_schur_identity(p):
    N = np.full(2, 3 * p - 1)
    prob, _ = build_problem(p, VERTS, ETOV, ETOF, _ftob(), N, N,
                            tau_scale=1.0)
    import scipy.sparse as sp
    Mblk = sp.block_diag([prob.lops[0].M, prob.lops[1].M]).toarray()
    Fd = prob.FbarT.toarray()
    B_direct = np.diag(prob.D) - Fd @ np.linalg.solve(Mblk, Fd.T)
    np.testing.assert_allclose(prob.B.toarray(), B_direct, atol=1e-8)
    # B is SPD
    w = np.linalg.eigvalsh(prob.B.toarray())
    assert w.min() > 0


def test_solve_methods_agree():
    p = 4
    N = np.full(2, 11)
    prob, _ = build_problem(p, VERTS, ETOV, ETOF, _ftob(), N, N)
    rng = np.random.default_rng(3)
    g = rng.standard_normal(int(prob.vstarts[-1]))
    gd = rng.standard_normal(int(prob.FToLstarts[-1]))
    u_t, lam_t = prob.solve(g, gd, method="trace")
    u_m, lam_m = prob.solve(g, gd, method="monolithic")
    u_d, lam_d = prob.solve(g, gd, method="displacements")
    np.testing.assert_allclose(u_t, u_m, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(u_t, u_d, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(lam_t, lam_m, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(lam_t, lam_d, rtol=1e-8, atol=1e-10)


def test_solve_many_matches_columnwise():
    """Batched multi-RHS trace solves (solve_many) are columnwise
    identical to solve(method='trace') — incl. sparse columns that hit
    the per-block zero-skip path (the unit-slip setup workload)."""
    p = 2
    N = np.full(2, 9)
    prob, _ = build_problem(p, VERTS, ETOV, ETOF, _ftob(), N, N)
    rng = np.random.default_rng(5)
    nvol, nlam = int(prob.vstarts[-1]), int(prob.FToLstarts[-1])
    k = 5
    G = rng.standard_normal((nvol, k))
    GD = rng.standard_normal((nlam, k))
    G[:, 2] = 0.0                       # zero column
    G[prob.vstarts[1]:, 3] = 0.0        # block-sparse column
    U, LAM = prob.solve_many(G, GD)
    for c in range(k):
        u, lam = prob.solve(G[:, c], GD[:, c], method="trace")
        np.testing.assert_allclose(U[:, c], u, rtol=1e-12, atol=1e-13)
        np.testing.assert_allclose(LAM[:, c], lam, rtol=1e-12, atol=1e-13)
    # elements= restricts the back-substitution: listed block exact,
    # the other block's rows zero
    Ur, LAMr = prob.solve_many(G, GD, elements=[1])
    np.testing.assert_allclose(LAMr, LAM, rtol=1e-13, atol=1e-14)
    vs = prob.vstarts
    np.testing.assert_allclose(Ur[vs[1]:vs[2]], U[vs[1]:vs[2]],
                               rtol=1e-12, atol=1e-13)
    assert np.all(Ur[vs[0]:vs[1]] == 0.0)


@pytest.mark.parametrize("p", [2, 4])
def test_two_block_mms_convergence(p):
    uex = lambda x, y: np.sin(np.pi * x) * np.cosh(y) + x * y
    ux = lambda x, y: np.pi * np.cos(np.pi * x) * np.cosh(y) + y
    uy = lambda x, y: np.sin(np.pi * x) * np.sinh(y) + x
    f = lambda x, y: (np.pi**2 - 1) * np.sin(np.pi * x) * np.cosh(y)

    errs = []
    for N0 in (8, 16, 32):
        N = np.full(2, N0)
        prob, _ = build_problem(p, VERTS, ETOV, ETOF, _ftob(), N, N)
        g, gd = _assemble_rhs(prob, uex, ux, uy, f)
        u, lam = prob.solve(g, gd, method="trace")
        err2 = 0.0
        for e in range(2):
            lop = prob.lops[e]
            x, y = lop.coord
            du = u[prob.vstarts[e]:prob.vstarts[e + 1]] - uex(x.ravel(), y.ravel())
            err2 += du @ (lop.JH * du)
        errs.append(np.sqrt(err2))
    rates = np.log2(np.array(errs[:-1]) / np.array(errs[1:]))
    assert rates[-1] > p - 0.4, f"p={p}: rates {rates}, errs {errs}"
