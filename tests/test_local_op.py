"""Gates for the per-block 2D SBP-SAT operator.

- affine-mesh kron oracle (the commented asserts at global_curved.jl:287-294,
  341-348)
- SPD property under random SPD coefficient fields (port of
  local_op_eigenvalues.jl with a fixed PRNG)
- single-block MMS convergence through locoperator + locbcarray +
  direct solve (the minimum end-to-end slice)
- constant-solution smoke (single_block.jl)
- traction extraction consistency
"""
import numpy as np
import pytest
import scipy.sparse.linalg as spla

from hybridsbp_tpu import BC_DIRICHLET, BC_NEUMANN
from hybridsbp_tpu.mesh import create_metrics
from hybridsbp_tpu.ops1d import build_d2
from hybridsbp_tpu.ops2d import (
    computetraction_mod,
    locbcarray_mod,
    locoperator,
    locsourcearray,
)


@pytest.mark.parametrize("p", [2, 4, 6])
def test_affine_kron_oracle(p):
    """On the identity map, Arr+Ass+SATs match the constant-coefficient
    tensor-product (kron) forms."""
    Nr, Ns = 3 * p + 4, 3 * p + 6
    lop = locoperator(p, Nr, Ns)
    D2r, S0r, SNr, _, Hr, _ = build_d2(p, Nr)
    D2s, S0s, SNs, _, Hs, _ = build_d2(p, Ns)
    Ar = SNr - S0r - Hr @ D2r
    As = SNs - S0s - Hs @ D2s
    # Dirichlet everywhere: M = kron(Hs,Ar)+kron(As,Hr) + SAT face terms.
    # The SAT terms only touch boundary entries; check the *interior*
    # rows exactly against the kron form.
    K = np.kron(Hs, Ar) + np.kron(As, Hr)
    M = lop.M.toarray()
    Nrp, Nsp = Nr + 1, Ns + 1
    interior = np.array([j * Nrp + i for j in range(1, Ns)
                         for i in range(1, Nr)])
    np.testing.assert_allclose(M[np.ix_(interior, interior)],
                               K[np.ix_(interior, interior)], atol=1e-11)


@pytest.mark.parametrize("p", [2, 4, 6])
def test_spd_random_coefficients(p):
    """local_op_eigenvalues.jl: min eig of M > 0 for random SPD coefficient
    fields, Dirichlet and mixed bc (20 samples, fixed seed)."""
    rng = np.random.default_rng(777)
    N = 3 * (p + 1) - 1
    metrics = create_metrics(p, N, N)
    for _ in range(20):
        lam1 = rng.random((N + 1, N + 1))
        lam2 = rng.random((N + 1, N + 1)) / 10000
        q = np.pi * rng.random((N + 1, N + 1))
        crr = lam1 * np.cos(q) ** 2 + lam2 * np.sin(q) ** 2
        css = lam1 * np.sin(q) ** 2 + lam2 * np.cos(q) ** 2
        crs = (lam2 - lam1) * np.cos(q) * np.sin(q)
        for bcs in [(BC_DIRICHLET,) * 4,
                    (BC_DIRICHLET, BC_NEUMANN, BC_NEUMANN, BC_NEUMANN)]:
            lop = locoperator(p, N, N, metrics, bcs, tau_scale=1.0,
                              crr=crr, css=css, crs=crs)
            M = lop.M.toarray()
            np.testing.assert_allclose(M, M.T, atol=1e-10)
            w = np.linalg.eigvalsh(0.5 * (M + M.T))
            assert w.min() > 0, f"M not SPD: min eig {w.min()}"


def _mms_solve(p, N):
    """Solve -div(grad u) = f on the unit block with mixed
    Dirichlet/Neumann SAT bcs; return energy-norm error."""
    metrics = create_metrics(p, N, N)
    LFToB = (BC_DIRICHLET, BC_DIRICHLET, BC_NEUMANN, BC_DIRICHLET)
    lop = locoperator(p, N, N, metrics, LFToB)

    uex = lambda x, y: np.sin(np.pi * x) * np.cosh(y) + x * y
    ux = lambda x, y: np.pi * np.cos(np.pi * x) * np.cosh(y) + y
    uy = lambda x, y: np.sin(np.pi * x) * np.sinh(y) + x
    f = lambda x, y: (np.pi**2 - 1) * np.sin(np.pi * x) * np.cosh(y)

    bc_D = lambda lf, x, y: uex(x, y)
    bc_N = lambda lf, x, y, nx, ny: nx * ux(x, y) + ny * uy(x, y)
    ge = locbcarray_mod(lop, LFToB, bc_D, bc_N)
    ge += locsourcearray(lop, lambda x, y: f(x, y))

    u = spla.spsolve(lop.M, ge)
    x, y = lop.coord
    du = u - uex(x.ravel(), y.ravel())
    return float(np.sqrt(du @ (lop.JH * du)))


@pytest.mark.parametrize("p,expected", [(2, 2.0), (4, 4.0)])
def test_single_block_mms_convergence(p, expected):
    errs = [_mms_solve(p, N) for N in (16, 32, 64)]
    rates = np.log2(np.array(errs[:-1]) / np.array(errs[1:]))
    assert rates[-1] > expected - 0.4, f"p={p}: rates {rates}, errs {errs}"


def test_constant_solution_smoke():
    """single_block.jl: u == 1 with matching bcs reproduces exactly 1
    through the full metrics -> locoperator -> bc -> solve path, on the
    BP1 tan-stretched map."""
    N, p, L, el = 8, 2, 80.0, 10.0

    def xt(r, s):
        A = np.arctan(L / el)
        return (el * np.tan(A * (0.5 * r + 0.5)),
                el / np.cos(A * (0.5 * r + 0.5)) ** 2 * A * 0.5,
                np.zeros_like(s))

    def yt(r, s):
        A = np.arctan(L / el)
        return (el * np.tan(A * (0.5 * s + 0.5)),
                np.zeros_like(r),
                el / np.cos(A * (0.5 * s + 0.5)) ** 2 * A * 0.5)

    metrics = create_metrics(p, N, N, xt, yt)
    LFToB = (BC_DIRICHLET, BC_DIRICHLET, BC_NEUMANN, BC_NEUMANN)
    lop = locoperator(p, N, N, metrics, LFToB)
    ge = locbcarray_mod(lop, LFToB,
                        lambda lf, x, y: np.ones_like(x),
                        lambda lf, x, y, nx, ny: np.zeros_like(x))
    u = spla.spsolve(lop.M, ge)
    np.testing.assert_allclose(u, 1.0, atol=1e-9)
    # traction on the fault face of the constant solution is ~0 when the
    # slip is consistent with the Dirichlet data (data = delta/2 = 1)
    tr = computetraction_mod(lop, 0, u, 2.0 * np.ones(N + 1))
    np.testing.assert_allclose(tr, 0.0, atol=1e-9)
