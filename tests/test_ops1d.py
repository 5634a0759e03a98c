"""Gate tests for the 1D SBP operator factory.

These verify the mechanically-extracted coefficient tables through the
operators' defining algebraic identities, the reference's own validation
script (check_residual.jl), and polynomial exactness — any transcription
or assembly error breaks at least one of them.
"""
import numpy as np
import pytest

from hybridsbp_tpu.ops1d import (
    D1_ORDERS,
    VD2_ORDERS,
    build_d1,
    build_d2,
    build_vard2,
    build_vard2_batched,
)

Ns = {2: 20, 4: 24, 6: 30, 8: 40, 10: 48}


@pytest.mark.parametrize("p", D1_ORDERS)
def test_d1_sbp_property(p):
    """Q + Q^T = B = diag(-1, 0, ..., 0, 1) — the SBP definition."""
    N = Ns[p]
    D, HI, H, r = build_d1(p, N)
    Q = H @ D
    B = np.zeros((N + 1, N + 1))
    B[0, 0], B[N, N] = -1.0, 1.0
    np.testing.assert_allclose(Q + Q.T, B, atol=1e-11)


@pytest.mark.parametrize("p", D1_ORDERS)
def test_d1_accuracy(p):
    """Exact differentiation of polynomials up to boundary order p/2."""
    N = Ns[p]
    D, _, _, r = build_d1(p, N)
    # p=10's closure table is published as truncated decimals
    # (diagonal_sbp.jl:111-121), so its k=5 boundary rows are only exact to
    # ~1e-5; test the digits the table actually carries.
    for k in range(min(p // 2, 4) + 1):
        np.testing.assert_allclose(D @ r**k, k * r ** max(k - 1, 0) * (k > 0),
                                   atol=1e-9)
    # interior rows are order-p accurate
    from hybridsbp_tpu.ops1d import d1_tables
    bm = d1_tables(p)[2].shape[0]
    interior = slice(bm, N + 1 - bm)
    for k in range(p + 1):
        np.testing.assert_allclose((D @ r**k)[interior],
                                   (k * r ** max(k - 1, 0) * (k > 0))[interior],
                                   atol=1e-8)


@pytest.mark.parametrize("p", D1_ORDERS)
def test_d2_sbp_structure(p):
    """A = SN - S0 - H D2 must be symmetric PSD; D2 exact on low polys."""
    N = Ns[p]
    D2, S0, SN, HI, H, r = build_d2(p, N)
    A = SN - S0 - H @ D2
    np.testing.assert_allclose(A, A.T, atol=1e-10)
    w = np.linalg.eigvalsh(0.5 * (A + A.T))
    assert w.min() > -1e-9, f"A not PSD: min eig {w.min()}"
    for k in range(p // 2 + 2):
        np.testing.assert_allclose(D2 @ r**k,
                                   k * (k - 1) * r ** max(k - 2, 0) * (k > 1),
                                   atol=1e-8)
    # boundary derivative operators approximate +u' at each end
    for k in range(p // 2 + 1):
        du = k * r ** max(k - 1, 0) * (k > 0)
        assert abs((S0 @ r**k)[0] - du[0]) < 1e-9
        assert abs((SN @ r**k)[N] - du[N]) < 1e-9


@pytest.mark.parametrize("p", VD2_ORDERS)
def test_vard2_compatibility_residual(p):
    """check_residual.jl:5-18 — R = M - D1' H diag(B) D1 is symmetric PSD."""
    N = 20
    B = np.array([i % 2 + 1.0 for i in range(N + 1)])
    _, _, _, _, _, M, _ = build_vard2(p, N, B)
    D1, _, H, _ = build_d1(p, N)
    R = M - D1.T @ H @ np.diag(B) @ D1
    np.testing.assert_allclose(R, R.T, atol=1e-10)
    w = np.linalg.eigvalsh(0.5 * (R + R.T))
    assert w.min() > -1e-10, f"compatibility residual not PSD: {w.min()}"


@pytest.mark.parametrize("p", VD2_ORDERS)
def test_vard2_constant_coeff_oracle(p):
    """For B=1 the variable operator matches the constant-coefficient one:
    M_var(1) == SN - S0 - H @ D2 (global_curved.jl:287-292 oracle)."""
    N = Ns[p]
    D2, S0c, SNc, _, _, _ = build_d2(p, N)
    _, _, _, _, H, M, _ = build_vard2(p, N, 1.0)
    np.testing.assert_allclose(M, SNc - S0c - H @ D2, atol=1e-10)


@pytest.mark.parametrize("p", VD2_ORDERS)
def test_vard2_structure(p):
    """Symmetry, M @ 1 = 0 (constants in nullspace of stiffness), SPD-ness
    of M, and accuracy of D on smooth data."""
    N = 40
    rng = np.random.default_rng(777)
    B = 1.0 + 0.5 * rng.random(N + 1)
    D, S0, SN, HI, H, M, r = build_vard2(p, N, B)
    np.testing.assert_allclose(M, M.T, atol=1e-10)
    np.testing.assert_allclose(M @ np.ones(N + 1), 0.0, atol=1e-10)
    w = np.linalg.eigvalsh(M)
    assert w.min() > -1e-10

    # D approximates d/dr(b du/dr): convergence on smooth b, u
    errs = []
    for NN in (40, 80):
        b = lambda x: 2.0 + np.sin(np.pi * x)
        Dv = build_vard2(p, NN, b)[0]
        rv = np.linspace(-1, 1, NN + 1)
        u = np.sin(2 * rv)
        exact = (np.pi * np.cos(np.pi * rv)) * (2 * np.cos(2 * rv)) + \
            (2.0 + np.sin(np.pi * rv)) * (-4 * np.sin(2 * rv))
        errs.append(np.abs(Dv @ u - exact).max())
    rate = np.log2(errs[0] / errs[1])
    # boundary closure accuracy is p/2, which bounds the max-norm rate
    assert rate > p / 2 - 0.5, f"vard2 convergence rate {rate} too low"


def test_vard2_batched_matches_single():
    rng = np.random.default_rng(0)
    N = 24
    for p in VD2_ORDERS:
        Bs = 1.0 + rng.random((5, N + 1))
        A, S0e, SNe = build_vard2_batched(p, N, Bs)
        for i in range(5):
            _, S0, SN, _, _, M, _ = build_vard2(p, N, Bs[i])
            np.testing.assert_allclose(A[i], M, atol=1e-12)
            nBS = S0e.shape[1]
            np.testing.assert_allclose(S0e[i], S0[0, :nBS], atol=1e-12)
            np.testing.assert_allclose(SNe[i], SN[N, N - nBS + 1:][::-1],
                                       atol=1e-12)
