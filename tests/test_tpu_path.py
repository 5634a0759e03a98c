"""Device-path gates: DIA stencil apply == sparse matvec, CG == direct
solve, batched multiblock matvec == dense eliminated system, and the
full batched CG solve matches the host hybrid solver."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from hybridsbp_tpu import BC_DIRICHLET, BC_LOCKED_INTERFACE, BC_NEUMANN
from hybridsbp_tpu.hybrid import build_problem
from hybridsbp_tpu.mesh import create_metrics
from hybridsbp_tpu.ops2d import locbcarray_mod, locoperator, locsourcearray
from hybridsbp_tpu.tpu import (
    build_blocked,
    cg,
    dia_apply,
    displacement_matvec,
    solve_displacements,
    to_dia,
)
from hybridsbp_tpu.tpu.multiblock import block_traces, combine_traces

VERTS = np.array([[-1.0, 0.0, 1.0, -1.0, 0.0, 1.0],
                  [0.0, 0.0, 0.0, 1.0, 1.0, 1.0]])
ETOV = np.array([[0, 1], [1, 2], [3, 4], [4, 5]])
ETOF = np.array([[0, 1], [1, 4], [2, 5], [3, 6]])


def _ftob():
    FToB = np.full(7, BC_DIRICHLET, dtype=np.int64)
    FToB[1] = BC_LOCKED_INTERFACE
    return FToB


@pytest.mark.parametrize("p", [2, 4, 6])
def test_dia_apply_matches_sparse(p):
    N = 3 * p + 5
    lop = locoperator(p, N, N, create_metrics(p, N, N),
                      (BC_DIRICHLET, BC_NEUMANN, BC_NEUMANN, BC_DIRICHLET))
    op = to_dia(lop.M, N + 1, N + 1)
    rng = np.random.default_rng(1)
    u = rng.standard_normal((N + 1, N + 1))
    got = np.asarray(dia_apply(op, jnp.asarray(u)))
    want = (lop.M @ u.ravel()).reshape(N + 1, N + 1)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_cg_matches_direct():
    p, N = 4, 17
    lop = locoperator(p, N, N)
    op = to_dia(lop.M, N + 1, N + 1)
    rng = np.random.default_rng(2)
    b = rng.standard_normal((N + 1, N + 1))
    from hybridsbp_tpu.tpu import dia_diagonal
    d = dia_diagonal(op)
    res = cg(lambda u: dia_apply(op, u), jnp.asarray(b), tol=1e-12,
             maxiter=4000, precond=lambda r: r / d)
    assert bool(res.converged), f"resnorm {res.resnorm}"
    want = spla.spsolve(lop.M, b.ravel()).reshape(N + 1, N + 1)
    np.testing.assert_allclose(np.asarray(res.x), want, rtol=1e-6, atol=1e-8)


def test_cg_stall_guard_broken_preconditioner():
    """VERDICT r4 next #3: a deliberately broken (rank-deficient)
    preconditioner stalls the flexible outer — the guard must bail
    after ~stall_iters windowed iterations and report ``stalled``
    distinctly, instead of burning maxiter (the N=272 trace failure
    burned 200 x 36 s before reporting)."""
    rng = np.random.default_rng(7)
    n = 64
    Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
    A = jnp.asarray(Q @ np.diag(np.linspace(1.0, 50.0, n)) @ Q.T)
    b = jnp.asarray(rng.standard_normal(n))
    # rank-1 "preconditioner": confines every correction to e0 — once
    # that component of the residual is gone, z = gamma = 0 and the
    # iteration makes no further progress (guarded divisions keep it
    # inert, exactly the stalled shape)
    mask = jnp.zeros(n).at[0].set(1.0)
    res = cg(lambda x: A @ x, b, tol=1e-10, maxiter=500, flexible=True,
             precond=lambda r: r * mask, stall_iters=10)
    assert bool(res.stalled)
    assert not bool(res.converged)
    assert int(res.iters) <= 30, f"guard should bail early: {res.iters}"


def test_cg_stall_guard_trips_at_f32_floor():
    """tol below the f32 attainable-accuracy floor: the residual
    plateaus at ~kappa*eps_f32 and the guard must trip instead of
    running to maxiter (the N=272 diagnosis shape)."""
    rng = np.random.default_rng(8)
    n = 96
    Q = np.linalg.qr(rng.standard_normal((n, n)))[0].astype(np.float32)
    d = np.logspace(0, 6, n).astype(np.float32)
    A = jnp.asarray(Q @ np.diag(d) @ Q.T, dtype=jnp.float32)
    b = jnp.asarray(rng.standard_normal(n), dtype=jnp.float32)
    res = cg(lambda x: A @ x, b, tol=1e-12, maxiter=5000,
             stall_iters=25)
    assert not bool(res.converged)
    assert bool(res.stalled)
    assert int(res.iters) < 5000


def test_cg_stall_guard_inert_on_healthy_solve():
    """A healthy converging solve must not trip the guard."""
    rng = np.random.default_rng(9)
    n = 80
    M = rng.standard_normal((n, n))
    A = jnp.asarray(np.eye(n) + 0.1 * (M @ M.T) / n)
    b = jnp.asarray(rng.standard_normal(n))
    res = cg(lambda x: A @ x, b, tol=1e-10, maxiter=200, stall_iters=10)
    assert bool(res.converged)
    assert not bool(res.stalled)


def _two_block(p=2, N=12):
    Narr = np.full(2, N)
    prob, conn = build_problem(p, VERTS, ETOV, ETOF, _ftob(), Narr, Narr)
    return prob


@pytest.mark.parametrize("p,curved", [(2, False), (4, False), (6, True)])
def test_blocked_matvec_matches_dense(p, curved):
    if curved:
        # distorted quads -> crs != 0 -> the face coupling carries its
        # widest along-face bands (+-(p-1) at p=6); gates the banded
        # FaceOps extraction against the dense eliminated operator
        verts = np.array([[-1.0, 0.0, 1.0, -1.1, 0.2, 0.9],
                          [0.0, -0.15, 0.1, 1.0, 1.3, 0.8]])
        N = np.full(2, 3 * p + 4)
        prob, _ = build_problem(p, verts, ETOV, ETOF, _ftob(), N, N)
    else:
        prob = _two_block(p=p)
    bp = build_blocked(prob)
    assert max(len(o) for o in bp.faces.offs) > 1 or not curved
    E = 2
    N1 = prob.lops[0].Nr + 1
    rng = np.random.default_rng(7)
    u = rng.standard_normal((E, N1, N1))

    Mblk = sp.block_diag([prob.lops[0].M, prob.lops[1].M]).tocsr()
    Fd = prob.FbarT
    C = Mblk - Fd.T @ sp.diags(1.0 / prob.D) @ Fd
    want = (C @ u.reshape(-1)).reshape(E, N1, N1)
    got = np.asarray(displacement_matvec(bp, jnp.asarray(u)))
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)

    # trace pipeline alone matches FbarT @ u (interior faces)
    w = np.asarray(combine_traces(bp, block_traces(bp, jnp.asarray(u))))
    fb = Fd @ u.reshape(-1)
    f_int = np.where(bp.interior)[0]
    for f in f_int:
        s0, s1 = prob.FToLstarts[f], prob.FToLstarts[f + 1]
        np.testing.assert_allclose(w[f] * prob.D[s0:s1], fb[s0:s1],
                                   rtol=1e-10, atol=1e-12)


def test_blocked_solve_matches_host():
    p, N = 2, 16
    prob = _two_block(p=p, N=N)
    bp = build_blocked(prob)
    uex = lambda x, y: np.sin(np.pi * x) * np.cosh(y) + x * y
    ux = lambda x, y: np.pi * np.cos(np.pi * x) * np.cosh(y) + y
    uy = lambda x, y: np.sin(np.pi * x) * np.sinh(y) + x
    f = lambda x, y: (np.pi**2 - 1) * np.sin(np.pi * x) * np.cosh(y)

    g = np.zeros(int(prob.vstarts[-1]))
    for e in range(2):
        lop = prob.lops[e]
        ge = locbcarray_mod(
            lop, lop.bctype, lambda lf, x, y: uex(x, y),
            lambda lf, x, y, nx, ny: nx * ux(x, y) + ny * uy(x, y))
        ge += locsourcearray(lop, f)
        g[prob.vstarts[e]:prob.vstarts[e + 1]] = ge

    u_host, _ = prob.solve(g, np.zeros(int(prob.FToLstarts[-1])),
                           method="displacements")
    gb = jnp.asarray(g.reshape(2, N + 1, N + 1))
    gd = jnp.zeros_like(bp.Dinv)
    res = solve_displacements(bp, gb, gd, tol=1e-12, maxiter=5000)
    assert bool(res.converged), f"CG resnorm {float(res.resnorm)}"
    np.testing.assert_allclose(np.asarray(res.x).ravel(), u_host,
                               rtol=1e-6, atol=1e-8)


def test_pallas_stencil_interpret_matches_sparse():
    """The Pallas VMEM-staged kernel (interpret mode on CPU) equals the
    sparse matvec."""
    from hybridsbp_tpu.tpu.pallas_stencil import dia_apply_batched
    p, N, E = 2, 10, 3
    lop = locoperator(p, N, N, create_metrics(p, N, N),
                      (BC_DIRICHLET, BC_NEUMANN, BC_NEUMANN, BC_DIRICHLET))
    op = to_dia(lop.M, N + 1, N + 1)
    rng = np.random.default_rng(9)
    u = rng.standard_normal((E, N + 1, N + 1))
    coefs = jnp.broadcast_to(op.coefs[None], (E,) + op.coefs.shape)
    got = np.asarray(dia_apply_batched(jnp.asarray(coefs), op.offsets,
                                       jnp.asarray(u), interpret=True))
    want = np.stack([(lop.M @ u[e].ravel()).reshape(N + 1, N + 1)
                     for e in range(E)])
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_fastdiag_exact_on_separable():
    """On the identity map (separable coefficients, crs=0) the fast-
    diagonalization preconditioner equals M exactly: CG converges in a
    couple of iterations."""
    from hybridsbp_tpu.tpu.fastdiag import build_fastdiag, fastdiag_apply
    p, N = 4, 21
    lop = locoperator(p, N, N, create_metrics(p, N, N),
                      (BC_DIRICHLET, BC_DIRICHLET, BC_NEUMANN, BC_DIRICHLET))
    fd = build_fastdiag(lop)
    op = to_dia(lop.M, N + 1, N + 1)
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.standard_normal((N + 1, N + 1)))
    # P^{-1} M b ~= b
    x = fastdiag_apply(fd, dia_apply(op, b))
    np.testing.assert_allclose(np.asarray(x), np.asarray(b), rtol=1e-8,
                               atol=1e-8)
    res = cg(lambda u: dia_apply(op, u), b, tol=1e-11, maxiter=50,
             precond=lambda r: fastdiag_apply(fd, r))
    assert bool(res.converged) and int(res.iters) <= 5, \
        f"iters {int(res.iters)}"


def test_fastdiag_beats_jacobi_on_curved():
    """On a curved block (crs != 0) fastdiag-CG needs far fewer
    iterations than Jacobi-CG."""
    from hybridsbp_tpu.tpu.fastdiag import build_fastdiag, fastdiag_apply
    from hybridsbp_tpu.tpu import dia_diagonal

    def xf(r, s):
        R = 1.5 + 0.5 * r
        th = np.pi / 4 * s
        return R * np.cos(th), 0.5 * np.cos(th), -R * np.pi / 4 * np.sin(th)

    def yf(r, s):
        R = 1.5 + 0.5 * r
        th = np.pi / 4 * s
        return R * np.sin(th), 0.5 * np.sin(th), R * np.pi / 4 * np.cos(th)

    p, N = 4, 24
    m = create_metrics(p, N, N, xf, yf)
    lop = locoperator(p, N, N, m,
                      (BC_DIRICHLET, BC_DIRICHLET, BC_NEUMANN, BC_NEUMANN))
    op = to_dia(lop.M, N + 1, N + 1)
    fd = build_fastdiag(lop)
    d = dia_diagonal(op)
    rng = np.random.default_rng(4)
    b = jnp.asarray(rng.standard_normal((N + 1, N + 1)))
    r_j = cg(lambda u: dia_apply(op, u), b, tol=1e-10, maxiter=4000,
             precond=lambda r: r / d)
    r_f = cg(lambda u: dia_apply(op, u), b, tol=1e-10, maxiter=4000,
             precond=lambda r: fastdiag_apply(fd, r))
    assert bool(r_f.converged)
    assert int(r_f.iters) * 3 < int(r_j.iters), \
        f"fastdiag {int(r_f.iters)} vs jacobi {int(r_j.iters)}"
    # same answer
    np.testing.assert_allclose(np.asarray(r_f.x), np.asarray(r_j.x),
                               rtol=1e-6, atol=1e-8)


def test_iterative_refinement_f32_to_f64():
    """f32 fastdiag-CG + f64 residual refinement reaches f64-level
    accuracy on a curved-block solve."""
    from hybridsbp_tpu.tpu.fastdiag import build_fastdiag, fastdiag_apply
    from hybridsbp_tpu.tpu.refine import iterative_refinement

    def xf(r, s):
        R = 1.5 + 0.5 * r
        th = np.pi / 4 * s
        return R * np.cos(th), 0.5 * np.cos(th), -R * np.pi / 4 * np.sin(th)

    def yf(r, s):
        R = 1.5 + 0.5 * r
        th = np.pi / 4 * s
        return R * np.sin(th), 0.5 * np.sin(th), R * np.pi / 4 * np.cos(th)

    p, N = 2, 20
    m = create_metrics(p, N, N, xf, yf)
    lop = locoperator(p, N, N, m)
    op64 = to_dia(lop.M, N + 1, N + 1)
    op32 = to_dia(lop.M, N + 1, N + 1, dtype=jnp.float32)
    fd32 = build_fastdiag(lop, dtype=jnp.float32)

    def solve32(r32):
        return cg(lambda u: dia_apply(op32, u), r32, tol=1e-6, maxiter=300,
                  precond=lambda r: fastdiag_apply(fd32, r)).x

    rng = np.random.default_rng(6)
    b = rng.standard_normal((N + 1, N + 1))
    x, norms = iterative_refinement(solve32, lambda u: dia_apply(op64, u),
                                    jnp.asarray(b), sweeps=3)
    want = spla.spsolve(lop.M, b.ravel()).reshape(N + 1, N + 1)
    err = np.abs(np.asarray(x) - want).max() / np.abs(want).max()
    assert err < 1e-9, f"refined solution err {err}, norms {norms}"
    # refinement actually reduced the residual
    assert float(norms[-1]) < 1e-6 * float(norms[0])


def test_cg_solve_implicit_gradients():
    """Gradients flow through the SPD solve by the adjoint method:
    d/db sum(A^{-1} b) = A^{-1} 1, and grads w.r.t. operator data match
    finite differences."""
    import jax
    from hybridsbp_tpu.tpu import cg_solve

    p, N = 2, 10
    lop = locoperator(p, N, N)
    op = to_dia(lop.M, N + 1, N + 1)
    rng = np.random.default_rng(12)
    b = jnp.asarray(rng.standard_normal((N + 1, N + 1)))

    f = lambda bb: jnp.sum(cg_solve(lambda u: dia_apply(op, u), bb,
                                    tol=1e-12, maxiter=2000))
    g = jax.grad(f)(b)
    want = spla.spsolve(lop.M, np.ones((N + 1) ** 2)).reshape(N + 1, N + 1)
    np.testing.assert_allclose(np.asarray(g), want, rtol=1e-6, atol=1e-8)

    # forward-mode too
    tang = jnp.asarray(rng.standard_normal(b.shape))
    _, jvp = jax.jvp(f, (b,), (tang,))
    np.testing.assert_allclose(float(jvp), float(jnp.sum(g * tang)),
                               rtol=1e-8)


def test_bf16_inner_refinement():
    """bf16 DIA matvec + fastdiag-CG inner solves, refined to f64: the
    half-bandwidth serving path is numerically viable."""
    from hybridsbp_tpu.tpu.fastdiag import build_fastdiag, fastdiag_apply
    from hybridsbp_tpu.tpu.refine import iterative_refinement

    p, N = 2, 24
    lop = locoperator(p, N, N)
    op64 = to_dia(lop.M, N + 1, N + 1)
    op16 = to_dia(lop.M, N + 1, N + 1, dtype=jnp.bfloat16)
    fd16 = build_fastdiag(lop, dtype=jnp.bfloat16)
    rng = np.random.default_rng(1)
    b = rng.standard_normal((N + 1, N + 1))

    def solve16(r):
        return cg(lambda u: dia_apply(op16, u),
                  jnp.asarray(r, jnp.bfloat16), tol=3e-2, maxiter=100,
                  precond=lambda rr: fastdiag_apply(fd16, rr)).x

    x, norms = iterative_refinement(solve16,
                                    lambda u: dia_apply(op64, u),
                                    jnp.asarray(b), sweeps=8)
    want = spla.spsolve(lop.M, b.ravel()).reshape(N + 1, N + 1)
    err = np.abs(np.asarray(x) - want).max() / np.abs(want).max()
    assert err < 1e-12, f"bf16-refined err {err}"


def test_recover_lambda_matches_host():
    from hybridsbp_tpu.tpu.multiblock import blocked_rhs_from_host, recover_lambda
    from hybridsbp_tpu.tpu import solve_displacements
    p, N = 2, 12
    prob = _two_block(p=p, N=N)
    bp = build_blocked(prob)
    rng = np.random.default_rng(8)
    g = rng.standard_normal(int(prob.vstarts[-1]))
    gd = rng.standard_normal(int(prob.FToLstarts[-1]))
    u_host, lam_host = prob.solve(g, gd, method="displacements")
    gb, gdf = blocked_rhs_from_host(prob, g, gd)
    res = solve_displacements(bp, gb, gdf, tol=1e-12, maxiter=5000)
    lam = np.asarray(recover_lambda(bp, res.x, gdf))
    for f in np.where(bp.interior)[0]:
        s0, s1 = prob.FToLstarts[f], prob.FToLstarts[f + 1]
        np.testing.assert_allclose(lam[f, :s1 - s0], lam_host[s0:s1],
                                   rtol=1e-6, atol=1e-8)


def test_fastdiag_p6_curved():
    """fastdiag remains an effective preconditioner at p=6 on a curved
    block (31 stencil offsets, crs != 0)."""
    from hybridsbp_tpu.tpu.fastdiag import build_fastdiag, fastdiag_apply

    def xf(r, s):
        R = 1.5 + 0.5 * r
        th = np.pi / 4 * s
        return R * np.cos(th), 0.5 * np.cos(th), -R * np.pi / 4 * np.sin(th)

    def yf(r, s):
        R = 1.5 + 0.5 * r
        th = np.pi / 4 * s
        return R * np.sin(th), 0.5 * np.sin(th), R * np.pi / 4 * np.cos(th)

    p, N = 6, 26
    m = create_metrics(p, N, N, xf, yf)
    lop = locoperator(p, N, N, m)
    op = to_dia(lop.M, N + 1, N + 1)
    fd = build_fastdiag(lop)
    rng = np.random.default_rng(21)
    b = jnp.asarray(rng.standard_normal((N + 1, N + 1)))
    res = cg(lambda u: dia_apply(op, u), b, tol=1e-10, maxiter=2000,
             precond=lambda r: fastdiag_apply(fd, r))
    assert bool(res.converged) and int(res.iters) < 200, \
        f"iters {int(res.iters)}"
    want = spla.spsolve(lop.M, np.asarray(b).ravel()).reshape(N + 1, N + 1)
    np.testing.assert_allclose(np.asarray(res.x), want, rtol=1e-5, atol=1e-7)


def test_reference_style_aliases():
    from hybridsbp_tpu.ops1d import (
        diagonal_sbp_D1, diagonal_sbp_D2, variable_diagonal_sbp_D2)
    D, HI, H, r = diagonal_sbp_D1(4, 20)
    assert D.shape == (21, 21)
    out = diagonal_sbp_D2(4, 20)
    assert len(out) == 6
    out = variable_diagonal_sbp_D2(4, 20, 1.0)
    assert len(out) == 7


def test_woodbury_two_level_precond():
    """Woodbury two-level preconditioner (fastdiag blocks + assembled
    trace inverse) is SPD-consistent and cuts CG iterations vs
    fastdiag-only on a multiblock jump problem."""
    from hybridsbp_tpu.tpu.multiblock import (build_woodbury,
                                              woodbury_precond,
                                              blocked_rhs_from_host)
    prob = _two_block(p=2, N=14)
    bp = build_blocked(prob)
    rng = np.random.default_rng(17)
    g = rng.standard_normal(int(prob.vstarts[-1]))
    gd = rng.standard_normal(int(prob.FToLstarts[-1]))
    gb, gdf = blocked_rhs_from_host(prob, g, gd)
    r_fd = solve_displacements(bp, gb, gdf, tol=1e-11, maxiter=8000)
    M = woodbury_precond(bp, build_woodbury(bp, prob))
    r_w = solve_displacements(bp, gb, gdf, tol=1e-11, maxiter=8000,
                              precond=M)
    assert bool(r_w.converged)
    assert int(r_w.iters) < int(r_fd.iters)
    np.testing.assert_allclose(np.asarray(r_w.x), np.asarray(r_fd.x),
                               rtol=1e-6, atol=1e-8)

    # VERDICT r1 #7: upgrading the block solve to k inner fastdiag-CG
    # iterations (flexible outer) collapses the outer count to O(1)
    # (56-block jump problem: 218 -> 4 at 1e-10, measured r2)
    M8 = woodbury_precond(bp, build_woodbury(bp, prob), inner_iters=8)
    r_w8 = solve_displacements(bp, gb, gdf, tol=1e-11, maxiter=500,
                               precond=M8, flexible=True)
    assert bool(r_w8.converged)
    assert int(r_w8.iters) <= 12, f"woodbury+innerCG took {r_w8.iters}"
    np.testing.assert_allclose(np.asarray(r_w8.x), np.asarray(r_fd.x),
                               rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("p", [2, 6])
def test_dia_apply_compact_matches(p):
    """Scan-based apply (O(1) program size) == unrolled apply."""
    from hybridsbp_tpu.tpu import dia_apply_compact
    N = 3 * p + 7
    lop = locoperator(p, N, N, create_metrics(p, N, N),
                      (BC_DIRICHLET, BC_NEUMANN, BC_NEUMANN, BC_DIRICHLET))
    op = to_dia(lop.M, N + 1, N + 1)
    rng = np.random.default_rng(23)
    u = jnp.asarray(rng.standard_normal((N + 1, N + 1)))
    np.testing.assert_allclose(np.asarray(dia_apply_compact(op, u)),
                               np.asarray(dia_apply(op, u)),
                               rtol=1e-13, atol=1e-13)
    # batched too
    ub = jnp.asarray(rng.standard_normal((3, N + 1, N + 1)))
    got = np.asarray(dia_apply_compact(op, ub))
    want = np.asarray(jax.vmap(lambda x: dia_apply(op, x))(ub))
    np.testing.assert_allclose(got, want, rtol=1e-13, atol=1e-13)


def test_solve_displacements_compact_stencil():
    """The full CG solve with the scan-based compact stencil matches
    the default (unrolled) stencil path."""
    p, N = 2, 16
    prob = _two_block(p=p, N=N)
    bp = build_blocked(prob)
    rng = np.random.default_rng(31)
    gb = jnp.asarray(rng.standard_normal((2, N + 1, N + 1)))
    gd = jnp.zeros_like(bp.Dinv)
    r_ref = solve_displacements(bp, gb, gd, tol=1e-12, maxiter=5000)
    r_cmp = solve_displacements(bp, gb, gd, tol=1e-12, maxiter=5000,
                                stencil="compact")
    assert bool(r_cmp.converged)
    np.testing.assert_allclose(np.asarray(r_cmp.x), np.asarray(r_ref.x),
                               rtol=1e-9, atol=1e-11)


def test_pallas_tiled_and_shared_kernels_match():
    """The s-tiled manual-DMA kernel and both shared-coefficient forms
    (XLA + Pallas) equal the sparse matvec (interpret mode on CPU).
    These kernels are options, not the default: on-chip measurement
    showed XLA at the irreducible roofline for this op (RESULTS.md r2)."""
    from hybridsbp_tpu.tpu.pallas_stencil import (
        _dia_apply_pallas_shared,
        _dia_apply_pallas_tiled,
        dia_apply_shared,
        dia_apply_shared_stream,
    )

    p, N, E = 6, 31, 3
    lop = locoperator(p, N, N, create_metrics(p, N, N))
    op = to_dia(lop.M, N + 1, N + 1)
    offs = tuple(op.offsets)
    rng = np.random.default_rng(41)
    u = jnp.asarray(rng.standard_normal((E, N + 1, N + 1)))
    want = np.stack([(lop.M @ np.asarray(u[e]).ravel()).reshape(N + 1, N + 1)
                     for e in range(E)])

    c1 = jnp.asarray(np.asarray(op.coefs))
    # distinct per-block scaling for the tiled (per-block) kernel
    scl = jnp.asarray([1.0, 2.0, 0.5])
    coefsE = c1[None] * scl[:, None, None, None]
    got = np.asarray(_dia_apply_pallas_tiled(coefsE, u, offs, T=8,
                                             interpret=True))
    np.testing.assert_allclose(got, want * np.asarray(scl)[:, None, None],
                               rtol=1e-12, atol=1e-12)

    for f in (lambda: dia_apply_shared(c1, u, offs),
              lambda: _dia_apply_pallas_shared(c1, u, offs, interpret=True),
              lambda: dia_apply_shared_stream(c1, u, offs, interpret=True)):
        np.testing.assert_allclose(np.asarray(f()), want,
                                   rtol=1e-12, atol=1e-12)


def test_pallas_flat_stream_kernel():
    """Flat-layout streaming kernel (r3 frontier, TODO.md): strip-DMA'd
    flat coefficients + resident field == the XLA flat apply, against a
    real assembled operator, including a bf16-stored stack and a KO
    that does not divide nflat (zero-plane padding path)."""
    from hybridsbp_tpu.tpu.pallas_stencil import dia_apply_flat_stream
    from hybridsbp_tpu.tpu.stencil import dia_apply_flat, flatten_dia

    p, N, E = 6, 31, 3
    lop = locoperator(p, N, N, create_metrics(p, N, N))
    op = to_dia(lop.M, N + 1, N + 1)
    rng = np.random.default_rng(7)
    scl = jnp.asarray([1.0, 2.0, 0.5])
    coefsE = jnp.asarray(np.asarray(op.coefs))[None] \
        * scl[:, None, None, None]
    cf, offs_flat = flatten_dia(coefsE, tuple(op.offsets), N + 1)
    u = jnp.asarray(rng.standard_normal((E, N + 1, N + 1)))
    want = np.asarray(dia_apply_flat(cf, offs_flat, u))
    got = np.asarray(dia_apply_flat_stream(cf, offs_flat, u, KO=8,
                                           interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)
    # bf16 storage upcasts at the multiply; accumulator stays f32
    u32 = u.astype(jnp.float32)
    got16 = np.asarray(dia_apply_flat_stream(
        cf.astype(jnp.bfloat16), offs_flat, u32, KO=8, interpret=True))
    want16 = np.asarray(dia_apply_flat(
        cf.astype(jnp.bfloat16).astype(jnp.float32), offs_flat, u32))
    np.testing.assert_allclose(got16, want16, rtol=1e-5, atol=1e-5)
    # symmetric streaming mode: half the planes, same result
    from hybridsbp_tpu.tpu.stencil import flatten_dia_sym
    cs, offs_sym = flatten_dia_sym(coefsE, tuple(op.offsets), N + 1)
    gots = np.asarray(dia_apply_flat_stream(cs, offs_sym, u, KO=8,
                                            sym=True, interpret=True))
    np.testing.assert_allclose(gots, want, rtol=1e-12, atol=1e-12)
    # shared (extent-1) stack: every program streams block 0 in-kernel
    # (no E-fold broadcast copy in HBM)
    gotsh = np.asarray(dia_apply_flat_stream(cf[:1], offs_flat, u, KO=8,
                                             interpret=True))
    want_sh = np.asarray(dia_apply_flat(cf[:1], offs_flat, u))
    np.testing.assert_allclose(gotsh, want_sh, rtol=1e-12, atol=1e-12)
    # multi-block sublane packing (EB > 1), incl. the E-padding path
    # (E=3, EB=2 -> E_pad=4 zero block) and EB on the shared + sym forms
    for kw in (dict(EB=2), dict(EB=2, sym=True), dict(EB=3)):
        c_in, o_in = (cs, offs_sym) if kw.get("sym") else (cf, offs_flat)
        got_eb = np.asarray(dia_apply_flat_stream(
            c_in, o_in, u, KO=8, interpret=True, **kw))
        np.testing.assert_allclose(got_eb, want, rtol=1e-12, atol=1e-12)
    gotsh_eb = np.asarray(dia_apply_flat_stream(
        cf[:1], offs_flat, u, KO=8, EB=3, interpret=True))
    np.testing.assert_allclose(gotsh_eb, want_sh, rtol=1e-12, atol=1e-12)


def test_pallas_kernels_bf16_coefs():
    """Mixed dtypes: bf16-stored coefficient stacks with f32 fields
    through the manual-DMA kernels — buffers must carry the matching
    endpoint dtypes (review r2: cbuf/ubuf typed from the wrong ref
    broke the bf16-storage + pallas combination)."""
    from hybridsbp_tpu.tpu.pallas_stencil import (
        _dia_apply_pallas_tiled,
        dia_apply_batched,
        dia_apply_shared_stream,
    )

    rng = np.random.default_rng(5)
    E, Nsp, Nrp = 3, 32, 16
    offs = tuple((ds, dr) for ds in (-1, 0, 1) for dr in (-1, 0, 1))
    coefs = jnp.asarray(rng.standard_normal((E, len(offs), Nsp, Nrp)),
                        jnp.float32).astype(jnp.bfloat16)
    u = jnp.asarray(rng.standard_normal((E, Nsp, Nrp)), jnp.float32)
    want = dia_apply_batched(coefs.astype(jnp.float32), offs, u,
                             use_pallas=False)
    got = _dia_apply_pallas_tiled(coefs, u, offs, T=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    c1 = coefs[0]
    got2 = dia_apply_shared_stream(c1, u, offs, interpret=True)
    want2 = dia_apply_batched(
        jnp.broadcast_to(c1.astype(jnp.float32), coefs.shape), offs, u,
        use_pallas=False)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               rtol=1e-5, atol=1e-5)


def _same_op_prob(p=2, N=12):
    """Duck-typed two-block problem whose blocks carry the SAME local
    operator (block 0's), for gating the shared-representation path —
    physical meshes rarely produce byte-identical blocks (bctype layouts
    differ at domain corners), so the equivalence is tested directly."""
    import types

    prob = _two_block(p=p, N=N)
    return types.SimpleNamespace(
        lops={0: prob.lops[0], 1: prob.lops[0]},
        FToB=prob.FToB, FToLstarts=prob.FToLstarts, D=prob.D,
        FToE=prob.FToE, FToLF=prob.FToLF, EToF=prob.EToF, EToO=prob.EToO)


def test_shared_operator_representation():
    """share_ops='auto' stores one broadcast coefficient stack for
    identical-operator meshes; the shared dispatch (XLA, pallas-shared,
    compact) computes the same coupled matvec as the per-block layout,
    and the SPD decoupled block solve agrees."""
    from hybridsbp_tpu.tpu.multiblock import block_solve

    fake = _same_op_prob()
    bp_sh = build_blocked(fake)
    assert bp_sh.shared and bp_sh.coefs.shape[0] == 1 and bp_sh.nblocks == 2
    bp_pb = build_blocked(fake, share_ops=False)
    assert not bp_pb.shared and bp_pb.coefs.shape[0] == 2

    rng = np.random.default_rng(23)
    u = jnp.asarray(rng.standard_normal((2,) + tuple(bp_pb.grid_shape)))
    want = np.asarray(displacement_matvec(bp_pb, u))
    for stencil in ("auto", "compact"):
        got = np.asarray(displacement_matvec(bp_sh, u, stencil=stencil))
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)

    r_sh = block_solve(bp_sh, u, tol=1e-11)
    r_pb = block_solve(bp_pb, u, tol=1e-11)
    assert bool(r_sh.converged) and bool(r_pb.converged)
    np.testing.assert_allclose(np.asarray(r_sh.x), np.asarray(r_pb.x),
                               rtol=1e-8, atol=1e-10)

    # the symmetric physical strip's two blocks ARE byte-identical
    # (mirror-symmetric closures on a constant metric): auto detects it
    assert build_blocked(_two_block()).shared

    # an asymmetric bc layout breaks the sharing and must not be detected
    FToB = _ftob()
    FToB[4] = BC_NEUMANN                 # block 1's east face only
    N = np.full(2, 12)
    prob_asym, _ = build_problem(2, VERTS, ETOV, ETOF, FToB, N, N)
    assert not build_blocked(prob_asym).shared
    with pytest.raises(AssertionError):
        build_blocked(prob_asym, share_ops=True)


@pytest.mark.heavy
def test_bf16_coef_storage_and_refined_solve():
    """coef_dtype=bfloat16 halves the coefficient stream: the matvec
    upcasts on-chip (output stays in field precision, error ~bf16 eps),
    and refined_displacement_solve recovers full-precision residuals
    against the exact operator while iterating on the bf16 one."""
    from hybridsbp_tpu.tpu import refined_displacement_solve, with_coef_dtype
    from hybridsbp_tpu.tpu.multiblock import displacement_rhs

    # distorted quads -> variable metric -> generic coefficient values
    # (on the Cartesian strip nearly every entry is a dyadic rational,
    # exactly bf16-representable, and the cast would be lossless!)
    p, N = 2, 13
    verts = np.array([[-1.0, 0.0, 1.0, -1.1, 0.2, 0.9],
                      [0.0, -0.15, 0.1, 1.0, 1.3, 0.8]])
    Narr = np.full(2, N)
    prob, _ = build_problem(p, verts, ETOV, ETOF, _ftob(), Narr, Narr)
    bp = build_blocked(prob)
    bp16 = with_coef_dtype(bp, jnp.bfloat16)
    assert bp16.coefs.dtype == jnp.bfloat16

    rng = np.random.default_rng(29)
    u = jnp.asarray(rng.standard_normal((2, N + 1, N + 1)))
    y = np.asarray(displacement_matvec(bp, u))
    y16 = np.asarray(displacement_matvec(bp16, u))
    assert y16.dtype == y.dtype                      # upcast on-chip
    rel = np.abs(y16 - y).max() / np.abs(y).max()
    assert 1e-8 < rel < 2e-2, f"bf16 matvec rel err {rel}"

    # build_blocked can store bf16 stacks directly
    assert build_blocked(prob, coef_dtype=jnp.bfloat16).coefs.dtype \
        == jnp.bfloat16

    g = jnp.asarray(rng.standard_normal((2, N + 1, N + 1)))
    gd = jnp.zeros_like(bp.Dinv)
    x, norms = refined_displacement_solve(bp, g, gd, sweeps=12,
                                          inner_tol=1e-8,
                                          inner_maxiter=2000, tol=1e-11)
    # measured contraction ~0.08/sweep on this curved mesh (operator-
    # perturbation-limited), so 1e-11 takes ~10 sweeps
    assert float(norms[-1]) < 1e-11, [float(n) for n in norms]
    assert float(norms[1]) < 0.3 * float(norms[0])
    want = solve_displacements(bp, g, gd, tol=1e-12, maxiter=5000)
    assert bool(want.converged)
    b = displacement_rhs(bp, g, gd)
    bn = float(jnp.sqrt(jnp.sum(b * b)))
    r = b - displacement_matvec(bp, jnp.asarray(x))
    assert float(jnp.sqrt(jnp.sum(r * r))) / bn < 1e-11
    np.testing.assert_allclose(np.asarray(x), np.asarray(want.x),
                               rtol=1e-7, atol=1e-9)


@pytest.mark.parametrize("p", [2, 4, 6])
def test_dia_apply_flat_matches_sparse(p):
    """1D raveled-diagonal layout (flatten_dia/dia_apply_flat) is exact
    — including offset collisions at tiny Nrp (|dr| comparable to the
    row length), which merge by coefficient summation."""
    from hybridsbp_tpu.tpu.stencil import dia_apply_flat, flatten_dia

    N = 3 * p + 5
    lop = locoperator(p, N, N, create_metrics(p, N, N),
                      (BC_DIRICHLET, BC_NEUMANN, BC_NEUMANN, BC_DIRICHLET))
    op = to_dia(lop.M, N + 1, N + 1)
    cf, offs = flatten_dia(op.coefs, op.offsets, N + 1)
    rng = np.random.default_rng(1)
    u = rng.standard_normal((N + 1, N + 1))
    got = np.asarray(dia_apply_flat(cf, offs, jnp.asarray(u)))
    want = (lop.M @ u.ravel()).reshape(N + 1, N + 1)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)
    # batched: (E, nflat, Nvol) coefs against (E, Nsp, Nrp) fields
    cfb = jnp.stack([cf, 2.0 * cf])
    ub = jnp.stack([jnp.asarray(u), jnp.asarray(u)])
    gb = np.asarray(dia_apply_flat(cfb, offs, ub))
    np.testing.assert_allclose(gb[0], want, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(gb[1], 2 * want, rtol=1e-12, atol=1e-12)


def test_blocked_solve_flat_layout_matches_host():
    """with_flat_layout / build_blocked(flat=True): the auto-routed
    flat-stencil solve reproduces the host direct solve, and the flat
    apply equals the plane apply bit-for-bit on the coupled matvec."""
    from hybridsbp_tpu.tpu.multiblock import (displacement_matvec,
                                              with_flat_layout)

    p, N = 2, 16
    prob = _two_block(p=p, N=N)
    bp = build_blocked(prob, flat=False)
    bpf = with_flat_layout(bp)
    assert bpf.coefs_flat is not None and bpf.offsets_flat is not None

    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.standard_normal((2, N + 1, N + 1)))
    y_plane = displacement_matvec(bp, u, stencil="unrolled")
    y_flat = displacement_matvec(bpf, u, stencil="flat")
    np.testing.assert_allclose(np.asarray(y_flat), np.asarray(y_plane),
                               rtol=1e-13, atol=1e-13)

    uex = lambda x, y: np.sin(np.pi * x) * np.cosh(y) + x * y
    ux = lambda x, y: np.pi * np.cos(np.pi * x) * np.cosh(y) + y
    uy = lambda x, y: np.sin(np.pi * x) * np.sinh(y) + x
    f = lambda x, y: (np.pi**2 - 1) * np.sin(np.pi * x) * np.cosh(y)
    g = np.zeros(int(prob.vstarts[-1]))
    for e in range(2):
        lop = prob.lops[e]
        ge = locbcarray_mod(
            lop, lop.bctype, lambda lf, x, y: uex(x, y),
            lambda lf, x, y, nx, ny: nx * ux(x, y) + ny * uy(x, y))
        ge += locsourcearray(lop, f)
        g[prob.vstarts[e]:prob.vstarts[e + 1]] = ge
    u_host, _ = prob.solve(g, np.zeros(int(prob.FToLstarts[-1])),
                           method="displacements")
    gb = jnp.asarray(g.reshape(2, N + 1, N + 1))
    res = solve_displacements(bpf, gb, jnp.zeros_like(bp.Dinv),
                              tol=1e-12, maxiter=5000)  # auto -> flat
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x).ravel(), u_host,
                               rtol=1e-6, atol=1e-8)


def test_blocked_solve_symmetric_flat_matches_host():
    """with_flat_layout(sym=True) / build_blocked(flat='sym'): the
    symmetric flat matvec (half the coefficient planes) equals the
    plane apply to roundoff on the coupled matvec, chunked and
    unchunked, and the auto-routed solve reproduces the host direct
    solve."""
    from hybridsbp_tpu.tpu.multiblock import (displacement_matvec,
                                              with_flat_layout)

    p, N = 2, 16
    prob = _two_block(p=p, N=N)
    bp = build_blocked(prob, flat=False)
    bps = with_flat_layout(bp, sym=True)
    assert bps.flat_sym and all(o >= 0 for o in bps.offsets_flat)

    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.standard_normal((2, N + 1, N + 1)))
    y_plane = displacement_matvec(bp, u, stencil="unrolled")
    y_sym = displacement_matvec(bps, u, stencil="flat")
    np.testing.assert_allclose(np.asarray(y_sym), np.asarray(y_plane),
                               rtol=1e-12, atol=1e-12)
    # chunked symmetric path (pads E 2 -> 3)
    bpc = with_flat_layout(bp, echunk=3, sym=True)
    y_chunk = displacement_matvec(bpc, u, stencil="flat")
    np.testing.assert_allclose(np.asarray(y_chunk), np.asarray(y_plane),
                               rtol=1e-12, atol=1e-12)

    uex = lambda x, y: np.sin(np.pi * x) * np.cosh(y) + x * y
    ux = lambda x, y: np.pi * np.cos(np.pi * x) * np.cosh(y) + y
    uy = lambda x, y: np.sin(np.pi * x) * np.sinh(y) + x
    f = lambda x, y: (np.pi**2 - 1) * np.sin(np.pi * x) * np.cosh(y)
    g = np.zeros(int(prob.vstarts[-1]))
    for e in range(2):
        lop = prob.lops[e]
        ge = locbcarray_mod(
            lop, lop.bctype, lambda lf, x, y: uex(x, y),
            lambda lf, x, y, nx, ny: nx * ux(x, y) + ny * uy(x, y))
        ge += locsourcearray(lop, f)
        g[prob.vstarts[e]:prob.vstarts[e + 1]] = ge
    u_host, _ = prob.solve(g, np.zeros(int(prob.FToLstarts[-1])),
                           method="displacements")
    gb = jnp.asarray(g.reshape(2, N + 1, N + 1))
    res = solve_displacements(bps, gb, jnp.zeros_like(bp.Dinv),
                              tol=1e-12, maxiter=5000)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x).ravel(), u_host,
                               rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize(
    "p", [2, pytest.param(6, marks=pytest.mark.heavy)])
def test_symmetric_flat_layout_matches_sparse(p):
    """Symmetric flat layout (flatten_dia_sym/dia_apply_flat_sym):
    storing only the o >= 0 diagonals (operator symmetry supplies the
    rest — halves the dominant coefficient stream) reproduces the
    sparse matvec to machine precision, single and batched, on a
    curved-metric operator."""
    from hybridsbp_tpu.tpu.stencil import (dia_apply_flat_sym,
                                           flatten_dia_sym, to_dia)

    N = 3 * p + 7

    def xf(r, s):
        return (r + 0.08 * np.sin(1.1 * r + 0.4 * s),
                1 + 0.088 * np.cos(1.1 * r + 0.4 * s),
                0.032 * np.cos(1.1 * r + 0.4 * s))

    def yf(r, s):
        return (s + 0.06 * np.cos(0.8 * r) * np.sin(0.9 * s),
                -0.048 * np.sin(0.8 * r) * np.sin(0.9 * s),
                1 + 0.054 * np.cos(0.8 * r) * np.cos(0.9 * s))

    lop = locoperator(p, N, N, create_metrics(p, N, N, xf, yf))
    op = to_dia(lop.M, N + 1, N + 1)
    cs, offs = flatten_dia_sym(op.coefs[None], op.offsets, N + 1)
    assert offs[0] == 0 and all(o > 0 for o in offs[1:])
    assert len(offs) == (len({ds * (N + 1) + dr
                              for ds, dr in op.offsets}) + 1) // 2

    rng = np.random.default_rng(11)
    u = rng.standard_normal((N + 1, N + 1))
    want = lop.M @ u.ravel()
    got = np.asarray(dia_apply_flat_sym(cs[0], offs, jnp.asarray(u)))
    np.testing.assert_allclose(got.ravel(), want, rtol=1e-13, atol=1e-13)

    csb, offsb = flatten_dia_sym(
        jnp.stack([op.coefs, 2.0 * op.coefs]), op.offsets, N + 1)
    ub = jnp.stack([jnp.asarray(u)] * 2)
    gb = np.asarray(dia_apply_flat_sym(csb, offsb, ub))
    np.testing.assert_allclose(gb[1].ravel(), 2 * want,
                               rtol=1e-13, atol=1e-13)

    # rectangular block (Nr != Ns): the linear offsets are Nrp-based
    Nr, Ns = N + 3, N
    lop_r = locoperator(p, Nr, Ns, create_metrics(p, Nr, Ns))
    op_r = to_dia(lop_r.M, Nr + 1, Ns + 1)
    cr, offs_r = flatten_dia_sym(op_r.coefs[None], op_r.offsets, Nr + 1)
    ur = rng.standard_normal((Ns + 1, Nr + 1))
    want_r = lop_r.M @ ur.ravel()
    got_r = np.asarray(dia_apply_flat_sym(cr[0], offs_r, jnp.asarray(ur)))
    np.testing.assert_allclose(got_r.ravel(), want_r,
                               rtol=1e-13, atol=1e-13)


def test_flat_layout_chunked_matches():
    """Chunked flat apply (with_flat_layout echunk=K, incl. zero-pad to
    a chunk multiple) equals the unchunked flat and plane applies."""
    from hybridsbp_tpu.tpu.multiblock import (displacement_matvec,
                                              with_flat_layout)

    p, N = 2, 16
    prob = _two_block(p=p, N=N)
    # per-block stacks (share_ops off): chunking applies to these only;
    # a shared stack keeps its broadcast axis (with_flat_layout refuses
    # to chunk it — asserted below)
    bp = build_blocked(prob, flat=False, share_ops=False)  # E=2
    bpf = with_flat_layout(bp, echunk=None)
    bpc = with_flat_layout(bp, echunk=3)          # pads E 2 -> 3
    assert bpc.flat_chunk == 3 and bpc.coefs_flat.shape[0] == 3
    bps = build_blocked(prob, flat=False)         # auto: shared here
    if bps.shared:
        assert with_flat_layout(bps, echunk=3).flat_chunk is None
    rng = np.random.default_rng(11)
    u = jnp.asarray(rng.standard_normal((2, N + 1, N + 1)))
    y0 = displacement_matvec(bp, u, stencil="unrolled")
    y1 = displacement_matvec(bpf, u, stencil="flat")
    y2 = displacement_matvec(bpc, u, stencil="flat")
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-13, atol=1e-13)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y0),
                               rtol=1e-13, atol=1e-13)


def test_face_band_contractions_pinned_to_highest_precision():
    """banded_trace_1f / banded_scatter_1f must carry HIGHEST precision.

    On TPU, XLA rewrites the tiny band contractions into dot_generals
    and lowers f32 to bf16 MXU passes: measured 1.3e-3 relative trace
    error (vs 5e-7 for the identical code on CPU), which the
    B̃ = D − F M̃⁻¹ Fᵀ cancellation amplified to a 3e-2 block error in
    the device-probed trace preconditioner (18-iter outer FCG at N=34
    instead of 3) and which perturbs every coupled matvec's face values
    on the f32 path (tools/probe_banded_localize.py, round 4)."""
    prob = _two_block(p=6)
    bp = build_blocked(prob, dtype=jnp.float32)
    u = jnp.ones((2,) + tuple(bp.grid_shape), dtype=jnp.float32)
    jaxpr = jax.make_jaxpr(lambda v: displacement_matvec(bp, v))(u)
    hp = (jax.lax.Precision.HIGHEST, jax.lax.Precision.HIGHEST)
    dots = [e for e in jaxpr.jaxpr.eqns
            if e.primitive.name == "dot_general"]
    assert dots, "expected face-coupling dot_generals in the matvec jaxpr"
    bad = [str(e.params["precision"]) for e in dots
           if e.params.get("precision") != hp]
    assert not bad, f"{len(bad)} face contraction(s) without HIGHEST"
