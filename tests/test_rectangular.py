"""Rectangular-block (Nr != Ns) device-path gates (VERDICT r1 #4).

The device multiblock path uses an L = max(Nrp, Nsp) padded face-trace
layout with static per-face reversal permutations, so blocks no longer
need to be square (reference parity: locoperator takes independent
Nr[e], Ns[e], global_curved.jl:211).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from hybridsbp_tpu import BC_DIRICHLET, BC_JUMP_INTERFACE
from hybridsbp_tpu.hybrid import build_problem
from hybridsbp_tpu.tpu import build_blocked, solve_displacements, solve_trace
from hybridsbp_tpu.tpu.multiblock import blocked_rhs_from_host

VERTS = np.array([[-1.0, 0.0, 1.0, -1.0, 0.0, 1.0],
                  [0.0, 0.0, 0.0, 1.0, 1.0, 1.0]])


def _problem(EToV, Nr, Ns, p=2, EToF=None):
    if EToF is None:
        EToF = np.array([[0, 1], [1, 4], [2, 5], [3, 6]])
    FToB = np.full(7, BC_DIRICHLET, dtype=np.int64)
    FToB[1] = BC_JUMP_INTERFACE
    E = EToV.shape[1]
    prob, conn = build_problem(p, VERTS, EToV, EToF, FToB,
                               np.full(E, Nr), np.full(E, Ns))
    return prob, conn


def _check_device_vs_host(prob):
    rng = np.random.default_rng(21)
    g = rng.standard_normal(int(prob.vstarts[-1]))
    gd = rng.standard_normal(int(prob.FToLstarts[-1]))
    u_host, lam_host = prob.solve(g, gd, method="trace")

    bp = build_blocked(prob)
    gb, gdf = blocked_rhs_from_host(prob, g, gd)
    res = solve_displacements(bp, gb, gdf, tol=1e-12, maxiter=8000)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x).ravel(), u_host,
                               rtol=1e-6, atol=1e-8)
    u, lam, rest = solve_trace(bp, gb, gdf, tol=1e-11, inner_tol=1e-12)
    assert bool(rest.converged)
    np.testing.assert_allclose(np.asarray(u).ravel(), u_host,
                               rtol=1e-6, atol=1e-8)
    return bp


@pytest.mark.parametrize("Nr,Ns", [(10, 14), (14, 10)])
def test_rectangular_blocks_device_solve(Nr, Ns):
    EToV = np.array([[0, 1], [1, 2], [3, 4], [4, 5]])
    prob, conn = _problem(EToV, Nr, Ns)
    bp = _check_device_vs_host(prob)
    assert bp.Dinv.shape[1] == max(Nr, Ns) + 1


@pytest.mark.heavy
def test_two_bucket_mixed_shapes():
    """Mixed per-block (Nr, Ns) via shape bucketing: two blocks with
    different Nr (conforming shared vertical face, equal Ns) solved by
    the bucketed device path == host (displacement AND trace)."""
    from hybridsbp_tpu.tpu import bucketed as bkt

    EToV = np.array([[0, 1], [1, 2], [3, 4], [4, 5]])
    ETOF = np.array([[0, 1], [1, 4], [2, 5], [3, 6]])
    FToB = np.full(7, BC_DIRICHLET, dtype=np.int64)
    FToB[1] = BC_JUMP_INTERFACE
    Nr = np.array([8, 16])
    Ns = np.array([12, 12])
    prob, _ = build_problem(2, VERTS, EToV, ETOF, FToB, Nr, Ns)

    rng = np.random.default_rng(29)
    g = rng.standard_normal(int(prob.vstarts[-1]))
    gd = rng.standard_normal(int(prob.FToLstarts[-1]))
    u_host, _ = prob.solve(g, gd, method="trace")

    bk = bkt.build_bucketed(prob)
    assert len(bk.buckets) == 2
    gs, gdf = bkt.bucketed_rhs_from_host(bk, prob, g, gd)
    res = bkt.solve_displacements(bk, gs, gdf, tol=1e-12, maxiter=8000)
    assert bool(res.converged)
    np.testing.assert_allclose(bkt.scatter_solution(bk, prob, res.x),
                               u_host, rtol=1e-6, atol=1e-8)

    us, lam, rest = bkt.solve_trace(bk, gs, gdf, tol=1e-11,
                                    inner_tol=1e-12)
    assert bool(rest.converged)
    np.testing.assert_allclose(bkt.scatter_solution(bk, prob, us),
                               u_host, rtol=1e-6, atol=1e-8)

    # Woodbury two-level preconditioning on the bucketed path: O(1)
    # flexible-CG iterations
    Mw = bkt.woodbury_precond_bucketed(
        bk, bkt.build_woodbury_bucketed(bk, prob), inner_iters=8)
    res_w = bkt.solve_displacements(bk, gs, gdf, tol=1e-11,
                                    maxiter=100, precond=Mw,
                                    flexible=True)
    assert bool(res_w.converged)
    assert int(res_w.iters) <= 8, f"bucketed woodbury {int(res_w.iters)}"
    np.testing.assert_allclose(bkt.scatter_solution(bk, prob, res_w.x),
                               u_host, rtol=1e-6, atol=1e-8)


def test_nonconforming_mesh_rejected():
    """Mismatched trace lengths across a shared face are rejected at
    host assembly (reference parity: the trace-size assert at
    global_curved.jl:528); build_bucketed carries a defensive duplicate
    of the same check."""
    EToV = np.array([[0, 1], [1, 2], [3, 4], [4, 5]])
    ETOF = np.array([[0, 1], [1, 4], [2, 5], [3, 6]])
    FToB = np.full(7, BC_DIRICHLET, dtype=np.int64)
    FToB[1] = BC_JUMP_INTERFACE
    # shared face is vertical (length Ns+1): mismatched Ns on the two
    # sides is non-conforming
    Nr = np.array([8, 8])
    Ns = np.array([8, 12])
    with pytest.raises(AssertionError):
        build_problem(2, VERTS, EToV, ETOF, FToB, Nr, Ns)


def test_rectangular_blocks_flipped_face():
    """Second block rotated 180 degrees: the shared face's orientations
    mismatch (EToO False), exercising the length-aware reversal perms
    on a non-square trace layout."""
    # z-order (v1,v2,v3,v4) = (ll, lr, ul, ur); rotating block 1 by 180
    # maps (1,2,4,5) -> (5,4,2,1) (orientation-preserving, J > 0); the
    # shared face {1,4} becomes its *east* face (4,1) — reversed w.r.t.
    # block 0's east face (1,4)
    EToV = np.array([[0, 1, 3, 4], [5, 4, 2, 1]]).T
    EToF = np.array([[0, 4], [1, 1], [2, 5], [3, 6]])
    prob, conn = _problem(EToV, 10, 14, EToF=EToF)
    EToO = conn[2]
    assert not np.all(EToO), "fixture must contain a flipped face"
    _check_device_vs_host(prob)


def test_bucketed_banded_and_device_assembly():
    """r3 features on the mixed-shape path: (a) build_bucketed with
    assemble_on_device=True matches the host-extracted buckets,
    (b) the banded face-block trace preconditioner
    (build_woodbury_bucketed(mode='banded')) converges the flexible
    solve in few outer iterations."""
    from hybridsbp_tpu.tpu import bucketed as bkt

    EToV = np.array([[0, 1], [1, 2], [3, 4], [4, 5]])
    ETOF = np.array([[0, 1], [1, 4], [2, 5], [3, 6]])
    FToB = np.full(7, BC_DIRICHLET, dtype=np.int64)
    FToB[1] = BC_JUMP_INTERFACE
    Nr = np.array([8, 16])
    Ns = np.array([12, 12])
    prob, _ = build_problem(2, VERTS, EToV, ETOF, FToB, Nr, Ns)

    rng = np.random.default_rng(31)
    g = rng.standard_normal(int(prob.vstarts[-1]))
    gd = rng.standard_normal(int(prob.FToLstarts[-1]))
    u_host, _ = prob.solve(g, gd, method="trace")

    bk = bkt.build_bucketed(prob)
    bd = bkt.build_bucketed(prob, assemble_on_device=True)
    for bh, bdev in zip(bk.buckets, bd.buckets):
        hmap = dict(zip(bh.offsets, np.asarray(bh.coefs).swapaxes(0, 1)))
        scale = np.abs(np.asarray(bh.coefs)).max()
        for k, off in enumerate(bdev.offsets):
            w = hmap.get(off, 0.0 * np.asarray(bdev.coefs[:, k]))
            assert np.abs(np.asarray(bdev.coefs[:, k]) - w).max() \
                < 1e-11 * scale, off

    gs, gdf = bkt.bucketed_rhs_from_host(bd, prob, g, gd)
    Mb = bkt.woodbury_precond_bucketed(
        bd, bkt.build_woodbury_bucketed(bd, prob, mode="banded"),
        inner_iters=8)
    res = bkt.solve_displacements(bd, gs, gdf, tol=1e-11,
                                  maxiter=100, precond=Mb, flexible=True)
    assert bool(res.converged)
    assert int(res.iters) <= 10, f"bucketed banded {int(res.iters)}"
    np.testing.assert_allclose(bkt.scatter_solution(bd, prob, res.x),
                               u_host, rtol=1e-6, atol=1e-8)
