"""Device-side trace (Schur) solve gates.

The reference's *default* solve method (square_circle.jl:374-388) run
matrix-free on device: flexible CG on B = D - Fbar M^-1 Fbar' with
batched fastdiag-CG inner block solves.  Gates: u and lambda match the
host :trace direct solve; the sharded variant matches on the virtual
8-device mesh.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybridsbp_tpu import BC_DIRICHLET, BC_JUMP_INTERFACE
from hybridsbp_tpu.hybrid import build_problem
from hybridsbp_tpu.tpu import build_blocked, solve_trace
from hybridsbp_tpu.tpu.multiblock import blocked_rhs_from_host

VERTS = np.array([[-1.0, 0.0, 1.0, -1.0, 0.0, 1.0],
                  [0.0, 0.0, 0.0, 1.0, 1.0, 1.0]])
ETOV = np.array([[0, 1], [1, 2], [3, 4], [4, 5]])
ETOF = np.array([[0, 1], [1, 4], [2, 5], [3, 6]])


def _jump_problem(p=2, N=12):
    FToB = np.full(7, BC_DIRICHLET, dtype=np.int64)
    FToB[1] = BC_JUMP_INTERFACE
    Narr = np.full(2, N)
    prob, _ = build_problem(p, VERTS, ETOV, ETOF, FToB, Narr, Narr)
    return prob


def _lambda_padded_to_host(bp, prob, lam_pad):
    """Map the (nfaces, L) padded trace array to the host's stacked
    lambda vector."""
    out = np.zeros(int(prob.FToLstarts[-1]))
    for f in range(len(prob.FToB)):
        s0, s1 = prob.FToLstarts[f], prob.FToLstarts[f + 1]
        out[s0:s1] = np.asarray(lam_pad[f, :s1 - s0])
    return out


@pytest.mark.parametrize("p", [2, 4])
def test_device_trace_solve_matches_host(p):
    prob = _jump_problem(p=p, N=14)
    bp = build_blocked(prob)
    rng = np.random.default_rng(5)
    g = rng.standard_normal(int(prob.vstarts[-1]))
    gd = rng.standard_normal(int(prob.FToLstarts[-1]))
    u_host, lam_host = prob.solve(g, gd, method="trace")

    gb, gdf = blocked_rhs_from_host(prob, g, gd)
    u, lam, res = solve_trace(bp, gb, gdf, tol=1e-11, inner_tol=1e-12)
    assert bool(res.converged), f"outer FCG resnorm {float(res.resnorm)}"
    np.testing.assert_allclose(np.asarray(u).ravel(), u_host,
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(_lambda_padded_to_host(bp, prob, lam),
                               lam_host, rtol=1e-6, atol=1e-8)


def test_device_trace_matvec_matches_assembled_B():
    """Matrix-free B-matvec == assembled Schur complement."""
    from hybridsbp_tpu.tpu.multiblock import block_solve, trace_matvec

    prob = _jump_problem(p=2, N=10)
    bp = build_blocked(prob)
    nfaces, L = bp.Dinv.shape
    rng = np.random.default_rng(9)
    lam_pad = np.zeros((nfaces, L))
    lam_host = rng.standard_normal(int(prob.FToLstarts[-1]))
    for f in range(nfaces):
        s0, s1 = prob.FToLstarts[f], prob.FToLstarts[f + 1]
        lam_pad[f, :s1 - s0] = lam_host[s0:s1]

    minv = lambda y: block_solve(bp, y, tol=1e-13, maxiter=2000).x
    got_pad = trace_matvec(bp, jnp.asarray(lam_pad), minv)
    got = _lambda_padded_to_host(bp, prob, got_pad)
    want = prob.B @ lam_host
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)


def test_trace_solve_square_circle_56_blocks():
    """VERDICT r1 #3 gate: the device trace solve reproduces the host
    :trace result on the 56-block curved square_circle problem, and the
    assembled-B outer preconditioner collapses the outer iteration
    count to O(1)."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "drivers"))
    import square_circle
    from hybridsbp_tpu.tpu.multiblock import build_woodbury

    prob, g, gd, _, _, _, _ = square_circle.assemble_level(
        2, 8, square_circle.load_mesh())
    u_host, _ = prob.solve(g, gd, method="trace")
    bp = build_blocked(prob)
    gb, gdf = blocked_rhs_from_host(prob, g, gd)
    Binv = build_woodbury(bp, prob)
    u, lam, res = solve_trace(bp, gb, gdf, tol=1e-10, inner_tol=1e-11,
                              maxiter=1000, inner_maxiter=1000,
                              Binv_pad=Binv)
    assert bool(res.converged)
    assert int(res.iters) <= 5, f"B-preconditioned outer took {res.iters}"
    np.testing.assert_allclose(np.asarray(u).ravel(), u_host,
                               rtol=1e-6, atol=1e-8)


def test_sharded_trace_solve_matches_host():
    """Trace solve under block sharding on the 8-device virtual mesh."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from hybridsbp_tpu.parallel import make_sharded_solver

    assert len(jax.devices()) == 8
    prob = _jump_problem(p=2, N=12)
    bp = build_blocked(prob)
    rng = np.random.default_rng(13)
    g = rng.standard_normal(int(prob.vstarts[-1]))
    gd = rng.standard_normal(int(prob.FToLstarts[-1]))
    u_host, lam_host = prob.solve(g, gd, method="trace")

    mesh = Mesh(np.array(jax.devices()), ("block",))
    solver = make_sharded_solver(bp, mesh)
    bpp = solver.bp
    E_pad = bpp.nblocks
    N1 = bp.grid_shape[0]
    g_pad = np.zeros((E_pad, N1, N1))
    g_pad[:2] = g.reshape(2, N1, N1)
    gdf = np.zeros_like(np.asarray(bp.Dinv))
    for f in range(len(prob.FToB)):
        s0, s1 = prob.FToLstarts[f], prob.FToLstarts[f + 1]
        gdf[f, :s1 - s0] = gd[s0:s1]

    sh = NamedSharding(mesh, P("block"))
    gb = jax.device_put(jnp.asarray(g_pad), sh)
    u, lam, res = solve_trace(bpp, gb, jnp.asarray(gdf),
                              tol=1e-11, inner_tol=1e-12)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(u[:2]).ravel(), u_host,
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(_lambda_padded_to_host(bp, prob, lam),
                               lam_host, rtol=1e-6, atol=1e-8)


def test_banded_from_device_matches_host():
    """On-device banded-B̃ probing (banded_from_device, VERDICT r3
    next #2) with a near-exact inner solve must reproduce the
    host-assembled banded blocks (banded_from_B) to solver precision,
    including statics (graph, faceids, masks) — on a 4-block strip
    with two interior faces per element so off-diagonal blocks and
    plus-side flips are exercised."""
    from hybridsbp_tpu import BC_LOCKED_INTERFACE
    from hybridsbp_tpu.hybrid import build_problem_light
    from hybridsbp_tpu.tpu.multiblock import (banded_from_device,
                                              build_woodbury_banded)

    E, N, p = 4, 12, 2
    verts = np.array(
        [[0.0, 1.0, 2.0, 3.0, 4.0, 0.0, 1.0, 2.0, 3.0, 4.0],
         [0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 1.0, 1.0]])
    etov = np.array([[e, e + 1, e + 5, e + 6] for e in range(E)]).T
    etof = np.array([[e, e + 1, 5 + e, 9 + e] for e in range(E)]).T
    FToB = np.full(13, BC_DIRICHLET, dtype=np.int64)
    FToB[1:4] = BC_LOCKED_INTERFACE
    Narr = np.full(E, N)
    prob, _ = build_problem(p, verts, etov, etof, FToB, Narr, Narr)
    bp = build_blocked(prob, dtype=jnp.float64)
    tb_host = build_woodbury_banded(bp, prob, iters=32)
    # the light problem (no LU, no B) must suffice for the device form
    probl, _ = build_problem_light(p, verts, etov, etof, FToB, Narr,
                                   Narr)
    assert probl.B is None and probl.store.factors[0] is None
    tb_dev = banded_from_device(bp, probl, iters=32, probe_iters=300,
                                k_chunk=4)
    np.testing.assert_array_equal(tb_host.nbr, tb_dev.nbr)
    np.testing.assert_array_equal(tb_host.faceids, tb_dev.faceids)
    np.testing.assert_array_equal(tb_host.mask, tb_dev.mask)
    scale = np.abs(np.asarray(tb_host.blocks)).max()
    assert np.abs(np.asarray(tb_host.blocks)
                  - np.asarray(tb_dev.blocks)).max() < 1e-10 * scale
    assert np.abs(np.asarray(tb_host.diag_inv)
                  - np.asarray(tb_dev.diag_inv)).max() < 1e-8


@pytest.mark.skipif(not os.environ.get("HYBRIDSBP_SLOW_TESTS"),
                    reason="device-only square_circle pipeline ~90s "
                           "(slow gate)")
def test_device_only_square_circle():
    """The full device-only pipeline (light assembly + on-device
    operator assembly + on-device banded B̃) on the 56-block curved
    mesh at N=17: both methods converge and the MMS errors sit at the
    f32 iterative floor (matching the host-setup path's quality)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "drivers"))
    import square_circle as sc

    out = sc.run_device_only(p=6, N=17, repeats=1, probe_iters=24,
                             k_chunk=6, verbose=False)
    for m in ("displacements", "trace"):
        d = out[m]
        assert d["converged"], m
        assert d["iters"] <= 10, (m, d["iters"])
        assert d["mms_rel_maxerr"] < 1e-3, (m, d["mms_rel_maxerr"])
        assert d["mms_traction_err"] < 5e-3, (m, d["mms_traction_err"])


@pytest.mark.heavy
def test_device_only_cached_matches_direct(tmp_path):
    """The cached device-only pipeline (VERDICT r4 next #2:
    build_device_only_cache + run_device_only_cached — operator
    templates + cached metrics/MMS data, chunk-assembled flat operator,
    banded B̃ appended to the cache by the first run) reproduces the
    direct run_device_only MMS errors exactly for both methods and the
    refined solve, and the second invocation reuses the probed B̃."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "drivers"))
    import square_circle as sc

    p, N = 2, 12
    path = str(tmp_path / "do.cache")
    sc.build_device_only_cache(p=p, N=N, path=path, verbose=False)
    kw = dict(tol=1e-8, methods=("displacements", "trace"),
              refine_sweeps=3, repeats=1, verbose=False)
    out_c = sc.run_device_only_cached(path=path, p=p, N=N, **kw)
    out_d = sc.run_device_only(p=p, N=N, **kw)
    for m in ("displacements", "trace", "refined"):
        for k in ("mms_energy_err", "mms_traction_err",
                  "mms_rel_maxerr"):
            a, b = out_c[m][k], out_d[m][k]
            assert abs(a - b) <= 1e-6 * max(abs(a), abs(b)) + 1e-12, \
                (m, k, a, b)
    # the first cached run appended the probed B~; a reload skips
    # the probing phase entirely
    out_c2 = sc.run_device_only_cached(path=path, p=p, N=N, tol=1e-8,
                                       methods=("displacements",),
                                       repeats=1, verbose=False)
    assert out_c2["setup"]["t_banded_device_s"] < 5.0
    assert out_c2["displacements"]["converged"]
    # refine_sym: the f64 residual operator chunk-assembled in the
    # SYMMETRIC flat layout (half the footprint — the N=384 capacity
    # mode) refines to the same accuracy class (the sym averaging is
    # an exact symmetrization, ~1e-16 operator perturbation)
    out_s = sc.run_device_only_cached(path=path, p=p, N=N, tol=1e-8,
                                      methods=("displacements",),
                                      refine_sweeps=3, refine_sym=True,
                                      repeats=1, verbose=False)
    for k in ("mms_energy_err", "mms_traction_err", "mms_rel_maxerr"):
        a, b = out_s["refined"][k], out_c["refined"][k]
        assert abs(a - b) <= 1e-3 * max(abs(a), abs(b)) + 1e-12, \
            (k, a, b)
