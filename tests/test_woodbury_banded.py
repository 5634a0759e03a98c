"""Banded face-block trace preconditioner (VERDICT r2 next #3).

The dense Woodbury trace inverse costs O(nλ³) host setup and O(nλ²)
memory/transfer; the banded form stores only the face-pair (L, L)
blocks of B on the bounded-degree face graph and applies B^{-1} as
fixed-iteration block-Jacobi CG.  Gates: (1) the banded application
converges to the dense one, (2) both jitted hybrid methods reach the
host answer with few flexible outer iterations on the 56-block curved
square_circle mesh (reference problem: square_circle.jl:374-394;
B's face-pair structure: global_curved.jl:743-797).
"""
import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "drivers"))

from hybridsbp_tpu.tpu import build_blocked, build_woodbury, make_jit_solver
from hybridsbp_tpu.tpu.multiblock import (apply_traceinv, blocked_rhs_from_host,
                                          build_woodbury_banded)


@pytest.fixture(scope="module")
def sc56():
    import square_circle
    prob, g, gd, _, _, _, _ = square_circle.assemble_level(
        2, 8, square_circle.load_mesh())
    bp = build_blocked(prob)
    return prob, bp, g, gd


def test_banded_apply_converges_to_dense(sc56):
    prob, bp, _, _ = sc56
    dense = build_woodbury(bp, prob)
    banded = build_woodbury_banded(bp, prob, iters=60)
    assert banded.blocks.shape[1] <= 7          # bounded face degree
    nfaces, L = bp.Dinv.shape
    rng = np.random.default_rng(5)
    t = np.zeros((nfaces, L))
    for f in range(len(prob.FToB)):
        s0, s1 = prob.FToLstarts[f], prob.FToLstarts[f + 1]
        t[f, :s1 - s0] = rng.standard_normal(s1 - s0)
    want = np.asarray(apply_traceinv(dense, jnp.asarray(t)))

    def err(iters):
        got = np.asarray(apply_traceinv(banded._replace(iters=iters),
                                        jnp.asarray(t)))
        return np.abs(got - want).max() / np.abs(want).max()

    # the application is an inexact inner CG (that's the design — the
    # outer is flexible): it must be preconditioner-grade at serving
    # iteration counts and converge toward the dense inverse
    e16, e60 = err(16), err(60)
    assert e16 < 0.5, f"16-iteration banded B^-1 rel err {e16:.2e}"
    assert e60 < 1e-3, f"60-iteration banded B^-1 rel err {e60:.2e}"
    assert e60 < e16 / 10, f"no convergence: {e16:.2e} -> {e60:.2e}"


@pytest.mark.parametrize("method,max_outer", [("displacements", 12),
                                              ("trace", 12)])
def test_banded_jit_solver_matches_host(sc56, method, max_outer):
    prob, bp, g, gd = sc56
    u_host, _ = prob.solve(g, gd, method="trace")
    gb, gdf = blocked_rhs_from_host(prob, g, gd)
    banded = build_woodbury_banded(bp, prob, iters=16)
    solve = make_jit_solver(bp, method=method, trace_inv=banded,
                            tol=1e-9, maxiter=100, inner_iters=8)
    res = solve(gb, gdf)
    assert bool(res.converged), f"resnorm {float(res.resnorm)}"
    assert int(res.iters) <= max_outer, f"outer iters {int(res.iters)}"
    np.testing.assert_allclose(np.asarray(res.x).ravel(), u_host,
                               rtol=1e-5, atol=1e-7)


def test_jit_solver_chain_embedding(sc56):
    """The solver exposes its traced body (solve.fn) + operator arrays
    (solve.arrs) so callers can embed the whole solve inside a larger
    jitted program — the chained RTT-free timing in run_device_multi
    and bench.py's hybrid_ref sub-bench depend on this surface.  A
    2-solve fori_loop chain must reproduce the single-call solution."""
    import jax
    import jax.numpy as jnp

    prob, bp, g, gd = sc56
    gb, gdf = blocked_rhs_from_host(prob, g, gd)
    banded = build_woodbury_banded(bp, prob, iters=16)
    solve = make_jit_solver(bp, method="displacements", trace_inv=banded,
                            tol=1e-9, maxiter=100, inner_iters=8)
    want = np.asarray(solve(gb, gdf).x)

    @jax.jit
    def chain(a, g0, gd0, iters):
        def body(i, carry):
            gi, x = carry
            r = solve.fn(a, gi, gd0)
            return (g0 + 0.0 * r.x, r.x)     # serialized dependence
        _, x = jax.lax.fori_loop(0, iters, body,
                                 (g0, jnp.zeros_like(g0)))
        return x

    got = np.asarray(chain(solve.arrs, gb, gdf, jnp.asarray(2)))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-14)
