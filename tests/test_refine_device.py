"""Gates for the device-only mixed-precision refinement path
(VERDICT r3 next #2): chunked flat-only on-device assembly parity and
the refined solver breaking the f32 attainable-accuracy floor.

Reference context: the reference's ladder stops at N=136
(/root/reference/square_circle.jl:207-210) because its host direct
path must factorize; the device-only N=272 configuration has no host
factorization anywhere, so its accuracy limit is the f32 floor — which
make_refined_solver removes with f64 on-device residuals.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from hybridsbp_tpu import BC_DIRICHLET, BC_LOCKED_INTERFACE
from hybridsbp_tpu.hybrid import build_problem
from hybridsbp_tpu.tpu import build_blocked, displacement_matvec
from hybridsbp_tpu.tpu.multiblock import (blocked_rhs_from_host,
                                          build_woodbury_banded)
from hybridsbp_tpu.tpu.refine import make_refined_solver

# distorted quads: crs != 0, per-block metrics differ (not shared)
VERTS = np.array([[-1.0, 0.0, 1.0, -1.1, 0.2, 0.9],
                  [0.0, -0.15, 0.1, 1.0, 1.3, 0.8]])
ETOV = np.array([[0, 1], [1, 2], [3, 4], [4, 5]])
ETOF = np.array([[0, 1], [1, 4], [2, 5], [3, 6]])


def _ftob():
    FToB = np.full(7, BC_DIRICHLET, dtype=np.int64)
    FToB[1] = BC_LOCKED_INTERFACE
    return FToB


def _curved_prob(p=4, N=16):
    Narr = np.full(2, N)
    prob, _ = build_problem(p, VERTS, ETOV, ETOF, _ftob(), Narr, Narr)
    return prob


@pytest.mark.heavy
def test_assemble_chunk_matches_full():
    """Chunked assemble+flatten == one-shot assemble then flatten
    (same einsums per block, so bit-identical), flat-only storage."""
    prob = _curved_prob(p=4, N=14)
    full = build_blocked(prob, dtype=jnp.float64, assemble_on_device=True,
                         flat=True)
    chunked = build_blocked(prob, dtype=jnp.float64,
                            assemble_on_device=True, assemble_chunk=1,
                            with_fastdiag=False)
    assert chunked.coefs is None            # flat-only memory mode
    assert chunked.offsets_flat == full.offsets_flat
    np.testing.assert_array_equal(np.asarray(chunked.coefs_flat),
                                  np.asarray(full.coefs_flat))
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.standard_normal((2,) + tuple(full.grid_shape)))
    got = displacement_matvec(chunked, u)
    want = displacement_matvec(full, u)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-13, atol=1e-13)


def test_assemble_chunk_sym_matches_full():
    """Chunked assemble+flatten in the SYMMETRIC layout (the capacity
    mode for the f64 residual operator at sizes where the full flat
    stack would not fit next to the f32 operator): matches a one-shot
    sym flatten and applies identically to the full-layout operator up
    to the sym averaging (exact symmetrization; the assembled operator
    is symmetric to ~1e-16 so the apply agrees to roundoff)."""
    from hybridsbp_tpu.tpu.multiblock import with_flat_layout

    prob = _curved_prob(p=4, N=14)
    plain = build_blocked(prob, dtype=jnp.float64,
                          assemble_on_device=True, flat=False)
    full_sym = with_flat_layout(plain, sym=True)
    chunked = build_blocked(prob, dtype=jnp.float64,
                            assemble_on_device=True, assemble_chunk=1,
                            flat_sym=True, with_fastdiag=False)
    assert chunked.coefs is None            # flat-only memory mode
    assert chunked.flat_sym
    assert chunked.offsets_flat == full_sym.offsets_flat
    assert all(o >= 0 for o in chunked.offsets_flat)
    E = chunked.coefs_flat.shape[0]
    np.testing.assert_array_equal(
        np.asarray(chunked.coefs_flat),
        np.asarray(full_sym.coefs_flat[:E]))
    # half the stream vs the full layout
    noff_full = len(plain.offsets)
    assert len(chunked.offsets_flat) == (noff_full + 1) // 2
    rng = np.random.default_rng(5)
    u = jnp.asarray(rng.standard_normal((2,) + tuple(plain.grid_shape)))
    got = displacement_matvec(chunked, u)
    want = displacement_matvec(plain, u, stencil="unrolled")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12, atol=1e-12)


def test_refined_solver_reaches_f64_accuracy():
    """f32 two-level solve + chunk-assembled f64 residuals reaches the
    host f64 direct solution far below the f32 operator's own accuracy
    (~kappa*eps_f32); the per-sweep contraction is what breaks the
    floor at scales where no host oracle exists."""
    prob = _curved_prob(p=4, N=16)
    rng = np.random.default_rng(11)
    nvol = int(prob.vstarts[-1])
    g = rng.standard_normal(nvol)
    gdelta = rng.standard_normal(int(prob.FToLstarts[-1]))

    bp32 = build_blocked(prob, dtype=jnp.float32, flat=True)
    trace_inv = build_woodbury_banded(bp32, prob, iters=64)
    bp64 = build_blocked(prob, dtype=jnp.float64, assemble_on_device=True,
                         assemble_chunk=1, with_fastdiag=False)
    gb64, gd64 = blocked_rhs_from_host(prob, g, gdelta)

    refine = make_refined_solver(bp32, bp64, trace_inv,
                                 inner_tol=1e-5, inner_maxiter=120)
    x64, rels = refine(gb64, gd64, sweeps=4, tol=1e-11)
    assert rels[-1] < 1e-11, rels
    # monotone contraction sweep over sweep
    assert all(b < a for a, b in zip(rels, rels[1:])), rels

    u_host, _ = prob.solve(g, gdelta, method="displacements")
    u_dev = np.asarray(x64, dtype=np.float64).reshape(-1)
    rel = (np.abs(u_dev - u_host).max()
           / max(np.abs(u_host).max(), 1e-300))
    # far below the ~1e-6-ish f32 operator accuracy at this size
    assert rel < 1e-9, rel


def test_refined_solver_beats_f32_only():
    """The first sweep IS the plain f32 solve; later sweeps must gain
    orders of magnitude on the f64 true residual."""
    prob = _curved_prob(p=4, N=16)
    rng = np.random.default_rng(12)
    g = rng.standard_normal(int(prob.vstarts[-1]))
    gdelta = rng.standard_normal(int(prob.FToLstarts[-1]))

    bp32 = build_blocked(prob, dtype=jnp.float32, flat=True)
    trace_inv = build_woodbury_banded(bp32, prob, iters=64)
    bp64 = build_blocked(prob, dtype=jnp.float64, assemble_on_device=True,
                         assemble_chunk=2, with_fastdiag=False)
    gb64, gd64 = blocked_rhs_from_host(prob, g, gdelta)

    refine = make_refined_solver(bp32, bp64, trace_inv,
                                 inner_tol=1e-5, inner_maxiter=120)
    _, rels = refine(gb64, gd64, sweeps=3)
    assert rels[-1] < 1e-3 * rels[0], rels


def test_fixed_refined_bf16_matches_f32_solve():
    """make_fixed_refined (VERDICT r4 next #4): the one-program
    bf16-inner refined solve reaches the plain f32 Woodbury solve's
    solution quality — the bf16 operator perturbation (~3e-3) must be
    fully absorbed by the full-precision residual sweeps."""
    from hybridsbp_tpu.tpu.multiblock import make_jit_solver
    from hybridsbp_tpu.tpu.refine import make_fixed_refined

    prob = _curved_prob(p=4, N=16)
    rng = np.random.default_rng(13)
    g = rng.standard_normal(int(prob.vstarts[-1]))
    gdelta = rng.standard_normal(int(prob.FToLstarts[-1]))

    bp32 = build_blocked(prob, dtype=jnp.float32, flat=True)
    trace_inv = build_woodbury_banded(bp32, prob, iters=64)
    gb, gd = blocked_rhs_from_host(prob, g, gdelta)
    gb, gd = gb.astype(jnp.float32), gd.astype(jnp.float32)

    u_host, _ = prob.solve(g, gdelta, method="displacements")
    umax = np.abs(u_host).max()

    sj = make_jit_solver(bp32, trace_inv=trace_inv, tol=1e-6,
                         maxiter=100)
    res32 = sj(gb, gd)
    rel32 = (np.abs(np.asarray(res32.x, dtype=np.float64).ravel()
                    - u_host).max() / umax)

    # measured contraction ~0.15-0.17 per sweep (bf16-perturbation
    # limited — inner_tol below 1e-3 buys nothing; see the r5 probe in
    # RESULTS.md): 5 sweeps reach the f32 solve's accuracy class
    solve = make_fixed_refined(bp32, trace_inv, sweeps=5,
                               inner_tol=1e-3, inner_maxiter=40)
    x, rn = solve(gb, gd)
    rel = (np.abs(np.asarray(x, dtype=np.float64).ravel()
                  - u_host).max() / umax)
    assert float(rn) < 1e-5, float(rn)
    # the bf16 operator's raw ~3e-3 perturbation is absorbed: the
    # refined solution lands ~2 orders below it, within a small factor
    # of the plain f32 solve
    assert rel < 1e-4, (rel, rel32)


@pytest.mark.parametrize("chunk", [1, 3])
def test_assemble_chunk_pad_and_apply(chunk):
    """Chunk sizes that do not divide E still produce a correct
    operator (the lax.map echunk padding is sliced off the result)."""
    prob = _curved_prob(p=2, N=12)
    full = build_blocked(prob, dtype=jnp.float64, assemble_on_device=True,
                         flat=True)
    chunked = build_blocked(prob, dtype=jnp.float64,
                            assemble_on_device=True, assemble_chunk=chunk,
                            with_fastdiag=False)
    rng = np.random.default_rng(5)
    u = jnp.asarray(rng.standard_normal((2,) + tuple(full.grid_shape)))
    np.testing.assert_allclose(
        np.asarray(displacement_matvec(chunked, u)),
        np.asarray(displacement_matvec(full, u)), rtol=1e-13, atol=1e-13)
