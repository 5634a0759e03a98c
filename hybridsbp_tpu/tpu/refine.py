"""Mixed-precision iterative refinement (SURVEY §7 risk item).

TPU serving solves run in float32; validation demands float64 accuracy.
Classic iterative refinement closes the gap: solve in f32 (fast CG with
the fastdiag preconditioner), compute the residual in f64, re-solve for
the correction, repeat.  Each sweep multiplies the error by
O(kappa * eps_f32), so 2-3 sweeps reach f64 levels for the
well-preconditioned SPD systems of this framework.
"""
from typing import Callable

import jax.numpy as jnp


def iterative_refinement(solve32: Callable, matvec64: Callable, b64,
                         sweeps=3):
    """Solve A x = b64 to (near-)f64 accuracy using an f32 inner solver.

    solve32(r32) -> approximate A^{-1} r in float32;
    matvec64(x64) -> A @ x in float64.
    Returns (x64, residual_norms) with one norm per sweep.
    """
    b64 = jnp.asarray(b64, dtype=jnp.float64)
    x = jnp.zeros_like(b64)
    norms = []
    r = b64
    for _ in range(sweeps):
        dx = solve32(jnp.asarray(r, dtype=jnp.float32))
        x = x + jnp.asarray(dx, dtype=jnp.float64)
        r = b64 - matvec64(x)
        norms.append(jnp.sqrt(jnp.sum(r * r)))
    return x, norms


def refined_displacement_solve(bp, g, gdelta_faces, *, sweeps=3,
                               coef_dtype=jnp.bfloat16, inner_tol=1e-4,
                               inner_maxiter=300, tol=None, stencil="auto",
                               precond="auto"):
    """Displacement solve whose CG matvecs stream **bf16 coefficient
    planes** (half the dominant HBM traffic of the hot op), refined
    against the full-precision operator.

    Each sweep: CG on the ``coef_dtype``-perturbed system for a
    correction (cheap matvecs), then one full-precision residual.  The
    bf16 operator perturbation is ~4e-3 relative, so each sweep
    contracts the true residual by O(kappa_precond * 4e-3) — measured
    ~0.08/sweep on a curved two-block problem, i.e. ~1 digit per sweep
    while the inner matvec traffic runs at half the coefficient
    bandwidth.  For serving tolerances (1e-5-ish) 2-4 sweeps suffice;
    deep tolerances take ~10.

    Returns (x, residual_norms) — one relative residual per sweep,
    measured with the full-precision operator.  ``tol``: stop early
    once the true relative residual falls below it.
    """
    from .multiblock import (displacement_matvec, displacement_rhs,
                             solve_displacements, with_coef_dtype)

    bp_lo = with_coef_dtype(bp, coef_dtype)
    b = displacement_rhs(bp, g, gdelta_faces)
    bnorm = jnp.sqrt(jnp.sum(b * b))
    bnorm = jnp.where(bnorm == 0, 1.0, bnorm)
    x = jnp.zeros_like(b)
    r = b
    norms = []
    zero_gd = jnp.zeros_like(gdelta_faces)
    for _ in range(sweeps):
        dx = solve_displacements(bp_lo, r, zero_gd, tol=inner_tol,
                                 maxiter=inner_maxiter, stencil=stencil,
                                 precond=precond).x
        x = x + dx
        r = b - displacement_matvec(bp, x, stencil=stencil)
        rn = jnp.sqrt(jnp.sum(r * r)) / bnorm
        norms.append(rn)
        if tol is not None and float(rn) < tol:
            break
    return x, norms
