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
