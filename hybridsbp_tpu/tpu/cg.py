"""Preconditioned conjugate gradients (pure JAX, jit/vmap/shard_map safe).

The iterative device-side counterpart of the host sparse factorizations:
all hybrid-solver systems are SPD (M~ per block, the trace Schur
complement B, the eliminated system C), so CG with a cheap preconditioner
is the TPU-native solve.  Fixed-iteration-bound ``lax.while_loop`` keeps
it compilable; the matvec is any traceable callable (DIA stencil apply,
trace matvec with collectives, ...).
"""
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class CGResult(NamedTuple):
    x: jnp.ndarray
    iters: jnp.ndarray
    resnorm: jnp.ndarray        # final |r| / |b|
    converged: jnp.ndarray
    # stagnation guard tripped (see cg(stall_iters=...)): the solve made
    # no meaningful residual progress over a window of iterations —
    # distinct from running to maxiter ("diverged"/floored).  False when
    # the guard is off.
    stalled: jnp.ndarray = False


def _dot(a, b):
    # elementwise-multiply + full reduction (no reshape: keeps GSPMD
    # shardings intact so sharded operands reduce with one psum).
    # Operands may be arbitrary pytrees (e.g. per-shape-bucket tuples
    # of block fields): the dot is the sum over leaves.  tree_map
    # validates the structures match (a leaf-zip would silently drop
    # unmatched leaves and report convergence on a partial residual).
    prods = jax.tree_util.tree_map(lambda x, y: jnp.sum(x * y), a, b)
    return jax.tree_util.tree_reduce(lambda p, q: p + q, prods)


def _axpy(alpha, x, y):
    """y + alpha * x over pytrees."""
    return jax.tree_util.tree_map(lambda xi, yi: yi + alpha * xi, x, y)


def cg(matvec: Callable, b, x0=None, *, tol=1e-10, maxiter=500,
       precond: Optional[Callable] = None, flexible=False,
       stall_iters=None, stall_factor=0.9) -> CGResult:
    """Solve A x = b with (preconditioned) CG.

    ``matvec(x)`` and ``precond(r)`` operate on arrays of b's shape (any
    rank — fields stay in their natural (Ns+1, Nr+1) or block-batched
    layout; no flattening needed).

    ``flexible=True`` uses the Polak–Ribière beta
    beta_k = z_{k+1}·(r_{k+1} − r_k) / z_k·r_k (flexible CG / Notay),
    which tolerates a *variable* preconditioner — required when the
    preconditioner is itself an inexact inner iteration (e.g. the
    batched block solves inside the device trace-Schur solve).

    ``stall_iters=k``: stagnation guard (VERDICT r4 next #3) — bail out
    once the residual norm has not improved below ``stall_factor`` × its
    best value for ``k`` consecutive iterations, reporting
    ``stalled=True`` (distinct from running to ``maxiter``).  Motivated
    by the N=272 trace-method failure mode: at ~36 s per outer
    iteration, 200 futile iterations burned ~2 h before reporting;
    a stalled preconditioned outer (broken preconditioner, f32
    attainable-accuracy floor below ``tol``) shows NO window progress
    and trips this in minutes.  Off (None) by default — long
    lightly-preconditioned solves have legitimate plateaus; the
    well-preconditioned serving paths (``make_jit_solver``) enable it.
    """
    M = precond if precond is not None else (lambda r: r)
    x0 = (jax.tree_util.tree_map(jnp.zeros_like, b) if x0 is None else x0)

    bnorm = jnp.sqrt(jnp.real(_dot(b, b)))
    bnorm = jnp.where(bnorm == 0, 1.0, bnorm)
    r0 = _axpy(-1.0, matvec(x0), b)
    z0 = M(r0)
    gamma0 = jnp.real(_dot(r0, z0))
    rn0 = jnp.sqrt(jnp.real(_dot(r0, r0)))

    def cond(st):
        x, r, r_old, z, p, gamma, k, best_rn, best_k = st
        rn = jnp.sqrt(jnp.real(_dot(r, r)))
        go = (rn > tol * bnorm) & (k < maxiter)
        if stall_iters is not None:
            go = go & (k - best_k < stall_iters)
        return go

    def body(st):
        x, r, r_old, z, p, gamma, k, best_rn, best_k = st
        Ap = matvec(p)
        # guarded divisions: under vmap, lanes that already converged
        # keep iterating until the whole batch is done, and their
        # vanishing gamma/pAp must not produce 0/0 NaNs
        pAp = jnp.real(_dot(p, Ap))
        alpha = gamma / jnp.where(pAp == 0, 1.0, pAp)
        x = _axpy(alpha, p, x)
        r_new = _axpy(-alpha, Ap, r)
        z = M(r_new)
        if flexible:
            num = jnp.real(_dot(z, _axpy(-1.0, r, r_new)))
            gamma_new = jnp.real(_dot(r_new, z))
        else:
            gamma_new = jnp.real(_dot(r_new, z))
            num = gamma_new
        beta = num / jnp.where(gamma == 0, 1.0, gamma)
        p = _axpy(beta, p, z)
        if stall_iters is not None:
            rn = jnp.sqrt(jnp.real(_dot(r_new, r_new)))
            improved = rn < stall_factor * best_rn
            best_rn = jnp.where(improved, rn, best_rn)
            best_k = jnp.where(improved, k + 1, best_k)
        return (x, r_new, r, z, p, gamma_new, k + 1, best_rn, best_k)

    st = (x0, r0, r0, z0, z0, gamma0, jnp.asarray(0), rn0, jnp.asarray(0))
    x, r, r_old, z, p, gamma, k, best_rn, best_k = jax.lax.while_loop(
        cond, body, st)
    rn = jnp.sqrt(jnp.real(_dot(r, r))) / bnorm
    converged = rn <= tol
    stalled = ((k - best_k >= stall_iters) & ~converged
               if stall_iters is not None else jnp.asarray(False))
    return CGResult(x=x, iters=k, resnorm=rn, converged=converged,
                    stalled=stalled)


def cg_fixed(matvec: Callable, b, iters: int, x0=None,
             precond: Optional[Callable] = None):
    """Fixed-iteration preconditioned CG (``lax.fori_loop``): returns x
    after exactly ``iters`` steps, no convergence test.

    For INNER solves nested inside an outer iteration: a tolerance-free
    truncated solve compiled as a data-dependent while_loop inside
    another while_loop explodes XLA compile time (CLAUDE.md; the same
    reason the friction Newton has newtbndv_fixed).  Guarded divisions
    keep post-convergence iterations inert (0/0-free)."""
    M = precond if precond is not None else (lambda r: r)
    x0 = (jax.tree_util.tree_map(jnp.zeros_like, b) if x0 is None else x0)
    r0 = _axpy(-1.0, matvec(x0), b)
    z0 = M(r0)
    gamma0 = jnp.real(_dot(r0, z0))

    def body(_, st):
        x, r, p, gamma = st
        Ap = matvec(p)
        pAp = jnp.real(_dot(p, Ap))
        alpha = gamma / jnp.where(pAp == 0, 1.0, pAp)
        x = _axpy(alpha, p, x)
        r = _axpy(-alpha, Ap, r)
        z = M(r)
        gamma_new = jnp.real(_dot(r, z))
        beta = gamma_new / jnp.where(gamma == 0, 1.0, gamma)
        p = _axpy(beta, p, z)
        return (x, r, p, gamma_new)

    x, _, _, _ = jax.lax.fori_loop(0, iters, body, (x0, r0, z0, gamma0))
    return x


def cg_solve(matvec: Callable, b, *, tol=1e-10, maxiter=500,
             precond: Optional[Callable] = None, flexible=False):
    """Differentiable SPD solve: x = A^{-1} b with implicit gradients.

    Wraps CG in ``lax.custom_linear_solve(symmetric=True)`` so reverse-
    and forward-mode derivatives re-use the same (preconditioned) CG on
    the transposed system instead of differentiating through the
    iteration — the adjoint-state method for free.  Enables
    gradient-based inversion (e.g. d(misfit)/d(boundary data) through
    the hybrid elliptic solve).  ``flexible``: Polak–Ribière form for
    variable preconditioners (e.g. Woodbury with inner CG sweeps).
    """
    def solve(mv, bb):
        return cg(mv, bb, tol=tol, maxiter=maxiter, precond=precond,
                  flexible=flexible).x

    return jax.lax.custom_linear_solve(matvec, b, solve, symmetric=True)
