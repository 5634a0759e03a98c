"""Rate-and-state friction and the safeguarded bracketed Newton solver.

Reference parity: ``rateandstate`` (global_curved.jl:1031-1039) and
``newtbndv`` (:1041-1075).  TPU-native design: the Newton iteration is a
``lax.while_loop`` with the bracket carried in the state, and the whole
solver is vmapped across fault nodes — every node iterates in lockstep on
the VPU instead of the reference's sequential per-node loop.
"""
from functools import partial

import jax
import jax.numpy as jnp


def rateandstate(V, psi, sigma_n, phi, eta, a, V0):
    """Regularized rate-and-state strength balance g(V) and dg/dV.

    g(V) = sigma_n * a * asinh(V * Y) + eta*V - phi,
    Y = exp(psi/a) / (2 V0).
    """
    Y = jnp.exp(psi / a) / (2.0 * V0)
    f = a * jnp.arcsinh(V * Y)
    dfdV = a * Y / jnp.sqrt(1.0 + (V * Y) ** 2)
    g = sigma_n * f + eta * V - phi
    dgdV = sigma_n * dfdV + eta
    return g, dgdV


@partial(jax.jit, static_argnums=(0,))
def newtbndv(func, xL, xR, x, ftol=1e-6, maxiter=500, minchange=0.0,
             atolx=1e-4, rtolx=1e-4):
    """Safeguarded (bracketed) scalar Newton with bisection fallback.

    ``func(x) -> (f, df)`` must be traceable.  Returns ``(x, f, iters)``
    with ``iters < 0`` signalling failure (no sign change in the bracket
    or no convergence in ``maxiter``) — same protocol as the reference.
    All arguments may be batched by vmapping this function.
    """
    fL, _ = func(xL)
    fR, _ = func(xR)
    no_bracket = fL * fR > 0

    f0, df0 = func(x)

    def cond(state):
        x, dx, xL, xR, fL, fR, f, df, it, done = state
        return jnp.logical_and(~done, it < maxiter)

    def body(state):
        x, dx, xL, xR, fL, fR, f, df, it, done = state
        dx = -f / df
        xn = x + dx
        bad = (xn < xL) | (xn > xR) | (jnp.abs(dx) / (xR - xL) < minchange)
        xn = jnp.where(bad, (xR + xL) / 2, xn)
        dx = jnp.where(bad, (xR - xL) / 2, dx)
        fn, dfn = func(xn)
        same_side = fn * fL > 0
        fL2 = jnp.where(same_side, fn, fL)
        xL2 = jnp.where(same_side, xn, xL)
        fR2 = jnp.where(same_side, fR, fn)
        xR2 = jnp.where(same_side, xR, xn)
        conv = (jnp.abs(fn) < ftol) & (
            jnp.abs(dx) < atolx + rtolx * (jnp.abs(dx) + jnp.abs(xn)))
        return (xn, dx, xL2, xR2, fL2, fR2, fn, dfn, it + 1, conv)

    init = (x, xR - xL, xL, xR, fL, fR, f0, df0, jnp.asarray(0), no_bracket)
    xf, _, _, _, _, _, ff, _, iters, done = jax.lax.while_loop(cond, body, init)
    failed = no_bracket | ~done
    xf = jnp.where(no_bracket, jnp.nan, xf)
    ff = jnp.where(no_bracket, jnp.nan, ff)
    return xf, ff, jnp.where(failed, -iters - 1, iters)


def solve_slip_rates(psi, tau, eta, sigma_n, a, V0, V_init=None,
                     ftol=1e-9, atolx=1e-9, rtolx=1e-9, maxiter=500):
    """Vectorized fault-node slip-rate solve (odefun.jl:80-85).

    Brackets each node's V in [-|tau/eta|, +|tau/eta|] and Newton-solves
    the strength balance.  Returns (V, ok) with ok=False where the Newton
    failed or produced NaN.
    """
    VR = jnp.abs(tau / eta)
    x0 = jnp.zeros_like(tau) if V_init is None else V_init

    def one(psi_n, tau_n, a_n, VR_n, x0_n):
        f = lambda V: rateandstate(V, psi_n, sigma_n, tau_n, eta, a_n, V0)
        return newtbndv(f, -VR_n, VR_n, x0_n, ftol=ftol, atolx=atolx,
                        rtolx=rtolx, maxiter=maxiter)

    V, fval, iters = jax.vmap(one)(psi, tau, a, VR, x0)
    ok = jnp.isfinite(V) & (iters >= 0)
    return V, ok
