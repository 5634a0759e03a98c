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

    Evaluated in log space: psi/a reaches ~85 in BP1, so the literal
    Y = exp(psi/a)/(2 V0) ~ 1e42 overflows float32.  With w = psi/a and
    u = V/(2 V0),

        asinh(u e^w) = sign(u) * (w + log(|u| + sqrt(e^{-2w} + u^2)))
        d/dV asinh(u e^w) = 1 / (2 V0 sqrt(e^{-2w} + u^2)),

    which is exact in infinite precision and stable in f32/f64 for the
    whole BP1 range (e^{-2w} underflows gracefully to 0).
    """
    w = psi / a
    u = V / (2.0 * V0)
    au = jnp.abs(u)
    # clamp the e^{-2w} underflow (w ~ 60-90 in BP1): keeps dg/dV finite
    # in f32 so Newton can move off V = 0 (invisible for |u| >> 1e-18)
    root = jnp.sqrt(jnp.exp(jnp.maximum(-2.0 * w, -80.0)) + u * u)
    asinh_uy = jnp.sign(u) * (w + jnp.log(au + root))
    # u == 0: asinh(0) = 0 (the formula gives w + log(e^{-w}) = 0, but
    # guard the underflowed-log(0) corner explicitly)
    asinh_uy = jnp.where(u == 0, 0.0, asinh_uy)
    f = a * asinh_uy
    dfdV = a / (2.0 * V0 * root)
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


def strength_balance_hoisted(V, w, e2w, sigma_n, phi, eta, a, V0):
    """rateandstate() with the iteration-independent pieces precomputed:
    w = psi/a and e2w = exp(max(-2w, -80)).  Inside the Newton loop this
    leaves one sqrt + one log per evaluation — the dominant cost when
    the friction solve runs in (TPU-emulated) float64."""
    u = V / (2.0 * V0)
    au = jnp.abs(u)
    root = jnp.sqrt(e2w + u * u)
    asinh_uy = jnp.sign(u) * (w + jnp.log(au + root))
    asinh_uy = jnp.where(u == 0, 0.0, asinh_uy)
    g = sigma_n * (a * asinh_uy) + eta * V - phi
    dgdV = sigma_n * (a / (2.0 * V0 * root)) + eta
    return g, dgdV


# fdlibm-style Cody-Waite split of ln(2) for the precise f32 log
_LN2_HI = 6.9313812256e-01
_LN2_LO = 9.0580006145e-06
_SQRT_HALF = 0.70710678118


def log_precise(x):
    """Accurate natural log for float32 on TPU.

    The TPU's hardware f32 ``log`` approximation has only ~2**-13
    *relative* accuracy (measured r2: ~1.6e-4 output granularity at
    magnitudes ~7), which puts an ~1e-4*(sigma a) evaluation-noise
    floor under the rate-and-state strength balance — the friction
    Newton then 2-cycles between adjacent quantization plateaus and can
    never satisfy a tight ftol.  This software form (Cody-Waite ln2
    split + atanh series after mantissa/exponent decomposition) costs
    ~10 VPU flops and is accurate to a few f32 ulps of the result,
    restoring a ~1e-6-relative slip-rate solve in pure f32.

    float64 inputs fall through to ``jnp.log`` (the series is tuned to
    f32 accuracy).
    """
    if jnp.result_type(x) == jnp.float64:
        return jnp.log(x)
    m, e = jnp.frexp(x)                      # x = m 2^e, m in [0.5, 1)
    adj = m < _SQRT_HALF
    m = jnp.where(adj, 2.0 * m, m)           # m in [sqrt(1/2), sqrt(2))
    e = (e - adj).astype(m.dtype)
    r = (m - 1.0) / (m + 1.0)                # |r| <= 0.1716
    z = r * r
    # log(m) = 2 atanh(r) = 2r(1 + z/3 + z^2/5 + z^3/7 + z^4/9); the
    # z^5/11 tail is < 3e-9 relative — below f32 resolution
    p = 2.0 * r * (1.0 + z * (0.33333333 + z * (0.2 + z * (
        0.14285714 + z * 0.11111111))))
    res = e * _LN2_HI + (p + e * _LN2_LO)
    # domain guard: frexp(0) = (0, 0) would walk the series to a finite
    # wrong value; defer x <= 0 (and inf/nan) to jnp.log's -inf/NaN
    return jnp.where((x > 0) & jnp.isfinite(x), res, jnp.log(x))


def strength_balance_compensated(V, qp, qm, w32, e2w, sigma_a, eta, inv2V0):
    """f32-robust strength balance via cancellation hoisting.

    The f32 failure mode of g = sigma*a*(w + log(|u|+root)) + eta*V - phi
    is the cancellation of the O(60-85) terms w and log(...) down to
    O(tau/(sigma a)): rounding of w alone exceeds any usable ftol.  Here
    the caller precomputes (in f64, once per node per stage — V-independent)

        qp = +w - phi/(sigma a),    qm = -w - phi/(sigma a),

    so the only V-dependent transcendental per Newton iteration is one
    f32 log whose absolute error is a few ulp of its O(20) result:

        g/(sigma a) = qp + log(|u|+root)   (u >= 0)
                    = qm - log(|u|+root)   (u <  0),  u = V/(2 V0).
    """
    u = V * inv2V0
    au = jnp.abs(u)
    root = jnp.sqrt(e2w + u * u)
    l = log_precise(au + root)
    gs = jnp.where(u >= 0, qp + l, qm - l)
    gs = jnp.where(u == 0, qp - w32, gs)   # asinh(0) = 0 exactly
    g = sigma_a * gs + eta * V
    dgdV = sigma_a * inv2V0 / root + eta
    return g, dgdV


def newtbndv_fixed(func, xL, xR, x, iters=25, ftol=1e-6, atolx=1e-4,
                   rtolx=1e-4, polish=0, xtol_rel=None):
    """Fixed-iteration bracketed Newton (fori_loop), batched-friendly.

    Same safeguarded iteration as :func:`newtbndv`, but with a static
    iteration count: under vmap a data-dependent while_loop runs to the
    worst node anyway, and the static form compiles to a much simpler
    program (important inside the BP1 outer while_loop on TPU).  With
    the analytic warm start ~10 iterations converge; returns
    ``(x, f, iters_pos_or_neg)`` with the same failure protocol.

    ``polish=k`` appends k *unsafeguarded* Newton steps after the
    bracketed sweep, with a noise-aware acceptance: a step is taken
    only while it keeps shrinking (|dx_new| <= |dx_prev|) — past that
    point the update is pure evaluation noise and would random-walk x.
    This drives |f| from ftol down to the evaluation-noise floor of
    ``func``.

    ``xtol_rel`` adds a second, noise-aware convergence acceptance:
    the node counts as converged once its bracket has collapsed to a
    relative width <= xtol_rel, even if |f| never reaches ftol.  This
    is REQUIRED on TPU f32: the hardware's f32 log carries ~2e-5
    *relative* error, so the strength balance g has an evaluation-noise
    floor of ~1e-4·(sigma a) at O(10) log magnitudes — no ftol below
    that is reachable, the convergence flag never trips at marginal
    nodes, and the resulting "Newton failed" rejections storm the step
    controller (the round-1 f32 storm, diagnosed r2).  A collapsed
    bracket means x is pinned to within (evaluation noise)/g' of the
    true root — the best any iteration can do with this arithmetic.
    """
    fL, _ = func(xL)
    fR, _ = func(xR)
    no_bracket = fL * fR > 0

    def body(_, st):
        x, xL, xR, fL, fR, f, df, conv = st
        dx = -f / df
        xn = x + dx
        bad = (xn < xL) | (xn > xR)
        xn = jnp.where(bad, (xR + xL) / 2, xn)
        dx = jnp.where(bad, (xR - xL) / 2, dx)
        fn, dfn = func(xn)
        same = fn * fL > 0
        xL2 = jnp.where(same, xn, xL)
        xR2 = jnp.where(same, xR, xn)
        c = (jnp.abs(fn) < ftol) & (jnp.abs(dx) < atolx + rtolx
                                    * (jnp.abs(dx) + jnp.abs(xn)))
        if xtol_rel is not None:
            c = c | ((xR2 - xL2) <= xtol_rel
                     * jnp.maximum(jnp.abs(xL2), jnp.abs(xR2)))
        st_new = (xn, xL2, xR2,
                  jnp.where(same, fn, fL), jnp.where(same, fR, fn),
                  fn, dfn, conv | c)
        # freeze once converged
        return jax.tree_util.tree_map(
            lambda new, old: jnp.where(conv, old, new), st_new, st)

    f0, df0 = func(x)
    st = (x, xL, xR, fL, fR, f0, df0, jnp.asarray(False))
    x, xL, xR, fL, fR, f, df, conv = jax.lax.fori_loop(0, iters, body, st)

    if polish:
        def pbody(_, pst):
            x, f, df, dx_prev, alive = pst
            dx = -f / df
            # noise-aware acceptance: step must keep contracting, else
            # we are at the noise floor — freeze.  Deliberately NOT
            # bracket-constrained: with a noise-collapsed bracket the
            # computed root can sit (noise/g') outside it.
            ok_step = jnp.abs(dx) <= jnp.abs(dx_prev)
            take = alive & ok_step
            xn = jnp.where(take, x + dx, x)
            fn, dfn = func(xn)
            keep_f = jnp.where(take, fn, f)
            keep_df = jnp.where(take, dfn, df)
            return (xn, keep_f, keep_df, jnp.where(take, dx, dx_prev),
                    take)
        # seed dx_prev from the current Newton step estimate so the
        # first polish step is accepted whenever it is sane
        dx0 = jnp.abs(-f / df) * 4.0 + atolx
        x, f, df, _, _ = jax.lax.fori_loop(
            0, polish, pbody, (x, f, df, dx0, conv))

    ok = conv & ~no_bracket
    x = jnp.where(no_bracket, jnp.nan, x)
    return x, f, jnp.where(ok, iters, -iters)


def slip_rate_estimate(psi, tau, sigma_n, a, V0, clip_exp=80.0):
    """Analytic slip rate of the non-regularized strength balance,
    V = 2 V0 sinh(tau/(sigma_n a)) e^{-psi/a}, evaluated in log space
    (odefun.jl:87's Vex).  An excellent Newton warm start: radiation
    damping makes it an upper-ish estimate, and it is f32-stable."""
    e1 = jnp.clip(tau / (sigma_n * a) - psi / a, -clip_exp, clip_exp)
    e2 = jnp.clip(-tau / (sigma_n * a) - psi / a, -clip_exp, clip_exp)
    return V0 * (jnp.exp(e1) - jnp.exp(e2))


def newton_defaults(newton_dtype):
    """Per-dtype friction-Newton knobs, as tuned for the BP1 hot loop
    (r2): f64 gets a tight ftol; pure f32 needs the compensated
    strength balance with a looser ftol, 2 unsafeguarded polish steps,
    and bracket-collapse acceptance (the TPU hardware f32 log's ~2^-13
    relative accuracy makes a tight f32 ftol unattainable — see
    log_precise)."""
    if newton_dtype == jnp.float64:
        return {"tol": 1e-9, "polish": 0, "xtol_rel": None}
    return {"tol": 3e-5, "polish": 2,
            "xtol_rel": 8 * float(jnp.finfo(newton_dtype).eps)}


def newton_slip_rates(psi, tau_n, a_arr, *, sigma_n, eta, V0,
                      newton_dtype, newton_tol, newton_iters=25,
                      newton_polish=0, newton_xtol_rel=None):
    """Batched fault-node slip-rate Newton, dtype-aware (the shared hot
    path of the single-block and multiblock BP1 RHS; odefun.jl:80-85).

    f64: fixed-iteration bracketed Newton on the hoisted strength
    balance.  Other dtypes: the compensated-f32 formulation — the
    cancellation-carrying scalars qp/qm are precomputed in the widest
    available dtype, the in-loop transcendental is the software f32 log
    (log_precise), and the bracketed sweep is followed by noise-aware
    polish steps.  Returns (V, iters) in newton_dtype; iters < 0 marks
    failed nodes.
    """
    psi_n = psi.astype(newton_dtype)
    tau_nn = tau_n.astype(newton_dtype)
    a_n = jnp.broadcast_to(a_arr, psi.shape).astype(newton_dtype)
    VR = jnp.abs(tau_nn / eta)
    V_guess = slip_rate_estimate(psi_n, tau_nn, sigma_n, a_n, V0)
    V_guess = jnp.clip(V_guess, -0.95 * VR, 0.95 * VR)

    if newton_dtype == jnp.float64:
        w_n = psi_n / a_n
        e2w_n = jnp.exp(jnp.maximum(-2.0 * w_n, -80.0))

        def one(w_i, e2w_i, tau_i, a_i, VR_i, x0_i):
            f = lambda V: strength_balance_hoisted(
                V, w_i, e2w_i, sigma_n, tau_i, eta, a_i, V0)
            return newtbndv_fixed(f, -VR_i, VR_i, x0_i,
                                  iters=newton_iters, ftol=newton_tol,
                                  atolx=newton_tol, rtolx=newton_tol)

        V, fval, iters = jax.vmap(one)(w_n, e2w_n, tau_nn, a_n, VR,
                                       V_guess)
        return V, iters

    # compensated f32 path: precompute the cancellation-carrying
    # scalars in the widest available dtype (f64 when x64 is on)
    hi = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    w_hi = psi.astype(hi) / a_n.astype(hi)
    base = tau_nn.astype(hi) / (sigma_n * a_n.astype(hi))
    qp = (w_hi - base).astype(newton_dtype)
    qm = (-w_hi - base).astype(newton_dtype)
    w32 = w_hi.astype(newton_dtype)
    e2w_n = jnp.exp(jnp.maximum(-2.0 * w32, -80.0))
    sig_a = (sigma_n * a_n).astype(newton_dtype)
    inv2V0 = jnp.asarray(1.0 / (2.0 * V0), dtype=newton_dtype)

    def one(qp_i, qm_i, w_i, e2w_i, sa_i, VR_i, x0_i):
        f = lambda V: strength_balance_compensated(
            V, qp_i, qm_i, w_i, e2w_i, sa_i, eta, inv2V0)
        return newtbndv_fixed(f, -VR_i, VR_i, x0_i,
                              iters=newton_iters, ftol=newton_tol,
                              atolx=newton_tol, rtolx=newton_tol,
                              polish=newton_polish,
                              xtol_rel=newton_xtol_rel)

    V, fval, iters = jax.vmap(one)(qp, qm, w32, e2w_n, sig_a,
                                   VR.astype(newton_dtype),
                                   V_guess.astype(newton_dtype))
    return V, iters


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
