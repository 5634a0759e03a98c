"""Adaptive Tsitouras 5(4) Runge-Kutta integrator (pure JAX).

Replaces the reference's OrdinaryDiffEq.Tsit5 dependency
(seas/BP1/BP1.jl:159-161) with a jit-compatible implementation: FSAL
tableau, PI step-size controller, infinity-norm error control, and the
step-rejection protocol of the BP1 driver — an RHS may declare a step
invalid (NaN traction / failed Newton), which rejects and retries with a
smaller dt exactly like the ``isoutofdomain`` + reject_step flag wiring
(BP1.jl:149-156, odefun.jl:74-107).

The whole solve is one ``lax.while_loop`` — O(10^5) steps run on device
with no host round-trips.  Tableau coefficients are from Tsitouras,
Comput. Math. Appl. 62 (2011) 770-775.
"""

from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

# Tsitouras 5(4) tableau — plain Python floats (weakly typed) so the
# stage arithmetic follows the state dtype instead of promoting f32
# states to f64 when x64 is enabled for the time variables
_C = (0.0, 0.161, 0.327, 0.9, 0.9800255409045097, 1.0, 1.0)
_A = [
    [],
    [0.161],
    [-0.008480655492356989, 0.335480655492357],
    [2.8971530571054935, -6.359448489975075, 4.3622954328695815],
    [5.325864828439257, -11.748883564062828, 7.4955393428898365,
     -0.09249506636175525],
    [5.86145544294642, -12.92096931784711, 8.159367898576159,
     -0.071584973281401006, -0.028269050394068383],
    [0.09646076681806523, 0.01, 0.4798896504144996, 1.379008574103742,
     -3.290069515436081, 2.324710524099774],
]
_B = (0.09646076681806523, 0.01, 0.4798896504144996,
      1.379008574103742, -3.290069515436081, 2.324710524099774, 0.0)
# b - bhat (error weights)
_BTILDE = (-0.00178001105222577714, -0.0008164344596567469,
           0.007880878010261995, -0.1447110071732629,
           0.5823571654525552, -0.45808210592918697,
           0.015151515151515152)


class SolveStats(NamedTuple):
    naccept: jnp.ndarray
    nreject: jnp.ndarray
    nfe: jnp.ndarray
    success: jnp.ndarray


class Tsit5Solution(NamedTuple):
    ts: jnp.ndarray          # (nsave,) accepted step times (NaN-padded)
    save: Any                # pytree of per-step saved values (NaN-padded)
    y_final: jnp.ndarray
    t_final: jnp.ndarray
    stats: SolveStats
    dt_final: jnp.ndarray = None   # controller step size (for resuming)
    meta: Any = None         # caller bookkeeping (e.g. station indices),
                             # attached post-solve via _replace
    yc_final: jnp.ndarray = None   # compensated-mode low word (resume)

    @property
    def nsteps(self):
        return int(self.stats.naccept)


def _inf_norm_err(err, y0, y1, rtol, atol):
    scale = atol + rtol * jnp.maximum(jnp.abs(y0), jnp.abs(y1))
    return jnp.max(jnp.abs(err) / scale)


@partial(jax.jit,
         static_argnames=("rhs", "save_fn", "max_steps", "save_every",
                          "compensated"))
def solve_tsit5(rhs: Callable, y0, t0, t1, dt0, args=None, *,
                rtol=1e-3, atol=1e-5, max_steps=200_000,
                save_fn: Optional[Callable] = None, save_every: int = 1,
                safety=0.9, min_factor=0.2, max_factor=10.0,
                beta1=0.7 / 5, beta2=0.08, compensated: bool = False,
                yc0=None):
    """Integrate ``dy/dt = rhs(t, y, args)`` from t0 to t1 adaptively.

    ``rhs`` returns either ``dy`` or ``(dy, ok)`` where ``ok=False``
    forces step rejection (the BP1 NaN/Newton-failure protocol).
    ``save_fn(t, y, args)`` (optional) maps each accepted state to a small
    pytree recorded every ``save_every``-th accepted step into
    preallocated buffers (NaN-padded past the end).

    ``compensated=True`` carries a Neumaier low word ``yc`` for the
    state so the ACCUMULATED trajectory keeps ~2x the state dtype's
    mantissa across O(10^4) steps while every RHS/stage evaluation
    stays in the state dtype: the effective state is ``y + yc``, each
    stage adds ``yc`` into its increment, and the accepted update runs
    the increment through an exact two-sum.  This is the f32 serving
    mode's event-fidelity fix — measured r5 (BP1 canonical Dc=0.008,
    ~14k steps / 700 yr): the plain-f32 state drifts individual late
    recurrences by 20-28 yr, which is ACCUMULATION rounding (per-step
    increments ~1e-4 of the state magnitude round their tails into a
    random walk), not RHS quantization.  ``yc0`` resumes the low word
    across chunked launches (see ``yc_final``)."""
    y0 = jnp.asarray(y0)
    # Time must carry more precision than the state: BP1 spans 3e10 s
    # with event steps of ~1e-2 s, so t/dt live in float64 whenever x64
    # is enabled even if the state is float32 (the serving path).
    tdtype = jnp.float64 if jax.config.jax_enable_x64 else y0.dtype

    def eval_rhs(t, y):
        out = rhs(t, y, args)
        if isinstance(out, tuple):
            dy, ok = out
        else:
            dy, ok = out, True
        ok = jnp.asarray(ok) & jnp.all(jnp.isfinite(dy))
        return dy, ok

    nsave = max_steps // save_every + 1
    if save_fn is not None:
        proto = save_fn(t0, y0, args)
        bufs = jax.tree_util.tree_map(
            lambda x: jnp.full((nsave,) + jnp.shape(x), jnp.nan,
                               dtype=jnp.result_type(x, jnp.float32)), proto)
    else:
        bufs = None
    ts_buf = jnp.full((nsave,), jnp.nan, dtype=tdtype)

    def write(bufs, ts_buf, idx, t, y):
        ts_buf = ts_buf.at[idx].set(t)
        if save_fn is not None:
            vals = save_fn(t, y, args)
            bufs = jax.tree_util.tree_map(
                lambda b, v: b.at[idx].set(v), bufs, vals)
        return bufs, ts_buf

    k1_0, ok0 = eval_rhs(t0, y0)
    bufs, ts_buf = write(bufs, ts_buf, 0, t0, y0)

    if compensated:
        yc_0 = (jnp.zeros_like(y0) if yc0 is None
                else jnp.asarray(yc0, dtype=y0.dtype))
    else:
        yc_0 = jnp.zeros((), dtype=y0.dtype)   # dummy carry

    # carry: (t, y, yc, dt, k1, err_prev, nacc, nrej, nfe, isave,
    #         bufs, ts_buf, alive)
    def cond(c):
        (t, y, yc, dt, k1, ep, nacc, nrej, nfe, isave, bufs, ts_buf,
         alive) = c
        return alive & (t < t1) & (nacc + nrej < max_steps)

    def body(c):
        (t, y, yc, dt, k1, err_prev, nacc, nrej, nfe, isave, bufs,
         ts_buf, alive) = c
        dt = jnp.minimum(dt, t1 - t)

        dty = dt.astype(y.dtype)
        ks = [k1]
        ok_all = jnp.asarray(True)
        for i in range(1, 7):
            inc = dty * sum(_A[i][j] * ks[j] for j in range(i))
            # effective state is y + yc: fold the low word into each
            # stage increment (the sum y + (inc + yc) rounds once)
            yi = y + (inc + yc) if compensated else y + inc
            ki, oki = eval_rhs(t + _C[i] * dt, yi)
            ks.append(ki)
            ok_all = ok_all & oki
        inc_b = dty * sum(_B[j] * ks[j] for j in range(6))   # B[6] = 0
        if compensated:
            # Neumaier two-sum: |y| >> |delta| here, so the dropped
            # tail of delta is recovered exactly into the new low word
            delta = inc_b + yc
            y1 = y + delta
            yc1 = (y - y1) + delta
        else:
            y1 = y + inc_b
            yc1 = yc
        err = dty * sum(_BTILDE[j] * ks[j] for j in range(7))
        enorm = _inf_norm_err(err, y, y1, rtol, atol)
        enorm = jnp.where(ok_all & jnp.all(jnp.isfinite(y1)), enorm, jnp.inf)

        accept = enorm <= 1.0

        # PI controller (limited); hard shrink on invalid steps
        enorm_c = jnp.maximum(enorm, 1e-10)
        ep_c = jnp.maximum(err_prev, 1e-10)
        factor = safety * enorm_c ** (-beta1) * ep_c ** (beta2)
        factor = jnp.clip(factor, min_factor, max_factor)
        factor = jnp.where(jnp.isfinite(enorm), factor, 0.25)
        dt_next = dt * factor

        t_new = jnp.where(accept, t + dt, t)
        y_new = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, b, a), y, y1)
        yc_new = jnp.where(accept, yc1, yc)
        # FSAL: k7 is f(t+dt, y1)
        k1_new = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, b, a), k1, ks[6])
        err_prev_new = jnp.where(accept, enorm_c, err_prev)

        nacc2 = nacc + accept
        nrej2 = nrej + (1 - accept)
        do_save = accept & (nacc2 % save_every == 0)
        isave2 = isave + do_save
        bufs2, ts2 = jax.lax.cond(
            do_save,
            lambda b, tb: write(b, tb, isave2, t_new, y_new),
            lambda b, tb: (b, tb),
            bufs, ts_buf)
        alive2 = alive & (dt_next > 1e-14 * jnp.maximum(jnp.abs(t1 - t0), 1.0))
        return (t_new, y_new, yc_new, dt_next, k1_new, err_prev_new,
                nacc2, nrej2, nfe + 6, isave2, bufs2, ts2, alive2)

    init = (jnp.asarray(t0, dtype=tdtype), y0, yc_0,
            jnp.asarray(dt0, dtype=tdtype), k1_0,
            jnp.asarray(1.0, dtype=tdtype),
            jnp.asarray(0), jnp.asarray(0), jnp.asarray(1), jnp.asarray(0),
            bufs, ts_buf, ok0)
    (t, y, yc, dt, k1, ep, nacc, nrej, nfe, isave, bufs, ts_buf,
     alive) = jax.lax.while_loop(cond, body, init)

    stats = SolveStats(naccept=nacc, nreject=nrej, nfe=nfe,
                       success=(t >= t1))
    return Tsit5Solution(ts=ts_buf, save=bufs, y_final=y, t_final=t,
                         stats=stats, dt_final=dt,
                         yc_final=yc if compensated else None)
