"""SEAS benchmark problem BP1: quasi-dynamic earthquake cycles on a
vertical strike-slip fault with rate-and-state friction.

Reference parity: ``seas/BP1/BP1.jl`` (parameters, tan-stretched mesh,
initial state) and ``seas/BP1/odefun.jl`` (the ODE right-hand side with
its step-rejection protocol).

TPU-native redesign of the hot loop
-----------------------------------
The reference re-solves the 40,401-DOF elliptic problem with a CHOLMOD
triangular solve on *every* RHS evaluation (odefun.jl:43).  But the BP1
boundary data is low-dimensional: Dirichlet data is ``delta/2`` on the
fault face and the spatially-constant ``t*Vp/2`` on the remote face, and
the discrete problem is linear.  By superposition

    u(delta, t) = -W1 @ (delta/2) - (t*Vp/2) * w2,
    W1 = M^{-1} F_fault,   w2 = M^{-1} (F_remote @ 1),

so the fault traction needed by the friction solve collapses to

    HfI_FT @ u = -K @ (delta/2) - (t*Vp/2) * k2,

with ``K = HfI_FT @ W1`` a dense (N+1)x(N+1) matrix — one small MXU
matmul per RHS evaluation instead of a sparse 40k-DOF backsolve.  W1/K
are precomputed once at setup with a sparse factorization on the host.
The full displacement field is recoverable on demand from the same
operators.  This is mathematically exact (no approximation), and it is
what makes the whole 1000-year cycle run as a single jitted
``lax.while_loop`` on device.
"""
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse.linalg as spla

from .. import BC_DIRICHLET, BC_NEUMANN
from ..mesh import create_metrics
from ..ode import solve_tsit5
from ..ops2d import locoperator
from ..physics.rateandstate import newton_defaults, newton_slip_rates

YEAR_SECONDS = 31556926.0


@dataclass
class BP1Params:
    """Physical and numerical parameters (seas/BP1/BP1.jl:6-31,63-66)."""
    sim_years: float = 1000.0
    Vp: float = 1e-9            # plate rate (m/s)
    rho: float = 2.670          # density
    cs: float = 3.464           # shear wave speed
    sigma_n: float = 50.0       # effective normal stress (MPa)
    RSamin: float = 0.010
    RSamax: float = 0.025
    RSb: float = 0.015
    RSDc: float = 0.016
    RSf0: float = 0.6
    RSV0: float = 1e-6
    RSVinit: float = 1e-9
    RSH1: float = 15.0
    RSH2: float = 18.0
    N: int = 200                # grid intervals per dimension
    p: int = 2                  # SBP interior order
    Lx: float = 80.0
    Ly: float = 80.0
    el: float = 1e13            # tan-stretch scale (~inf => uniform)
    # imposed-creep depth: fault nodes deeper than Wf slide at exactly
    # Vp (state frozen) — the canonical SEAS BP1 loading (Wf=40.0)
    # instead of the reference variant's friction-everywhere fault
    # (BP1.jl:8-31 has no such cutoff; None preserves that behavior)
    Wf: float = None

    @property
    def mu_shear(self):
        return self.cs**2 * self.rho

    @property
    def eta(self):
        return self.mu_shear / (2 * self.cs)


def tan_stretch_maps(par: BP1Params):
    """Coordinate maps (0,Lx)x(0,Ly) with tan clustering (BP1.jl:63-66)."""
    Ax = np.arctan(par.Lx / par.el)
    Ay = np.arctan(par.Ly / par.el)

    def xt(r, s):
        q = Ax * (0.5 * r + 0.5)
        return (par.el * np.tan(q),
                par.el / np.cos(q) ** 2 * Ax * 0.5,
                np.zeros_like(np.broadcast_to(s, np.shape(r))))

    def yt(r, s):
        q = Ay * (0.5 * s + 0.5)
        return (par.el * np.tan(q),
                np.zeros_like(np.broadcast_to(r, np.shape(s))),
                par.el / np.cos(q) ** 2 * Ay * 0.5)

    return xt, yt


LFTOB = (BC_DIRICHLET, BC_DIRICHLET, BC_NEUMANN, BC_NEUMANN)


@dataclass
class BP1Problem:
    par: BP1Params
    lop: "LocalOperator"
    factor: object               # sparse factorization of M (host)
    yf: np.ndarray               # fault-face depth coordinates
    # device-side reduced operators (float64 jnp arrays)
    K: jnp.ndarray
    k2: jnp.ndarray
    tau1: jnp.ndarray
    sJ1: jnp.ndarray
    RSa: jnp.ndarray
    tau_z0: float
    psi0: np.ndarray
    W1: np.ndarray = field(repr=False, default=None)
    w2: np.ndarray = field(repr=False, default=None)

    def displacement(self, delta, t):
        """Full volume field u(delta, t) by superposition (on demand)."""
        return -self.W1 @ (np.asarray(delta) / 2) - (t * self.par.Vp / 2) * self.w2


def setup(par: BP1Params = BP1Params(), dtype=None,
          solver: str = "direct") -> BP1Problem:
    """Setup; ``dtype`` casts the device-side reduced operators (float32
    for the TPU serving path).

    ``solver='direct'`` builds the reduced operators with a host sparse
    factorization; ``solver='cg'`` solves the N+2 right-hand sides on
    device with vmapped fastdiag-preconditioned CG + f64 refinement —
    no sparse direct solve anywhere (the fully device-native path for
    large N).
    """
    xt, yt = tan_stretch_maps(par)
    metrics = create_metrics(par.p, par.N, par.N, xt, yt)
    lop = locoperator(par.p, par.N, par.N, metrics, LFTOB)

    F1 = lop.F[0].toarray()
    rhs_all = np.concatenate(
        [F1, np.asarray(lop.F[1] @ np.ones(par.N + 1))[:, None]], axis=1)
    if solver == "direct":
        factor = spla.splu(lop.M.tocsc())
        sols = factor.solve(rhs_all)
    elif solver == "cg":
        import jax as _jax

        from ..tpu import cg, dia_apply, to_dia
        from ..tpu.fastdiag import build_fastdiag, fastdiag_apply

        factor = None
        op = to_dia(lop.M, par.N + 1, par.N + 1)
        fd = build_fastdiag(lop)

        def solve_one(b2d):
            return cg(lambda u: dia_apply(op, u), b2d, tol=1e-11,
                      maxiter=3000,
                      precond=lambda r: fastdiag_apply(fd, r)).x

        B = jnp.asarray(rhs_all.T.reshape(-1, par.N + 1, par.N + 1))
        batch_solve = _jax.jit(_jax.vmap(solve_one))
        X = batch_solve(B)
        # one restarted-CG correction sweep pushes the stiffest columns
        # (corner fault dofs on strongly stretched grids) past stagnation
        R = B - _jax.vmap(lambda x: dia_apply(op, x))(X)
        X = X + batch_solve(R)
        sols = np.asarray(X).reshape(-1, (par.N + 1) ** 2).T
    else:
        raise ValueError(f"unknown solver {solver!r}")
    W1 = sols[:, :-1]
    w2 = sols[:, -1]
    HfI_FT1 = lop.HfI_FT[0]
    K = np.asarray(HfI_FT1 @ W1)
    k2 = np.asarray(HfI_FT1 @ w2)

    # fault friction parameter ramp with depth (BP1.jl:96-114)
    yf = np.asarray(lop.facecoord[1][0])
    RSa = par.RSamin - (par.RSamin - par.RSamax) * np.minimum(
        1.0, np.maximum(0.0, (par.RSH1 - yf) / (par.RSH1 - par.RSH2)))
    tau_z0 = float(
        par.sigma_n * par.RSamax * np.arcsinh(
            par.RSVinit / (2 * par.RSV0)
            * np.exp((par.RSf0 + par.RSb * np.log(par.RSV0 / par.RSVinit))
                     / par.RSamax))
        + par.eta * par.RSVinit)
    theta = (par.RSDc / par.RSV0) * np.exp(
        (RSa / par.RSb) * np.log(
            (2 * par.RSV0 / par.RSVinit)
            * np.sinh((tau_z0 - par.eta * par.RSVinit) / (RSa * par.sigma_n)))
        - par.RSf0 / par.RSb)
    psi0 = par.RSf0 + par.RSb * np.log(par.RSV0 * theta / par.RSDc)

    dt = dtype or jnp.float64
    return BP1Problem(
        par=par, lop=lop, factor=factor, yf=yf,
        K=jnp.asarray(K, dtype=dt), k2=jnp.asarray(k2, dtype=dt),
        tau1=jnp.asarray(lop.tau[0], dtype=dt),
        sJ1=jnp.asarray(lop.sJ[0], dtype=dt),
        RSa=jnp.asarray(RSa, dtype=dt), tau_z0=tau_z0, psi0=psi0,
        W1=W1, w2=w2)


def make_odefun(prob: BP1Problem, newton_tol=None, newton_iters=20,
                newton_dtype=None, newton_polish=None):
    """The jittable BP1 right-hand side (odefun.jl:8-121).

    State y = [psi; delta] (2(N+1),).  Returns (dy, ok) for the
    integrator's rejection protocol.  The slip Newton runs a fixed
    ``newton_iters`` sweep (warm-started; lockstep across fault nodes).

    Newton dtype: float64 (default when x64 is enabled) or float32.
    The pure-f32 path uses the compensated strength balance with the
    *software* f32 log (the TPU hardware f32 log is only ~2**-13
    relative-accurate, which floors the balance at ~1e-4*(sigma a) and
    2-cycles the Newton — the round-1 storm, diagnosed and fixed r2),
    plus polish steps and bracket-collapse acceptance.  Measured on
    TPU v5e: the f32 path runs the full 1000-yr cycle with a normal
    rejection rate at ~3.4x the f64-Newton path's warm speed.
    """
    par = prob.par
    K, k2 = prob.K, prob.k2
    if newton_dtype is None:
        newton_dtype = (jnp.float64 if jax.config.jax_enable_x64
                        else K.dtype)
    # per-dtype knobs (tight f64 ftol; compensated-f32 ftol + polish +
    # bracket-collapse acceptance) live in ONE place —
    # physics.rateandstate.newton_defaults — shared with the multiblock
    # path; see its docstring for the f32-storm rationale
    nd = newton_defaults(newton_dtype)
    if newton_tol is None:
        newton_tol = nd["tol"]
    if newton_polish is None:
        newton_polish = nd["polish"]
    newton_xtol_rel = nd["xtol_rel"]
    tau1, sJ1, RSa = prob.tau1, prob.sJ1, prob.RSa
    mu, eta, sigma_n = par.mu_shear, par.eta, par.sigma_n
    V0, b, Dc, f0, Vp = par.RSV0, par.RSb, par.RSDc, par.RSf0, par.Vp
    tau_z0 = prob.tau_z0
    n = par.N + 1

    def rhs(t, y, args):
        psi = y[:n]
        delta = y[n:]
        # per-member friction overrides for ensemble runs
        if isinstance(args, dict):
            a_arr = args.get("RSa", RSa)
            tz0_ = args.get("tau_z0", tau_z0)
        else:
            a_arr, tz0_ = RSa, tau_z0

        # fault traction via the reduced elliptic solve (exact); time may
        # arrive in f64 (integrator precision) — the physics runs in the
        # state dtype, and t only enters through the smooth loading term
        t_phys = jnp.asarray(t * Vp / 2).astype(K.dtype)
        # full-precision matmul: the TPU default (bf16 MXU passes) puts
        # ~0.4% noise on the traction, which destroys the step-size
        # controller's error estimate
        hf = -jnp.matmul(K, delta / 2,
                         precision=jax.lax.Precision.HIGHEST) - t_phys * k2
        dtau = -mu * (hf + tau1 * (delta / 2)) / sJ1
        tau_n = dtau + tz0_
        # nodes below the imposed-creep depth Wf have their V/dpsi
        # overwritten below — non-finite friction intermediates there
        # must not reject the step (the results are discarded anyway)
        if par.Wf is not None:
            live = jnp.asarray(np.asarray(prob.yf) <= par.Wf)
        else:
            live = jnp.ones(tau_n.shape, dtype=bool)
        tau_ok = jnp.all(jnp.where(live, jnp.isfinite(tau_n), True))

        # per-node bracketed Newton for slip rate (odefun.jl:80-85),
        # warm-started from the analytic log-space estimate, computed in
        # newton_dtype (f64 when available — see docstring)
        V, iters = newton_slip_rates(
            psi, tau_n, a_arr, sigma_n=sigma_n, eta=eta, V0=V0,
            newton_dtype=newton_dtype, newton_tol=newton_tol,
            newton_iters=newton_iters, newton_polish=newton_polish,
            newton_xtol_rel=newton_xtol_rel)
        newton_ok = (jnp.all(jnp.where(live, jnp.isfinite(V), True))
                     & jnp.all(jnp.where(live, iters >= 0, True)))

        # the aging law's e^((f0-psi)/b) - |V|/V0 is a near-cancellation
        # along the creeping solution manifold: evaluate it in the widest
        # available dtype regardless of the Newton dtype (one exp per node)
        hi_dt = jnp.float64 if jax.config.jax_enable_x64 else psi.dtype
        psi_hi = psi.astype(hi_dt)
        V_hi = V.astype(hi_dt)
        dpsi = (b * V0 / Dc) * (jnp.exp((f0 - psi_hi) / b)
                                - jnp.abs(V_hi) / V0)
        psi_ok = jnp.all(jnp.where(live, jnp.isfinite(dpsi), True))

        if par.Wf is not None:
            # canonical SEAS BP1 loading: below Wf the fault slides at
            # exactly Vp (imposed creep); the friction Newton still
            # runs there (one program) but its result is discarded
            deep = ~live
            V = jnp.where(deep, jnp.asarray(Vp, dtype=V.dtype), V)
            dpsi = jnp.where(deep, jnp.zeros((), dtype=dpsi.dtype), dpsi)

        ok = tau_ok & newton_ok & psi_ok
        dy = jnp.concatenate([dpsi.astype(y.dtype), V.astype(y.dtype)])
        return dy, ok

    return rhs


def initial_state(prob: BP1Problem):
    n = prob.par.N + 1
    y0 = np.zeros(2 * n)
    y0[:n] = prob.psi0
    return jnp.asarray(y0)


def make_solver_fns(prob: BP1Problem, stations=None, save_profiles=False,
                    newton_dtype=None):
    """Build (rhs, save_fn) once per problem.  Reusing the same function
    objects across run() calls keeps the jit cache warm (each new closure
    would otherwise recompile the whole while_loop — costly on a
    tunneled TPU)."""
    par = prob.par
    n = par.N + 1
    if stations is None:
        # SEAS nominal station depths; files are named by these, the
        # histories sample the nearest grid node
        nominal_depths = np.arange(0.0, 36.0, 2.5)
        stations = np.array([int(np.argmin(np.abs(prob.yf - d)))
                             for d in nominal_depths])
    else:
        # custom indices: the snapped node depth is the best label
        nominal_depths = np.asarray(prob.yf)[np.asarray(stations)]
    stations = jnp.asarray(stations)
    rhs = make_odefun(prob, newton_dtype=newton_dtype)
    K, k2, tau1, sJ1 = prob.K, prob.k2, prob.tau1, prob.sJ1
    mu, Vp, tau_z0 = par.mu_shear, par.Vp, prob.tau_z0

    def save_fn(t, y, args):
        psi, delta = y[:n], y[n:]
        hf = -jnp.matmul(K, delta / 2, precision=jax.lax.Precision.HIGHEST) \
            - jnp.asarray(t * Vp / 2).astype(K.dtype) * k2
        dtau = -mu * (hf + tau1 * (delta / 2)) / sJ1
        dy, _ = rhs(t, y, args)
        V = dy[n:]
        # honor the per-member pre-stress override (ensemble runs): the
        # rhs integrates with it, so the recorded tau must too
        tz0_ = (args.get("tau_z0", tau_z0) if isinstance(args, dict)
                else tau_z0)
        out = {
            "log10_vmax": jnp.log10(jnp.max(jnp.abs(V)) + 1e-40),
            "delta": delta[stations],
            "psi": psi[stations],
            "tau": (dtau + tz0_)[stations],
            "V": V[stations],
        }
        if save_profiles:
            out["delta_full"] = delta
        return out

    # record the recording depths for the station writer (ADVICE r1:
    # label columns by the stations actually used, not by count-matching)
    save_fn.station_depths = nominal_depths
    return rhs, save_fn


def run(par: BP1Params = BP1Params(), *, stations=None, max_steps=200_000,
        save_every=1, rtol=1e-3, atol=1e-5, prob: Optional[BP1Problem] = None,
        t0=0.0, y0=None, dt0=YEAR_SECONDS, save_profiles=False, _fns=None,
        newton_dtype=None, compensated=False, yc0=None):
    """Full earthquake-cycle simulation.

    Returns (prob, solution) where solution.save holds per-step station
    histories: log10 max slip rate, slip/state/traction at station depths.
    Pass (t0, y0) from :func:`load_checkpoint` to resume a run.
    ``compensated=True`` carries the Neumaier state low word (the f32
    serving mode's event-fidelity fix — see :func:`..ode.solve_tsit5`).
    """
    if prob is None:
        prob = setup(par)
    par = prob.par
    if _fns is None:
        _fns = make_solver_fns(prob, stations=stations,
                               save_profiles=save_profiles,
                               newton_dtype=newton_dtype)
    rhs, save_fn = _fns
    y_init = initial_state(prob) if y0 is None else jnp.asarray(y0)
    y_init = y_init.astype(prob.K.dtype)   # state follows the serving dtype
    sol = solve_tsit5(rhs, y_init, t0,
                      par.sim_years * YEAR_SECONDS, dt0,
                      rtol=rtol, atol=atol, max_steps=max_steps,
                      save_fn=save_fn, save_every=save_every,
                      compensated=compensated, yc0=yc0)
    depths = getattr(save_fn, "station_depths", None)
    if depths is not None:
        sol = sol._replace(meta={"station_depths": depths})
    return prob, sol


def perturb_rsa(base, M, spread=0.08, seed=0):
    """M multiplicative-uniform perturbations (1 +- spread) of a
    rate-and-state ``a`` profile — the ensemble drivers' member
    generator (shared so both BP1 variants sweep identically)."""
    rng = np.random.default_rng(seed)
    base = np.asarray(base)
    return base[None] * (1.0 + spread
                         * (2 * rng.random((M, base.size)) - 1))


def run_ensemble(prob: BP1Problem, RSa_batch, *, tau_z0_batch=None,
                 sim_years=None, rtol=1e-3, atol=1e-5, max_steps=50_000,
                 save_every=1, stations=None, _fns=None,
                 compensated=False):
    """Vmapped ensemble of earthquake cycles over friction-parameter sets.

    All M members share the precomputed reduced elliptic operator K (the
    geometry), and differ in the rate-and-state ``a`` profile (and
    optionally pre-stress).  The whole ensemble integrates as one
    batched while_loop: K@delta becomes an (M, n) x (n, n) MXU matmul
    and the Newton runs across M*n nodes in lockstep — the TPU-native
    way to run parameter studies/UQ sweeps that the reference could only
    do one sequential cycle at a time.

    Each member carries its own adaptive (t, dt); the batched loop runs
    until every member finishes.  Returns the vmapped Tsit5Solution
    (leading axis M on every field).
    """
    par = prob.par
    sim_years = sim_years or par.sim_years
    # reuse prebuilt closures on repeated calls: fresh ones would
    # recompile the batched while_loop (jit keys on function identity)
    rhs, save_fn = (_fns if _fns is not None
                    else make_solver_fns(prob, stations=stations))
    M, n = RSa_batch.shape
    assert n == par.N + 1
    RSa_batch = jnp.asarray(RSa_batch, dtype=prob.K.dtype)
    if tau_z0_batch is None:
        tau_z0_batch = jnp.full((M,), prob.tau_z0, dtype=prob.K.dtype)
    else:
        tau_z0_batch = jnp.asarray(tau_z0_batch, dtype=prob.K.dtype)

    # per-member consistent initial state (stress balance at Vinit)
    th = (par.RSDc / par.RSV0) * jnp.exp(
        (RSa_batch / par.RSb) * jnp.log(
            (2 * par.RSV0 / par.RSVinit)
            * jnp.sinh((tau_z0_batch[:, None] - par.eta * par.RSVinit)
                       / (RSa_batch * par.sigma_n)))
        - par.RSf0 / par.RSb)
    psi0 = par.RSf0 + par.RSb * jnp.log(par.RSV0 * th / par.RSDc)
    y0 = jnp.concatenate(
        [psi0, jnp.zeros_like(psi0)], axis=1).astype(prob.K.dtype)

    def solve_one(y0_m, RSa_m, tz0_m):
        return solve_tsit5(rhs, y0_m, 0.0, sim_years * YEAR_SECONDS,
                           YEAR_SECONDS, args={"RSa": RSa_m,
                                               "tau_z0": tz0_m},
                           rtol=rtol, atol=atol, max_steps=max_steps,
                           save_fn=save_fn, save_every=save_every,
                           compensated=compensated)

    sols = jax.vmap(solve_one)(y0, RSa_batch, tau_z0_batch)
    depths = getattr(save_fn, "station_depths", None)
    if depths is not None:
        sols = sols._replace(meta={"station_depths": np.asarray(depths)})
    return sols


def run_chunked(par: BP1Params = BP1Params(), *, chunk_steps=4000,
                max_chunks=200, checkpoint_path=None, dtype=None,
                prob: Optional[BP1Problem] = None, progress=False, **kw):
    """Chunked cycle simulation: the device while_loop is bounded to
    ``chunk_steps`` per launch and resumed from (t, y, dt) on the host.

    Needed on remote/tunneled accelerators where a single multi-minute
    XLA execution can hit worker limits, and it gives natural checkpoint
    boundaries (``checkpoint_path`` saves state each chunk).  Returns
    (prob, history dict with stitched station time series, stats dict).
    """
    if prob is None:
        prob = setup(par, dtype=dtype)
    fns = make_solver_fns(prob, stations=kw.pop("stations", None),
                          save_profiles=kw.get("save_profiles", False))
    t_end = par.sim_years * YEAR_SECONDS
    t, y, dt0 = 0.0, None, YEAR_SECONDS
    yc = None                      # compensated-mode low word, carried
    ts_all, save_all = [], []      # across chunk launches
    nacc = nrej = 0
    t_prev = -1.0
    for chunk in range(max_chunks):
        prob, sol = run(par, prob=prob, max_steps=chunk_steps,
                        t0=t, y0=y, dt0=dt0, _fns=fns, yc0=yc, **kw)
        yc = sol.yc_final
        dt0 = float(sol.dt_final)
        ts = np.asarray(sol.ts)
        valid = np.isfinite(ts)
        ts_all.append(ts[valid])
        save_all.append({k: np.asarray(v)[valid]
                         for k, v in sol.save.items()})
        nacc += int(sol.stats.naccept)
        nrej += int(sol.stats.nreject)
        t, y = float(sol.t_final), sol.y_final
        if progress:
            print(f"  chunk {chunk + 1}: t = {t / YEAR_SECONDS:.1f} yr "
                  f"({nacc} acc / {nrej} rej)", flush=True)
        if checkpoint_path:
            save_checkpoint(checkpoint_path, t, y, par)
        # relative tolerance: with x64 off the device time is f32, whose
        # ulp at 1000 years is ~4e3 s
        if t >= t_end * (1.0 - 1e-6):
            break
        if t <= t_prev and int(sol.stats.naccept) == 0:
            raise RuntimeError(
                f"integration stalled at t={t / YEAR_SECONDS:.3f} yr "
                f"(dt={dt0:.3e}s): step size collapsed")
        t_prev = t
    history = {"t": np.concatenate(ts_all)}
    for k in save_all[0]:
        history[k] = np.concatenate([s[k] for s in save_all])
    # depths the histories were actually sampled at (ADVICE r1: the
    # station writer must never re-derive them from counts alone)
    depths = getattr(fns[1], "station_depths", None)
    if depths is not None:
        history["station_depths"] = np.asarray(depths)
    stats = {"naccept": nacc, "nreject": nrej, "chunks": chunk + 1,
             "t_final": t, "success": t >= t_end * (1.0 - 1e-6),
             "y_final": np.asarray(y)}
    return prob, history, stats


# ---- SEAS on-fault station files (aux output; the reference only plots
# slip profiles, BP1.jl:167-188 — this writes the SEAS benchmark's
# fltst_dp* text format so results can be compared against the
# community database) -------------------------------------------------------
def write_station_files(prob: BP1Problem, history, outdir, *,
                        station_depths=None, code="hybridsbp_tpu"):
    """Write SEAS BP1 on-fault station time series.

    ``history`` is either the dict from :func:`run_chunked` or a
    ``Tsit5Solution`` from :func:`run` (NaN padding is stripped).  One
    file per station depth, named ``fltst_dp{depth*10:03d}.txt``, with
    columns ``t slip slip_rate shear_stress state`` where slip_rate is
    log10(V [m/s]), shear_stress is in MPa, and state is log10(theta [s])
    recovered from psi via psi = f0 + b*log(V0*theta/Dc).

    The station depths are read from the run's recorded metadata when
    available (``sol.meta['station_depths']``, always consistent with
    the histories); the default 0..35 km/2.5 km grid is only a fallback
    for bare dict histories.  Returns the list of paths written.
    """
    if station_depths is None:
        meta = getattr(history, "meta", None)
        if meta and "station_depths" in meta:
            station_depths = meta["station_depths"]
        elif isinstance(history, dict) and "station_depths" in history:
            # run_chunked histories carry the sampled depths inline
            station_depths = history["station_depths"]
        else:
            station_depths = np.arange(0.0, 36.0, 2.5)
    return _write_station_data(prob.par, prob.yf, history, outdir,
                               station_depths, code)


def _write_station_data(par, yf, history, outdir, station_depths, code):
    """Shared SEAS fltst_dp* writer (used by bp1 and bp1_multiblock).
    ``yf``: fault-node depth coordinates for the node-snap report."""
    import os

    station_depths = np.asarray(station_depths, dtype=float)

    if hasattr(history, "save"):            # Tsit5Solution
        ts = np.asarray(history.ts)
        valid = np.isfinite(ts)
        data = {k: np.asarray(v)[valid] for k, v in history.save.items()}
        data["t"] = ts[valid]
    else:
        data = history
    t = np.asarray(data["t"])
    delta, psi = np.asarray(data["delta"]), np.asarray(data["psi"])
    tau, V = np.asarray(data["tau"]), np.asarray(data["V"])
    nst = delta.shape[1]
    if nst != len(station_depths):
        raise ValueError(
            f"history has {nst} stations but {len(station_depths)} depths "
            "given: pass the station_depths used at run time")

    log10_theta = ((psi - par.RSf0) / par.RSb) / np.log(10.0) \
        + np.log10(par.RSDc / par.RSV0)
    log10_V = np.log10(np.abs(V) + 1e-40)

    os.makedirs(outdir, exist_ok=True)
    paths = []
    for j, d in enumerate(station_depths):
        path = os.path.join(outdir, f"fltst_dp{int(round(d * 10)):03d}.txt")
        node = int(np.argmin(np.abs(np.asarray(yf) - d)))
        with open(path, "w") as fh:
            fh.write("# problem = SEAS benchmark BP1\n")
            fh.write(f"# code = {code}\n")
            fh.write(f"# fault station depth = {d:.1f} km "
                     f"(grid node at {float(np.asarray(yf)[node]):.4f} km)\n")
            fh.write("# column 1 = time (s)\n")
            fh.write("# column 2 = slip (m)\n")
            fh.write("# column 3 = slip_rate (log10 m/s)\n")
            fh.write("# column 4 = shear_stress (MPa)\n")
            fh.write("# column 5 = state (log10 s)\n")
            fh.write("t slip slip_rate shear_stress state\n")
            np.savetxt(fh, np.column_stack(
                [t, delta[:, j], log10_V[:, j], tau[:, j],
                 log10_theta[:, j]]), fmt="%.14e %.9e %.6e %.9e %.6e")
        paths.append(path)
    return paths


# ---- checkpoint / resume (aux subsystem; the reference has none) -----------
def save_checkpoint(path, t, y, par: BP1Params):
    np.savez(path, t=np.asarray(t), y=np.asarray(y),
             par=np.array([getattr(par, f.name) for f in
                           par.__dataclass_fields__.values()]))


def load_checkpoint(path):
    d = np.load(path, allow_pickle=True)
    names = list(BP1Params.__dataclass_fields__)
    vals = d["par"]

    def restore(k, v):
        # cast to the default's type; optional fields (default None,
        # e.g. Wf) round-trip as None or float
        ref = getattr(BP1Params(), k)
        if ref is None:
            return None if v is None else float(v)
        return type(ref)(v)

    par = BP1Params(**{k: restore(k, v) for k, v in zip(names, vals)})
    return float(d["t"]), jnp.asarray(d["y"]), par
