"""Multiblock BP1: earthquake cycles on an *interior* frictional fault.

The reference ships ``seas/BP1/meshes/BP1_v1.inp`` (194 blocks; side sets
per BP1_v1.jou:34-37 — 1: remote displacement (± half plate rate),
2: free surface, 7: frictional fault, 8: steady-sliding deep extension)
but has no driver for it; its BP1.jl uses the single-block half-space
short-cut.  This module runs the full multiblock problem: the fault is a
network of interior jump faces handled by the hybridized trace solver.

The hot loop uses the same exact-linearity reduction as bp1.py, now
through the *hybrid* solve: traction on the fault dofs is affine in the
fault slip vector and time,

    tau(delta, t) = Kff @ delta + kt * t,

where column j of Kff is the traction response to a unit slip basis
vector (one hybrid trace solve each, with cached block factors) and kt
is the response to the steady loading (deep sliding at Vp + remote
Dirichlet at ±Vp/2).  Setup does O(n_fault) solves once; each RHS
evaluation in the cycle is then a single dense matvec + the vmapped
rate-and-state Newton — identical machinery to the single-block driver.
"""
from dataclasses import dataclass
from typing import NamedTuple


import jax
import jax.numpy as jnp
import numpy as np

from .. import BC_DIRICHLET, BC_JUMP_INTERFACE, BC_NEUMANN
from ..hybrid import build_problem
from ..hybrid.assemble import assemble_jump_rhs, bcstarts
from ..ode import solve_tsit5
from ..ops2d import computetraction
from ..physics.rateandstate import newton_defaults, newton_slip_rates
from .bp1 import YEAR_SECONDS, BP1Params

BC_STEADY_SLIDE = 8


@dataclass
class MultiBP1Problem:
    par: BP1Params
    prob: object                 # HybridProblem
    conn: tuple                  # (FToE, FToLF, EToO, EToS)
    fault_faces: np.ndarray
    steady_faces: np.ndarray
    FTods: np.ndarray            # jump-face dof offsets (codes >= 7)
    fault_dofs: np.ndarray       # indices into the delta vector
    depth: np.ndarray            # |y| of each fault dof
    Kff: jnp.ndarray
    kt: jnp.ndarray
    RSa: jnp.ndarray
    tau_z0: float
    psi0: np.ndarray

    @property
    def n_fault(self):
        return len(self.fault_dofs)


def _assemble_rhs(prob, conn, FTods, delta_jump, t_scale, par):
    """Host RHS assembly for given jump data (over codes>=7 faces) and
    loading scale (t_scale multiplies remote Dirichlet and nothing else;
    the steady-slide part is inside delta_jump)."""
    lops = prob.lops

    def remote_dirichlet(e, lf, x, y):
        # remote loading: +Vp/2 on the x>0 side, -Vp/2 on x<0 (jou:34)
        side = 1.0 if float(np.mean(lops[e].coord[0])) > 0 else -1.0
        return np.full_like(x, side * t_scale / 2)

    return assemble_jump_rhs(prob, delta_jump, FTods,
                             bc_Dirichlet=remote_dirichlet)


def _fault_tractions(prob, conn, FTods, fault_faces, u, lam, delta_jump):
    FToE, FToLF, EToO, EToS = conn
    out = []
    for f in fault_faces:
        e1, lf1 = FToE[0, f], FToLF[0, f]
        lop = prob.lops[e1]
        lrng = slice(prob.FToLstarts[f], prob.FToLstarts[f + 1])
        drng = slice(FTods[f], FTods[f + 1])
        urng = slice(prob.vstarts[e1], prob.vstarts[e1 + 1])
        out.append(computetraction(lop, lf1, u[urng], lam[lrng],
                                   delta_jump[drng]))
    return np.concatenate(out)


def setup(par: BP1Params = None, N: int = 16, p: int = 2,
          mesh_path=None, dtype=None, verbose=False) -> MultiBP1Problem:
    import os
    par = par or BP1Params(N=N, p=p)
    if mesh_path is None:
        mesh_path = os.path.join(os.path.dirname(__file__), "..", "..",
                                 "meshes", "seas_bp1", "BP1_v1.inp")
    from ..mesh import read_inp_2d
    bc_map = [BC_DIRICHLET, BC_NEUMANN, 3, 4, 5, 6, BC_JUMP_INTERFACE,
              BC_STEADY_SLIDE]
    verts, EToV, EToF, FToB, _ = read_inp_2d(mesh_path, bc_map=bc_map)
    nelems = EToV.shape[1]
    Narr = np.full(nelems, N)
    prob, conn = build_problem(p, verts, EToV, EToF, FToB, Narr, Narr)
    FToE, FToLF, EToO, EToS = conn
    lops = prob.lops

    fault_faces = np.where(FToB == BC_JUMP_INTERFACE)[0]
    steady_faces = np.where(FToB == BC_STEADY_SLIDE)[0]
    FTods = bcstarts(FToB, FToE, FToLF,
                     [BC_JUMP_INTERFACE, BC_STEADY_SLIDE], lops)

    fault_dofs = np.concatenate([
        np.arange(FTods[f], FTods[f + 1]) for f in fault_faces])
    depth = np.concatenate([
        np.abs(np.asarray(lops[FToE[0, f]].facecoord[1][FToLF[0, f]]))
        for f in fault_faces])

    nd = int(FTods[-1])
    nf = len(fault_dofs)
    if verbose:
        print(f"multiblock BP1: {nelems} blocks, {len(fault_faces)} fault "
              f"faces ({nf} dofs), {len(steady_faces)} steady faces")

    # --- linear response: one hybrid solve per fault dof + one loading.
    # Sign: the fault's minus side is the x<0 element whose fault face has
    # outward normal +x (opposite to the single-block case where the
    # fault is the west *boundary*), so the stress change is
    # +mu * traction here: slip relieves stress (diag Kff < 0) and the
    # steady deep sliding loads the locked section (kt > 0).
    mu = par.mu_shear
    Kff = np.zeros((nf, nf))
    # a unit-slip column's RHS has support ONLY in the two elements
    # adjacent to its fault face (+ that face's gdelta row): assemble
    # just those instead of walking all elements per column (the full
    # walk made setup O(nelems·nf) in python-loop time — 194x slower).
    # Columns then solve in CHUNKS through prob.solve_many — multi-RHS
    # backsolves (BLAS-3) instead of nf sequential trace solves (the
    # r3 692-s N=64 setup was python-solve-loop bound).
    face_of_dof = np.concatenate([
        np.full(FTods[f + 1] - FTods[f], f) for f in fault_faces])
    # tractions read u only on the minus-side fault blocks, so the
    # back-substitution is restricted to them (solve_many elements=)
    minus_blocks = sorted({int(FToE[0, f]) for f in fault_faces})
    chunk = 64                       # bounds the dense (nvol, k) RHS
    nvol = int(prob.vstarts[-1])
    nlam = int(prob.FToLstarts[-1])
    for c0 in range(0, nf, chunk):
        k = min(chunk, nf - c0)
        G = np.zeros((nvol, k))
        GD = np.zeros((nlam, k))
        DJ = np.zeros((nd, k))
        for ci in range(k):
            j = int(fault_dofs[c0 + ci])
            f = int(face_of_dof[c0 + ci])
            DJ[j, ci] = 1.0
            G[:, ci], GD[:, ci] = assemble_jump_rhs(
                prob, DJ[:, ci], FTods,
                elements=sorted({int(FToE[0, f]), int(FToE[1, f])}))
        U, LAM = prob.solve_many(G, GD, elements=minus_blocks)
        Kff[:, c0:c0 + k] = mu * _fault_tractions(
            prob, conn, FTods, fault_faces, U, LAM, DJ)
        if verbose:
            print(f"  unit-slip solves {c0 + k}/{nf}")

    # loading response per unit t: steady faces slide at Vp, remote at Vp/2
    d_load = np.zeros(nd)
    for f in steady_faces:
        d_load[FTods[f]:FTods[f + 1]] = par.Vp
    g, gd = _assemble_rhs(prob, conn, FTods, d_load, par.Vp, par)
    u, lam = prob.solve(g, gd, method="trace")
    kt = mu * _fault_tractions(prob, conn, FTods, fault_faces, u, lam,
                                d_load)

    # friction parameters by depth, pre-stress/state as in BP1
    RSa = par.RSamin - (par.RSamin - par.RSamax) * np.minimum(
        1.0, np.maximum(0.0, (par.RSH1 - depth) / (par.RSH1 - par.RSH2)))
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
    return MultiBP1Problem(
        par=par, prob=prob, conn=conn, fault_faces=fault_faces,
        steady_faces=steady_faces, FTods=np.asarray(FTods),
        fault_dofs=fault_dofs, depth=depth,
        Kff=jnp.asarray(Kff, dtype=dt), kt=jnp.asarray(kt, dtype=dt),
        RSa=jnp.asarray(RSa, dtype=dt), tau_z0=tau_z0, psi0=psi0)


def make_odefun(mp: MultiBP1Problem, newton_tol=None, newton_iters=20,
                newton_dtype=None):
    """State y = [psi; delta] over the fault dofs; rhs as in BP1.

    Slip rates come from the shared dtype-aware Newton
    (:func:`..physics.rateandstate.newton_slip_rates`): by default the
    friction Newton runs in f64 when x64 is enabled even on an f32
    state (the single-block default — the plain f32 Newton with the
    hardware log storms the step controller on TPU, measured r2), and
    in the compensated-f32 form otherwise.
    """
    par = mp.par
    Kff, kt, RSa = mp.Kff, mp.kt, mp.RSa
    if newton_dtype is None:
        newton_dtype = (jnp.float64 if jax.config.jax_enable_x64
                        else Kff.dtype)
    nd = newton_defaults(newton_dtype)
    if newton_tol is None:
        newton_tol = nd["tol"]
    eta, sigma_n = par.eta, par.sigma_n
    V0, b, Dc, f0, Vp = par.RSV0, par.RSb, par.RSDc, par.RSf0, par.Vp
    tau_z0 = mp.tau_z0
    n = mp.n_fault
    state_dt = Kff.dtype
    # canonical SEAS imposed-creep depth (BP1.jl:8-31 loading): RS
    # fault dofs deeper than par.Wf slide at exactly Vp with frozen
    # state — same semantics as the single-block rhs (bp1.py).  On the
    # shipped BP1_v1 mesh the frictional side set already ends at
    # Wf=40 (BP1_v1.jou:14,36-37: curve 8 spans 0..-Wf, curve 7 below
    # is the steady-slide extension), so par.Wf only matters for
    # meshes whose jump faces extend deeper.
    if par.Wf is not None:
        live_mask = np.asarray(mp.depth) <= par.Wf
    else:
        live_mask = np.ones(n, dtype=bool)

    def rhs(t, y, args):
        psi, delta = y[:n], y[n:]
        # per-member friction overrides for ensemble runs (same
        # convention as the single-block rhs)
        if isinstance(args, dict):
            a_arr = args.get("RSa", RSa)
            tz0_ = args.get("tau_z0", tau_z0)
        else:
            a_arr, tz0_ = RSa, tau_z0
        live = jnp.asarray(live_mask)
        dtau = jnp.matmul(Kff, delta, precision=jax.lax.Precision.HIGHEST) \
            + jnp.asarray(t).astype(Kff.dtype) * kt
        tau_n = dtau + tz0_
        tau_ok = jnp.all(jnp.where(live, jnp.isfinite(tau_n), True))

        V, it = newton_slip_rates(
            psi, tau_n, a_arr, sigma_n=sigma_n, eta=eta, V0=V0,
            newton_dtype=newton_dtype, newton_tol=newton_tol,
            newton_iters=newton_iters, newton_polish=nd["polish"],
            newton_xtol_rel=nd["xtol_rel"])
        ok = (tau_ok & jnp.all(jnp.where(live, jnp.isfinite(V), True))
              & jnp.all(jnp.where(live, it >= 0, True)))
        # aging law in the widest available dtype (near-cancellation
        # along the creeping manifold — DESIGN.md §5)
        hi_dt = jnp.float64 if jax.config.jax_enable_x64 else state_dt
        psi_hi = psi.astype(hi_dt)
        V_hi = V.astype(hi_dt)
        dpsi = ((b * V0 / Dc)
                * (jnp.exp((f0 - psi_hi) / b) - jnp.abs(V_hi) / V0))
        ok = ok & jnp.all(jnp.where(live, jnp.isfinite(dpsi), True))
        if par.Wf is not None:
            # discarded deep-node results must not reject steps (the
            # r3 single-block lesson) nor evolve: imposed creep at Vp
            deep = ~live
            V = jnp.where(deep, jnp.asarray(Vp, dtype=V.dtype), V)
            dpsi = jnp.where(deep, jnp.zeros((), dtype=dpsi.dtype), dpsi)
        return jnp.concatenate([dpsi.astype(state_dt),
                                V.astype(state_dt)]), ok

    return rhs


def initial_state(mp: MultiBP1Problem):
    n = mp.n_fault
    y0 = np.zeros(2 * n)
    y0[:n] = mp.psi0
    return jnp.asarray(y0, dtype=mp.Kff.dtype)


def default_stations(mp: MultiBP1Problem, spacing=2.5):
    """SEAS station depths clipped to the fault extent, as (depths,
    nearest-dof indices)."""
    depths = np.arange(0.0, 36.0, spacing)
    depths = depths[depths <= float(np.max(mp.depth)) + 1e-9]
    idx = np.array([int(np.argmin(np.abs(mp.depth - d))) for d in depths])
    return depths, idx


class CycleFns(NamedTuple):
    """Per-problem closures for the cycle integration.  Build ONCE (per
    (mp, newton_dtype, stations)) and pass to repeated :func:`run`
    calls as ``_fns``: solve_tsit5's jit keys on the rhs/save_fn
    function identities, so fresh closures per call force a full
    recompile of the cycle while_loop (minutes through remote-compile;
    the single-block path's make_solver_fns exists for the same
    reason)."""
    rhs: callable
    save_fn: callable
    stations: np.ndarray
    station_depths: np.ndarray


def make_cycle_fns(mp: MultiBP1Problem, *, newton_dtype=None,
                   stations=None) -> CycleFns:
    rhs = make_odefun(mp, newton_dtype=newton_dtype)
    n = mp.n_fault
    if stations is None:
        nominal_depths, stations = default_stations(mp)
    else:
        nominal_depths = np.asarray(mp.depth)[np.asarray(stations)]
    stations_j = jnp.asarray(stations)
    Kff, kt, tau_z0 = mp.Kff, mp.kt, mp.tau_z0

    def save_fn(t, y, args):
        psi, delta = y[:n], y[n:]
        dy, _ = rhs(t, y, args)
        V = dy[n:]
        tz0_ = (args.get("tau_z0", mp.tau_z0) if isinstance(args, dict)
                else mp.tau_z0)
        tau = (jnp.matmul(Kff, delta, precision=jax.lax.Precision.HIGHEST)
               + jnp.asarray(t).astype(Kff.dtype) * kt) + tz0_
        return {"log10_vmax": jnp.log10(jnp.max(jnp.abs(V)) + 1e-40),
                "delta_max": jnp.max(delta),
                "delta": delta[stations_j], "psi": psi[stations_j],
                "tau": tau[stations_j], "V": V[stations_j]}

    return CycleFns(rhs=rhs, save_fn=save_fn,
                    stations=np.asarray(stations),
                    station_depths=nominal_depths)


def run(mp: MultiBP1Problem, *, sim_years=None, rtol=1e-3, atol=1e-5,
        max_steps=100_000, save_every=1, stations=None,
        newton_dtype=None, t0=0.0, y0=None, dt0=None, _fns=None,
        compensated=False, yc0=None):
    """Integrate the multiblock cycle.  ``stations``: fault-dof indices
    at which to record (delta, psi, tau, V) time series (default: the
    SEAS depths within the fault extent, :func:`default_stations`).
    ``newton_dtype``: friction-Newton dtype (see :func:`make_odefun`;
    jnp.float32 = the pure-f32 TPU serving path).  ``t0``/``y0``/
    ``dt0`` resume an interrupted run (see :func:`run_chunked`).
    ``_fns``: a :func:`make_cycle_fns` result — pass it for repeated
    calls so the compiled cycle is reused.  ``compensated=True``
    carries the Neumaier state low word (the f32 serving mode's
    event-fidelity fix — see :func:`..ode.solve_tsit5`)."""
    sim_years = sim_years or mp.par.sim_years
    fns = _fns if _fns is not None else make_cycle_fns(
        mp, newton_dtype=newton_dtype, stations=stations)

    if y0 is None:
        y0 = initial_state(mp)
    sol = solve_tsit5(fns.rhs, y0, t0,
                      sim_years * YEAR_SECONDS, dt0 or YEAR_SECONDS,
                      rtol=rtol, atol=atol, max_steps=max_steps,
                      save_fn=fns.save_fn, save_every=save_every,
                      compensated=compensated, yc0=yc0)
    # record which stations the histories were sampled at, so the
    # station writer labels columns by the depths actually recorded
    # (ADVICE r1: counts alone can coincidentally match)
    return sol._replace(meta={"stations": fns.stations,
                              "station_depths": fns.station_depths})


def run_chunked(mp: MultiBP1Problem, *, chunk_steps=4000, max_chunks=200,
                checkpoint_path=None, progress=False, **kw):
    """Chunked multiblock cycle (the multiblock counterpart of
    :func:`..bp1.run_chunked`): each device while_loop launch is bounded
    to ``chunk_steps`` and resumed from (t, y, dt) on the host — needed
    on remote/tunneled accelerators, and gives checkpoint boundaries
    (``checkpoint_path`` saves (t, y) each chunk via
    :func:`..bp1.save_checkpoint`).

    Returns ``(history, stats)``: stitched time series (incl. the
    station depths under "station_depths") and accept/reject totals.
    """
    from .bp1 import save_checkpoint

    sim_years = kw.pop("sim_years", None) or mp.par.sim_years
    fns = kw.pop("_fns", None) or make_cycle_fns(
        mp, newton_dtype=kw.pop("newton_dtype", None),
        stations=kw.pop("stations", None))
    t_end = sim_years * YEAR_SECONDS
    t, y, dt0 = 0.0, None, YEAR_SECONDS
    yc = None                      # compensated-mode low word, carried
    ts_all, save_all = [], []      # across chunk launches
    nacc = nrej = 0
    t_prev = -1.0
    for chunk in range(max_chunks):
        sol = run(mp, sim_years=sim_years, max_steps=chunk_steps,
                  t0=t, y0=y, dt0=dt0, _fns=fns, yc0=yc, **kw)
        yc = sol.yc_final
        dt0 = float(sol.dt_final)
        ts = np.asarray(sol.ts)
        valid = np.isfinite(ts)
        tv = ts[valid]
        # the integrator records the launch state at index 0; on a
        # resumed chunk drop it only when it actually duplicates the
        # previous chunk's last stitched entry (with save_every > 1
        # the boundary state may be a real, otherwise-unsaved sample)
        drop = (chunk > 0 and tv.size and ts_all
                and ts_all[-1].size and tv[0] == ts_all[-1][-1])
        sl = slice(1, None) if drop else slice(None)
        ts_all.append(tv[sl])
        save_all.append({k: np.asarray(v)[valid][sl]
                         for k, v in sol.save.items()})
        nacc += int(sol.stats.naccept)
        nrej += int(sol.stats.nreject)
        t, y = float(sol.t_final), sol.y_final
        if progress:
            print(f"  chunk {chunk + 1}: t = {t / YEAR_SECONDS:.1f} yr "
                  f"({nacc} acc / {nrej} rej)", flush=True)
        if checkpoint_path:
            save_checkpoint(checkpoint_path, t, y, mp.par)
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
    history["stations"] = fns.stations
    history["station_depths"] = fns.station_depths
    stats = {"naccept": nacc, "nreject": nrej,
             "t_final_years": t / YEAR_SECONDS,
             "success": t >= t_end * (1.0 - 1e-6)}
    return history, stats


def run_ensemble(mp: MultiBP1Problem, RSa_batch, *, tau_z0_batch=None,
                 sim_years=None, rtol=1e-3, atol=1e-5, max_steps=50_000,
                 save_every=1, stations=None, newton_dtype=None,
                 _fns=None, compensated=False):
    """Vmapped ensemble of multiblock fault-network cycles over
    friction-parameter sets (the multiblock counterpart of
    :func:`..bp1.run_ensemble`).

    All M members share the precomputed fault response operator Kff
    (194-block geometry, one setup) and differ in the rate-and-state
    ``a`` profile / pre-stress: Kff@delta becomes an (M, nf) x (nf, nf)
    MXU matmul and the friction Newton runs across M*nf nodes in
    lockstep, with per-member adaptive (t, dt).  Returns the vmapped
    Tsit5Solution (leading axis M).
    """
    par = mp.par
    sim_years = sim_years or par.sim_years
    fns = _fns if _fns is not None else make_cycle_fns(
        mp, newton_dtype=newton_dtype, stations=stations)
    M, nf = RSa_batch.shape
    assert nf == mp.n_fault, (nf, mp.n_fault)
    dt = mp.Kff.dtype
    RSa_batch = jnp.asarray(RSa_batch, dtype=dt)
    if tau_z0_batch is None:
        tau_z0_batch = jnp.full((M,), mp.tau_z0, dtype=dt)
    else:
        tau_z0_batch = jnp.asarray(tau_z0_batch, dtype=dt)

    # per-member consistent initial state (stress balance at Vinit)
    th = (par.RSDc / par.RSV0) * jnp.exp(
        (RSa_batch / par.RSb) * jnp.log(
            (2 * par.RSV0 / par.RSVinit)
            * jnp.sinh((tau_z0_batch[:, None] - par.eta * par.RSVinit)
                       / (RSa_batch * par.sigma_n)))
        - par.RSf0 / par.RSb)
    psi0 = par.RSf0 + par.RSb * jnp.log(par.RSV0 * th / par.RSDc)
    y0 = jnp.concatenate([psi0, jnp.zeros_like(psi0)], axis=1).astype(dt)

    def solve_one(y0_m, a_m, tz_m):
        return solve_tsit5(fns.rhs, y0_m, 0.0,
                           sim_years * YEAR_SECONDS, YEAR_SECONDS,
                           args={"RSa": a_m, "tau_z0": tz_m},
                           rtol=rtol, atol=atol, max_steps=max_steps,
                           save_fn=fns.save_fn, save_every=save_every,
                           compensated=compensated)

    sols = jax.vmap(solve_one)(y0, RSa_batch, tau_z0_batch)
    return sols._replace(meta={"stations": fns.stations,
                               "station_depths": fns.station_depths})


def write_station_files(mp: MultiBP1Problem, history, outdir, *,
                        station_depths=None, code="hybridsbp_tpu"):
    """SEAS fltst_dp* files for a multiblock run (same format as
    :func:`..bp1.write_station_files`; stations default to
    :func:`default_stations`, matching :func:`run`)."""
    from .bp1 import _write_station_data

    if station_depths is None:
        meta = getattr(history, "meta", None)
        if meta and "station_depths" in meta:
            # depths recorded by run() — always matches the histories
            station_depths = meta["station_depths"]
        elif isinstance(history, dict) and "station_depths" in history:
            station_depths = history["station_depths"]
        else:
            station_depths, _ = default_stations(mp)
    return _write_station_data(mp.par, mp.depth, history, outdir,
                               np.asarray(station_depths), code)
