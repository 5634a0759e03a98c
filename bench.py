#!/usr/bin/env python
"""Headline benchmark: SBP block-operator matvec throughput on one chip.

Measures the DIA stencil apply (the hot op under every iterative solve in
the framework) on a batch of BP1-sized blocks in float32, against the
chip's measured HBM bandwidth roofline.  The north-star target
(BASELINE.md) is >= 70% of the HBM roofline in GDOF/s; ``vs_baseline`` is
achieved / (0.7 * roofline), so >= 1.0 beats the target.  The roofline
in that definition is the r1 per-block-representation one ((noff+2) f32
planes), kept fixed for cross-round comparability; since r2 the
framework auto-detects that this mesh's 64 blocks share one operator
(build_blocked shared=True) and runs the shared-coefficient layout,
which beats that roofline by amortizing coefficient traffic E-fold —
both representations are timed and reported in ``detail``.

Methodology: this environment reaches the TPU through a high-latency
tunnel (host<->device RTT ~27 ms, and block_until_ready does not actually
synchronize), so each measurement chains K dependent kernel applications
inside one jitted ``lax.fori_loop``, reduces to a scalar, and uses a
two-point (K1, K2) fit to cancel launch/RTT overhead.

Prints exactly one JSON line.
"""
import json
import os
import subprocess
import sys
import time

os.environ.setdefault("HYBRIDSBP_X64", "0")   # f32 serving path


def _probe_backend():
    """The axon TPU worker can wedge (hangs any XLA call).  Probe it in a
    subprocess with a timeout; fall back to CPU only after retrying with
    backoff over a bounded ~22-min window (VERDICT r2 weak #1: a single
    transient tunnel hiccup must not zero a round's on-chip record).  A
    cold first contact through the tunnel measured up to 214 s (r3)
    and ~230-300 s (r5), so each attempt gets 420 s; backoff
    30/60/90/120 s (capped)."""
    if os.environ.get("HYBRIDSBP_PLATFORM"):
        return
    # time-bounded, not attempt-bounded: a wedged worker can fail FAST
    # (FAILED_PRECONDITION returns in seconds), and a fixed attempt
    # count would then burn the whole window in minutes of backoff
    window_s, start = 22 * 60, time.time()
    attempt = 0
    while True:
        attempt += 1
        t0 = time.time()
        try:
            subprocess.run(
                [sys.executable, "-c",
                 "import os; os.environ['HYBRIDSBP_X64']='0';"
                 "import jax, jax.numpy as jnp;"
                 "print(float(jnp.sum(jnp.ones(8))))"],
                timeout=420, check=True, capture_output=True)
            print(f"# TPU probe ok on attempt {attempt} "
                  f"({time.time() - t0:.0f}s)", file=sys.stderr)
            return
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError) \
                as e:
            kind = ("timeout" if isinstance(e, subprocess.TimeoutExpired)
                    else f"rc={e.returncode}")
            elapsed = time.time() - start
            print(f"# TPU probe attempt {attempt} failed ({kind}, "
                  f"{elapsed:.0f}s into the {window_s}s window)",
                  file=sys.stderr)
            if elapsed > window_s:
                break
            time.sleep(min(30 * attempt, 120))
    os.environ["HYBRIDSBP_PLATFORM"] = "cpu"
    print(f"# TPU backend unresponsive after {attempt} probe attempts "
          f"over {window_s}s; benching on CPU", file=sys.stderr)


_probe_backend()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _log(msg):
    print(f"# [{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def make_chain_runner(step_fn):
    """One jitted program with a *traced* trip count, so both fit points
    of the two-point regression share a single compile (remote compiles
    through the tunnel cost 30-60 s each and dominate bench wall time)."""
    @jax.jit
    def runner(x, iters):
        x = jax.lax.fori_loop(0, iters, lambda i, v: step_fn(v), x,
                              unroll=1)
        return jax.tree_util.tree_reduce(
            lambda a, b: a + b,
            jax.tree_util.tree_map(lambda v: jnp.sum(v), x))

    return runner


def timed_chain(runner, init, iters, repeats=5, warm=True):
    """Median wall time of `iters` chained applications (scalar fetch).

    Median over repeats: the tunnel occasionally produces both long
    outliers (RTT hiccups) and anomalously SHORT readings (observed
    3.5x-fast transients that inflated a min-based fit into a roofline
    above the chip's HBM spec) — the median rejects both tails."""
    k = jnp.asarray(iters, dtype=jnp.int32)
    if warm:
        s = float(runner(init, k))    # warm/compile + sync
        assert np.isfinite(s), "benchmark chain diverged"
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(runner(init, k))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def per_iter_time(step_fn, init, k1=200, k2=1000, fits=3, runner=None):
    """Median of `fits` independent two-point fits of the per-iteration
    time.

    Chain lengths are sized so the k2 chain (~70 ms at the headline
    kernel's ~70 us/apply) DOMINATES the tunnel RTT: with the r2 K=50/200
    the fitted dt was (t2-t1)/150 on ~13 ms chains, so a few ms of RTT
    jitter leaked tens of us into a ~70 us reading (measured on-chip:
    five K=50/200 fits spanned 69.7-93.1 us where K=200/1000 fits
    spanned 61.5-71.7 us).  The trip count is a traced argument, so all
    fits share one compile and the whole measurement warms ONCE
    (ADVICE r3 #1: the old per-timed_chain warm re-ran ~6 redundant
    warm chains per fit); the median-of-fits rejects whole-fit outliers
    the per-point median can't.  Fits with non-positive slope (tunnel
    noise inverting t1/t2) are DISCARDED and retried, never clamped
    into the median (ADVICE r3 #2); if every retry inverts, fall back
    to the k2 chain time / k2 (a physical overestimate: it includes the
    per-call overhead the fit would have cancelled)."""
    if runner is None:
        runner = make_chain_runner(step_fn)
    s = float(runner(init, jnp.asarray(k2, dtype=jnp.int32)))
    assert np.isfinite(s), "benchmark chain diverged"
    vals, attempts = [], 0
    while len(vals) < fits and attempts < 2 * fits:
        attempts += 1
        t1 = timed_chain(runner, init, k1, warm=False)
        t2 = timed_chain(runner, init, k2, warm=False)
        dt = (t2 - t1) / (k2 - k1)
        if dt > 0:
            vals.append(dt)
        else:
            _log(f"discarding inverted two-point fit (t1={t1 * 1e3:.1f} "
                 f"ms >= t2={t2 * 1e3:.1f} ms; tunnel noise)")
    if not vals:
        _log("all two-point fits inverted; falling back to t(k2)/k2")
        vals = [timed_chain(runner, init, k2, warm=False) / k2]
    return float(np.median(vals))


# published per-chip HBM bandwidth (GB/s) — sanity cap for the measured
# roofline; a measured value above spec is a timing artifact, not hardware
_HBM_SPEC_GBS = {
    "TPU v4": 1228.0,
    "TPU v5 lite": 819.0,      # v5e
    "TPU v5": 2765.0,          # v5p
    "TPU v6 lite": 1640.0,     # v6e / Trillium
}


def measure_hbm_bw():
    """Effective HBM bandwidth from a chained axpy x = a*x + b (x read +
    x written: 8 bytes/element/iteration), on a working set (1 GB) far
    larger than on-chip memories, capped at the device's published spec."""
    n = 256 * 1024 * 1024  # 1 GB (f32)
    x = jnp.ones((n,), dtype=jnp.float32)
    # ~2.6 ms/iter at v5e spec bw: k2=80 makes the chain ~210 ms >> RTT
    dt = per_iter_time(lambda v: 0.999999 * v + 1e-7, x, k1=20, k2=80)
    bw = 2 * 4 * n / dt
    kind = jax.devices()[0].device_kind
    spec = _HBM_SPEC_GBS.get(kind)
    if spec is not None:
        bw = min(bw, spec * 1e9)
    return bw


def _op_fingerprint():
    """Cheap numerics fingerprint for the operator cache (ADVICE r1):
    a small locoperator assembled with the same tables/code path —
    changes whenever SBP tables or locoperator numerics change, so a
    stale cached bench operator is detected and re-assembled.  Shared
    with the flagship device-problem cache (utils.fingerprint)."""
    from hybridsbp_tpu.utils.fingerprint import op_fingerprint

    return op_fingerprint()


def _run_sub(mode, timeout):
    """Run `bench.py --sub MODE` in a subprocess with a hard timeout;
    returns the parsed JSON detail dict or None.  Keeps the extra
    metrics from ever hanging the one-line contract."""
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--sub", mode],
            timeout=timeout, capture_output=True, text=True)
        for line in reversed(out.stdout.strip().splitlines()):
            if line.startswith("{"):
                return json.loads(line)
        _log(f"sub-bench {mode} produced no JSON (rc={out.returncode})")
    except subprocess.TimeoutExpired:
        _log(f"sub-bench {mode} timed out")
    except Exception as e:  # noqa: BLE001
        _log(f"sub-bench {mode} failed: {e}")
    return None


def bench_hybrid_sub():
    """Hybrid elliptic solve time/step (BASELINE.md north star #2):
    4-block strip, N=64, p=2, f32 — both the fastdiag-CG path (no
    host-side setup beyond extraction) and the Woodbury two-level
    path (assembled trace inverse, the framework's fastest)."""
    from hybridsbp_tpu import BC_DIRICHLET, BC_LOCKED_INTERFACE
    from hybridsbp_tpu.hybrid import build_problem
    from hybridsbp_tpu.tpu import (build_blocked, build_woodbury,
                                   make_jit_solver)

    E, N, p = 4, 64, 2
    verts = np.array(
        [[0.0, 1.0, 2.0, 3.0, 4.0, 0.0, 1.0, 2.0, 3.0, 4.0],
         [0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 1.0, 1.0]])
    ETOV = np.array([[e, e + 1, e + 5, e + 6] for e in range(E)]).T
    ETOF = np.array([[e, e + 1, 5 + e, 9 + e] for e in range(E)]).T
    FToB = np.full(13, BC_DIRICHLET, dtype=np.int64)
    FToB[1:4] = BC_LOCKED_INTERFACE
    Narr = np.full(E, N)
    prob, _ = build_problem(p, verts, ETOV, ETOF, FToB, Narr, Narr)
    bp = build_blocked(prob, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    g = jnp.asarray(rng.standard_normal((E, N + 1, N + 1)),
                    dtype=jnp.float32)
    gd = jnp.zeros_like(bp.Dinv)

    # one jitted program per solve path (make_jit_solver: whole solve
    # in one program, operator arrays as jit arguments — eager dispatch
    # costs ~27 ms tunnel RTT per op, closure arrays bloat the HLO)
    def timed(solver):
        res = solver(g, gd)                   # compile + warm
        iters, conv = int(res.iters), bool(res.converged)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = solver(g, gd)
            int(r.iters), float(r.resnorm)    # scalar fetch = sync
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)), iters, conv

    wall_fd, it_fd, ok_fd = timed(
        make_jit_solver(bp, tol=1e-5, maxiter=500))
    # B is assembled by HybridProblem.build(); the Woodbury trace
    # inverse reuses it directly
    ti = build_woodbury(bp, prob)
    wall_wb, it_wb, ok_wb = timed(
        make_jit_solver(bp, trace_inv=ti, tol=1e-5, maxiter=500))
    # headline = fastest CONVERGED path (never report an unconverged
    # solve's wall time as the metric)
    ranked = [(w, i) for w, i, ok in
              ((wall_fd, it_fd, ok_fd), (wall_wb, it_wb, ok_wb)) if ok]
    wall, iters = min(ranked) if ranked else (wall_fd, it_fd)
    print(json.dumps({"hybrid_solve_ms": round(wall * 1e3, 2),
                      "hybrid_cg_iters": iters,
                      "hybrid_ms_per_iter": round(wall * 1e3 / max(iters, 1),
                                                  3),
                      "hybrid_fastdiag_ms": round(wall_fd * 1e3, 2),
                      "hybrid_fastdiag_iters": it_fd,
                      "hybrid_woodbury_ms": round(wall_wb * 1e3, 2),
                      "hybrid_woodbury_iters": it_wb,
                      "hybrid_dofs": E * (N + 1) ** 2}))


def bench_hybrid_ref_sub():
    """Reference-scale hybrid solve (VERDICT r2 next #2): the 56-block
    curved square_circle mesh at p=6, N=68/block (~267k volume DOF —
    the reference's second-finest level, square_circle.jl:374-394),
    BOTH hybrid methods off one assembly:

    - displacements: Woodbury two-level FCG (the framework's fastest)
    - trace: the reference's DEFAULT method (Schur-on-the-trace FCG
      with batched fastdiag-CG inner solves)
    """
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "drivers"))
    from square_circle import run_device_multi

    res = run_device_multi(p=6, N=68, tol=1e-6, inner_iters=8,
                           verbose=False, repeats=5,
                           methods=("displacements", "trace"),
                           trace_mode="banded")
    d, t = res["displacements"], res["trace"]

    def _ms(v):
        return None if v is None else round(v * 1e3, 1)

    print(json.dumps({
        "hybrid_ref_dofs": d["nvol"],
        "hybrid_ref_ms": round(d["t_warm_s"] * 1e3, 1),
        "hybrid_ref_ms_min": round(d["t_warm_min_s"] * 1e3, 1),
        # chained = RTT-free device time (per-call walls carry one
        # ~27 ms tunnel round trip; see run_device_multi)
        "hybrid_ref_chained_ms": _ms(d.get("t_chained_s")),
        "hybrid_ref_trace_chained_ms": _ms(t.get("t_chained_s")),
        "hybrid_ref_iters": d["iters"],
        "hybrid_ref_converged": d["converged"],
        "hybrid_ref_rel_err": float(f"{d['rel_err']:.3g}"),
        "hybrid_ref_trace_ms": round(t["t_warm_s"] * 1e3, 1),
        "hybrid_ref_trace_ms_min": round(t["t_warm_min_s"] * 1e3, 1),
        "hybrid_ref_trace_iters": t["iters"],
        "hybrid_ref_trace_converged": t["converged"],
        "hybrid_ref_trace_rel_err": float(f"{t['rel_err']:.3g}"),
        "hybrid_ref_host_direct_ms": round(t["t_host_s"] * 1e3, 1)}))


def bench_hybrid_flagship_sub():
    """Flagship-scale hybrid solve (VERDICT r3 next #1): the reference's
    FINEST refinement level (square_circle.jl:22,40,209 — 56 blocks,
    p=6, N=136/block, ~1.05M volume DOF), both hybrid methods, from the
    prebuilt device-problem cache so the ~20-32 min host
    HybridProblem.build is NOT paid inside the bench (the cache stores
    metrics for on-device assembly, banded trace blocks, RHS, and the
    host f64 reference solution; drivers/square_circle.py
    --flagship-cache-build regenerates it, fingerprint-guarded)."""
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "drivers"))
    from square_circle import FLAGSHIP_CACHE, run_flagship_cached

    if not os.path.exists(FLAGSHIP_CACHE):
        _log("flagship cache missing; run drivers/square_circle.py "
             "--flagship-cache-build once to enable this sub-bench")
        print(json.dumps({"hybrid_flagship_skipped": "cache missing"}))
        return
    res = run_flagship_cached(repeats=5, verbose=False,
                              methods=("displacements", "trace"))
    d, t = res["displacements"], res["trace"]

    def _ms(v):
        return None if v is None else round(v * 1e3, 1)

    print(json.dumps({
        "hybrid_flagship_dofs": d["nvol"],
        "hybrid_flagship_ms": round(d["t_warm_s"] * 1e3, 1),
        "hybrid_flagship_chained_ms": _ms(d.get("t_chained_s")),
        "hybrid_flagship_iters": d["iters"],
        "hybrid_flagship_converged": d["converged"],
        "hybrid_flagship_rel_err": float(f"{d['rel_err']:.3g}"),
        "hybrid_flagship_resnorm": float(f"{d['resnorm']:.3g}"),
        "hybrid_flagship_trace_ms": round(t["t_warm_s"] * 1e3, 1),
        "hybrid_flagship_trace_chained_ms": _ms(t.get("t_chained_s")),
        "hybrid_flagship_trace_iters": t["iters"],
        "hybrid_flagship_trace_converged": t["converged"],
        "hybrid_flagship_trace_rel_err": float(f"{t['rel_err']:.3g}"),
        "hybrid_flagship_host_direct_ms": round(d["t_host_s"] * 1e3, 1)}))


def bench_bp1_sub():
    """BP1 cycle wall-clock (BASELINE.md north star #3): reference
    configuration N=200, p=2, 1000 years, f32 state."""
    from hybridsbp_tpu.seas import bp1

    par = bp1.BP1Params(N=200, sim_years=1000)
    prob = bp1.setup(par, dtype=jnp.float32)
    fns = bp1.make_solver_fns(prob)
    _, sol = bp1.run(par, prob=prob, _fns=fns, max_steps=20000)  # compile
    float(sol.t_final)                     # force completion
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        _, sol = bp1.run(par, prob=prob, _fns=fns, max_steps=20000)
        float(sol.t_final)                 # scalar fetch = real sync
        ts.append(time.perf_counter() - t0)
    wall = float(np.median(ts))
    steps = int(sol.stats.naccept) + int(sol.stats.nreject)
    # seismic events = upcrossings of the SEAS threshold V > 1e-3 m/s
    lv = np.asarray(sol.save["log10_vmax"])
    lv = lv[np.isfinite(lv)]
    seismic = lv > -3.0
    events = int(np.sum(seismic[1:] & ~seismic[:-1]))
    print(json.dumps({
        "bp1_cycle_s": round(wall, 3),
        "bp1_steps": steps,
        "bp1_ms_per_step": round(wall * 1e3 / max(steps, 1), 4),
        "bp1_events": events,
        "bp1_sim_years": 1000}))


def bench_bp1mb_sub():
    """Canonical multiblock BP1-QD cycle warm on chip (VERDICT r4 next
    #7): the externally validated physics path — 194-block BP1_v1 mesh,
    canonical Dc=0.008, fault response Kff coupled through the hybrid
    trace solve (late recurrence 78.4 yr vs published ~78, RESULTS.md
    round 4) — in the f32 serving mode (compensated pure-f32 friction
    Newton; full-fidelity f64 capture: tools/capture_bp1mb_onchip.py).
    Ref: /root/reference/seas/BP1/BP1.jl:159-161 (the reference's
    host-side cycle loop over its CHOLMOD backsolves)."""
    from hybridsbp_tpu.seas import bp1_multiblock as mbm
    from hybridsbp_tpu.seas.bp1 import YEAR_SECONDS, BP1Params
    from hybridsbp_tpu.seas.events import merged_events

    years, rtol = 700.0, 1e-4
    par = BP1Params(N=16, RSDc=0.008)
    mp = mbm.setup(par=par, N=16, dtype=jnp.float32)
    fns = mbm.make_cycle_fns(mp, newton_dtype=jnp.float32)
    # compensated: the Neumaier state low word restores canonical
    # event fidelity at f32 speed for free (r5: warm 1.65 s both ways;
    # plain-f32 drifts late events 20-28 yr) — the serving config
    kw = dict(sim_years=years, rtol=rtol, max_steps=400_000, _fns=fns,
              compensated=True)
    sol = mbm.run(mp, **kw)                   # compile
    float(sol.t_final)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        sol = mbm.run(mp, **kw)
        float(sol.t_final)                    # scalar fetch = real sync
        ts.append(time.perf_counter() - t0)
    wall = float(np.median(ts))
    steps = int(sol.stats.naccept) + int(sol.stats.nreject)
    ev, _, _ = merged_events(sol, YEAR_SECONDS)
    # the full-fidelity config (f64 state + f64 Newton, warm 8.1 s,
    # canonical 78.5-yr recurrence reproduced on chip) lives in
    # tools/capture_bp1mb_onchip.py --dtype float64 — too heavy for
    # the bench budget (device init + emulated-f64 compile ~6 min)
    print(json.dumps({
        "bp1mb_cycle_s": round(wall, 3),
        "bp1mb_steps": steps,
        "bp1mb_ms_per_step": round(wall * 1e3 / max(steps, 1), 4),
        "bp1mb_sim_years": years,
        "bp1mb_sim_years_per_s": round(years / wall, 1),
        "bp1mb_events": len(ev),
        "bp1mb_compensated": True,
        "bp1mb_fault_dofs": int(mp.n_fault)}))


def bench_inversion_sub():
    """Differentiable-inversion unit cost (beyond-reference layer,
    DESIGN.md §8): one ``value_and_grad`` of the station misfit through
    the coupled flower-network solve — one forward + one adjoint
    coupled solve, the per-iteration cost of ``invert_linear``'s CGNE —
    as ONE jitted program with operator arrays as arguments (413-safe).
    The full nested-while CGNE program is deliberately not compiled
    here (nested data-dependent while_loops explode remote-compile
    time; the unit pair is the meaningful on-chip primitive)."""
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "drivers"))
    from invert_slip import build_flower_problem, true_slip

    from hybridsbp_tpu.inverse import make_slip_inversion

    prob = build_flower_problem(2, 8)
    inv = make_slip_inversion(prob, per=3, dtype=jnp.float32, tol=3e-6,
                              maxiter=400)
    fwd = inv.forward_with
    d_true = jnp.asarray(true_slip(inv), dtype=jnp.float32)
    jfwd = jax.jit(fwd)
    d_obs = jfwd(inv.arrs, d_true)

    @jax.jit
    def fwdgrad(a, x, d):
        def mis(z):
            r = fwd(a, z) - d
            return 0.5 * jnp.sum(r * r)
        return jax.value_and_grad(mis)(x)

    def timed(fn, *args):
        out = fn(*args)                       # compile + warm
        jax.tree_util.tree_map(np.asarray, out)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.tree_util.tree_map(np.asarray, out)   # real sync
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)), out

    t_fwd, _ = timed(jfwd, inv.arrs, d_true)
    x0 = jnp.zeros_like(d_true)
    t_fg, (val, gr) = timed(fwdgrad, inv.arrs, x0, d_obs)
    assert np.isfinite(float(val)) and np.isfinite(np.asarray(gr)).all()
    print(json.dumps({
        "inv_forward_ms": round(t_fwd * 1e3, 2),
        "inv_fwdgrad_ms": round(t_fg * 1e3, 2),
        "inv_slip_dofs": inv.nf,
        "inv_stations": int(len(inv.stations[0])),
        "inv_blocks": len(prob.lops)}))


def main():
    from hybridsbp_tpu.mesh import create_metrics
    from hybridsbp_tpu.ops2d import locoperator
    from hybridsbp_tpu.seas.bp1 import BP1Params, tan_stretch_maps
    from hybridsbp_tpu.tpu import to_dia
    from hybridsbp_tpu.tpu.pallas_stencil import dia_apply_batched

    backend = jax.default_backend()
    _log(f"backend = {backend}")
    p, N, E = 2, 256, 64

    # host assembly of the 66k-DOF block operator takes ~3 min; cache the
    # extracted DIA planes (2.4 MB) so the bench spends its budget on the
    # device, not scipy.  The cache carries a numerics fingerprint and is
    # invalidated when tables/locoperator change (ADVICE r1).
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "artifacts", f"bench_op_p{p}_N{N}.npz")
    fp = _op_fingerprint()
    op = None
    if os.path.exists(cache):
        try:
            d = np.load(cache)
            if "fingerprint" not in d or \
                    not np.isclose(float(d["fingerprint"]), fp,
                                   rtol=1e-12, atol=0.0):
                _log("operator cache fingerprint mismatch; re-assembling")
            else:
                coefs_1 = jnp.asarray(d["coefs"], dtype=jnp.float32)
                offsets = tuple(map(tuple, d["offsets"]))
                scale = np.float32(d["scale"])
                op = type("Op", (), {})()
                op.coefs, op.offsets = coefs_1, offsets
                _log(f"loaded cached operator {os.path.basename(cache)}")
        except Exception:
            _log("operator cache unreadable; assembling from scratch")
            op = None
    if op is None:
        par = BP1Params(N=N, el=10.0)
        xt, yt = tan_stretch_maps(par)
        metrics = create_metrics(p, N, N, xt, yt)
        lop = locoperator(p, N, N, metrics)
        op = to_dia(lop.M, N + 1, N + 1, dtype=jnp.float32)
        scale = np.float32(1.0 / abs(lop.M).sum(axis=1).max())
        try:
            os.makedirs(os.path.dirname(cache), exist_ok=True)
            np.savez_compressed(cache, coefs=np.asarray(op.coefs),
                                offsets=np.asarray(op.offsets,
                                                   dtype=np.int32),
                                scale=scale, fingerprint=fp)
            _log(f"cached operator to {os.path.basename(cache)}")
        except OSError:
            pass
    noff = len(op.offsets)

    # materialize the block batch ON the device: transferring one
    # block's planes (2.4 MB) instead of the full (E, noff, Nsp, Nrp)
    # batch (152 MB) saves ~150 s of host->device time over the tunnel
    _log("materializing device batch (2.4 MB transfer + 2 small jits)")
    c1 = jnp.asarray(np.asarray(op.coefs), dtype=jnp.float32)
    coefs = jax.jit(
        lambda c: jnp.tile(c[None], (E, 1, 1, 1)))(c1)
    _mk_u = jax.jit(lambda key: jax.random.normal(
        key, (E, N + 1, N + 1), dtype=jnp.float32))
    u = _mk_u(jax.random.PRNGKey(0))

    # scale normalizes each application so the chain stays finite
    dofs = E * (N + 1) ** 2

    # --- exact (f32) kernels.  The bench mesh is 64 *identical* BP1-
    # metric blocks, which build_blocked auto-detects (shared=True) and
    # routes to the shared-coefficient layout — one stack serves every
    # block, so coefficient traffic amortizes E-fold (measured 3.3x on
    # v5e).  Both representations are timed; the headline is the best
    # exact kernel, i.e. what the framework actually runs on this mesh.
    from hybridsbp_tpu.tpu.pallas_stencil import dia_apply_shared

    # flat (1D raveled-diagonal) shared layout: avoids the (8, 128)
    # tile padding of the 2D planes (257 lanes pad to 384 here — ~1.5x
    # wasted coefficient+field traffic).  This is what the framework
    # auto-selects on this mesh (build_blocked flat='auto' on TPU);
    # exact — flatten_dia is a bit-exact relayout (test-gated).
    from hybridsbp_tpu.tpu.stencil import dia_apply_flat, flatten_dia
    c1_flat, offs_flat = flatten_dia(c1, op.offsets, N + 1)

    # ONE step definition + ONE compiled chain runner per kernel — the
    # extra headline captures and the physics guard below re-measure
    # through the SAME compiled runner (no recompiles over the tunnel)
    kernel_steps = {
        "xla_perblock": (lambda v: scale * dia_apply_batched(
            coefs, op.offsets, v, use_pallas=False), False),
        "xla_shared": (lambda v: scale * dia_apply_shared(
            c1, v, op.offsets), False),
        "xla_shared_flat": (lambda v: scale * dia_apply_flat(
            c1_flat, offs_flat, v), True),
    }
    runners = {name: make_chain_runner(fn)
               for name, (fn, _) in kernel_steps.items()}

    def measure(name, ubatch):
        init = ubatch.reshape(E, -1) if kernel_steps[name][1] else ubatch
        return per_iter_time(None, init, runner=runners[name])

    candidates = {}
    for name in kernel_steps:
        _log(f"timing {name} kernel")
        candidates[name] = measure(name, u)

    best_name = min(candidates, key=candidates.get)

    # median-of-CAPTURES headline (VERDICT r3 #7): the r3 headline was
    # one capture's median-of-3 fits, and same-commit captures spread
    # ~±6% (59.1/62.0/63.3 GDOF/s).  Re-capture the winning kernel on a
    # freshly materialized device batch, twice, and take the median of
    # the three independent captures; report the spread in detail.
    headline_caps = [candidates[best_name]]
    for cap in range(2):
        _log(f"headline re-capture {cap + 2}/3 (fresh device batch)")
        headline_caps.append(measure(best_name, _mk_u(
            jax.random.PRNGKey(cap + 1))))
    best = float(np.median(headline_caps))
    spread_pct = 100.0 * (max(headline_caps) - min(headline_caps)) / best
    candidates[best_name] = best

    # physics guard on the HEADLINE (CLAUDE.md: the tunnel produces
    # anomalously SHORT readings too — a 66.7 us kernel once measured
    # 32.1 us, implying > spec HBM traffic).  If the best kernel's
    # implied traffic exceeds the chip's published bandwidth, the
    # reading is a timing artifact: re-measure once and take the
    # SLOWER median; if still above spec, clamp to the spec-implied
    # bound and keep the raw value in detail.
    bpd_of = {"xla_perblock": (noff + 2) * 4}  # bytes/dof by layout
    bpd_of["xla_shared"] = bpd_of["xla_shared_flat"] = (2 + noff / E) * 4
    spec = _HBM_SPEC_GBS.get(jax.devices()[0].device_kind)
    best_raw = None
    if spec is not None:
        t_floor = dofs * bpd_of[best_name] / (spec * 1e9)  # s at spec bw
        if best < t_floor:
            _log(f"headline {best * 1e6:.1f} us implies > spec HBM "
                 f"bandwidth (floor {t_floor * 1e6:.1f} us); "
                 "re-measuring the fast-transient reading")
            best_raw = best
            best = max(measure(best_name, u), best)
            if best < t_floor:
                _log("still above spec after re-measure; clamping to "
                     "the spec-implied bound")
                best = t_floor
            candidates[best_name] = best

    gdof_s = dofs / best / 1e9

    # --- bf16 coefficient storage (documented approximation, ~3e-3
    # operator perturbation; serving path wraps it in refinement).
    # Reported in detail, never the headline (exact arithmetic only).
    _log("timing bf16 shared kernel")
    c1_bf = c1.astype(jnp.bfloat16)
    rel_err = float(jnp.max(jnp.abs(
        dia_apply_shared(c1_bf, u, op.offsets)
        - dia_apply_shared(c1, u, op.offsets)))
        / jnp.max(jnp.abs(dia_apply_shared(c1, u, op.offsets))))
    bf16_dt = per_iter_time(
        lambda v: scale * dia_apply_shared(c1_bf, v, op.offsets), u)

    _log("measuring HBM bandwidth")
    bw = measure_hbm_bw()
    # per-block-representation roofline: noff coefficient planes + read
    # u + write out, all f32 — the fixed r1 target definition, so
    # vs_baseline is comparable across rounds
    bytes_per_dof = (noff + 2) * 4
    roofline_gdof_s = bw / bytes_per_dof / 1e9
    target = 0.7 * roofline_gdof_s
    # shared-representation roofline: coefficient traffic amortizes E-fold
    roofline_shared = bw / ((2 + noff / E) * 4) / 1e9

    detail = {
        "backend": backend, "kernel": best_name, "p": p, "N": N,
        "blocks": E, "noff": noff,
        "us_per_apply": round(best * 1e6, 2),
        "headline_captures_us": [round(v * 1e6, 2) for v in headline_caps],
        "spread_pct": round(spread_pct, 1),
        **({"us_per_apply_raw_transient": round(best_raw * 1e6, 2)}
           if best_raw is not None else {}),
        "all_kernels_us": {k: round(v * 1e6, 2)
                           for k, v in candidates.items()},
        "bf16_shared_us": round(bf16_dt * 1e6, 2),
        "bf16_rel_err": round(rel_err, 6),
        "hbm_bw_GBs": round(bw / 1e9, 1),
        "roofline_gdof_s": round(roofline_gdof_s, 3),
        "roofline_shared_gdof_s": round(roofline_shared, 3),
        "pct_roofline_shared": round(100 * gdof_s / roofline_shared, 1),
    }

    # breadth metrics (BASELINE.md north stars #2/#3), each in a
    # bounded subprocess so a wedged worker can't break the contract
    _log("sub-bench: hybrid solve")
    sub = _run_sub("hybrid", timeout=1500)
    if sub:
        detail.update(sub)
    _log("sub-bench: bp1 cycle")
    sub = _run_sub("bp1", timeout=1800)
    if sub:
        detail.update(sub)
    # canonical multiblock cycle (f32 serving mode; setup ~8 s, f32
    # Newton compile ~20 s, warm ~1.7 s/700 yr measured r5); skipped on
    # the CPU fallback (the 194-block host setup + 14k-step f64-island
    # integration is minutes there)
    if backend != "cpu":
        _log("sub-bench: canonical multiblock bp1 cycle")
        sub = _run_sub("bp1_multiblock", timeout=1500)
        if sub:
            detail.update(sub)
    # reference-scale hybrid (267k DOF): host assembly ~2 min + device
    # setup + 2 jit compiles; affordable on TPU, skipped on the CPU
    # fallback (the f64 host direct + 2 f32 iterative solves at 267k
    # DOF blow the bench budget there)
    if backend != "cpu":
        _log("sub-bench: hybrid reference-scale (267k DOF)")
        sub = _run_sub("hybrid_ref", timeout=2700)
        if sub:
            detail.update(sub)
        # flagship finest level (1.05M DOF) from the prebuilt cache —
        # no host assembly inside the bench (VERDICT r3 next #1)
        _log("sub-bench: hybrid flagship (1.05M DOF, cached setup)")
        sub = _run_sub("hybrid_flagship", timeout=1800)
        if sub:
            detail.update(sub)
    else:
        _log("skipping hybrid_ref/flagship sub-benches on CPU fallback")
    # differentiable-inversion unit (forward + adjoint pair through the
    # coupled flower solve); cheap enough to run on the CPU fallback
    _log("sub-bench: inversion forward/adjoint pair")
    sub = _run_sub("inversion", timeout=1500)
    if sub:
        detail.update(sub)
    _log("done")

    print(json.dumps({
        "metric": "sbp_matvec_gdof_s",
        "value": round(gdof_s, 3),
        "unit": "GDOF/s",
        "vs_baseline": round(gdof_s / target, 3),
        "detail": detail,
    }))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--sub":
        {"hybrid": bench_hybrid_sub, "bp1": bench_bp1_sub,
         "bp1_multiblock": bench_bp1mb_sub,
         "hybrid_ref": bench_hybrid_ref_sub,
         "hybrid_flagship": bench_hybrid_flagship_sub,
         "inversion": bench_inversion_sub}[sys.argv[2]]()
    else:
        main()
