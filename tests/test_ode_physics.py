"""Gates for the Tsit5 integrator and rate-and-state Newton solver."""
import jax
import jax.numpy as jnp
import numpy as np

from hybridsbp_tpu.ode import solve_tsit5
from hybridsbp_tpu.physics import newtbndv, rateandstate, solve_slip_rates


def test_tsit5_exponential_accuracy():
    sol = solve_tsit5(lambda t, y, a: -y, jnp.array([1.0]), 0.0, 5.0, 0.1,
                      rtol=1e-8, atol=1e-10, max_steps=10_000)
    assert bool(sol.stats.success)
    np.testing.assert_allclose(float(sol.y_final[0]), np.exp(-5.0), rtol=1e-6)


def test_tsit5_oscillator_and_saving():
    def rhs(t, y, a):
        return jnp.array([y[1], -y[0]])

    sol = solve_tsit5(rhs, jnp.array([1.0, 0.0]), 0.0, 2 * np.pi, 0.01,
                      rtol=1e-9, atol=1e-11, max_steps=20_000,
                      save_fn=lambda t, y, a: {"y0": y[0]})
    np.testing.assert_allclose(np.array(sol.y_final), [1.0, 0.0], atol=1e-6)
    n = int(sol.stats.naccept)
    ts = np.array(sol.ts)
    saved = np.array(sol.save["y0"])
    valid = np.isfinite(ts)
    assert valid.sum() >= n // 2
    np.testing.assert_allclose(saved[valid], np.cos(ts[valid]), atol=1e-6)


def test_tsit5_compensated_f32_accumulation():
    """compensated=True carries a Neumaier low word: 1e4 forced unit
    steps of +1e-3 onto an f32 state growing to 10 accumulate ~4e-4 of
    rounding plainly but stay at the representation floor (~2 ulps)
    compensated.  Also guards that XLA does not algebraically simplify
    the two-sum away.  Measured: plain 4.1e-4, compensated 1.9e-6."""
    rhs = lambda t, y, a: jnp.full_like(y, 1e-3)  # noqa: E731
    y0 = jnp.zeros(4, dtype=jnp.float32)
    kw = dict(rtol=1e-3, atol=1e30, max_steps=20_000, max_factor=1.0)
    plain = solve_tsit5(rhs, y0, 0.0, 1e4, 1.0, **kw)
    comp = solve_tsit5(rhs, y0, 0.0, 1e4, 1.0, compensated=True, **kw)
    assert int(plain.stats.naccept) == int(comp.stats.naccept) == 10_000
    err_plain = float(jnp.abs(plain.y_final[0] - 10.0))
    err_comp = float(jnp.abs(comp.y_final[0] - 10.0))
    assert err_plain > 1e-4          # the drift the mode exists to fix
    assert err_comp < 1e-5
    assert err_comp < err_plain / 20
    # the low word is returned for chunked resume and is genuinely small
    assert comp.yc_final is not None
    assert float(jnp.max(jnp.abs(comp.yc_final))) < 1e-5
    assert plain.yc_final is None


def test_tsit5_compensated_resume_matches_single_launch():
    """run_chunked-style resume: splitting the integration and carrying
    (y, yc) across the boundary reproduces the single-launch
    compensated result exactly (the low word must survive chunking)."""
    rhs = lambda t, y, a: jnp.full_like(y, 1e-3)  # noqa: E731
    y0 = jnp.zeros(2, dtype=jnp.float32)
    kw = dict(rtol=1e-3, atol=1e30, max_factor=1.0, compensated=True)
    one = solve_tsit5(rhs, y0, 0.0, 1e4, 1.0, max_steps=20_000, **kw)
    first = solve_tsit5(rhs, y0, 0.0, 1e4, 1.0, max_steps=5_000, **kw)
    second = solve_tsit5(rhs, first.y_final, float(first.t_final), 1e4,
                         float(first.dt_final), max_steps=20_000,
                         yc0=first.yc_final, **kw)
    np.testing.assert_array_equal(np.asarray(one.y_final),
                                  np.asarray(second.y_final))


def test_tsit5_nan_rejection():
    """RHS produces NaN past y=1 (sqrt); the controller must reject and
    shrink rather than poisoning the solution (the BP1 protocol)."""
    def rhs(t, y, a):
        return jnp.sqrt(1.0 - y)          # NaN when an internal stage y>1

    y_end = 1.0 - (1.0 - 1.9 / 2) ** 2    # exact: y = 1-(1-t/2)^2
    sol = solve_tsit5(rhs, jnp.array([0.0]), 0.0, 1.9, 0.5,
                      rtol=1e-7, atol=1e-9, max_steps=20_000)
    assert bool(sol.stats.success)
    np.testing.assert_allclose(float(sol.y_final[0]), y_end, atol=1e-5)


def test_tsit5_explicit_reject_flag():
    """RHS-level ok=False (reference reject_step flag) forces a retry."""
    def rhs(t, y, a):
        # stiff decay toward 1; RK stages overshoot y>1 at large dt, which
        # the physics declares invalid (like a failed fault Newton)
        ok = y[0] <= 1.0 + 1e-9
        return 50.0 * (1.0 - y), ok

    sol = solve_tsit5(rhs, jnp.array([0.0]), 0.0, 0.2, 0.5,
                      rtol=1e-6, atol=1e-9)
    assert bool(sol.stats.success)
    assert int(sol.stats.nreject) > 0     # the dt0=0.5 first step must fail
    np.testing.assert_allclose(float(sol.y_final[0]), 1.0 - np.exp(-10.0),
                               atol=1e-6)


def test_newtbndv_scalar():
    f = lambda x: (x**2 - 2.0, 2 * x)
    x, fx, it = newtbndv(f, jnp.asarray(0.0), jnp.asarray(2.0),
                         jnp.asarray(1.0), ftol=1e-12, atolx=1e-12,
                         rtolx=1e-12)
    assert int(it) > 0
    np.testing.assert_allclose(float(x), np.sqrt(2), rtol=1e-10)
    # no sign change -> NaN, negative iters
    x2, _, it2 = newtbndv(f, jnp.asarray(3.0), jnp.asarray(4.0),
                          jnp.asarray(3.5))
    assert np.isnan(float(x2)) and int(it2) < 0


def test_rateandstate_derivative():
    V = jnp.linspace(-1e-6, 1e-6, 11) + 1e-9
    g, dg = rateandstate(V, 0.8, 50.0, 0.3, 4.6, 0.015, 1e-6)
    gp, _ = rateandstate(V + 1e-12, 0.8, 50.0, 0.3, 4.6, 0.015, 1e-6)
    np.testing.assert_allclose(np.array((gp - g) / 1e-12), np.array(dg),
                               rtol=2e-3)


def test_solve_slip_rates_consistency():
    """At the BP1 initial condition the solved V equals Vinit: the
    pre-stress tau0 and state psi0 are constructed for balance
    (BP1.jl:105-114)."""
    sigma_n, eta, V0, f0, b = 50.0, 2.670 * 3.464 / 2, 1e-6, 0.6, 0.015
    Vinit = 1e-9
    a = jnp.linspace(0.010, 0.025, 33)
    tau0 = sigma_n * 0.025 * np.arcsinh(
        Vinit / (2 * V0) * np.exp((f0 + b * np.log(V0 / Vinit)) / 0.025)
    ) + eta * Vinit
    # per-node state consistent with tau0 at V=Vinit
    theta = (0.016 / V0) * np.exp(
        (np.array(a) / b) * np.log((2 * V0 / Vinit)
                                   * np.sinh((tau0 - eta * Vinit)
                                             / (np.array(a) * sigma_n)))
        - f0 / b)
    psi = f0 + b * np.log(V0 * theta / 0.016)
    V, ok = solve_slip_rates(jnp.asarray(psi), jnp.full(33, tau0), eta,
                             sigma_n, a, V0)
    assert bool(np.all(ok))
    np.testing.assert_allclose(np.array(V), Vinit, rtol=1e-4)


def test_hoisted_strength_balance_matches():
    from hybridsbp_tpu.physics.rateandstate import strength_balance_hoisted
    V = jnp.linspace(-2.0, 2.0, 9)
    psi, a, sg, eta, V0, phi = 0.82, 0.012, 50.0, 4.6, 1e-6, 28.0
    g1, dg1 = rateandstate(V, psi, sg, phi, eta, a, V0)
    w = psi / a
    e2w = jnp.exp(jnp.maximum(-2.0 * w, -80.0))
    g2, dg2 = strength_balance_hoisted(V, w, e2w, sg, phi, eta, a, V0)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(dg1), np.asarray(dg2), rtol=1e-12)


def test_log_precise_accuracy():
    """Software f32 log (Cody-Waite + atanh series) is f32-ulp accurate
    over the slip-rate solve's argument range.  On TPU the hardware f32
    log is only ~2**-13-relative accurate (measured 3.5e-4), which
    floored the compensated strength balance and stormed the f32 BP1
    controller (r2 diagnosis) — this pins the software form."""
    import numpy as np
    from hybridsbp_tpu.physics.rateandstate import log_precise

    x = jnp.asarray(np.logspace(-30, 10, 50000), dtype=jnp.float32)
    ref = np.log(np.asarray(x, dtype=np.float64))
    got = np.asarray(jax.jit(log_precise)(x), dtype=np.float64)
    rel = np.abs(got - ref) / np.maximum(np.abs(ref), 1e-30)
    assert rel.max() < 1e-6, f"max rel err {rel.max():.3e}"
    # f64 passthrough
    x64 = jnp.asarray([0.5, 1.0, 3.7, 1e-20], dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(log_precise(x64)),
                               np.log(np.asarray(x64)), rtol=1e-15)


def test_bp1_pure_f32_no_storm():
    """Pure-f32 BP1 loop (compensated balance + software log + polish +
    bracket-collapse acceptance): full cycle completes with a healthy
    rejection rate and the f64 trajectory's event signature (VERDICT r1
    #5 gate)."""
    import numpy as np
    from hybridsbp_tpu.seas import bp1

    par = bp1.BP1Params(N=100, sim_years=300)
    prob64 = bp1.setup(par)
    _, s64 = bp1.run(par, prob=prob64)
    prob32 = bp1.setup(par, dtype=jnp.float32)
    _, s32 = bp1.run(par, prob=prob32, newton_dtype=jnp.float32)
    n64, r64 = int(s64.stats.naccept), int(s64.stats.nreject)
    n32, r32 = int(s32.stats.naccept), int(s32.stats.nreject)
    assert float(s32.t_final) >= 300 * 3.1e7, "f32 run did not finish"
    # no storm: rejection rate comparable to f64, steps within 10%
    assert r32 <= 2 * max(r64, 20), f"f32 rejections {r32} vs f64 {r64}"
    assert abs(n32 - n64) <= 0.10 * n64, f"steps {n32} vs {n64}"
    v64 = float(np.nanmax(np.asarray(s64.save["log10_vmax"])))
    v32 = float(np.nanmax(np.asarray(s32.save["log10_vmax"])))
    assert abs(v64 - v32) < 0.1, f"vmax {v32} vs {v64}"
