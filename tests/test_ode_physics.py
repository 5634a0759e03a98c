"""Gates for the Tsit5 integrator and rate-and-state Newton solver."""
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
