"""Gates for the gradient-based material inversion (inverse.py).

Beyond-reference capability: the reference has no adjoint machinery.
These gate (1) the forward model's parity with the host sparse path,
(2) the exactness of jax.grad through assembly + implicit CG against
finite differences, and (3) end-to-end recovery of a material field
from sparse stations."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse.linalg as spla

from hybridsbp_tpu.inverse import (demo_problem, invert_material,
                                   make_material_inversion, station_grid)
from hybridsbp_tpu.mesh import create_metrics
from hybridsbp_tpu.ops2d import locoperator


def test_forward_matches_host_at_background():
    """forward(theta=0) must equal the host sparse mu=1 solve at the
    stations (plumbing gate: sources, assembly, CG, station sampling)."""
    p, N, K = 2, 16, 3
    inv = make_material_inversion(p, N, nsta=5, ctrl=5)
    _, sources, _ = demo_problem(p, N, K=K, nsta=5)
    pred = np.asarray(inv.forward(jnp.zeros((5, 5)), sources))
    lop = locoperator(p, N, N, create_metrics(p, N, N))
    si, ri = inv.stations
    want = np.stack([
        spla.spsolve(lop.M, np.asarray(sources[k]).ravel())
        .reshape(N + 1, N + 1)[si, ri] for k in range(K)])
    np.testing.assert_allclose(pred, want, rtol=1e-9, atol=1e-12)


@pytest.mark.heavy
def test_adjoint_gradient_matches_finite_differences():
    """jax.grad through (on-device assembly -> implicit-CG solve ->
    station misfit) matches central finite differences in random
    directions — the adjoint-state correctness gate."""
    p, N = 2, 12
    inv = make_material_inversion(p, N, nsta=4, ctrl=4, smooth=1e-5)
    _, sources, d_obs = demo_problem(p, N, K=2, nsta=4)
    th0 = jnp.asarray(0.05 * np.random.default_rng(1).standard_normal(
        (4, 4)))

    f = lambda th: inv.loss(th, sources, d_obs)   # noqa: E731
    g = jax.grad(f)(th0)
    rng = np.random.default_rng(3)
    for _ in range(3):
        v = rng.standard_normal((4, 4))
        v = jnp.asarray(v / np.linalg.norm(v))
        eps = 1e-6
        fd = (f(th0 + eps * v) - f(th0 - eps * v)) / (2 * eps)
        an = float(jnp.sum(g * v))
        assert abs(float(fd) - an) <= 1e-6 * max(abs(an), 1e-12), \
            f"directional derivative mismatch: fd={float(fd)} adjoint={an}"


def test_material_recovery():
    """End-to-end: recover the two-anomaly field from 6 sources x 64
    stations to a few percent (measured 2.2% at these settings; gated
    with margin)."""
    p, N = 2, 24
    mu_true, sources, d_obs = demo_problem(p, N, K=6, nsta=8)
    inv = make_material_inversion(p, N, nsta=8, ctrl=7, smooth=1e-5)
    res = invert_material(inv, sources, d_obs, steps=300, lr=0.2)
    mu_rec = np.asarray(res.mu)
    rel = np.linalg.norm(mu_rec - mu_true) / np.linalg.norm(mu_true)
    assert rel < 0.06, f"recovery error {rel:.3f}"
    assert float(res.losses[-1]) < 5e-2 * float(res.losses[0]), \
        "loss did not drop by >= 20x (measured ~50x; the smoothness " \
        "term floors the total)"
    # the recovered anomaly amplitudes are real, not smoothed away
    assert mu_rec.max() > 1.5 and mu_rec.min() < 0.75


def test_material_inversion_source_sharded():
    """make_material_inversion(mesh=...) — data-parallel over sources:
    loss and gradient on an 8-device source-sharded mesh must match the
    unsharded program (GSPMD partitions the vmapped CG per source and
    inserts the gradient psum; bitwise up to reduction order)."""
    from jax.sharding import Mesh

    p, N, K = 2, 12, 8
    _, sources, d_obs = demo_problem(p, N, K=K, nsta=4)
    inv_ref = make_material_inversion(p, N, nsta=4, ctrl=4)
    mesh = Mesh(np.array(jax.devices()), ("src",))
    inv_sh = make_material_inversion(p, N, nsta=4, ctrl=4, mesh=mesh)

    th0 = jnp.asarray(0.05 * np.random.default_rng(1).standard_normal(
        (4, 4)))
    l_ref, g_ref = jax.value_and_grad(
        lambda th: inv_ref.loss(th, sources, d_obs))(th0)
    l_sh, g_sh = jax.jit(jax.value_and_grad(
        lambda th: inv_sh.loss(th, sources, d_obs)))(th0)
    assert abs(float(l_sh) - float(l_ref)) < 1e-11 * abs(float(l_ref))
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                               rtol=1e-8, atol=1e-14)


def test_station_grid_interior():
    si, ri = station_grid(24, 5)
    assert len(si) == 25 and si.min() >= 2 and si.max() <= 22


def test_ctrl_smoothness_matches_loss_reg():
    """theta' R theta (ctrl_smoothness) must equal the loss's
    smoothness term exactly — the Laplace prior precision is the
    curvature of the objective actually minimized."""
    from hybridsbp_tpu.inverse import ctrl_smoothness

    rng = np.random.default_rng(5)
    for c in (3, 5, 7):
        th = rng.standard_normal((c, c))
        want = (np.sum(np.diff(th, axis=0) ** 2)
                + np.sum(np.diff(th, axis=1) ** 2))
        got = th.ravel() @ ctrl_smoothness(c) @ th.ravel()
        np.testing.assert_allclose(got, want, rtol=1e-13)


@pytest.mark.skipif(os.environ.get("HYBRIDSBP_SLOW_TESTS") != "1",
                    reason="~2 min MAP + jacfwd (set HYBRIDSBP_SLOW_TESTS=1)")
def test_material_posterior_calibration():
    """Laplace (Gauss-Newton) posterior at the MAP with 1% noise: the
    error vs the RECOVERABLE (resolution-filtered) truth must be
    covered by the posterior bars (measured 98% within 3 sigma at
    these settings), the data fit must sit at the noise level up to
    the smoothing penalty (chi2/dof measured 3.4), and the resolution
    diagonal must be informative (measured 0.59)."""
    from hybridsbp_tpu.inverse import material_posterior

    p, N, ctrl, K, nsta, noise = 2, 12, 5, 3, 6, 0.01
    mu_true, sources, d_obs, d_clean = demo_problem(
        p, N, K=K, nsta=nsta, noise=noise, return_clean=True)
    inv = make_material_inversion(p, N, nsta=nsta, ctrl=ctrl, smooth=1e-4)
    res = invert_material(inv, sources, d_obs, steps=120, lr=0.25)
    sigma = noise * float(np.abs(np.asarray(d_clean)).std())
    mu_map, std_mu, resol, U = material_posterior(inv, res.theta, sources,
                                                  d_obs, sigma=sigma)
    r = np.asarray(inv.forward(res.theta, sources)) - np.asarray(d_obs)
    chi2 = float(np.sum(r ** 2) / sigma ** 2 / r.size)
    assert chi2 < 6.0, f"MAP misfit far from the noise level: {chi2}"
    th_best, *_ = np.linalg.lstsq(U, np.log(mu_true).ravel(), rcond=None)
    mu_reach = np.exp(U @ (resol @ th_best)).reshape(mu_true.shape)
    z = np.abs(mu_map - mu_reach) / np.maximum(std_mu, 1e-12)
    assert np.mean(z < 3) > 0.9, f"bars uncalibrated: {np.mean(z < 3)}"
    assert 0.3 < np.diag(resol).mean() < 0.9
    rel = np.linalg.norm(mu_map - mu_true) / np.linalg.norm(mu_true)
    assert rel < 0.1, f"MAP recovery {rel}"


# ---------------------------------------------------------------------------
# fault-slip inversion through the coupled multiblock solve
# ---------------------------------------------------------------------------
def _flower_slip_setup(per):
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "drivers"))
    from invert_slip import build_flower_problem, true_slip

    from hybridsbp_tpu.inverse import make_slip_inversion

    prob = build_flower_problem(2, 8)
    inv = make_slip_inversion(prob, per=per)
    return inv, true_slip(inv)


def test_slip_forward_adjoint_identity():
    """<J x, y> == <x, J' y> with J' from jax.linear_transpose through
    the coupled multiblock solve (custom_linear_solve adjoint) — the
    multiblock adjoint-correctness gate.  Floor is the forward solve
    tolerance."""
    inv, _ = _flower_slip_setup(per=2)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal(inv.nf))
    y = jnp.asarray(rng.standard_normal(len(inv.stations[0])))
    Jt = jax.linear_transpose(inv.forward, jnp.zeros(inv.nf))
    lhs = float(jnp.vdot(inv.forward(x), y))
    rhs = float(jnp.vdot(x, Jt(y)[0]))
    assert abs(lhs - rhs) < 1e-7 * abs(lhs), \
        f"adjoint identity violated: {lhs} vs {rhs}"


@pytest.mark.heavy
def test_slip_uq_exact_gauss_newton():
    """Dense-Jacobian exact Gauss-Newton + linear-Gaussian posterior:
    J reproduces the forward, noiseless recovery beats CGNE (measured
    3.7%), and with 1% noise the posterior is CALIBRATED (the
    unresolved components carry proportionally large error bars)."""
    from hybridsbp_tpu.inverse import dense_jacobian, linear_posterior

    inv, d_true = _flower_slip_setup(per=3)
    clean = inv.forward(jnp.asarray(d_true))
    J = dense_jacobian(inv.forward, inv.nf, batch=32)
    # floor: each Jacobian column is its own CG solve; superposition
    # holds only to the solve tolerance (measured 5e-8 abs)
    np.testing.assert_allclose(np.asarray(J @ jnp.asarray(d_true)),
                               np.asarray(clean), rtol=1e-5, atol=2e-7)

    mean, _, _ = linear_posterior(J, clean, lam=1e-8, Rmat=inv.Rmat,
                                  sigma=1.0)
    rel = np.linalg.norm(mean - d_true) / np.linalg.norm(d_true)
    assert rel < 0.06, f"noiseless exact-GN recovery {rel:.3f}"

    rng = np.random.default_rng(0)
    sigma = 0.01 * float(jnp.abs(clean).std())
    d_noisy = clean + sigma * rng.standard_normal(clean.shape)
    mean, std, resol = linear_posterior(J, d_noisy, lam=1e-5,
                                        Rmat=inv.Rmat, sigma=sigma)
    z = np.abs(mean - d_true) / np.maximum(std, 1e-12)
    assert np.mean(z < 3) > 0.95, "posterior bars uncalibrated"
    assert 0.4 < np.diag(resol).mean() < 1.0


@pytest.mark.heavy
def test_slip_inversion_args_form():
    """The 413-safe arrays-as-arguments form (forward_with/arrs — the
    accelerator deployment path, CLAUDE.md closure-constant rule)
    matches the closure forward for invert_linear and dense_jacobian."""
    from hybridsbp_tpu.inverse import dense_jacobian, invert_linear

    inv, d_true = _flower_slip_setup(per=2)
    d = inv.forward(jnp.asarray(d_true))
    # CGNE iterates amplify rounding differences between the
    # constant-folded and argument-passed programs (normal equations
    # square the condition number), so gate at the SOLUTION level:
    # both runs must recover the same slip to iterate-path noise
    r1 = invert_linear(inv.forward, d, inv.nf, lam=1e-8,
                       reg_mv=inv.reg_mv, tol=1e-10, maxiter=40)
    r2 = invert_linear(None, d, inv.nf, lam=1e-8, tol=1e-10, maxiter=40,
                       forward_with=inv.forward_with, arrs=inv.arrs)
    diff = (np.linalg.norm(np.asarray(r2.x) - np.asarray(r1.x))
            / np.linalg.norm(np.asarray(r1.x)))
    assert diff < 1e-3, f"args-form CGNE diverged from closure: {diff}"
    # each Jacobian column is a CONVERGED solve -> tight parity
    J1 = dense_jacobian(inv.forward, inv.nf, batch=64)
    J2 = dense_jacobian(None, inv.nf, batch=64,
                        forward_with=inv.forward_with, arrs=inv.arrs)
    np.testing.assert_allclose(np.asarray(J2), np.asarray(J1),
                               rtol=1e-6, atol=1e-8)


@pytest.mark.heavy
def test_slip_inversion_f32_refined():
    """Mixed-precision inversion (f32 inner CGNE + f64 outer
    refinement — the accelerator deployment dtype): at a
    well-conditioned regularization (lam=1e-4, cond(A) ~ 2.5e5) the
    refined f32 solution must match the exact dense-solve oracle to
    f64-CGNE-class accuracy (measured 8.6e-3 vs f64's 1.2e-3 at these
    iteration budgets; 1.7e-3 with 600 inner iters), and refinement
    must collapse the normal-equation residual (measured ~1600x over
    3 steps).  At cond ~1e6 (lam=1e-5) f32 CG stalls — that envelope
    is documented in invert_linear_refined's docstring, not gated."""
    from hybridsbp_tpu.inverse import (dense_jacobian, invert_linear_refined,
                                       make_slip_inversion)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "drivers"))
    from invert_slip import build_flower_problem, true_slip

    lam = 1e-4
    prob = build_flower_problem(2, 8)
    inv = make_slip_inversion(prob, per=2)
    d_true = true_slip(inv)
    d = np.asarray(inv.forward(jnp.asarray(d_true)))
    J = np.asarray(dense_jacobian(None, inv.nf, batch=64,
                                  forward_with=inv.forward_with,
                                  arrs=inv.arrs))
    x_exact = np.linalg.solve(J.T @ J + lam * np.asarray(inv.Rmat),
                              J.T @ d)

    inv32 = make_slip_inversion(prob, per=2, tol=3e-6, maxiter=400,
                                dtype=jnp.float32)
    x32, resn = invert_linear_refined(inv32, jnp.asarray(d), lam=lam,
                                      tol=1e-5, maxiter=400, refine=3)
    assert resn[-1] < 1e-2 * resn[0], f"refinement did not bite: {resn}"
    err = np.linalg.norm(x32 - x_exact) / np.linalg.norm(x_exact)
    assert err < 2e-2, f"f32-refined vs dense oracle: {err}"


@pytest.mark.heavy
def test_slip_inversion_sharded_mesh():
    """make_slip_inversion(mesh=...) — the multi-chip inversion path:
    the block-sharded implicit forward (custom_linear_solve over the
    shard_map solver) must match the single-device forward to solver
    noise, and its transpose must satisfy the adjoint identity (the
    collectives transpose: all_gather <-> reduce-scatter)."""
    from jax.sharding import Mesh
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "drivers"))
    from invert_slip import build_flower_problem, true_slip

    from hybridsbp_tpu.inverse import make_slip_inversion

    prob = build_flower_problem(2, 8)
    inv_ref = make_slip_inversion(prob, per=2)
    mesh = Mesh(np.array(jax.devices()), ("block",))
    inv_sh = make_slip_inversion(prob, per=2, mesh=mesh)
    d = jnp.asarray(true_slip(inv_ref))
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal(inv_sh.nf))
    y = jnp.asarray(rng.standard_normal(len(inv_sh.stations[0])))

    # jit everything: eager shard_map dispatch on the virtual mesh is
    # ~10x slower than one compiled program per topology
    def run(inv):
        """(forward(d), <Jx,y>, <x,J'y>) in one jitted program."""
        @jax.jit
        def prog(a, d, x, y):
            f = lambda z: inv.forward_with(a, z)      # noqa: E731
            Jt = jax.linear_transpose(f, jnp.zeros(inv.nf))
            return f(d), jnp.vdot(f(x), y), jnp.vdot(x, Jt(y)[0])
        return prog(inv.arrs, d, x, y)

    y_ref, _, _ = run(inv_ref)
    y_sh, lhs, rhs = run(inv_sh)
    rel = float(jnp.linalg.norm(y_sh - y_ref) / jnp.linalg.norm(y_ref))
    assert rel < 1e-9, f"sharded forward vs single-device: {rel}"
    assert abs(float(lhs) - float(rhs)) < 1e-7 * abs(float(lhs)), \
        f"sharded adjoint identity violated: {lhs} vs {rhs}"

    # topology dispatch: a ('slice', 'block') mesh routes the forward
    # through the two-level cut-face DCN solver's implicit path
    mesh_sl = Mesh(np.array(jax.devices()).reshape(2, 4),
                   ("slice", "block"))
    inv_sl = make_slip_inversion(prob, per=2, mesh=mesh_sl)
    y_sl, lhs, rhs = run(inv_sl)
    rel_sl = float(jnp.linalg.norm(y_sl - y_ref) / jnp.linalg.norm(y_ref))
    assert rel_sl < 1e-9, f"two-level forward vs single-device: {rel_sl}"
    assert abs(float(lhs) - float(rhs)) < 1e-7 * abs(float(lhs)), \
        f"two-level adjoint identity violated: {lhs} vs {rhs}"

    # unknown axis names fail fast at the dispatch point
    with pytest.raises(ValueError, match="unsupported mesh axes"):
        make_slip_inversion(prob, per=2,
                            mesh=Mesh(np.array(jax.devices()), ("data",)))


def test_slip_recovery_flower():
    """Recover the 18-face slip distribution from 603 interior stations
    by regularized normal-equation CG (measured 9.1% at 150 iterations,
    4.5% at 400; gated with margin)."""
    from hybridsbp_tpu.inverse import invert_linear

    inv, d_true = _flower_slip_setup(per=3)
    d_obs = inv.forward(jnp.asarray(d_true))
    res = invert_linear(inv.forward, d_obs, inv.nf, lam=1e-7,
                        reg_mv=inv.reg_mv, tol=1e-12, maxiter=150)
    rec = np.asarray(res.x)
    rel = np.linalg.norm(rec - d_true) / np.linalg.norm(d_true)
    assert rel < 0.12, f"slip recovery error {rel:.3f}"


# ---------------------------------------------------------------------------
# Multiblock material inversion (VERDICT r3 next #5)
# ---------------------------------------------------------------------------

def _mb_strip(E=4, N=10, p=2):
    from hybridsbp_tpu import BC_DIRICHLET, BC_LOCKED_INTERFACE
    from hybridsbp_tpu.hybrid import build_problem

    verts = np.array(
        [[0.0, 1.0, 2.0, 3.0, 4.0, 0.0, 1.0, 2.0, 3.0, 4.0],
         [0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 1.0, 1.0]])
    etov = np.array([[e, e + 1, e + 5, e + 6] for e in range(E)]).T
    etof = np.array([[e, e + 1, 5 + e, 9 + e] for e in range(E)]).T
    FToB = np.full(13, BC_DIRICHLET, dtype=np.int64)
    FToB[1:4] = BC_LOCKED_INTERFACE
    Narr = np.full(E, N)
    prob, _ = build_problem(p, verts, etov, etof, FToB, Narr, Narr)
    return prob


def _mb_sources(prob, K=2, seed=0):
    """JH-weighted Gaussian volume loads (material-independent RHS)."""
    E = len(prob.lops)
    N = prob.lops[0].Nr
    rng = np.random.default_rng(seed)
    srcs = np.zeros((K, E, N + 1, N + 1))
    for k in range(K):
        e = int(rng.integers(E))
        lop = prob.lops[e]
        x, y = lop.coord
        cx = float(x.mean()) + 0.2 * rng.standard_normal()
        cy = float(y.mean()) + 0.1 * rng.standard_normal()
        f = np.exp(-((x - cx) ** 2 + (y - cy) ** 2) / 0.03)
        srcs[k, e] = (lop.JH.reshape(N + 1, N + 1) * f)
    return srcs


def test_mb_material_forward_matches_heterogeneous_host():
    """The scaled-background multiblock forward must equal a host
    direct solve of the TRUE heterogeneous problem (locoperator
    rebuilt with crr=mu*crr etc. per block) — the exact-homogeneity
    property the design relies on."""
    from hybridsbp_tpu.hybrid.solve import HybridProblem
    from hybridsbp_tpu.inverse import make_material_inversion_mb
    from hybridsbp_tpu.ops2d import locoperator

    prob = _mb_strip()
    E, N = len(prob.lops), prob.lops[0].Nr
    mu = np.array([1.0, 2.0, 0.7, 1.5])
    theta = jnp.asarray(np.log(mu))
    srcs = _mb_sources(prob, K=2)

    inv = make_material_inversion_mb(prob, per=2, tol=1e-12,
                                     maxiter=4000)
    d_dev = np.asarray(inv.forward(theta, jnp.asarray(srcs)))

    # host: true heterogeneous assembly
    lops_h = {}
    for e in range(E):
        lop = prob.lops[e]
        m = lop.metrics
        lops_h[e] = locoperator(
            prob.lops[e].p, N, N, m, lop.bctype,
            crr=mu[e] * np.asarray(m.crr), css=mu[e] * np.asarray(m.css),
            crs=mu[e] * np.asarray(m.crs))
    prob_h = HybridProblem.build(
        lops_h, (prob.EToF, prob.FToB, prob.FToE, prob.FToLF,
                 prob.EToO, prob.EToS))
    bi, si, ri = inv.stations
    for k in range(srcs.shape[0]):
        u, _ = prob_h.solve(srcs[k].reshape(-1), np.zeros(
            int(prob_h.FToLstarts[-1])), method="trace")
        ub = u.reshape(E, N + 1, N + 1)
        np.testing.assert_allclose(d_dev[k], ub[bi, si, ri],
                                   rtol=1e-8, atol=1e-12)


def test_mb_material_gradient_fd():
    """jax.grad of the multiblock material loss (adjoint through the
    coupled implicit solve + the per-block operator scaling) matches
    central finite differences."""
    from hybridsbp_tpu.inverse import make_material_inversion_mb

    prob = _mb_strip(N=8)
    srcs = jnp.asarray(_mb_sources(prob, K=2))
    inv = make_material_inversion_mb(prob, per=2, tol=1e-12,
                                     maxiter=4000, smooth=1e-3)
    th_true = jnp.asarray(np.log([1.0, 1.8, 0.8, 1.3]))
    d_obs = inv.forward(th_true, srcs)

    th0 = jnp.zeros(4)
    g = jax.grad(lambda th: inv.loss(th, srcs, d_obs))(th0)
    eps = 1e-5
    for i in range(4):
        dth = np.zeros(4)
        dth[i] = eps
        fp = float(inv.loss(th0 + dth, srcs, d_obs))
        fm = float(inv.loss(th0 - dth, srcs, d_obs))
        fd = (fp - fm) / (2 * eps)
        assert abs(fd - float(g[i])) < 2e-5 * max(1.0, abs(fd)), \
            (i, fd, float(g[i]))


@pytest.mark.heavy
def test_mb_material_recovery_and_sharded_parity():
    """End-to-end: recover a 4-block material contrast through the
    coupled solve; and the mesh= (virtual 8-device, block-sharded)
    forward matches the single-device forward at heterogeneous theta."""
    from jax.sharding import Mesh

    from hybridsbp_tpu.inverse import (invert_material_mb,
                                       make_material_inversion_mb)

    prob = _mb_strip(N=8)
    srcs = jnp.asarray(_mb_sources(prob, K=3, seed=3))
    inv = make_material_inversion_mb(prob, per=2, tol=1e-11,
                                     maxiter=3000, smooth=1e-6)
    th_true = jnp.asarray(np.log([1.0, 2.0, 0.7, 1.4]))
    d_obs = inv.forward(th_true, srcs)

    res = invert_material_mb(inv, srcs, d_obs, steps=200, lr=0.1)
    err = np.abs(np.asarray(res.theta) - np.asarray(th_true)).max()
    assert err < 0.05, f"recovered log-mu off by {err:.3f}"
    assert float(res.losses[-1]) < float(res.losses[0]) * 1e-3

    mesh = Mesh(np.array(jax.devices()[:4]), ("block",))
    inv_sh = make_material_inversion_mb(prob, per=2, tol=1e-11,
                                        maxiter=3000, mesh=mesh)
    d_sh = np.asarray(jax.jit(inv_sh.forward_with)(
        inv_sh.arrs, th_true, srcs))
    np.testing.assert_allclose(d_sh, np.asarray(d_obs), rtol=1e-8,
                               atol=1e-12)
