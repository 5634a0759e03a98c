"""On-device operator assembly parity (tpu/assemble_device.py).

The device-assembled DIA planes must equal to_dia(locoperator(...).M)
exactly (f64) — curved metrics, every bc mix, rectangular blocks,
p in {2, 4, 6}.  Reference assembly: global_curved.jl:322-486.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybridsbp_tpu import BC_DIRICHLET, BC_LOCKED_INTERFACE, BC_NEUMANN
from hybridsbp_tpu.mesh import create_metrics
from hybridsbp_tpu.ops2d import locoperator
from hybridsbp_tpu.tpu.assemble_device import (assemble_planes,
                                               extract_assembly_data)
from hybridsbp_tpu.tpu.stencil import to_dia


def _curved(p, Nr, Ns):
    def xf(r, s):
        return (r + 0.08 * np.sin(1.1 * r + 0.4 * s),
                1 + 0.08 * 1.1 * np.cos(1.1 * r + 0.4 * s),
                0.08 * 0.4 * np.cos(1.1 * r + 0.4 * s))

    def yf(r, s):
        return (s + 0.06 * np.cos(0.8 * r) * np.sin(0.9 * s),
                -0.06 * 0.8 * np.sin(0.8 * r) * np.sin(0.9 * s),
                1 + 0.06 * 0.9 * np.cos(0.8 * r) * np.cos(0.9 * s))

    return create_metrics(p, Nr, Ns, xf, yf)


def _compare(p, Nr, Ns, bctype):
    m = _curved(p, Nr, Ns)
    lop = locoperator(p, Nr, Ns, m, bctype)
    want = to_dia(lop.M, Nr + 1, Ns + 1)

    data = extract_assembly_data(p, Nr, Ns)
    mask = jnp.asarray([1.0 if b == BC_NEUMANN else 0.0 for b in bctype])
    got = assemble_planes(data, jnp.asarray(m.crr), jnp.asarray(m.css),
                          jnp.asarray(m.crs), mask)

    wmap = dict(zip(want.offsets, np.asarray(want.coefs)))
    scale = max(np.abs(np.asarray(want.coefs)).max(), 1.0)
    for k, off in enumerate(data.offsets):
        g = np.asarray(got[k])
        w = wmap.get(off, np.zeros_like(g))
        err = np.abs(g - w).max()
        assert err < 1e-11 * scale, \
            f"plane {off}: max err {err:.3e} (scale {scale:.1e})"
    # no host plane outside the canonical set
    missing = set(want.offsets) - set(data.offsets)
    assert not missing, f"host planes missing from canonical set: {missing}"


@pytest.mark.parametrize("p", [2, 4, 6])
def test_dirichlet_parity(p):
    _compare(p, 3 * p + 6, 3 * p + 6, (BC_DIRICHLET,) * 4)


@pytest.mark.parametrize("p", [2, 4])
def test_neumann_parity(p):
    _compare(p, 3 * p + 6, 3 * p + 6,
             (BC_DIRICHLET, BC_NEUMANN, BC_NEUMANN, BC_DIRICHLET))


def test_mixed_interface_rectangular_parity():
    _compare(2, 14, 11, (BC_LOCKED_INTERFACE, BC_NEUMANN, BC_DIRICHLET,
                         BC_NEUMANN))


def test_all_neumann_p6_parity():
    _compare(6, 25, 25, (BC_NEUMANN,) * 4)


def test_build_blocked_assemble_on_device():
    """build_blocked(assemble_on_device=True) matches the host
    extraction plane-by-plane on a curved 2-block problem (the device
    offset set is the canonical superset)."""
    from hybridsbp_tpu import BC_JUMP_INTERFACE
    from hybridsbp_tpu.hybrid import build_problem
    from hybridsbp_tpu.tpu import build_blocked

    verts = np.array([[0.0, 1.0, 2.0, 0.0, 1.0, 2.0],
                      [0.0, 0.1, 0.0, 1.0, 1.1, 1.0]])
    etov = np.array([[0, 1], [1, 2], [3, 4], [4, 5]])
    etof = np.array([[0, 1], [1, 2], [3, 4], [5, 6]])
    FToB = np.array([BC_DIRICHLET, BC_JUMP_INTERFACE, BC_DIRICHLET,
                     BC_NEUMANN, BC_NEUMANN, BC_DIRICHLET, BC_DIRICHLET])
    N = np.full(2, 11)
    prob, _ = build_problem(2, verts, etov, etof, FToB, N, N)

    bh = build_blocked(prob)
    bd = build_blocked(prob, assemble_on_device=True)
    assert set(bh.offsets) <= set(bd.offsets)
    hmap = dict(zip(bh.offsets, np.asarray(bh.coefs).swapaxes(0, 1)))
    scale = np.abs(np.asarray(bh.coefs)).max()
    for k, off in enumerate(bd.offsets):
        g = np.asarray(bd.coefs[:, k])
        w = hmap.get(off, np.zeros_like(g))
        assert np.abs(g - w).max() < 1e-11 * scale, off


def test_assemble_on_device_honors_tau_scale_and_overrides():
    """A problem built with a non-default tau_scale and per-block
    crr/css/crs coefficient overrides (the spectral-validation path,
    drivers/global_op_eigenvalues.py) must re-assemble to the SAME
    operator on device: locoperator records tau_scale and the effective
    coefficients, and build_blocked keys its assembly data on them
    (review r3: the device path silently used tau_scale=2.0 and the
    geometric metrics)."""
    from hybridsbp_tpu import BC_JUMP_INTERFACE
    from hybridsbp_tpu.hybrid import build_problem
    from hybridsbp_tpu.tpu import build_blocked

    verts = np.array([[0.0, 1.0, 2.0, 0.0, 1.0, 2.0],
                      [0.0, 0.1, 0.0, 1.0, 1.1, 1.0]])
    etov = np.array([[0, 1], [1, 2], [3, 4], [4, 5]])
    etof = np.array([[0, 1], [1, 2], [3, 4], [5, 6]])
    FToB = np.array([BC_DIRICHLET, BC_JUMP_INTERFACE, BC_DIRICHLET,
                     BC_NEUMANN, BC_NEUMANN, BC_DIRICHLET, BC_DIRICHLET])
    N = np.full(2, 11)
    prob, _ = build_problem(2, verts, etov, etof, FToB, N, N,
                            tau_scale=1.25)
    assert prob.lops[0].tau_scale == 1.25

    # random SPD coefficient overrides on block 1 (as the global
    # eigenvalue validator does), keeping block 0 on its metrics
    rng = np.random.default_rng(3)
    l1 = prob.lops[1]
    m1 = l1.metrics
    crr = m1.crr * (1 + 0.3 * rng.random(m1.crr.shape))
    css = m1.css * (1 + 0.3 * rng.random(m1.css.shape))
    prob.lops[1] = locoperator(2, l1.Nr, l1.Ns, m1, l1.bctype,
                               tau_scale=1.25, crr=crr, css=css)

    bh = build_blocked(prob)
    bd = build_blocked(prob, assemble_on_device=True)
    hmap = dict(zip(bh.offsets, np.asarray(bh.coefs).swapaxes(0, 1)))
    scale = np.abs(np.asarray(bh.coefs)).max()
    for k, off in enumerate(bd.offsets):
        g = np.asarray(bd.coefs[:, k])
        w = hmap.get(off, np.zeros_like(g))
        assert np.abs(g - w).max() < 1e-11 * scale, off

    # mixed tau_scale across blocks is refused, not silently wrong
    prob.lops[0] = locoperator(2, l1.Nr, l1.Ns, prob.lops[0].metrics,
                               prob.lops[0].bctype, tau_scale=2.0)
    with pytest.raises(AssertionError, match="tau_scale"):
        build_blocked(prob, assemble_on_device=True)


def test_geometry_ensemble_vmapped_solve():
    """Geometry-ensemble capability unlocked by on-device assembly:
    operators for G perturbed geometries assemble in one vmapped
    device call (no per-member host sparse assembly) and solve in one
    batched CG.  Each member is checked against its host solve."""
    import scipy.sparse.linalg as spla

    from hybridsbp_tpu.tpu.cg import cg
    from hybridsbp_tpu.tpu.stencil import to_dia

    p, N = 2, 12
    G = 4
    data = extract_assembly_data(p, N, N)
    kidx = {o: k for k, o in enumerate(data.offsets)}

    def member_metrics(amp):
        def xf(r, s, amp=amp):
            return (r + amp * np.sin(1.1 * r + 0.4 * s),
                    1 + amp * 1.1 * np.cos(1.1 * r + 0.4 * s),
                    amp * 0.4 * np.cos(1.1 * r + 0.4 * s))

        def yf(r, s, amp=amp):
            return (s + amp * np.cos(0.8 * r) * np.sin(0.9 * s),
                    -amp * 0.8 * np.sin(0.8 * r) * np.sin(0.9 * s),
                    1 + amp * 0.9 * np.cos(0.8 * r) * np.cos(0.9 * s))

        return create_metrics(p, N, N, xf, yf)

    amps = [0.02, 0.05, 0.08, 0.11]
    ms = [member_metrics(a) for a in amps]
    crr = jnp.stack([jnp.asarray(m.crr) for m in ms])
    css = jnp.stack([jnp.asarray(m.css) for m in ms])
    crs = jnp.stack([jnp.asarray(m.crs) for m in ms])
    mask = jnp.zeros((G, 4))

    coefs = jax.jit(jax.vmap(
        lambda a, b, c, mk: assemble_planes(data, a, b, c, mk)))(
        crr, css, crs, mask)
    assert coefs.shape[:2] == (G, len(data.offsets))

    rng = np.random.default_rng(23)
    b = jnp.asarray(rng.standard_normal((G, N + 1, N + 1)))
    diag = coefs[:, kidx[(0, 0)]]

    def solve_one(cf, dg, bb):
        op = type("Op", (), {"coefs": cf, "offsets": data.offsets,
                             "shape": (N + 1, N + 1)})()
        return cg(lambda u: dia_apply(op, u), bb, tol=1e-11,
                  maxiter=4000, precond=lambda r: r / dg).x

    from hybridsbp_tpu.tpu.stencil import dia_apply
    xs = jax.jit(jax.vmap(solve_one))(coefs, diag, b)

    for gmem, m in enumerate(ms):
        lop = locoperator(p, N, N, m)
        want = spla.spsolve(lop.M.tocsc(),
                            np.asarray(b[gmem]).ravel())
        np.testing.assert_allclose(np.asarray(xs[gmem]).ravel(), want,
                                   rtol=1e-6, atol=1e-8)


def test_assembly_contractions_pinned_to_highest_precision():
    """Every contraction in assemble_planes must carry HIGHEST precision.

    On TPU, f32 einsums otherwise lower to bf16 MXU passes — a ~3e-3
    operator perturbation that fine-level conditioning amplifies to
    O(1) solution error (measured: the N=136 flagship assemble-device
    solve "converged" to rel err 0.82 before the pin).
    """
    p, N = 4, 18
    m = _curved(p, N, N)
    data = extract_assembly_data(p, N, N)
    mask = jnp.zeros(4)
    f32 = lambda a: jnp.asarray(np.asarray(a), dtype=jnp.float32)
    jaxpr = jax.make_jaxpr(
        lambda a, b, c: assemble_planes(data, a, b, c, mask))(
        f32(m.crr), f32(m.css), f32(m.crs))
    dots = [e for e in jaxpr.jaxpr.eqns if e.primitive.name == "dot_general"]
    assert dots, "expected dot_general contractions in the assembly jaxpr"
    bad = [str(e.params["precision"]) for e in dots
           if e.params.get("precision")
           != (jax.lax.Precision.HIGHEST, jax.lax.Precision.HIGHEST)]
    assert not bad, f"{len(bad)} contraction(s) without HIGHEST precision"
