"""Gradient-based PDE-constrained inversion (beyond-reference capability).

The reference (`/root/reference/global_curved.jl`) is a forward-modeling
code: recovering model parameters (a material field, boundary data) from
observations would need hand-derived adjoint solves.  Here the whole
forward pipeline is differentiable JAX — the on-device operator assembly
(:mod:`.tpu.assemble_device`, linear in the coefficient planes) composed
with the implicitly-differentiated CG solve (:func:`.tpu.cg.cg_solve`,
``lax.custom_linear_solve``) — so ``d(misfit)/d(material field)`` is one
``jax.grad`` call: the adjoint-state method for free, at the cost of one
extra (SPD, so self-transposed) solve per source.  The optimization loop
is a ``lax.scan`` of optax updates, so the ENTIRE inversion — assembly +
K forward solves + K adjoint solves per step, hundreds of steps —
compiles to one XLA program and runs on-device.

Physical setup (single curvilinear block): solve

    -div( mu(x) * grad u ) = f_k   on the mapped block,  u = 0 on the
                                   boundary (SAT-Dirichlet),

for K known source fields ``f_k``; observe ``u_k`` at a sparse station
set; recover ``mu`` from the observations.  ``mu`` multiplies the
geometric coefficient planes (crr, css, crs), so the assembled operator
is exactly ``locoperator(..., crr=mu*crr0, css=mu*css0, crs=mu*crs0)``
— the parity-gated override path (tests/test_assemble_device.py).

The material field is parameterized as ``mu = exp(resize(theta))`` on a
coarse control grid (positivity + mesh-independent regularization), with
an optional first-difference smoothness penalty on ``theta``.

The second half of the module inverts FAULT SLIP through the coupled
MULTIBLOCK solve (:func:`.tpu.multiblock.solve_displacements_implicit`):
the slip -> RHS map is linear and solve-free, so it is host-probed once
(:func:`probe_slip_rhs_map`) and :func:`invert_linear` solves the
regularized normal equations exactly with ``jax.linear_transpose``
supplying the adjoint — see DESIGN.md §8.

Demo drivers: ``drivers/invert_material.py``, ``drivers/invert_slip.py``;
gates: tests/test_inverse.py.
"""
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .mesh import create_metrics
from .ops2d import locoperator
from .tpu.assemble_device import assemble_planes, extract_assembly_data
from .tpu.cg import cg_solve
from .tpu.fastdiag import build_fastdiag, fastdiag_apply
from .tpu.stencil import DiaOperator, dia_apply


class MaterialInversion(NamedTuple):
    """The differentiable forward model + loss of one inversion setup."""
    p: int
    N: int
    ctrl: int                       # control-grid extent (ctrl x ctrl)
    stations: Tuple[np.ndarray, np.ndarray]   # (s_idx, r_idx), paired
    upsample: Callable              # theta (ctrl, ctrl) -> (Nsp, Nrp)
    forward: Callable               # (theta, sources (K,Nsp,Nrp)) -> (K,nsta)
    loss: Callable                  # (theta, sources, d_obs) -> scalar
    smooth: float = 1e-5            # the loss's smoothness weight


class InversionResult(NamedTuple):
    theta: jnp.ndarray              # (ctrl, ctrl) final control values
    mu: jnp.ndarray                 # (Nsp, Nrp) recovered material field
    losses: jnp.ndarray             # (steps,) loss trajectory


def station_grid(N: int, nsta: int = 8, margin: Optional[int] = None):
    """An nsta x nsta interior lattice of observation nodes (paired
    index arrays into the (Nsp, Nrp) field)."""
    if margin is None:
        margin = max(2, (N + 1) // (nsta + 2))
    pts = np.linspace(margin, N - margin, nsta).round().astype(np.int64)
    si, ri = np.meshgrid(pts, pts, indexing="ij")
    return si.ravel(), ri.ravel()


def make_material_inversion(p: int, N: int, *, metrics=None, nsta: int = 8,
                            ctrl: int = 7, smooth: float = 1e-5,
                            tol: float = 1e-10, maxiter: int = 2000,
                            precond: bool = True, mesh=None,
                            source_axis: str = "src",
                            dtype=jnp.float64) -> MaterialInversion:
    """Build the differentiable forward model for material inversion on
    one block.

    ``precond=True`` uses the fast-diagonalization preconditioner of the
    BACKGROUND (mu=1) operator inside CG — a fixed linear map, so it
    changes only the solver path, never the solution or its adjoint.

    ``mesh``: an optional ``jax.sharding.Mesh`` with a ``source_axis``
    — the K independent source solves are then DATA-PARALLEL over the
    devices (sharding constraints on the source batch; GSPMD partitions
    the vmapped CG — everything else is per-source — and inserts the
    psum over sources in the loss gradient).  The operator/theta stay
    replicated: the complement of the model-parallel block-sharded slip
    inversion (:func:`make_slip_inversion` ``mesh=``).  K must divide
    evenly by the axis size.
    """
    if metrics is None:
        metrics = create_metrics(p, N, N)
    data = extract_assembly_data(p, N, N)
    crr0 = jnp.asarray(metrics.crr, dtype=dtype)
    css0 = jnp.asarray(metrics.css, dtype=dtype)
    crs0 = jnp.asarray(metrics.crs, dtype=dtype)
    si, ri = station_grid(N, nsta)
    si_j, ri_j = jnp.asarray(si), jnp.asarray(ri)

    prec = None
    if precond:
        fd = build_fastdiag(locoperator(p, N, N, metrics), dtype=dtype)
        prec = lambda r: fastdiag_apply(fd, r)          # noqa: E731

    Nsp = N + 1

    def upsample(theta):
        return jax.image.resize(theta.astype(dtype), (Nsp, Nsp), "cubic")

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        src_sh = NamedSharding(mesh, PartitionSpec(source_axis))

    def forward(theta, sources):
        mu = jnp.exp(upsample(theta))
        coefs = assemble_planes(data, mu * crr0, mu * css0, mu * crs0,
                                jnp.zeros((4,), dtype=dtype))
        op = DiaOperator(coefs=coefs, offsets=data.offsets)

        def solve1(b):
            return cg_solve(lambda u: dia_apply(op, u), b,
                            tol=tol, maxiter=maxiter, precond=prec)

        srcs = sources.astype(dtype)
        if mesh is not None:
            srcs = jax.lax.with_sharding_constraint(srcs, src_sh)
        u = jax.vmap(solve1)(srcs)
        if mesh is not None:
            u = jax.lax.with_sharding_constraint(u, src_sh)
        return u[:, si_j, ri_j]

    def loss(theta, sources, d_obs):
        # misfit is normalized by the data energy so its scale (and the
        # meaning of ``smooth``) is independent of source amplitudes
        resid = forward(theta, sources) - d_obs
        mis = 0.5 * jnp.sum(resid * resid) / jnp.sum(d_obs * d_obs)
        reg = (jnp.sum(jnp.diff(theta, axis=0) ** 2)
               + jnp.sum(jnp.diff(theta, axis=1) ** 2))
        return mis + smooth * reg

    return MaterialInversion(p=p, N=N, ctrl=ctrl, stations=(si, ri),
                             upsample=upsample, forward=forward, loss=loss,
                             smooth=smooth)


def invert_material(inv: MaterialInversion, sources, d_obs, *,
                    steps: int = 200, lr: float = 0.2, theta0=None,
                    optimizer=None) -> InversionResult:
    """Run the full inversion as ONE jitted lax.scan of optax updates."""
    import optax

    opt = optimizer if optimizer is not None else optax.adam(lr)
    th0 = (jnp.zeros((inv.ctrl, inv.ctrl), dtype=jnp.result_type(d_obs))
           if theta0 is None else jnp.asarray(theta0))
    vg = jax.value_and_grad(lambda th: inv.loss(th, sources, d_obs))

    @jax.jit
    def run(th0):
        def step(carry, _):
            th, ost = carry
            val, g = vg(th)
            upd, ost = opt.update(g, ost, th)
            return (optax.apply_updates(th, upd), ost), val

        (th, _), losses = jax.lax.scan(step, (th0, opt.init(th0)), None,
                                       length=steps)
        return th, losses

    th, losses = run(th0)
    return InversionResult(theta=th, mu=jnp.exp(inv.upsample(th)),
                           losses=losses)


def ctrl_smoothness(ctrl: int) -> np.ndarray:
    """The (ctrl², ctrl²) matrix R with ``theta' R theta`` equal to the
    loss's smoothness term (sum of squared first differences along both
    control-grid axes) — the exact quadratic form invert_material's
    objective penalizes."""
    n = ctrl * ctrl
    idx = np.arange(n).reshape(ctrl, ctrl)
    rows = []
    for i in range(ctrl - 1):
        for j in range(ctrl):
            r = np.zeros(n)
            r[idx[i + 1, j]], r[idx[i, j]] = 1.0, -1.0
            rows.append(r)
    for i in range(ctrl):
        for j in range(ctrl - 1):
            r = np.zeros(n)
            r[idx[i, j + 1]], r[idx[i, j]] = 1.0, -1.0
            rows.append(r)
    L = np.stack(rows)
    return L.T @ L


def material_posterior(inv: MaterialInversion, theta_map, sources, d_obs,
                       *, sigma: float):
    """Laplace (Gauss-Newton) posterior of the material inversion at the
    MAP point ``theta_map`` (from :func:`invert_material`).

    The Jacobian J = d(stations)/d(theta) flows by ``jax.jacfwd``
    through assembly + the implicitly-differentiated solves (ctrl²
    tangents, each one extra solve per source, all batched).  The loss
    normalizes the misfit by the data energy Sd, so minimizing it is
    the MAP of a Gaussian model with noise std ``sigma`` and prior
    precision ``2 smooth Sd R / sigma²`` — hence

        Cov_theta = sigma² (J'J + 2 smooth Sd R)^-1,
        Res       = (J'J + 2 smooth Sd R)^-1 J'J,

    with R the exact loss quadratic form (:func:`ctrl_smoothness`).
    The pointwise std of ``mu = exp(upsample(theta))`` follows by the
    delta method through the (linear) upsample and the exp.

    Returns ``(mu_map (Nsp,Nsp), std_mu (Nsp,Nsp), resol (n,n),
    U (Nsp*Nsp, n))`` — U is the (linear) log-space upsample Jacobian,
    returned so callers computing resolution-filtered fields don't
    re-derive it.
    """
    c = inv.ctrl
    n = c * c
    th = jnp.asarray(theta_map)
    J = jax.jit(jax.jacfwd(
        lambda t: inv.forward(t.reshape(c, c), sources)))(th.ravel())
    J = np.asarray(J).reshape(-1, n)                    # (K*nsta, n)
    Sd = float(np.sum(np.asarray(d_obs) ** 2))
    R = ctrl_smoothness(c)
    A = J.T @ J + 2.0 * inv.smooth * Sd * R
    Ainv = np.linalg.inv(A)
    cov_th = sigma ** 2 * Ainv
    resol = Ainv @ (J.T @ J)
    # delta method: mu = exp(U theta) with U the (linear) upsample
    U = np.asarray(jax.jacfwd(
        lambda t: inv.upsample(t.reshape(c, c)))(th.ravel()))
    Nsp = U.shape[0]
    U2 = U.reshape(-1, n)
    var_log = np.einsum("ij,jk,ik->i", U2, cov_th, U2)
    mu = np.asarray(jnp.exp(inv.upsample(th)))
    std_mu = mu.ravel() * np.sqrt(np.maximum(var_log, 0.0))
    return mu, std_mu.reshape(Nsp, Nsp), resol, U2


# ---------------------------------------------------------------------------
# fault-slip inversion through the multiblock hybrid solve
# ---------------------------------------------------------------------------
class SlipInversion(NamedTuple):
    """Differentiable forward model for fault-slip inversion on a
    multiblock mesh: slip nodal values -> station displacements through
    the coupled device solve."""
    nf: int                                  # number of slip unknowns
    fault_faces: np.ndarray                  # global face ids
    FTods: np.ndarray                        # slip-dof offsets per face
    stations: Tuple[np.ndarray, ...]         # (block, s, r) index arrays
    forward: Callable                        # delta (nf,) -> (nsta,)
    reg_mv: Callable                         # delta -> R @ delta (2nd diff)
    Rmat: jnp.ndarray                        # the (nf, nf) smoothness R
    arrs: Optional[dict] = None              # operator arrays (jit args)
    forward_with: Optional[Callable] = None  # (arrs, delta) -> (nsta,)


class SlipRHSMap(NamedTuple):
    """Compact host-probed linear map slip dofs -> blocked RHS.

    A unit slip at one dof touches only its face's (at most) two
    adjacent blocks and its own face row, so columns are stored
    compactly — O(nf N^2), not O(nf E N^2) — and applied by
    scatter-add (linear, hence transposable by jax)."""
    Gg: jnp.ndarray          # (nf, 2, Nsp, Nrp) adjacent-block columns
    blocks: jnp.ndarray      # (nf, 2) block ids (slot 1 zero-padded
    Gd: jnp.ndarray          # (nf, L) own-face row        # if e1 == e2)
    faces: jnp.ndarray       # (nf,) face ids
    E: int
    nfaces: int

    def apply(self, delta):
        nf, _, Nsp, Nrp = self.Gg.shape
        gcols = self.Gg * delta[:, None, None, None]
        g = jnp.zeros((self.E, Nsp, Nrp), gcols.dtype).at[
            self.blocks.reshape(-1)].add(gcols.reshape(-1, Nsp, Nrp))
        gd = jnp.zeros((self.nfaces, self.Gd.shape[1]), gcols.dtype).at[
            self.faces].add(self.Gd * delta[:, None])
        return g, gd


def probe_slip_rhs_map(prob, dtype=jnp.float64):
    """Host-probe the LINEAR map from fault-slip nodal values to the
    blocked RHS: column n = (g, gδ) of a unit slip at slip dof n.

    No solves are involved — each column is (at most) two
    ``locbcarray`` calls on the dof's face-adjacent blocks (the jump
    data enters both the volume RHS and the face RHS, reference
    global_curved.jl SAT terms), so probing costs O(nf) local RHS
    assemblies.  Dofs cover EVERY jump-type face (code >=
    BC_JUMP_INTERFACE — e.g. both the frictional and steady-slide
    faces of the BP1 meshes).  Returns ``(map, FTods, fault_faces)``
    with ``map`` a :class:`SlipRHSMap` in the blocked layouts of
    :func:`.tpu.multiblock.blocked_rhs_from_host`.
    """
    from . import BC_JUMP_INTERFACE
    from .hybrid.assemble import assemble_jump_rhs, bcstarts

    lops, vstarts = prob.lops, prob.vstarts
    FToB, FToE, FToLF = prob.FToB, prob.FToE, prob.FToLF
    fault_faces = np.where(FToB >= BC_JUMP_INTERFACE)[0]
    jump_codes = sorted(int(c) for c in np.unique(FToB)
                        if c >= BC_JUMP_INTERFACE)
    FTods = bcstarts(FToB, FToE, FToLF, jump_codes, lops)
    nf = int(FTods[-1])
    L = max(lo.Nr + 1 for lo in lops.values())
    L = max(L, max(lo.Ns + 1 for lo in lops.values()))
    delta = np.zeros(nf)

    shp = np.shape(lops[0].coord[0])
    assert all(np.shape(lo.coord[0]) == shp for lo in lops.values()), \
        "probe_slip_rhs_map's compact storage assumes uniform block shapes"
    Gg = np.zeros((nf, 2, *shp))
    blocks = np.zeros((nf, 2), dtype=np.int32)
    Gd = np.zeros((nf, L))
    faces = np.zeros((nf,), dtype=np.int32)
    for f in fault_faces:
        es = sorted({int(FToE[0, f]), int(FToE[1, f])})
        for j in range(int(FTods[f + 1] - FTods[f])):
            n = int(FTods[f]) + j
            delta[:] = 0.0
            delta[n] = 1.0
            g, gd = assemble_jump_rhs(prob, delta, FTods, elements=es)
            faces[n] = f
            s0, s1 = int(prob.FToLstarts[f]), int(prob.FToLstarts[f + 1])
            Gd[n, :s1 - s0] = gd[s0:s1]
            for slot, e in enumerate(es):
                blocks[n, slot] = e
                Gg[n, slot] = g[vstarts[e]:vstarts[e + 1]].reshape(
                    Gg.shape[2:])
    return (SlipRHSMap(Gg=jnp.asarray(Gg, dtype=dtype),
                       blocks=jnp.asarray(blocks),
                       Gd=jnp.asarray(Gd, dtype=dtype),
                       faces=jnp.asarray(faces),
                       E=len(lops), nfaces=len(FToB)),
            FTods, fault_faces)


def block_station_grid(prob, per=2):
    """``per x per`` interior observation nodes in every block (away
    from block edges, where interface jumps live)."""
    E = len(prob.lops)
    N = prob.lops[0].Nr
    assert all(lo.Nr == N and lo.Ns == N for lo in prob.lops.values()), \
        "block_station_grid assumes uniform square blocks"
    pts = np.linspace(0, N, per + 2).round().astype(np.int64)[1:-1]
    bi = np.repeat(np.arange(E), per * per)
    si, ri = np.meshgrid(pts, pts, indexing="ij")
    return (bi, np.tile(si.ravel(), E), np.tile(ri.ravel(), E))


def slip_smoothness(FTods, fault_faces, nf):
    """R = sum_f L_f' L_f with L_f the per-face second difference —
    smoothness within each fault face, no coupling across junctions."""
    R = np.zeros((nf, nf))
    for f in fault_faces:
        s0, s1 = int(FTods[f]), int(FTods[f + 1])
        n = s1 - s0
        if n < 3:
            continue
        L = np.zeros((n - 2, n))
        for i in range(n - 2):
            L[i, i:i + 3] = (1.0, -2.0, 1.0)
        R[s0:s1, s0:s1] += L.T @ L
    return R


def make_slip_inversion(prob, bp=None, *, per=2, trace_inv=None,
                        inner_iters=8, tol=1e-9, maxiter=300,
                        dtype=jnp.float64, mesh=None) -> SlipInversion:
    """Differentiable slip->stations forward model on a multiblock mesh
    (e.g. the flower fault network).

    The forward is linear: RHS columns from :func:`probe_slip_rhs_map`
    contract with the slip vector, and
    :func:`.tpu.multiblock.solve_displacements_implicit` carries the
    adjoint of the coupled solve — so ``jax.linear_transpose`` of the
    forward is one adjoint solve, and :func:`invert_linear` solves the
    regularized normal equations exactly.

    For accelerator runs, the returned ``arrs`` / ``forward_with``
    pair threads every large operator array (blocked operator, RHS-map
    columns, Woodbury inverse, R) through jit as *arguments* — the
    axon 413-avoidance convention (:func:`.tpu.multiblock.bp_arrays`);
    ``forward`` is the convenience closure form (CPU/eager use).

    ``mesh``: an optional ``jax.sharding.Mesh`` — the forward then
    runs the MULTI-CHIP sharded solve through that topology's
    differentiable implicit path (``custom_linear_solve`` adjoint
    re-solves the sharded system), dispatched on the axis names:
    ``('block',)`` -> :func:`.parallel.sharded.make_sharded_solver`;
    a ``slice`` axis -> the two-level cut-face DCN solver
    (:func:`.parallel.dcn.make_two_level_solver`); a ``space`` axis ->
    the 2D block x space solver
    (:func:`.parallel.sharded2d.make_sharded_solver_2d`).  The whole
    inversion (CGNE / dense Jacobian / refinement) scales over the
    device mesh unchanged."""
    from .tpu import build_blocked, build_woodbury
    from .tpu.multiblock import (bp_arrays, bp_with,
                                 solve_displacements_implicit,
                                 traceinv_arrays, traceinv_with)

    if bp is None:
        bp = build_blocked(prob, dtype=dtype)
    if trace_inv is None and prob.B is not None:
        trace_inv = build_woodbury(bp, prob, dtype=dtype)
    rhs_map, FTods, fault_faces = probe_slip_rhs_map(prob, dtype=dtype)
    nf = rhs_map.Gg.shape[0]
    bi, si, ri = block_station_grid(prob, per=per)
    bi_j, si_j, ri_j = jnp.asarray(bi), jnp.asarray(si), jnp.asarray(ri)
    Rmat = jnp.asarray(slip_smoothness(FTods, fault_faces, nf),
                       dtype=dtype)

    rhs_arrs = {"Gg": rhs_map.Gg, "blocks": rhs_map.blocks,
                "Gd": rhs_map.Gd, "faces": rhs_map.faces, "R": Rmat}

    if mesh is not None:
        axes = tuple(mesh.axis_names)
        if "slice" in axes:
            from .parallel.dcn import make_two_level_solver
            bpp_sh, _, _, slv = make_two_level_solver(
                bp, mesh, maxiter=maxiter, trace_inv=trace_inv,
                inner_iters=inner_iters)
            E_pad, sh_arrs, implicit = (bpp_sh.nblocks, slv.arrs,
                                        slv.implicit_with)
        elif "space" in axes:
            from .parallel.sharded2d import make_sharded_solver_2d
            bpp_sh, slv = make_sharded_solver_2d(
                bp, mesh, maxiter=maxiter, trace_inv=trace_inv,
                inner_iters=inner_iters)
            E_pad, sh_arrs, implicit = (bpp_sh.nblocks, slv.arrs,
                                        slv.implicit_with)
        elif "block" in axes:
            from .parallel.sharded import make_sharded_solver
            solver = make_sharded_solver(bp, mesh, maxiter=maxiter,
                                         trace_inv=trace_inv,
                                         inner_iters=inner_iters)
            E_pad, sh_arrs, implicit = (solver.bp.nblocks, solver.arrs,
                                        solver.solve_implicit_with)
        else:
            raise ValueError(
                f"unsupported mesh axes {axes}: expected 'block' "
                "(1D block sharding), 'slice' (+'block', two-level "
                "DCN), or 'space' (+'block', 2D block x space)")
        arrs = {"sh": sh_arrs, **rhs_arrs}

        def forward_with(a, delta):
            rm = rhs_map._replace(Gg=a["Gg"], blocks=a["blocks"],
                                  Gd=a["Gd"], faces=a["faces"])
            g, gd = rm.apply(delta)
            if E_pad > rm.E:
                g = jnp.concatenate(
                    [g, jnp.zeros((E_pad - rm.E,) + g.shape[1:], g.dtype)])
            u = implicit(a["sh"], g, gd, tol=tol, cg_maxiter=maxiter)
            return u[bi_j, si_j, ri_j]
    else:
        arrs = {"bp": bp_arrays(bp), **rhs_arrs}
        if trace_inv is not None:
            arrs["Binv"] = traceinv_arrays(trace_inv)

        def forward_with(a, delta):
            bp2 = bp_with(bp, a["bp"])
            ti2 = (traceinv_with(trace_inv, a["Binv"])
                   if trace_inv is not None else None)
            rm = rhs_map._replace(Gg=a["Gg"], blocks=a["blocks"],
                                  Gd=a["Gd"], faces=a["faces"])
            g, gd = rm.apply(delta)
            u = solve_displacements_implicit(bp2, g, gd, tol=tol,
                                             maxiter=maxiter, trace_inv=ti2,
                                             inner_iters=inner_iters)
            return u[bi_j, si_j, ri_j]

    return SlipInversion(nf=nf, fault_faces=fault_faces, FTods=FTods,
                         stations=(bi, si, ri),
                         forward=lambda d: forward_with(arrs, d),
                         reg_mv=lambda d: Rmat @ d, Rmat=Rmat,
                         arrs=arrs, forward_with=forward_with)


def dense_jacobian(forward: Callable, n: int, *, batch: int = 16,
                   dtype=jnp.float64, forward_with: Callable = None,
                   arrs=None):
    """Materialize the (nsta, n) Jacobian of a LINEAR forward model by
    pushing identity columns through it, ``batch`` at a time via vmap
    (batched coupled solves — one batched CG per chunk).  Feasible
    whenever n is small (static slip inversions are); enables exact
    Gauss-Newton and linear-Gaussian uncertainty quantification
    (:func:`linear_posterior`).

    Pass ``forward_with``/``arrs`` (see :class:`SlipInversion`) on an
    accelerator: the operator arrays then enter the vmapped program as
    jit arguments (413-safe), not HLO literals."""
    cols = []
    eye = jnp.eye(n, dtype=dtype)
    if forward_with is not None:
        fwd_v = jax.jit(jax.vmap(forward_with, in_axes=(None, 0)))
        run = lambda cols_: fwd_v(arrs, cols_)           # noqa: E731
    else:
        run = jax.jit(jax.vmap(forward))
    for c0 in range(0, n, batch):
        cols.append(np.asarray(run(eye[c0:c0 + batch])))
    return jnp.asarray(np.concatenate(cols, axis=0).T)


def linear_posterior(J, d_obs, *, lam: float, Rmat, sigma: float):
    """Exact linear-Gaussian inversion + uncertainty from a dense
    Jacobian: posterior mean, pointwise std, and the model resolution
    matrix.

    With Gaussian noise (std ``sigma``) and prior precision
    ``lam R / sigma^2``:

        mean = (J'J + lam R)^-1 J' d,
        Cov  = sigma^2 (J'J + lam R)^-1,
        Res  = (J'J + lam R)^-1 J'J   (how much of the true model the
                                       data resolve; I = perfect).
    """
    J = np.asarray(J)
    A = J.T @ J + lam * np.asarray(Rmat)
    Ainv = np.linalg.inv(A)
    mean = Ainv @ (J.T @ np.asarray(d_obs))
    cov = sigma ** 2 * Ainv
    res = Ainv @ (J.T @ J)
    return mean, np.sqrt(np.maximum(np.diag(cov), 0.0)), res


def invert_linear(forward: Callable, d_obs, n: int, *, lam: float = 0.0,
                  reg_mv: Optional[Callable] = None, tol: float = 1e-10,
                  maxiter: int = 200, forward_with: Callable = None,
                  arrs=None):
    """Exact Gauss–Newton for a LINEAR forward model: solve the
    regularized normal equations (J'J + lam R) x = J' d by CG, with
    J' supplied by ``jax.linear_transpose`` — each CG iteration costs
    one forward + one adjoint application (for the slip model: two
    coupled multiblock solves).  Returns the package CGResult.

    Pass ``forward_with``/``arrs`` (see :class:`SlipInversion`) on an
    accelerator: every operator array (and, when present, ``arrs['R']``
    as the regularizer matrix) then enters the single jitted program
    as an argument — closure arrays lower to HLO literals duplicated
    per while-loop computation and blow the axon remote-compile
    request limit (HTTP 413)."""
    from .tpu.cg import cg

    def _body(fwd, rmv, d):
        # one program for the WHOLE inversion (rhs adjoint + CGNE):
        # nothing dispatches eagerly (each eager op through the TPU
        # tunnel costs ~27 ms RTT — CLAUDE.md)
        x0 = jnp.zeros((n,), dtype=jnp.result_type(d))
        Jt = jax.linear_transpose(fwd, x0)

        def normal_mv(x):
            y, = Jt(fwd(x))
            if rmv is not None and lam:
                y = y + lam * rmv(x)
            return y

        rhs, = Jt(d)
        return cg(normal_mv, rhs, tol=tol, maxiter=maxiter)

    if forward_with is not None:
        @jax.jit
        def run_args(a, d):
            rmv = ((lambda x: a["R"] @ x) if "R" in a else reg_mv)
            return _body(lambda x: forward_with(a, x), rmv, d)

        return run_args(arrs, d_obs)

    @jax.jit
    def run(d):
        return _body(forward, reg_mv, d)

    return run(d_obs)


def invert_linear_refined(inv: SlipInversion, d_obs, *, lam: float = 0.0,
                          tol: float = 1e-4, maxiter: int = 100,
                          refine: int = 3):
    """Mixed-precision exact Gauss–Newton: single-precision inner CGNE
    solves (the accelerator-friendly dtype — build the model with
    ``make_slip_inversion(..., dtype=jnp.float32, tol=~1e-5)``) wrapped
    in double-precision iterative refinement of the normal equations.

    Each refinement step evaluates the normal-equation residual
    ``r_k = J'(d - J x_k) - lam R x_k`` and the correction solve
    ``(J'J + lam R) dx = r_k`` in ONE jitted f32 program (operator
    arrays as jit arguments — 413-safe), then accumulates
    ``x_{k+1} = x_k + dx`` in f64 on the host.  CGNE squares the
    condition number, so plain f32 CGNE stagnates near sqrt(eps_f32)
    relative error; refinement drives the solution to the f32
    *forward's* accuracy (~1e-6 relative in data space) at the cost of
    one extra forward per step.  Returns ``(x (f64), resnorms)`` with
    ``resnorms`` the f64-accumulated residual norm per step.

    Conditioning envelope (measured, flower network): refinement
    converges when cond(J'J + lam R) is within f32 CG reach — at
    cond ~2.5e5 (lam=1e-4) the refined solution matches the exact
    dense oracle to 8.6e-3 (1.7e-3 with 600 inner iters); at
    cond ~1e6 (lam=1e-5) f32 CG stalls and refinement diverges.
    Pick ``lam`` so cond(A) <~ 1e6, or stay f64
    (:func:`invert_linear`).
    """
    from .tpu.cg import cg

    fwd_w, arrs = inv.forward_with, inv.arrs
    dtype = inv.Rmat.dtype
    n = inv.nf

    @jax.jit
    def step(a, d, x):
        fwd = lambda z: fwd_w(a, z)                      # noqa: E731
        Jt = jax.linear_transpose(fwd, jnp.zeros((n,), dtype))

        def normal_mv(z):
            y, = Jt(fwd(z))
            if lam:
                y = y + lam * (a["R"] @ z)
            return y

        rn, = Jt(d - fwd(x))
        if lam:
            rn = rn - lam * (a["R"] @ x)
        res = cg(normal_mv, rn, tol=tol, maxiter=maxiter)
        return rn, res.x

    d32 = jnp.asarray(d_obs, dtype)
    x = np.zeros((n,), dtype=np.float64)
    resnorms = []
    for _ in range(refine):
        rn, dx = step(arrs, d32, jnp.asarray(x, dtype))
        resnorms.append(float(np.linalg.norm(np.asarray(rn, np.float64))))
        x = x + np.asarray(dx, np.float64)
    return x, np.asarray(resnorms)


# ---------------------------------------------------------------------------
# demo problem (host-generated observations)
# ---------------------------------------------------------------------------
def demo_material_field(metrics):
    """A two-anomaly material field on the block (positive, contrast ~3)."""
    x, y = metrics.coord
    return (1.0
            + 0.8 * np.exp(-((x - 0.35) ** 2 + (y - 0.30) ** 2) / 0.08)
            - 0.45 * np.exp(-((x + 0.40) ** 2 + (y + 0.45) ** 2) / 0.10))


def demo_problem(p: int, N: int, *, K: int = 6, nsta: int = 8,
                 noise: float = 0.0, seed: int = 0, metrics=None,
                 return_clean: bool = False):
    """Generate (mu_true, sources, d_obs) for the inversion demo.

    Observations are produced by the HOST sparse path
    (``locoperator`` overrides + ``scipy`` direct solve) — an
    independent code path from the device-assembly forward model used
    in the inversion (their operator parity is separately gated).
    ``noise`` is the relative std of Gaussian noise added per datum.
    ``return_clean`` appends the noise-free observations (for noise-std
    bookkeeping) so UQ callers don't re-run the K sparse solves.
    """
    import scipy.sparse.linalg as spla

    if metrics is None:
        metrics = create_metrics(p, N, N)
    mu_true = demo_material_field(metrics)
    lop = locoperator(p, N, N, metrics,
                      crr=mu_true * metrics.crr,
                      css=mu_true * metrics.css,
                      crs=mu_true * metrics.crs)

    # quadrature-weighted Gaussian sources on a ring (RHS of M u = H J f)
    x, y = metrics.coord
    from .ops1d import build_d1
    H = np.diag(build_d1(p, N)[2])        # Hr == Hs on the square block
    W = np.outer(H, H) * metrics.J
    ang = 2 * np.pi * np.arange(K) / K
    cx, cy = 0.55 * np.cos(ang), 0.55 * np.sin(ang)
    sources = np.stack([
        W * np.exp(-((x - cx[k]) ** 2 + (y - cy[k]) ** 2) / 0.05)
        for k in range(K)])

    si, ri = station_grid(N, nsta)
    lu = spla.splu(lop.M.tocsc())
    d_obs = np.stack([
        lu.solve(sources[k].ravel()).reshape(N + 1, N + 1)[si, ri]
        for k in range(K)])
    d_clean = d_obs
    if noise > 0:
        rng = np.random.default_rng(seed)
        d_obs = d_obs + noise * np.abs(d_obs).std() * rng.standard_normal(
            d_obs.shape)
    out = (mu_true, jnp.asarray(sources), jnp.asarray(d_obs))
    return out + (jnp.asarray(d_clean),) if return_clean else out


# ---------------------------------------------------------------------------
# Multiblock material inversion (VERDICT r3 next #5): recover a
# per-block material field THROUGH the trace-coupled hybrid solve.
# ---------------------------------------------------------------------------

class MBMaterialInversion(NamedTuple):
    """Differentiable per-block-material forward model on a multiblock
    mesh.  Exploits exact degree-1 homogeneity of the SBP-SAT local
    operator in its coefficient planes (ops2d.local_op: M, F, tau and
    hence the trace diagonal D are all linear under a per-block
    constant scaling mu_e > 0 — tau = (2s/h)(c^2/beta + ...)/psi with
    psi linear in c), so the coupled heterogeneous operator is the
    background BlockedHybrid with coefs/face tensors scaled by mu_e
    and D rebuilt from its per-side components.  Parity with a host
    locoperator(crr=mu*crr, ...) assembly is test-gated."""
    E: int
    stations: Tuple[np.ndarray, np.ndarray, np.ndarray]   # (bi, si, ri)
    smooth: float
    Lblk: np.ndarray              # block-adjacency Laplacian (E, E)
    forward: Callable             # (theta, sources) -> (K, nsta)
    loss: Callable                # (theta, sources, d_obs) -> scalar
    arrs: dict                    # operator arrays (jit ARGUMENTS)
    forward_with: Callable        # (arrs, theta, sources) -> (K, nsta)


def _face_D_sides(prob, dinv_shape):
    """Per-side components of the trace diagonal in the face-padded
    layout: D_f(mu) = mu[em_f]*Dm[f] + mu[ep_f]*Dp[f] (the two SAT
    penalties of glo_lambda_operator's D = Hf*(tau_m + tau_p), split
    by owning element so per-block material scalings compose).
    Returns (Dm, Dp, em, ep) with em/ep clamped to 0 on boundary rows
    (their Dm/Dp rows are zero)."""
    from . import BC_JUMP_INTERFACE as _BCJ
    from . import BC_LOCKED_INTERFACE as _BCL

    nfaces, L = dinv_shape
    Dm = np.zeros((nfaces, L))
    Dp = np.zeros((nfaces, L))
    FToE, FToLF, EToO = prob.FToE, prob.FToLF, prob.EToO
    em_arr = np.zeros(nfaces, dtype=np.int64)
    ep_arr = np.zeros(nfaces, dtype=np.int64)
    for f in range(nfaces):
        b = prob.FToB[f]
        if not (b == _BCL or b >= _BCJ):
            continue
        em, ep = int(FToE[0, f]), int(FToE[1, f])
        fm, fp = int(FToLF[0, f]), int(FToLF[1, f])
        lop_m, lop_p = prob.lops[em], prob.lops[ep]
        nl = lop_m.face_length(fm)
        tau_p = lop_p.tau[fp]
        if not EToO[fp, ep]:
            tau_p = tau_p[::-1]
        Dm[f, :nl] = lop_m.Hf[fm] * lop_m.tau[fm]
        Dp[f, :nl] = lop_m.Hf[fm] * tau_p
        em_arr[f], ep_arr[f] = em, ep
    return Dm, Dp, em_arr, ep_arr


def block_adjacency_laplacian(prob):
    """Graph Laplacian over blocks (edges = interior faces): the
    mesh-topology smoothness quadratic for per-block parameters."""
    from . import BC_JUMP_INTERFACE as _BCJ
    from . import BC_LOCKED_INTERFACE as _BCL

    E = len(prob.lops)
    Lb = np.zeros((E, E))
    for f in range(len(prob.FToB)):
        b = prob.FToB[f]
        if not (b == _BCL or b >= _BCJ):
            continue
        em, ep = int(prob.FToE[0, f]), int(prob.FToE[1, f])
        Lb[em, em] += 1.0
        Lb[ep, ep] += 1.0
        Lb[em, ep] -= 1.0
        Lb[ep, em] -= 1.0
    return Lb


def make_material_inversion_mb(prob, bp=None, *, per=2, smooth=1e-4,
                               tol=1e-9, maxiter=2000, inner_iters=8,
                               trace_inv=None, dtype=jnp.float64,
                               mesh=None) -> MBMaterialInversion:
    """Differentiable MULTIBLOCK material inversion: recover per-block
    log-materials ``theta`` (mu_e = exp(theta_e)) from sparse station
    observations of K source-driven solves of the COUPLED hybrid
    system (the single-block :func:`make_material_inversion` composed
    with the trace coupling — VERDICT r3 next #5; the square_circle
    mesh's two-domain setup, square_circle.jl:100-110, is the natural
    demo).

    The forward scales the background operator exactly (see
    :class:`MBMaterialInversion`): coefs_e, face tensors F_e and the
    per-side trace penalties are all linear in mu_e, so no host
    re-assembly is differentiated — one elementwise scale + the
    implicitly-differentiated coupled solve
    (:func:`.tpu.multiblock.solve_displacements_implicit`).  Sources
    are volume loads (JH-weighted), which are material-independent.

    ``mesh``: optional ``jax.sharding.Mesh`` with a ``block`` axis —
    the K solves then run through the sharded differentiable implicit
    path (:func:`.parallel.sharded.make_sharded_solver`), with the
    per-block scaling applied to the solver's own (padded) operator
    arrays inside the traced program.
    """
    from .tpu import build_blocked
    from .tpu.multiblock import bp_arrays, bp_with
    from .tpu.multiblock import solve_displacements_implicit

    if bp is None:
        # per-block scaling needs per-block stacks even on meshes whose
        # background blocks are identical (share_ops auto would fold them)
        bp = build_blocked(prob, dtype=dtype, flat=False,
                           share_ops=False)
    assert not bp.shared, \
        "per-block material scaling needs per-block coefficient stacks " \
        "(build_blocked(share_ops=False))"
    E = bp.nblocks
    bi, si, ri = block_station_grid(prob, per)
    bi_j, si_j, ri_j = map(jnp.asarray, (bi, si, ri))
    Dm, Dp, em_arr, ep_arr = _face_D_sides(prob, bp.Dinv.shape)
    Lblk = block_adjacency_laplacian(prob)
    nfaces, L = bp.Dinv.shape

    base = {"Dm": jnp.asarray(Dm, dtype=dtype),
            "Dp": jnp.asarray(Dp, dtype=dtype),
            "Lblk": jnp.asarray(Lblk, dtype=dtype)}
    em_j, ep_j = jnp.asarray(em_arr), jnp.asarray(ep_arr)
    zero_gd = jnp.zeros((nfaces, L), dtype=dtype)

    def _dinv_of(a, mu):
        D = mu[em_j][:, None] * a["Dm"] + mu[ep_j][:, None] * a["Dp"]
        pos = D > 0
        return jnp.where(pos, 1.0 / jnp.where(pos, D, 1.0), 0.0)

    if mesh is not None:
        from .parallel.sharded import make_sharded_solver

        solver = make_sharded_solver(bp, mesh, maxiter=maxiter,
                                     trace_inv=trace_inv,
                                     inner_iters=inner_iters)
        E_pad = solver.bp.nblocks
        arrs = {"sh": solver.arrs, **base}

        def forward_with(a, theta, sources):
            mu = jnp.exp(theta).astype(dtype)
            mu_pad = jnp.concatenate(
                [mu, jnp.ones((E_pad - E,), dtype=dtype)])
            sh = dict(a["sh"])
            sh["coefs"] = sh["coefs"] * mu_pad[:, None, None, None]
            if sh.get("coefs_flat") is not None:
                sh["coefs_flat"] = (sh["coefs_flat"]
                                    * mu_pad[:, None, None])
            sh["T"] = tuple(t * mu_pad[:, None, None, None]
                            for t in sh["T"])
            sh["Dinv"] = _dinv_of(a, mu).astype(dtype)

            outs = []
            for k in range(sources.shape[0]):     # K static and small
                gk = sources[k].astype(dtype)
                gk = jnp.concatenate([gk, jnp.zeros(
                    (E_pad - E,) + gk.shape[1:], dtype=dtype)])
                u = solver.solve_implicit_with(sh, gk, zero_gd, tol=tol,
                                               cg_maxiter=maxiter)
                outs.append(u[bi_j, si_j, ri_j])
            return jnp.stack(outs)
    else:
        arrs = {"bp": bp_arrays(bp), **base}

        def forward_with(a, theta, sources):
            mu = jnp.exp(theta).astype(dtype)
            b = dict(a["bp"])
            b["coefs"] = b["coefs"] * mu[:, None, None, None]
            if b.get("coefs_flat") is not None:
                b["coefs_flat"] = b["coefs_flat"] * mu[:, None, None]
            b["Tb"] = tuple(t * mu[:, None, None, None]
                            for t in b["Tb"])
            bp2 = bp_with(bp, b)
            bp2 = bp2._replace(Dinv=_dinv_of(a, mu).astype(dtype))

            def solve1(gk):
                return solve_displacements_implicit(
                    bp2, gk.astype(dtype), zero_gd, tol=tol,
                    maxiter=maxiter, inner_iters=inner_iters)

            u = jax.vmap(solve1)(sources)
            return u[:, bi_j, si_j, ri_j]

    def loss_with(a, theta, sources, d_obs):
        resid = forward_with(a, theta, sources) - d_obs
        mis = 0.5 * jnp.sum(resid * resid) / jnp.sum(d_obs * d_obs)
        reg = theta @ (a["Lblk"] @ theta)
        return mis + smooth * reg

    return MBMaterialInversion(
        E=E, stations=(bi, si, ri), smooth=smooth, Lblk=Lblk,
        forward=lambda th, s: forward_with(arrs, th, s),
        loss=lambda th, s, d: loss_with(arrs, th, s, d),
        arrs=arrs, forward_with=forward_with)


def invert_material_mb(inv: MBMaterialInversion, sources, d_obs, *,
                       steps: int = 150, lr: float = 0.15, theta0=None,
                       optimizer=None) -> InversionResult:
    """Adam on the multiblock material loss as ONE jitted lax.scan
    (operator arrays enter as jit arguments — 413-safe)."""
    import optax

    opt = optimizer if optimizer is not None else optax.adam(lr)
    th0 = (jnp.zeros((inv.E,), dtype=jnp.result_type(d_obs))
           if theta0 is None else jnp.asarray(theta0))

    @jax.jit
    def run(a, th0, sources, d_obs):
        vg = jax.value_and_grad(
            lambda th: _mb_loss(inv, a, th, sources, d_obs))

        def step(carry, _):
            th, ost = carry
            val, g = vg(th)
            upd, ost = opt.update(g, ost, th)
            return (optax.apply_updates(th, upd), ost), val

        (th, _), losses = jax.lax.scan(step, (th0, opt.init(th0)), None,
                                       length=steps)
        return th, losses

    th, losses = run(inv.arrs, th0, jnp.asarray(sources),
                     jnp.asarray(d_obs))
    return InversionResult(theta=th, mu=jnp.exp(th), losses=losses)


def _mb_loss(inv: MBMaterialInversion, a, theta, sources, d_obs):
    resid = inv.forward_with(a, theta, sources) - d_obs
    mis = 0.5 * jnp.sum(resid * resid) / jnp.sum(d_obs * d_obs)
    reg = theta @ (a["Lblk"] @ theta)
    return mis + inv.smooth * reg
