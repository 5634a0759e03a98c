"""2D-mesh hybrid solve: blocks x within-block spatial sharding.

Composes the two parallel axes on a ``Mesh(('block', 'space'))``:

- ``block``: domain decomposition (the dp-like axis) — per-block DIA
  stencils, face tensors, and fields sharded on the leading E axis;
  cross-block coupling via one all_gather of face traces per matvec.
- ``space``: the s axis of every block sharded (sp/tp-like) — the
  stencil uses a ppermute halo exchange; west/east face traces are
  psum-reduced partial contractions; south/north faces live on the edge
  space-shards (owner-computes with masked gathers/scatters).

This is the full communication pattern of the hybridized method on a
2D device grid: nearest-neighbor halos + tiny face collectives, all
riding ICI.  Preconditioning is the fast-diagonalization block solve
when available: its dense s-direction eigen-transforms run *across*
the space axis — each device all_gathers the block rows (tiled, ICI),
contracts against its own row/column chunk of Qs (static slices by
axis_index), and keeps everything else local.  Two tiled all_gathers
per application buy a ~4x CG iteration cut over point-Jacobi (the
fallback when no fastdiag data is present).
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..tpu.cg import cg
from ..tpu.multiblock import (BlockedHybrid, dense_face_tensor,
                              traceinv_arrays as _tia)
from .sharded import pad_blocks
from .spatial import halo_exchange_s

# face-coupling einsums are tiny contractions that XLA:TPU would
# otherwise rewrite into bf16-MXU dots (~1e-3 f32 face error — see
# multiblock.banded_trace_1f); pin them to full f32 precision
_HP = jax.lax.Precision.HIGHEST


def make_sharded_solver_2d(bp: BlockedHybrid, mesh: Mesh, *, maxiter=5000,
                           block_axis="block", space_axis="space",
                           trace_inv=None, inner_iters=8, sym=False):
    """``trace_inv``: optional :func:`..tpu.multiblock.build_woodbury`
    result — Woodbury two-level preconditioning at the GSPMD level
    (see :func:`.sharded.make_sharded_solver`; the preconditioner's
    banded face ops and inner block sweeps shard automatically over
    the 2D mesh).

    ``sym``: symmetric plane storage for the matvec's stencil — one
    plane per ±(ds, dr) pair (stencil.dia_sym_half), halving the
    dominant coefficient stream.  The transpose side needs C·u on
    neighbor s-rows: the static coefficient halos are precomputed per
    space shard (see parallel.spatial), so per-apply ICI traffic is
    unchanged (u halos only)."""
    nb = mesh.shape[block_axis]
    ns = mesh.shape[space_axis]
    E = bp.nblocks
    E_pad = ((E + nb - 1) // nb) * nb
    bpp = pad_blocks(bp, E_pad)
    offsets = bpp.offsets
    layers = bpp.faces.layers
    Nsp, Nrp = bpp.grid_shape
    L = bpp.Dinv.shape[1]
    if Nsp % ns != 0:
        raise ValueError(f"s extent {Nsp} not divisible by {ns} devices")
    S_loc = Nsp // ns
    S_halo = max(abs(ds) for ds, _ in offsets)
    if S_halo > S_loc:
        raise ValueError(f"halo {S_halo} > local rows {S_loc}")

    FToE, FToLF = bpp.FToE, bpp.FToLF
    em, fm = FToE[0], FToLF[0]
    ep, fp = FToE[1].copy(), FToLF[1].copy()
    has_plus = ep >= 0
    ep[~has_plus], fp[~has_plus] = 0, 0
    pflip = bpp.flip[fp, ep] & has_plus
    interior = bpp.interior

    EToF_t = jnp.asarray(bpp.EToF.T)
    flip_t = jnp.asarray(bpp.flip.T)

    R_halo = max(abs(dr) for _, dr in offsets)

    offs_sym = None
    if sym:
        from ..tpu.stencil import dia_sym_half
        cs, offs_sym = dia_sym_half(bpp.coefs, offsets)  # (E|1,nsym,Nsp,Nrp)
        csp = jnp.pad(cs, ((0, 0), (0, 0), (S_halo, S_halo), (0, 0)))
        # per-space-shard halo-extended stacks: device d's s-rows plus
        # S_halo neighbor rows each side (static — coefficients are
        # constant, so no runtime coefficient halo exchange)
        coefs_mv = jnp.stack(
            [csp[:, :, d * S_loc:d * S_loc + S_loc + 2 * S_halo]
             for d in range(ns)])        # (ns, E|1, nsym, S_loc+2S, Nrp)
    else:
        coefs_mv = bpp.coefs

    def dia_local_sym(cext_loc, u_loc):
        """Symmetric per-block stencil apply on the space shard —
        delegates to the shared halo-extended form (the coefficient
        stack's leading E|1 block axis broadcasts against u there).
        cext_loc: (E|1, nsym, S_loc+2S, Nrp)."""
        from .spatial import dia_apply_spatial_sym
        return dia_apply_spatial_sym(cext_loc, offs_sym, u_loc,
                                     space_axis)

    def dia_local(coefs_loc, u_loc):
        """Per-block DIA apply with s-halo exchange; u_loc (E, S_loc, Nrp).

        Stays on the 2D plane layout by design: the space axis shards
        s-rows within a block, and the flat raveled-diagonal layout
        (parallel/sharded.py, tpu.multiblock.with_flat_layout) would
        interleave those rows across shards — its 1D shifts become the
        same halo exchange this form already does, with none of the
        padding win (the lane dim here is the shard-local s extent)."""
        top, bot = halo_exchange_s(u_loc, S_halo, space_axis)
        up = jnp.concatenate([top, u_loc, bot], axis=-2)
        up = jnp.pad(up, ((0, 0), (0, 0), (R_halo, R_halo)))
        out = jnp.zeros_like(u_loc)
        for k, (ds, dr) in enumerate(offsets):
            sh = jax.lax.slice_in_dim(
                jax.lax.slice_in_dim(up, S_halo + ds, S_halo + ds + S_loc,
                                     axis=-2),
                R_halo + dr, R_halo + dr + Nrp, axis=-1)
            out = out + coefs_loc[:, k] * sh
        return out

    def traces_local(u_loc, T_we, T_sn):
        """(E_loc, 4, L) face traces from the local s-rows (psum'd)."""
        off = jax.lax.axis_index(space_axis) * S_loc
        outs = []
        for lf in (0, 1):
            lay = list(layers[lf])                     # r-layers, full
            sub = u_loc[:, :, lay].transpose(0, 2, 1)  # (E, nlay, S_loc)
            outs.append(jnp.einsum("elak,ela->ek", T_we[lf], sub,
                                    precision=_HP))
        for i, lf in enumerate((2, 3)):
            acc = jnp.zeros(u_loc.shape[:1] + (L,), dtype=u_loc.dtype)
            for li, l_global in enumerate(layers[lf]):
                owned = (l_global >= off) & (l_global < off + S_loc)
                idx = jnp.clip(l_global - off, 0, S_loc - 1)
                row = u_loc[:, idx, :] * owned          # (E, Nrp)
                acc = acc + jnp.einsum("eak,ea->ek", T_sn[i][:, li], row,
                                       precision=_HP)
            outs.append(acc)
        t = jnp.stack(outs, axis=1)
        return jax.lax.psum(t, space_axis)

    def scatter_local(w, T_we, T_sn, etof_loc, flip_loc, shape):
        """sum_lf F[lf] @ w(face) restricted to the local s-rows."""
        off = jax.lax.axis_index(space_axis) * S_loc
        out = jnp.zeros(shape, dtype=w.dtype)
        for lf in (0, 1):
            wf = w[etof_loc[:, lf], :]
            wf = jnp.where(flip_loc[:, lf][:, None], bpp._rev_lf(wf, lf), wf)
            vals = jnp.einsum("elak,ek->ela", T_we[lf], wf,
                              precision=_HP)       # (E,nlay,S_loc)
            lay = list(layers[lf])
            out = out.at[:, :, lay].add(vals.transpose(0, 2, 1))
        for i, lf in enumerate((2, 3)):
            wf = w[etof_loc[:, lf], :]
            wf = jnp.where(flip_loc[:, lf][:, None], bpp._rev_lf(wf, lf), wf)
            for li, l_global in enumerate(layers[lf]):
                owned = (l_global >= off) & (l_global < off + S_loc)
                idx = jnp.clip(l_global - off, 0, S_loc - 1)
                vals = jnp.einsum("eak,ek->ea", T_sn[i][:, li], wf,
                                  precision=_HP) * owned
                out = out.at[:, idx, :].add(vals)
        return out

    def combine(t_all, Dinv):
        t_m = t_all[em, fm]
        t_p = t_all[ep, fp]
        t_p = jnp.where(jnp.asarray(pflip)[:, None], bpp._rev_face(t_p), t_p)
        t_p = jnp.where(jnp.asarray(has_plus)[:, None], t_p, 0.0)
        t = jnp.where(jnp.asarray(interior)[:, None], t_m + t_p, 0.0)
        return t * Dinv

    # sharded face tensors: west/east sharded along the volume-row axis;
    # south/north replicated (their layer rows live on edge shards).
    # This solver's einsums need the dense (E, nlay, A, L) form (the
    # along-face axis is the sharded s axis for west/east) — materialize
    # it once from the banded storage.
    T_dense = tuple(dense_face_tensor(bpp.faces, lf, L) for lf in range(4))
    spec_we = P(block_axis, None, space_axis, None)
    spec_sn = P(block_axis, None, None, None)

    # shared-operator meshes: the single stack (broadcast block axis of
    # extent 1) is replicated along 'block' and sharded along s like the
    # fields; dia_local's coefficient multiply broadcasts over blocks.
    # sym stacks carry a leading per-space-shard axis instead (each
    # shard owns its halo-extended rows).
    plane_spec = (P(None, None, space_axis, None) if bpp.shared
                  else P(block_axis, None, space_axis, None))
    if sym:
        coef_spec = (P(space_axis, None, None, None, None) if bpp.shared
                     else P(space_axis, block_axis, None, None, None))
    else:
        coef_spec = plane_spec

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(block_axis, space_axis, None),
                  coef_spec,
                  (spec_we, spec_we), (spec_sn, spec_sn),
                  P(block_axis), P(block_axis), P()),
        out_specs=P(block_axis, space_axis, None))
    def matvec_sm(u, coefs, T_we, T_sn, etof_loc, flip_loc, Dinv):
        y = dia_local_sym(coefs[0], u) if sym else dia_local(coefs, u)
        t_loc = traces_local(u, T_we, T_sn)
        t_all = jax.lax.all_gather(t_loc, block_axis, tiled=True)
        w = combine(t_all, Dinv)
        return y - scatter_local(w, T_we, T_sn, etof_loc, flip_loc, u.shape)

    diag_k = offsets.index((0, 0))

    if bpp.fd is not None:

        @partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(block_axis, space_axis, None),
                      P(block_axis), P(block_axis), P(block_axis),
                      P(block_axis, space_axis),
                      P(block_axis, space_axis, None)),
            out_specs=P(block_axis, space_axis, None))
        def fd_sm(r, Qr, Qs, lam_r, lam_s_loc, s_inv_loc):
            """Sharded fastdiag apply: P^{-1} r with the s-transforms
            running across the space axis (see fastdiag.fastdiag_apply
            for the unsharded form)."""
            off = jax.lax.axis_index(space_axis) * S_loc
            t = r * s_inv_loc
            t_full = jax.lax.all_gather(t, space_axis, axis=1, tiled=True)
            # own eigen-row chunk of Qs^T: columns j in [off, off+S_loc)
            QsT_own = jax.lax.dynamic_slice_in_dim(Qs, off, S_loc, axis=2)
            t = jnp.einsum("esj,esr->ejr", QsT_own, t_full)
            t = jnp.einsum("ejr,eri->eji", t, Qr)
            denom = lam_s_loc[:, :, None] + lam_r[:, None, :]
            denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
            t = t / denom
            t_full = jax.lax.all_gather(t, space_axis, axis=1, tiled=True)
            # own physical-row chunk of Qs: rows s in [off, off+S_loc)
            Qs_own = jax.lax.dynamic_slice_in_dim(Qs, off, S_loc, axis=1)
            t = jnp.einsum("ejm,emr->ejr", Qs_own, t_full)
            t = jnp.einsum("ejr,eir->eji", t, Qr)
            return t * s_inv_loc

        def make_precond(fd):
            return lambda r: fd_sm(r, fd.Qr, fd.Qs, fd.lam_r, fd.lam_s,
                                   fd.s_inv)
    else:
        make_precond = None

    sh_u = NamedSharding(mesh, P(block_axis, space_axis, None))
    sh_e = NamedSharding(mesh, P(block_axis))

    # large arrays as jit arguments, not closure literals (see
    # tpu.multiblock.bp_arrays for the rationale).  Tb: the banded
    # face tensors for the (optional) Woodbury preconditioner's face
    # ops — the matvec itself uses the dense T for the sharded einsums
    arrs = {"coefs": bpp.coefs, "coefs_mv": coefs_mv, "T": T_dense,
            "etof": EToF_t,
            "flip": flip_t, "Dinv": bpp.Dinv, "fd": bpp.fd,
            "diag": bpp.coefs[:, diag_k],
            "Tb": bpp.faces.Tb if trace_inv is not None else None,
            "Binv": None if trace_inv is None else _tia(trace_inv)}

    sh_cmv = NamedSharding(mesh, coef_spec)

    def _prep(a, g, gdelta_faces):
        """Shared prologue (linear in (g, gdelta_faces) — the implicit
        path transposes it): sharding constraints, preconditioner,
        b = g - scatter(gδ·D⁻¹), the 2D-mesh matvec closure."""
        g = jax.lax.with_sharding_constraint(g, sh_u)
        coefs = jax.lax.with_sharding_constraint(a["coefs_mv"], sh_cmv)
        T_we = tuple(jax.lax.with_sharding_constraint(
            a["T"][lf], NamedSharding(mesh, spec_we)) for lf in (0, 1))
        T_sn = tuple(a["T"][lf] for lf in (2, 3))
        etof = jax.lax.with_sharding_constraint(a["etof"], sh_e)
        flps = jax.lax.with_sharding_constraint(a["flip"], sh_e)
        Dinv = a["Dinv"]
        flexible = False
        if trace_inv is not None:
            from .sharded import two_level_precond
            # the inner sweeps use the space-sharded fastdiag form
            # (fd_sm's owner-computes tiled all_gathers), not the
            # unsharded vmap that GSPMD would have to repartition
            bpc = (make_precond(a["fd"]) if make_precond is not None
                   else None)
            precond, flexible = two_level_precond(
                {"coefs": a["coefs"], "T": a["Tb"], "Dinv": Dinv,
                 "fd": a["fd"], "diag": a["diag"], "Binv": a["Binv"]},
                bpp, trace_inv, inner_iters, block_precond=bpc)
        else:
            precond = (make_precond(a["fd"]) if make_precond is not None
                       else (lambda r: r / a["diag"]))

        w0 = gdelta_faces * Dinv
        corr = jax.shard_map(
            lambda w, twe, tsn, el, fl, su: scatter_local(
                w, twe, tsn, el, fl, su.shape),
            mesh=mesh,
            in_specs=(P(), (spec_we, spec_we), (spec_sn, spec_sn),
                      P(block_axis), P(block_axis),
                      P(block_axis, space_axis, None)),
            out_specs=P(block_axis, space_axis, None))(
                w0, T_we, T_sn, etof, flps, g)
        b = g - corr
        mv = lambda u: matvec_sm(u, coefs, T_we, T_sn, etof, flps,  # noqa
                                 Dinv)
        return b, mv, precond, flexible

    @partial(jax.jit, static_argnames=("tol", "cg_maxiter"))
    def _solve(a, g, gdelta_faces, tol, cg_maxiter):
        b, mv, precond, flexible = _prep(a, g, gdelta_faces)
        return cg(mv, b, tol=tol, maxiter=cg_maxiter, precond=precond,
                  flexible=flexible)

    def solve(g, gdelta_faces, tol=1e-10, cg_maxiter=maxiter):
        return _solve(arrs, g, gdelta_faces, tol, cg_maxiter)

    def solve_implicit_with(a, g, gdelta_faces, tol=1e-10,
                            cg_maxiter=maxiter):
        """Differentiable 2D-mesh solve (u only): the SPD system under
        ``lax.custom_linear_solve(symmetric=True)`` — derivatives
        re-solve the (block x space) sharded system; the halo ppermutes
        and face collectives transpose automatically.  Not jitted:
        embed in the caller's jitted program with ``a`` = ``solve.arrs``
        passed as jit arguments (see inverse.py)."""
        b, mv, precond, flexible = _prep(a, g, gdelta_faces)

        def slv(mv_, bb):
            return cg(mv_, bb, tol=tol, maxiter=cg_maxiter,
                      precond=precond, flexible=flexible).x

        return jax.lax.custom_linear_solve(mv, b, slv, symmetric=True)

    solve.arrs = arrs
    solve.implicit_with = solve_implicit_with
    return bpp, solve
