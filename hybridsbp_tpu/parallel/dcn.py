"""Two-level (slice x block) hybrid solve: cut-face-only DCN exchange.

`make_sharded_solver` all_gathers every block's face traces along one
mesh axis — the right pattern within a slice, where the (E, 4, L)
tensor rides ICI.  Across DCN-connected slices only *cut faces* (faces
whose two blocks live on different slices) actually need to move, and
`parallel.partition` lays blocks out so there are few of them (5-34%
of interior faces on the shipped meshes).

This solver implements that hierarchy on a ``Mesh((slice, block))``:

  1. per-shard local face traces (no communication),
  2. ``all_gather`` over ``block`` -> each slice holds its own blocks'
     (E/nslices, 4, L) traces (intra-slice, ICI),
  3. each slice packs only its sides of the cut faces into a dense
     (ncut_max, L) export tensor; ONE ``all_gather`` over ``slice``
     moves just those (the DCN hop),
  4. the face combination reads each side from the slice-local gather
     or the remote export table, then the correction scatter is local.

Blocks must be ordered slice-contiguously (feed
:func:`partition.permute_elements`'s output to ``build_problem``);
blocks are padded to nslices*nblockdev as in `sharded.pad_blocks`.

The reference is single-process (SURVEY §5.8); this is the scale-out
design for topologies where the flat all_gather would cross DCN.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..tpu.cg import cg
from ..tpu.multiblock import BlockedHybrid, traceinv_arrays as _tia
from .sharded import (face_combination_meta, make_face_kernels,
                      pad_blocks, two_level_precond)


def make_two_level_solver(bp: BlockedHybrid, mesh: Mesh, *, maxiter=5000,
                          slice_axis="slice", block_axis="block",
                          trace_inv=None, inner_iters=8, parts=None,
                          flat_sym=False):
    """Returns (bp_padded, parts, ncut, solve).  ``solve(g_padded,
    gdelta_faces, tol)`` -> CGResult; fields (E_pad, Nsp, Nrp) sharded
    over (slice, block).  ``trace_inv``: optional
    :func:`..tpu.multiblock.build_woodbury` result — Woodbury
    two-level preconditioning at the GSPMD level (see
    :func:`.sharded.make_sharded_solver`).

    ``parts``: optional (E,) slice id per block from
    :func:`.partition.partition_blocks` — blocks are then *placed* so
    each part occupies exactly its slice's slot range, realizing the
    partitioner's minimized cut even when padding makes E_pad/nslices
    exceed ceil(E/nslices) (ADVICE r2).  The returned ``solve`` has a
    ``.slots`` attribute: scatter per-block fields with
    :func:`.sharded.place_fields(x, solve.slots, E_pad)`, and read
    block e of the solution at ``res.x[solve.slots[e]]``.  Without
    ``parts``, blocks keep their order (slots = arange(E)) and slices
    are equal contiguous chunks."""
    nsl = mesh.shape[slice_axis]
    nb = mesh.shape[block_axis]
    E = bp.nblocks
    E_pad = ((E + nsl * nb - 1) // (nsl * nb)) * (nsl * nb)
    E_per = E_pad // nsl                     # blocks per slice
    if parts is not None:
        pin = np.asarray(parts, dtype=np.int64)
        assert pin.shape == (E,)
        assert pin.min() >= 0 and pin.max() < nsl, "part id out of range"
        sizes = np.bincount(pin, minlength=nsl)
        assert sizes.max() <= E_per, \
            f"a part has {sizes.max()} blocks > slice capacity {E_per}"
        rank = np.zeros(E, dtype=np.int64)
        cnt = np.zeros(nsl, dtype=np.int64)
        for e in range(E):
            rank[e] = cnt[pin[e]]
            cnt[pin[e]] += 1
        slots = pin * E_per + rank
        from .sharded import place_blocks
        bpp = place_blocks(bp, slots, E_pad)
    else:
        slots = np.arange(E)
        bpp = pad_blocks(bp, E_pad)
    parts = np.arange(E_pad) // E_per        # slice id per SLOT

    # flat raveled-diagonal layout per shard (see parallel/sharded.py)
    from ..tpu.multiblock import with_flat_layout
    bpp = with_flat_layout(bpp, echunk=None, sym=flat_sym)
    offsets = bpp.offsets
    L = bpp.Dinv.shape[1]
    nfaces = bpp.Dinv.shape[0]

    # padded/boundary faces point at block 0 with zero weight
    em, fm, ep, fp, has_plus, pflip, interior = face_combination_meta(bpp)

    # --- static cut-face export tables -------------------------------
    cut = interior & (parts[em] != parts[ep]) & has_plus
    exports = [[] for _ in range(nsl)]       # per slice: (elem, lf, f, side)
    slot = np.zeros((2, nfaces), dtype=np.int64)
    for f in np.where(cut)[0]:
        for side, (e, lf) in enumerate(((em[f], fm[f]), (ep[f], fp[f]))):
            s = parts[e]
            slot[side, f] = len(exports[s])
            exports[s].append((e - s * E_per, lf))
    ncut = int(cut.sum())
    ncut_max = max(1, max(len(x) for x in exports))
    pack_e = np.zeros((nsl, ncut_max), dtype=np.int64)
    pack_lf = np.zeros((nsl, ncut_max), dtype=np.int64)
    for s, lst in enumerate(exports):
        for j, (eloc, lf) in enumerate(lst):
            pack_e[s, j], pack_lf[s, j] = eloc, lf

    EToF_t = jnp.asarray(bpp.EToF.T)
    flip_t = jnp.asarray(bpp.flip.T)
    pack_e_t = jnp.asarray(pack_e)
    pack_lf_t = jnp.asarray(pack_lf)
    parts_m = jnp.asarray(parts[em])
    parts_p = jnp.asarray(parts[ep])
    em_t, fm_t = jnp.asarray(em), jnp.asarray(fm)
    ep_t, fp_t = jnp.asarray(ep), jnp.asarray(fp)
    slot_m = jnp.asarray(slot[0])
    slot_p = jnp.asarray(slot[1])

    local_traces, scatter = make_face_kernels(bpp)

    both = P((slice_axis, block_axis))

    def combine(t_sl, X_all, s_idx, Dinv):
        """Face combination: each side comes from this slice's gather
        or the remote slice's cut-face export.  Rows for faces not
        adjacent to this slice are garbage — the local scatter never
        reads them."""
        m_here = parts_m == s_idx
        p_here = parts_p == s_idx
        em_loc = jnp.clip(em_t - s_idx * E_per, 0, E_per - 1)
        ep_loc = jnp.clip(ep_t - s_idx * E_per, 0, E_per - 1)
        t_m = jnp.where(m_here[:, None], t_sl[em_loc, fm_t],
                        X_all[parts_m, slot_m])
        t_p = jnp.where(p_here[:, None], t_sl[ep_loc, fp_t],
                        X_all[parts_p, slot_p])
        t_p = jnp.where(jnp.asarray(pflip)[:, None], bpp._rev_face(t_p), t_p)
        t_p = jnp.where(jnp.asarray(has_plus)[:, None], t_p, 0.0)
        t = jnp.where(jnp.asarray(interior)[:, None], t_m + t_p, 0.0)
        return t * Dinv

    coef_spec = P() if bpp.shared else both

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(both, coef_spec, tuple(both for _ in range(4)), both,
                  both, P()),
        out_specs=both)
    def matvec_sm(u, cf, T, etof_loc, flip_loc, Dinv):
        from ..tpu.stencil import dia_apply_flat, dia_apply_flat_sym
        ap_one = dia_apply_flat_sym if bpp.flat_sym else dia_apply_flat
        y = ap_one(cf, bpp.offsets_flat, u)
        t_loc = local_traces(u, T)
        t_sl = jax.lax.all_gather(t_loc, block_axis, tiled=True)  # slice's
        s_idx = jax.lax.axis_index(slice_axis)
        X = t_sl[pack_e_t[s_idx], pack_lf_t[s_idx]]       # (ncut_max, L)
        X_all = jax.lax.all_gather(X, slice_axis)         # DCN hop
        w = combine(t_sl, X_all, s_idx, Dinv)
        return y - scatter(w, T, etof_loc, flip_loc, u.shape)

    diag_k = offsets.index((0, 0))
    sh = lambda spec: NamedSharding(mesh, spec)

    # large arrays as jit arguments, not closure literals (see
    # tpu.multiblock.bp_arrays for the rationale)
    arrs = {"coefs": bpp.coefs, "coefs_flat": bpp.coefs_flat,
            "T": bpp.faces.Tb, "etof": EToF_t,
            "flip": flip_t, "Dinv": bpp.Dinv, "fd": bpp.fd,
            "diag": bpp.coefs[:, diag_k],
            "Binv": None if trace_inv is None else _tia(trace_inv)}

    def _prep(a, g, gdelta_faces):
        """Shared prologue (linear in (g, gdelta_faces) — the implicit
        path transposes it): sharding constraints, preconditioner,
        b = g - scatter(gδ·D⁻¹), the two-level matvec closure."""
        g = jax.lax.with_sharding_constraint(g, sh(both))
        coefs = jax.lax.with_sharding_constraint(a["coefs"], sh(coef_spec))
        cf = jax.lax.with_sharding_constraint(a["coefs_flat"],
                                              sh(coef_spec))
        T = tuple(jax.lax.with_sharding_constraint(t, sh(both))
                  for t in a["T"])
        etof = jax.lax.with_sharding_constraint(a["etof"], sh(both))
        flps = jax.lax.with_sharding_constraint(a["flip"], sh(both))
        Dinv = a["Dinv"]
        precond, flexible = two_level_precond(
            {"coefs": coefs, "coefs_flat": cf, "T": T, "Dinv": Dinv,
             "fd": a["fd"], "diag": a["diag"], "Binv": a["Binv"]},
            bpp, trace_inv, inner_iters)
        w0 = gdelta_faces * Dinv
        corr = jax.shard_map(
            lambda w, Tl, el, fl, su: scatter(w, Tl, el, fl, su.shape),
            mesh=mesh,
            in_specs=(P(), tuple(both for _ in range(4)), both, both, both),
            out_specs=both)(w0, T, etof, flps, g)
        b = g - corr
        mv = lambda u: matvec_sm(u, cf, T, etof, flps, Dinv)  # noqa: E731
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
        """Differentiable two-level solve (u only): the SPD system under
        ``lax.custom_linear_solve(symmetric=True)`` — derivatives
        re-solve the (slice x block) sharded system, the cut-face DCN
        exchange transposing along with the intra-slice collectives.
        Not jitted: embed in the caller's jitted program with ``a`` =
        ``solve.arrs`` passed as jit arguments (see inverse.py)."""
        b, mv, precond, flexible = _prep(a, g, gdelta_faces)

        def slv(mv_, bb):
            return cg(mv_, bb, tol=tol, maxiter=cg_maxiter,
                      precond=precond, flexible=flexible).x

        return jax.lax.custom_linear_solve(mv, b, slv, symmetric=True)

    solve.slots = slots
    solve.arrs = arrs
    solve.implicit_with = solve_implicit_with
    return bpp, parts, ncut, solve
