"""Multi-chip block-sharded hybrid solve (shard_map over a device Mesh).

The mesh blocks are the framework's parallel axis (SURVEY §5.8): per-block
DIA stencils and face tensors are sharded along the leading ``E`` axis of
a 1D ``jax.sharding.Mesh(('block',))``; the only cross-chip communication
is an ``all_gather`` of the per-block face traces (E x 4 x L — tiny
compared to volume data) once per CG matvec, riding ICI.  The trace
combination and the correction scatter are local after the gather.

Blocks are padded with decoupled identity blocks when E is not divisible
by the device count, so every shard has equal extent (static shapes).
"""
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


from ..tpu.cg import cg
from ..tpu.multiblock import BlockedHybrid, traceinv_arrays as _tia



def pad_blocks(bp: BlockedHybrid, E_pad: int) -> BlockedHybrid:
    """Append decoupled identity blocks so the block axis has extent E_pad."""
    E = bp.nblocks
    if E_pad == E:
        return bp
    assert E_pad > E
    extra = E_pad - E
    noff = bp.coefs.shape[1]
    Nsp, Nrp = bp.grid_shape
    diag_k = bp.offsets.index((0, 0))
    if bp.shared:
        # the padded blocks reuse the shared operator: their T is zero
        # (no coupling) and their rhs is zero, so CG keeps them at 0
        coefs = bp.coefs
    else:
        pad_coefs = np.zeros((extra, noff, Nsp, Nrp))
        pad_coefs[:, diag_k] = 1.0                   # identity operator
        coefs = jnp.concatenate(
            [bp.coefs, jnp.asarray(pad_coefs, dtype=bp.coefs.dtype)], axis=0)
    T = tuple(jnp.concatenate(
        [t, jnp.zeros((extra,) + t.shape[1:], dtype=t.dtype)], axis=0)
        for t in bp.faces.Tb)
    # dummy blocks point at face 0 but their T is zero, so no coupling;
    # their flip flags are false
    EToF = np.concatenate([bp.EToF, np.zeros((4, extra), dtype=np.int64)],
                          axis=1)
    flip = np.concatenate([bp.flip, np.zeros((4, extra), dtype=bool)], axis=1)
    JH = jnp.concatenate(
        [bp.JH, jnp.ones((extra, Nsp, Nrp), dtype=bp.JH.dtype)], axis=0)
    fd = bp.fd
    if fd is not None:
        from ..tpu.fastdiag import FastDiag
        dt = fd.Qr.dtype
        eye_r = jnp.broadcast_to(jnp.eye(Nrp, dtype=dt), (extra, Nrp, Nrp))
        eye_s = jnp.broadcast_to(jnp.eye(Nsp, dtype=dt), (extra, Nsp, Nsp))
        fd = FastDiag(
            Qr=jnp.concatenate([fd.Qr, eye_r]),
            Qs=jnp.concatenate([fd.Qs, eye_s]),
            lam_r=jnp.concatenate(
                [fd.lam_r, jnp.full((extra, Nrp), 0.5, dtype=dt)]),
            lam_s=jnp.concatenate(
                [fd.lam_s, jnp.full((extra, Nsp), 0.5, dtype=dt)]),
            s_inv=jnp.concatenate(
                [fd.s_inv, jnp.ones((extra, Nsp, Nrp), dtype=dt)]))
    # the flat companion layout (if any) is block-indexed too; padded/
    # placed copies drop it — sharded paths apply the plane layout
    return bp._replace(coefs=coefs, faces=bp.faces._replace(Tb=T),
                       EToF=EToF, flip=flip, JH=JH, fd=fd,
                       coefs_flat=None, offsets_flat=None,
                       flat_sym=False)


def place_blocks(bp: BlockedHybrid, slots, E_pad: int) -> BlockedHybrid:
    """Place block ``e`` at slot ``slots[e]`` (injective, < E_pad);
    remaining slots get decoupled identity padding.

    Generalizes :func:`pad_blocks` (which is the identity placement):
    it lets a partitioner's parts land exactly on the slice boundaries
    of the two-level solver instead of being split by end-of-axis
    padding (ADVICE r2: with end padding, E_pad//nslices can exceed
    the partitioner's ceil(E/nslices) capacity, silently pulling
    blocks of one part across the DCN boundary)."""
    E = bp.nblocks
    slots = np.asarray(slots, dtype=np.int64)
    assert slots.shape == (E,) and len(np.unique(slots)) == E
    assert 0 <= slots.min() and slots.max() < E_pad
    if E_pad == E and np.array_equal(slots, np.arange(E)):
        return bp
    # pad first (guaranteeing at least one padding template), then
    # gather every block-indexed array into slot order
    bpe = pad_blocks(bp, max(E_pad, E + 1))
    src = np.full(E_pad, E, dtype=np.int64)   # default: a padding block
    src[slots] = np.arange(E)
    gidx = jnp.asarray(src)
    coefs = bpe.coefs if bp.shared else bpe.coefs[gidx]
    T = tuple(t[gidx] for t in bpe.faces.Tb)
    EToF = bpe.EToF[:, src]
    flip = bpe.flip[:, src]
    JH = bpe.JH[gidx]
    fd = bpe.fd
    if fd is not None:
        fd = type(fd)(*(a[gidx] for a in fd))
    # FToE references block ids (only original blocks appear): remap
    mask = bp.FToE >= 0
    FToE = np.where(mask, slots[np.clip(bp.FToE, 0, E - 1)], -1)
    return bpe._replace(coefs=coefs, faces=bpe.faces._replace(Tb=T),
                        EToF=EToF, flip=flip, JH=JH, fd=fd, FToE=FToE,
                        coefs_flat=None, offsets_flat=None,
                        flat_sym=False)


def place_fields(x, slots, E_pad: int):
    """Scatter per-block fields (E, ...) into their placed slots
    (zeros elsewhere) — the RHS companion of :func:`place_blocks`."""
    out = jnp.zeros((E_pad,) + tuple(x.shape[1:]), dtype=x.dtype)
    return out.at[jnp.asarray(np.asarray(slots, dtype=np.int64))].set(x)


class ShardedSolver(NamedTuple):
    mesh: Mesh
    bp: BlockedHybrid          # padded
    E: int                     # original (unpadded) block count
    solve: callable            # (g_padded, gdelta_faces, tol) -> CGResult
    # differentiable path (None on solvers that don't build it):
    arrs: Optional[dict] = None            # operator arrays (jit args)
    solve_implicit_with: Optional[callable] = None
    # (arrs, g_padded, gdelta_faces, tol, cg_maxiter) -> u; wrap it in
    # YOUR jit (custom_linear_solve adjoint — see inverse.py)


def face_combination_meta(bpp: BlockedHybrid):
    """Static minus/plus-side metadata for the face combination, shared
    by the 1D and two-level solvers: (em, fm, ep, fp, has_plus, pflip,
    interior), with boundary/padded faces pointed at block 0."""
    em, fm = bpp.FToE[0].copy(), bpp.FToLF[0].copy()
    ep, fp = bpp.FToE[1].copy(), bpp.FToLF[1].copy()
    em[em < 0] = 0
    has_plus = ep >= 0
    ep[~has_plus], fp[~has_plus] = 0, 0
    pflip = bpp.flip[fp, ep] & has_plus
    return em, fm, ep, fp, has_plus, pflip, bpp.interior


def make_face_kernels(bpp: BlockedHybrid):
    """(local_traces, scatter) over the banded face tensors of a padded
    BlockedHybrid — the per-shard face extraction and correction used
    identically by the 1D block-sharded and two-level (slice x block)
    solvers."""
    from ..tpu.multiblock import (_gather_layers, banded_scatter_1f,
                                  banded_trace_1f)

    layers = bpp.faces.layers
    face_offs = bpp.faces.offs
    L = bpp.Dinv.shape[1]

    def local_traces(u, T):
        E_loc = u.shape[0]
        t = jnp.zeros((E_loc, 4, L), dtype=u.dtype)
        for lf in range(4):
            sub = _gather_layers(u, layers[lf], lf)
            tl = banded_trace_1f(T[lf], face_offs[lf], sub)
            t = t.at[:, lf, :tl.shape[-1]].set(tl)
        return t                                     # (E_loc, 4, L)

    def scatter(w, T, etof_loc, flip_loc, shape):
        out = jnp.zeros(shape, dtype=w.dtype)
        for lf in range(4):
            wf = w[etof_loc[:, lf], :]
            wf = jnp.where(flip_loc[:, lf][:, None], bpp._rev_lf(wf, lf),
                           wf)
            A = T[lf].shape[-1]
            vals = banded_scatter_1f(T[lf], face_offs[lf], wf[:, :A])
            lay = list(layers[lf])
            if lf < 2:
                out = out.at[:, :, lay].add(vals.transpose(0, 2, 1))
            else:
                out = out.at[:, lay, :].add(vals)
        return out

    return local_traces, scatter


def two_level_precond(a, bpp, trace_inv, inner_iters, block_precond=None):
    """(precond, flexible) for a jitted sharded solve, from the traced
    array dict: the Woodbury two-level preconditioner when a trace
    inverse is given (fastdiag/Jacobi inner sweeps are block-local;
    the B^{-1} matmul runs under GSPMD), else fastdiag, else Jacobi.
    Shared by the sharded solvers.  ``block_precond`` overrides the
    inner sweep's per-block preconditioner (e.g. the space-sharded
    fastdiag form of the 2D mesh)."""
    if trace_inv is not None:
        from ..tpu.multiblock import traceinv_with, woodbury_precond
        cf = a.get("coefs_flat")
        bp2 = bpp._replace(
            coefs=a["coefs"], Dinv=a["Dinv"],
            faces=bpp.faces._replace(Tb=tuple(a["T"])), fd=a["fd"],
            coefs_flat=cf,
            offsets_flat=bpp.offsets_flat if cf is not None else None,
            flat_chunk=None)
        ti2 = traceinv_with(trace_inv, a["Binv"])
        return (woodbury_precond(bp2, ti2, inner_iters=inner_iters,
                                 block_precond=block_precond),
                inner_iters > 0)
    if a["fd"] is not None:
        from ..tpu.fastdiag import fastdiag_apply
        return (lambda r: jax.vmap(fastdiag_apply)(a["fd"], r)), False
    return (lambda r: r / a["diag"]), False


def make_sharded_solver(bp: BlockedHybrid, mesh: Mesh, *, maxiter=5000,
                        axis="block", trace_inv=None,
                        inner_iters=8, flat_sym=False) -> ShardedSolver:
    """``trace_inv``: an optional :func:`..tpu.multiblock.build_woodbury`
    result — enables the Woodbury two-level preconditioner under
    sharding (fastdiag inner solves are block-local; the dense B^{-1}
    matmul and face contractions run in GSPMD-land where XLA inserts
    the collectives), cutting iteration counts ~10x vs plain fastdiag.
    The face layout is padding-invariant, so the unpadded problem's
    trace inverse applies directly."""
    ndev = mesh.shape[axis]
    E = bp.nblocks
    E_pad = ((E + ndev - 1) // ndev) * ndev
    bpp = pad_blocks(bp, E_pad)
    # flat raveled-diagonal layout (tpu.multiblock.with_flat_layout):
    # per-shard applies — the shard_map matvec AND the GSPMD-level
    # Woodbury inner sweeps — avoid the (8, 128) tile padding of the
    # plane stack (measured 2.3x at 128-unaligned block shapes).  No
    # block-chunking under sharding (the per-shard batch is small).
    from ..tpu.multiblock import with_flat_layout
    bpp = with_flat_layout(bpp, echunk=None, sym=flat_sym)
    offsets = bpp.offsets
    layers = bpp.faces.layers
    nfaces = bpp.Dinv.shape[0]
    L = bpp.Dinv.shape[1]

    # replicated global-combination metadata (static numpy)
    em, fm, ep, fp, has_plus, pflip, interior = face_combination_meta(bpp)

    EToF_t = jnp.asarray(bpp.EToF.T)                 # (E_pad, 4)
    flip_t = jnp.asarray(bpp.flip.T)                 # (E_pad, 4)

    local_traces, scatter = make_face_kernels(bpp)

    def combine(t_all, Dinv):
        t_m = t_all[em, fm]
        t_p = t_all[ep, fp]
        t_p = jnp.where(jnp.asarray(pflip)[:, None], bpp._rev_face(t_p), t_p)
        t_p = jnp.where(jnp.asarray(has_plus)[:, None], t_p, 0.0)
        t = jnp.where(jnp.asarray(interior)[:, None], t_m + t_p, 0.0)
        return t * Dinv

    # shared-operator meshes: the single coefficient stack is replicated
    # (P()) and applied with the 2.3x shared-layout kernel per shard
    coef_spec = P() if bpp.shared else P(axis)

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis), coef_spec, tuple(P(axis) for _ in range(4)),
                  P(axis), P(axis), P()),
        out_specs=P(axis))
    def matvec_sm(u, cf, T, etof_loc, flip_loc, Dinv):
        from ..tpu.stencil import dia_apply_flat, dia_apply_flat_sym
        # flat layout serves shared stacks too (broadcast block axis)
        ap_one = dia_apply_flat_sym if bpp.flat_sym else dia_apply_flat
        y = ap_one(cf, bpp.offsets_flat, u)
        t_loc = local_traces(u, T)
        t_all = jax.lax.all_gather(t_loc, axis, tiled=True)   # (E_pad,4,L)
        w = combine(t_all, Dinv)
        return y - scatter(w, T, etof_loc, flip_loc, u.shape)

    diag_k = offsets.index((0, 0))

    block_sharding = NamedSharding(mesh, P(axis))

    constrain = partial(jax.lax.with_sharding_constraint,
                        shardings=block_sharding)

    # the large operator arrays enter the jitted solve as ARGUMENTS:
    # closure arrays lower to HLO literals duplicated per while-loop
    # computation, which bloats the program (and trips the axon
    # remote-compile size limit at scale — see tpu.multiblock.bp_arrays)
    arrs = {"coefs": bpp.coefs, "coefs_flat": bpp.coefs_flat,
            "T": bpp.faces.Tb, "etof": EToF_t,
            "flip": flip_t, "Dinv": bpp.Dinv, "fd": bpp.fd,
            "diag": bpp.coefs[:, diag_k],
            "Binv": None if trace_inv is None else _tia(trace_inv)}

    def _prep(a, g, gdelta_faces):
        """Shared prologue: constrain the operator arrays to the mesh,
        build the preconditioner, assemble b = g - scatter(gδ·D⁻¹), and
        return (b, matvec, precond, flexible).  Everything is linear in
        (g, gdelta_faces), so the implicit path can transpose it."""
        g = constrain(g)
        Dinv = a["Dinv"]
        w0 = gdelta_faces * Dinv
        cf = jax.lax.with_sharding_constraint(
            a["coefs_flat"], NamedSharding(mesh, coef_spec))
        coefs = jax.lax.with_sharding_constraint(
            a["coefs"], NamedSharding(mesh, coef_spec))
        T = tuple(constrain(t) for t in a["T"])
        etof = constrain(a["etof"])
        flps = constrain(a["flip"])
        precond, flexible = two_level_precond(
            {"coefs": coefs, "coefs_flat": cf, "T": T, "Dinv": Dinv,
             "fd": a["fd"], "diag": a["diag"], "Binv": a["Binv"]},
            bpp, trace_inv, inner_iters)

        corr = jax.shard_map(
            lambda w, Tl, el, fl, sh_u: scatter(w, Tl, el, fl, sh_u.shape),
            mesh=mesh,
            in_specs=(P(), tuple(P(axis) for _ in range(4)), P(axis),
                      P(axis), P(axis)),
            out_specs=P(axis))(w0, T, etof, flps, g)
        b = g - corr
        mv = lambda u: matvec_sm(u, cf, T, etof, flps, Dinv)  # noqa: E731
        return b, mv, precond, flexible

    @partial(jax.jit, static_argnames=("tol", "cg_maxiter"))
    def _solve(a, g, gdelta_faces, tol, cg_maxiter):
        b, mv, precond, flexible = _prep(a, g, gdelta_faces)
        return cg(mv, b, tol=tol, maxiter=cg_maxiter, precond=precond,
                  flexible=flexible)

    def solve(g, gdelta_faces, tol=1e-10, cg_maxiter=maxiter):
        """g: (E_pad, Nsp, Nrp) (zeros on padded blocks);
        gdelta_faces: (nfaces, L)."""
        return _solve(arrs, g, gdelta_faces, tol, cg_maxiter)

    def solve_implicit_with(a, g, gdelta_faces, tol=1e-10,
                            cg_maxiter=maxiter):
        """Differentiable sharded solve (u only): the SPD system under
        ``lax.custom_linear_solve(symmetric=True)``, so reverse/forward
        derivatives re-solve the sharded system (shard_map collectives
        transpose: all_gather <-> reduce-scatter) instead of unrolling
        CG — the multi-chip adjoint-state path (see inverse.py).  Not
        jitted: embed it in the caller's jitted program with ``a`` the
        solver's ``arrs`` passed as jit arguments."""
        b, mv, precond, flexible = _prep(a, g, gdelta_faces)

        def slv(mv_, bb):
            return cg(mv_, bb, tol=tol, maxiter=cg_maxiter,
                      precond=precond, flexible=flexible).x

        return jax.lax.custom_linear_solve(mv, b, slv, symmetric=True)

    return ShardedSolver(mesh=mesh, bp=bpp, E=E, solve=solve, arrs=arrs,
                         solve_implicit_with=solve_implicit_with)
