"""Within-block spatial sharding of the DIA stencil apply (sp/tp-like axis).

For very large blocks the s axis of the (Nsp, Nrp) field is sharded over
a mesh axis; the stencil needs only a halo of max|ds| rows from each
neighbor, exchanged with two ``ppermute`` shifts (the ICI nearest-
neighbor pattern).  Composes with the block axis of
:mod:`.sharded` on a 2D mesh ('block', 'space').

Boundary devices receive zero halos, matching the zero-padding semantics
of :func:`..tpu.stencil.dia_apply` (the operator has no support past the
grid edge).
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def halo_exchange_s(u_local, halo, axis_name):
    """Exchange `halo` rows along axis -2 with mesh neighbors.

    Returns (top_halo, bottom_halo) — the neighbor rows to prepend/append
    (zeros at the chain ends).
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    # send our first rows up (to idx-1), our last rows down (to idx+1)
    down = [(i, (i + 1) % n) for i in range(n)]   # i -> i+1 carries bottoms
    up = [(i, (i - 1) % n) for i in range(n)]

    from_above = jax.lax.ppermute(u_local[..., -halo:, :], axis_name, down)
    from_below = jax.lax.ppermute(u_local[..., :halo, :], axis_name, up)
    zero = jnp.zeros_like(from_above)
    from_above = jnp.where(idx == 0, zero, from_above)      # no upper nbr
    from_below = jnp.where(idx == n - 1, zero, from_below)  # no lower nbr
    return from_above, from_below


def dia_apply_spatial(coefs_local, offsets, u_local, axis_name):
    """Sharded-s DIA apply inside shard_map.

    coefs_local: (noff, S_loc, Nrp) shard of the coefficient planes;
    u_local: (..., S_loc, Nrp).  The (ds, dr) offsets are global/static.
    """
    S = max(abs(ds) for ds, _ in offsets)
    R = max(abs(dr) for _, dr in offsets)
    S_loc, Nrp = u_local.shape[-2:]
    top, bot = halo_exchange_s(u_local, S, axis_name)
    up = jnp.concatenate([top, u_local, bot], axis=-2)
    pad = [(0, 0)] * (up.ndim - 2) + [(0, 0), (R, R)]
    up = jnp.pad(up, pad)

    out = jnp.zeros_like(u_local)
    for k, (ds, dr) in enumerate(offsets):
        shifted = jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(up, S + ds, S + ds + S_loc, axis=-2),
            R + dr, R + dr + Nrp, axis=-1)
        out = out + coefs_local[k] * shifted
    return out


def extend_coefs_s(coefs, ndev, S):
    """Halo-extend plane coefficients along s per device shard.

    (noff, Nsp, Nrp) -> (ndev, noff, Nsp//ndev + 2S, Nrp): device d's
    block carries its own rows plus S neighbor rows each side (zeros at
    the chain ends).  Coefficients are CONSTANT, so the symmetric
    spatial apply precomputes these once instead of exchanging
    noff-plane halos per apply — runtime halo traffic stays u-only."""
    noff, Nsp, Nrp = coefs.shape
    S_loc = Nsp // ndev
    cp = jnp.pad(coefs, ((0, 0), (S, S), (0, 0)))
    return jnp.stack([cp[:, d * S_loc:d * S_loc + S_loc + 2 * S]
                      for d in range(ndev)])


def dia_apply_spatial_sym(coefs_ext_local, offsets_sym, u_local,
                          axis_name):
    """Sharded-s SYMMETRIC plane apply inside shard_map.

    The flat raveled-diagonal layouts cannot serve the space-sharded
    axis (the linear index interleaves s-rows across shards), so the
    2D mesh gets the symmetric HALVING on the plane layout instead:
    only the lexicographically-positive (ds, dr) planes are stored
    (see stencil.dia_sym_half) and each contributes its transpose side

        out += C_o * shift(u, +o) + shift(C_o * u, -o).

    The transpose term needs C_o*u on neighbor rows; u halos are
    already exchanged and the static coefficient halos are precomputed
    (:func:`extend_coefs_s`), so per-apply ICI traffic is unchanged.

    coefs_ext_local: (..., noff, S_loc + 2S, Nrp) halo-extended shard —
    optional leading block dims broadcast against u (per-block stacks
    lead with E, shared stacks with extent 1); u_local: (..., S_loc,
    Nrp).
    """
    S = max(ds for ds, _ in offsets_sym)
    R = max(abs(dr) for _, dr in offsets_sym)
    S_loc, Nrp = u_local.shape[-2:]
    top, bot = halo_exchange_s(u_local, S, axis_name)
    ue = jnp.concatenate([top, u_local, bot], axis=-2)
    pad = [(0, 0)] * (ue.ndim - 2) + [(0, 0), (R, R)]
    ue_pad = jnp.pad(ue, pad)

    out = jnp.zeros_like(u_local)
    for k, (ds, dr) in enumerate(offsets_sym):
        c_ext = coefs_ext_local[..., k, :, :]         # (.., S_loc+2S, Nrp)
        c_int = jax.lax.slice_in_dim(c_ext, S, S + S_loc, axis=-2)
        shifted = jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(ue_pad, S + ds, S + ds + S_loc, axis=-2),
            R + dr, R + dr + Nrp, axis=-1)
        out = out + c_int * shifted
        if (ds, dr) != (0, 0):
            we = c_ext * ue               # broadcasts over block dims
            w = jnp.pad(we, [(0, 0)] * (we.ndim - 1) + [(R, R)])
            out = out + jax.lax.slice_in_dim(
                jax.lax.slice_in_dim(w, S - ds, S - ds + S_loc, axis=-2),
                R - dr, R - dr + Nrp, axis=-1)
    return out


def make_spatial_apply(op, mesh: Mesh, axis="space"):
    """jit-able sharded apply for a single-block DIA operator whose s axis
    is sharded over ``mesh[axis]``. Returns f(u) on globally-shaped
    arrays (GSPMD handles the sharding; the body is shard_map)."""
    offsets = op.offsets
    S = max(abs(ds) for ds, _ in offsets)
    ndev = mesh.shape[axis]
    Nsp = op.coefs.shape[1]
    if Nsp % ndev != 0:
        raise ValueError(f"s extent {Nsp} not divisible by {ndev} devices")
    if S > Nsp // ndev:
        raise ValueError(
            f"halo {S} exceeds local shard rows {Nsp // ndev}: the "
            f"single-hop exchange needs >= {S} rows per device")

    @jax.jit
    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(None, axis, None), P(axis, None)),
             out_specs=P(axis, None))
    def apply_sm(coefs_local, u_local):
        return dia_apply_spatial(coefs_local, offsets, u_local, axis)

    return lambda u: apply_sm(op.coefs, u)


def make_spatial_apply_sym(op, mesh: Mesh, axis="space"):
    """Symmetric-storage variant of :func:`make_spatial_apply`: halves
    the coefficient stream of the space-sharded apply (the plane-layout
    analogue of stencil.flatten_dia_sym) with unchanged per-apply ICI
    halo traffic (static coefficient halos are precomputed)."""
    from ..tpu.stencil import dia_sym_half

    cs, offs_sym = dia_sym_half(op.coefs, op.offsets)
    S = max(ds for ds, _ in offs_sym)
    ndev = mesh.shape[axis]
    Nsp = op.coefs.shape[1]
    if Nsp % ndev != 0:
        raise ValueError(f"s extent {Nsp} not divisible by {ndev} devices")
    if S > Nsp // ndev:
        raise ValueError(
            f"halo {S} exceeds local shard rows {Nsp // ndev}: the "
            f"single-hop exchange needs >= {S} rows per device")
    c_ext = extend_coefs_s(cs, ndev, S)     # (ndev, noff, S_loc+2S, Nrp)

    @jax.jit
    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axis, None, None, None), P(axis, None)),
             out_specs=P(axis, None))
    def apply_sm(coefs_ext_local, u_local):
        return dia_apply_spatial_sym(coefs_ext_local[0], offs_sym,
                                     u_local, axis)

    return lambda u: apply_sm(c_ext, u)
