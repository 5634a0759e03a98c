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
