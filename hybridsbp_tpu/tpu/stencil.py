"""Device-side matrix-free application of the block operator M~.

The assembled SPD operator of one block (ops2d.local_op) is a 2D stencil
matrix: a bounded set of logical offsets (dr, ds) carry nonzeros (interior
narrow stencils + boundary closures + SAT face terms).  We extract it once
into **generalized-diagonal (DIA) form** — for each offset a dense
(Ns+1, Nr+1) coefficient plane — and apply it as a fused sequence of
shift-multiply-adds:

    (M u)[j, i] = sum_d  C_d[j, i] * u[j + ds_d, i + dr_d]

This is the TPU-idiomatic replacement for the reference's CHOLMOD
factor/backsolve pipeline (SURVEY §7): it is exactly the sparse matvec,
it vectorizes over a leading block axis (vmap / shard_map), its HBM
traffic is (noffsets+2) x field size, and XLA fuses the whole sum into
one elementwise kernel.  Used as the CG matvec for iterative block
solves and for the sharded multiblock path.
"""
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class DiaOperator(NamedTuple):
    """DIA-form operator: coefficient planes per logical offset.

    coefs:   (noff, Nsp, Nrp) — coefficient plane per offset
    offsets: (noff, 2) static numpy int array of (ds, dr)
    """
    coefs: jnp.ndarray
    offsets: Tuple[Tuple[int, int], ...]

    @property
    def shape(self):
        return self.coefs.shape[1:]


def to_dia(M_sparse, Nrp, Nsp, dtype=jnp.float64) -> DiaOperator:
    """Extract the (ds, dr)-offset diagonal planes of an assembled sparse
    block operator (volume index = j * Nrp + i, r fastest)."""
    M = M_sparse.tocoo()
    ri, rj = M.row % Nrp, M.row // Nrp
    ci, cj = M.col % Nrp, M.col // Nrp
    dr, ds = ci - ri, cj - rj
    keys = ds.astype(np.int64) * (4 * Nrp) + dr
    uniq, inv = np.unique(keys, return_inverse=True)
    noff = len(uniq)
    coefs = np.zeros((noff, Nsp, Nrp))
    np.add.at(coefs, (inv, rj, ri), M.data)
    offs = []
    for k in uniq:
        drr = int((k + 2 * Nrp) % (4 * Nrp)) - 2 * Nrp
        dss = int((k - drr) // (4 * Nrp))
        offs.append((dss, drr))
    return DiaOperator(coefs=jnp.asarray(coefs, dtype=dtype),
                       offsets=tuple(offs))


def dia_apply(op: DiaOperator, u: jnp.ndarray) -> jnp.ndarray:
    """Apply the DIA operator to a (..., Nsp, Nrp) field (vmappable)."""
    Nsp, Nrp = op.shape
    S = max(abs(ds) for ds, _ in op.offsets)
    R = max(abs(dr) for _, dr in op.offsets)
    pad = [(0, 0)] * (u.ndim - 2) + [(S, S), (R, R)]
    up = jnp.pad(u, pad)
    out = jnp.zeros_like(u)
    for k, (ds, dr) in enumerate(op.offsets):
        shifted = jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(up, S + ds, S + ds + Nsp, axis=-2),
            R + dr, R + dr + Nrp, axis=-1)
        out = out + op.coefs[k] * shifted
    return out


def dia_apply_compact(op: DiaOperator, u: jnp.ndarray) -> jnp.ndarray:
    """Scan-based DIA apply with O(1) program size in the offset count.

    Identical result to :func:`dia_apply`, but the offset loop is a
    ``lax.scan`` over a traced offset array instead of an unrolled sum —
    for high-order operators (p=6: 31+ planes) the unrolled HLO can
    exceed remote-compile request limits (see TODO).  Slightly slower
    (no cross-offset fusion); use when program size matters.

    Note: the size win only materializes when ``op.coefs`` enters the
    jitted program as a traced argument (measured ~10x smaller HLO for
    the 133-plane p=6 curved-block operator).  If the operator is
    closed over as a Python constant, the coefficient planes are baked
    into the HLO as literals and dominate program size either way.
    """
    Nsp, Nrp = op.shape
    S = max(abs(ds) for ds, _ in op.offsets)
    R = max(abs(dr) for _, dr in op.offsets)
    pad = [(0, 0)] * (u.ndim - 2) + [(S, S), (R, R)]
    up = jnp.pad(u, pad)
    offs = jnp.asarray(op.offsets, dtype=jnp.int32)   # (noff, 2) = (ds, dr)

    lead = u.shape[:-2]
    start_lead = (jnp.int32(0),) * len(lead)

    def body(acc, xs):
        (ds, dr), coef = xs
        shifted = jax.lax.dynamic_slice(
            up, start_lead + (S + ds, R + dr), lead + (Nsp, Nrp))
        return acc + coef * shifted, None

    acc0 = jnp.zeros_like(u)
    acc, _ = jax.lax.scan(body, acc0, ((offs[:, 0], offs[:, 1]), op.coefs))
    return acc


def flatten_dia(coefs: jnp.ndarray, offsets, Nrp: int):
    """Convert 2D-offset DIA planes to 1D raveled-diagonal form.

    On the C-order raveled volume index (j*Nrp + i, r fastest) the
    logical offset (ds, dr) is the single linear offset ds*Nrp + dr —
    the true matrix diagonal.  Distinct (ds, dr) pairs can collide on
    one linear offset when |dr| wraps a full row (tiny blocks only);
    colliding planes are exactly mergeable by summing coefficients.

    Why: TPU tiles the two minor dims to (8, 128) — a (noff, Nsp, Nrp)
    stack at Nrp=137 pads the lane dim to 256 (~1.9x wasted HBM
    traffic, measured 1.5x apply slowdown at the flagship shape).  The
    flat (noff, Nsp*Nrp) layout pads only Nsp*Nrp -> next 128 multiple
    (<1%).

    coefs: (..., noff, Nsp, Nrp) -> returns (coefs_flat, offsets_flat)
    with coefs_flat (..., nflat, Nsp*Nrp) and offsets_flat a sorted
    tuple of ints.
    """
    *lead, noff, Nsp, Nrp_ = coefs.shape
    assert Nrp_ == Nrp
    lin = {}
    for k, (ds, dr) in enumerate(offsets):
        lin.setdefault(ds * Nrp + dr, []).append(k)
    offs = sorted(lin)
    cf = coefs.reshape(*lead, noff, Nsp * Nrp)
    planes = []
    for o in offs:
        ks = lin[o]
        pl = cf[..., ks[0], :]
        for k in ks[1:]:
            pl = pl + cf[..., k, :]
        planes.append(pl)
    return jnp.stack(planes, axis=-2), tuple(offs)


def dia_apply_flat(coefs_flat: jnp.ndarray, offsets_flat,
                   u: jnp.ndarray) -> jnp.ndarray:
    """Apply a flat-form DIA operator (see :func:`flatten_dia`).

    u: (..., Nsp, Nrp) or (..., Nvol); returns the same shape.
    coefs_flat: (..., nflat, Nvol) broadcastable against u's lead dims.
    """
    out_shape = u.shape
    Nvol = coefs_flat.shape[-1]
    if u.shape[-1] != Nvol:
        u = u.reshape(*u.shape[:-2], Nvol)
    L = max(abs(o) for o in offsets_flat)
    pad = [(0, 0)] * (u.ndim - 1) + [(L, L)]
    up = jnp.pad(u, pad)
    out = jnp.zeros_like(u)
    for k, off in enumerate(offsets_flat):
        shifted = jax.lax.slice_in_dim(up, L + off, L + off + Nvol, axis=-1)
        out = out + coefs_flat[..., k, :] * shifted
    return out.reshape(out_shape)


def flatten_dia_sym(coefs: jnp.ndarray, offsets, Nrp: int):
    """Symmetric flat raveled-diagonal form: store only o >= 0.

    The assembled block operator is symmetric (SPD), so the linear
    diagonals pair up exactly: diag_{-o}[v+o] = diag_o[v] (measured
    |M - M.T| ~ 1e-16 absolute).  Storing only the non-negative
    offsets HALVES the coefficient stream — the dominant HBM traffic
    of the apply — at identical VPU cost (per ±o pair the symmetric
    apply does the same 2 multiplies + 2 shifts + 2 adds as the full
    form).  Pairs are averaged, which also makes the applied operator
    EXACTLY symmetric (what CG assumes).

    coefs: (..., noff, Nsp, Nrp) -> (coefs_sym, offsets_sym) with
    coefs_sym (..., nsym, Nsp*Nrp), offsets_sym sorted ints >= 0,
    offsets_sym[0] == 0.
    """
    cf, offs = flatten_dia(coefs, offsets, Nrp)
    Nvol = cf.shape[-1]
    omap = {o: k for k, o in enumerate(offs)}
    pos = sorted(o for o in offs if o >= 0)
    assert pos and pos[0] == 0, "operator must carry a main diagonal"
    planes = []
    for o in pos:
        c = cf[..., omap[o], :]
        if o and -o in omap:
            # diag_{-o}[v+o] aligns with diag_o[v]
            cneg = cf[..., omap[-o], :]
            shifted = jnp.concatenate(
                [cneg[..., o:], jnp.zeros(cneg.shape[:-1] + (o,),
                                          cneg.dtype)], axis=-1)
            c = 0.5 * (c + shifted)
        planes.append(c)
    # any negative offset without a positive partner would be dropped —
    # cannot happen for a symmetric matrix, but guard the layout
    assert all(-o in omap or o == 0 for o in pos), "asymmetric offsets"
    assert all(o >= 0 or -o in omap for o in offs), "asymmetric offsets"
    return jnp.stack(planes, axis=-2), tuple(pos)


def dia_apply_flat_sym(coefs_sym: jnp.ndarray, offsets_sym,
                       u: jnp.ndarray) -> jnp.ndarray:
    """Apply a symmetric flat-form operator (see :func:`flatten_dia_sym`).

    y[v] = C_0[v] u[v] + sum_{o>0} C_o[v] u[v+o] + C_o[v-o] u[v-o]
         = C_0 u + sum_{o>0} C_o * shift(u, +o) + shift(C_o * u, -o).

    u: (..., Nsp, Nrp) or (..., Nvol); returns the same shape.
    """
    out_shape = u.shape
    Nvol = coefs_sym.shape[-1]
    if u.shape[-1] != Nvol:
        u = u.reshape(*u.shape[:-2], Nvol)
    L = max(offsets_sym)
    pad = [(0, 0)] * (u.ndim - 1)
    up = jnp.pad(u, pad + [(0, L)])
    out = coefs_sym[..., 0, :] * u
    for k, off in enumerate(offsets_sym):
        if off == 0:
            continue
        c = coefs_sym[..., k, :]
        out = out + c * jax.lax.slice_in_dim(up, off, off + Nvol, axis=-1)
        w = jnp.pad(c * u, pad + [(L, 0)])
        out = out + jax.lax.slice_in_dim(w, L - off, L - off + Nvol,
                                         axis=-1)
    return out.reshape(out_shape)


def dia_sym_half(coefs: jnp.ndarray, offsets):
    """Symmetric PLANE form: keep one plane per ±(ds, dr) pair.

    2D analogue of :func:`flatten_dia_sym` for paths that must stay on
    the (Nsp, Nrp) plane layout (the space-sharded apply, whose shard
    axis the flat index would interleave).  Operator symmetry gives
    C_{-ds,-dr}[j+ds, i+dr] = C_{ds,dr}[j, i]; pairs are averaged.

    Returns (coefs_sym, offsets_sym) where offsets_sym keeps (0, 0)
    first and the lexicographically-positive representative of each
    pair ((ds > 0) or (ds == 0 and dr > 0)).
    """
    *lead, noff, Nsp, Nrp = coefs.shape
    omap = {tuple(o): k for k, o in enumerate(offsets)}
    pos = sorted(o for o in omap
                 if o[0] > 0 or (o[0] == 0 and o[1] >= 0))
    assert pos and pos[0] == (0, 0), "operator must carry a main diagonal"
    assert all((-ds, -dr) in omap or (ds, dr) == (0, 0)
               for ds, dr in omap), "asymmetric offset set"
    lead_pad = [(0, 0)] * len(lead)

    def shift2(c, ds, dr):
        """c shifted: out[j, i] = c[j+ds, i+dr], zero outside."""
        S, R = abs(ds), abs(dr)
        cp = jnp.pad(c, lead_pad + [(S, S), (R, R)])
        return jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(cp, S + ds, S + ds + Nsp, axis=-2),
            R + dr, R + dr + Nrp, axis=-1)

    planes = []
    for ds, dr in pos:
        c = coefs[..., omap[(ds, dr)], :, :]
        if (ds, dr) != (0, 0):
            # C_{-ds,-dr} shifted by (+ds, +dr) aligns with C_{ds,dr}
            c = 0.5 * (c + shift2(coefs[..., omap[(-ds, -dr)], :, :],
                                  ds, dr))
        planes.append(c)
    return jnp.stack(planes, axis=-3), tuple(pos)


def dia_diagonal(op: DiaOperator) -> jnp.ndarray:
    """Main diagonal (for Jacobi preconditioning)."""
    for k, (ds, dr) in enumerate(op.offsets):
        if ds == 0 and dr == 0:
            return op.coefs[k]
    raise ValueError("operator has no main diagonal")
