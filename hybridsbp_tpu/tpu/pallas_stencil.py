"""Pallas TPU kernel for the DIA stencil matvec (the framework's hot op).

The XLA-fused form of :func:`..tpu.stencil.dia_apply` reads a shifted
copy of ``u`` from HBM for every offset (~2*noff+1 planes of traffic per
apply).  This kernel stages the padded field in VMEM once and streams
only the coefficient planes, approaching the irreducible
(noff+2)-plane HBM roofline: grid over the block batch; per program the
(Nsp+2S, Nrp+2R) padded field and the (noff, Nsp, Nrp) coefficient
stack for one mesh block live in VMEM, and the offset sum runs entirely
on the VPU with static slices.

Falls back transparently to the XLA form on non-TPU backends.
"""
from functools import partial

import jax
import jax.numpy as jnp

from .stencil import DiaOperator, dia_apply


def _kernel(offsets, Nsp, Nrp, S, R, u_ref, coef_ref, out_ref):
    # stage the halo-padded field in VMEM (cheap on-chip pad; avoids an
    # HBM round-trip of a padded copy)
    up = jnp.pad(u_ref[0], ((S, S), (R, R)))
    acc = jnp.zeros((Nsp, Nrp), dtype=out_ref.dtype)
    for k, (ds, dr) in enumerate(offsets):
        shifted = jax.lax.slice(up, (S + ds, R + dr),
                                (S + ds + Nsp, R + dr + Nrp))
        acc = acc + coef_ref[0, k] * shifted
    out_ref[0] = acc


@partial(jax.jit, static_argnames=("offsets", "interpret"))
def _dia_apply_pallas(coefs, u, offsets, interpret=False):
    """coefs: (E, noff, Nsp, Nrp); u: (E, Nsp, Nrp)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    E, noff, Nsp, Nrp = coefs.shape
    S = max(abs(ds) for ds, _ in offsets)
    R = max(abs(dr) for _, dr in offsets)

    return pl.pallas_call(
        partial(_kernel, offsets, Nsp, Nrp, S, R),
        grid=(E,),
        in_specs=[
            pl.BlockSpec((1, Nsp, Nrp),
                         lambda e: (e, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, noff, Nsp, Nrp),
                         lambda e: (e, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Nsp, Nrp), lambda e: (e, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, Nsp, Nrp), u.dtype),
        interpret=interpret,
    )(u, coefs)


def dia_apply_batched(op_coefs, offsets, u, *, use_pallas=None,
                      interpret=False):
    """Batched DIA apply; picks the Pallas kernel on TPU backends.

    op_coefs: (E, noff, Nsp, Nrp); u: (E, Nsp, Nrp).

    Auto mode engages the kernel only for large blocks: Mosaic rejects
    some small unaligned shapes, and below ~128 lanes the XLA fusion is
    equally bandwidth-bound anyway.
    """
    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu"
                      and min(u.shape[-1], u.shape[-2]) >= 128)
    if use_pallas or interpret:
        return _dia_apply_pallas(op_coefs, u, tuple(offsets),
                                 interpret=interpret)
    return jax.vmap(lambda c, ue: dia_apply(
        DiaOperator(coefs=c, offsets=tuple(offsets)), ue))(op_coefs, u)
