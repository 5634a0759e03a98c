"""Pallas TPU kernels for the DIA stencil matvec (the framework's hot op)
— and the measurement-backed conclusion that XLA wins this op.

Settled with on-chip data (r1-r2, see RESULTS.md and
:func:`dia_apply_batched`): the XLA-fused apply sits at the irreducible
(noff+2)-plane HBM roofline at every measured plane count, because one
block's field fits on-chip and the coefficient streaming — the dominant
traffic — cannot be reduced.  Three kernel designs live here,
correctness-gated and selectable, none faster than XLA:

- whole-block VMEM staging (``use_pallas=True``, small stacks),
- s-tiled double-buffered manual-DMA streaming (large stacks that
  exceed scoped VMEM, 8-aligned strips),
- shared-coefficient residency/streaming variants (see
  :func:`dia_apply_shared` — whose *XLA* form is the real 2.3x win for
  meshes where blocks share one operator).
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


def _kernel_tiled(offsets, Nsp, Nrp, S, R, T, u_ref, coef_ref, out_ref):
    """s-tiled double-buffered variant: the coefficient stack stays in
    HBM (memory_space=ANY) and is streamed strip-by-strip with manual
    async DMA, so VMEM holds only (2, noff, T, Nrp) + the padded field
    — required when noff*Nsp*Nrp*4 exceeds VMEM (fully-curved p=6 has
    ~133 planes: 8.7 MB/block at 128^2, which OOMs the whole-block
    kernel together with its I/O), and it overlaps the next strip's
    coefficient DMA with the current strip's VPU work."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    noff = len(offsets)
    nt = (Nsp + T - 1) // T
    SP = 8                 # sublane-aligned halo (vector loads need
                           # provably 8-aligned row starts; |ds|<=SP)
    e = pl.program_id(0)   # hoisted: run_scoped's body loses the grid
                           # context under the interpreter

    def body(upad, cbuf, sem):
        # stage the field once with an aligned halo: upad[SP+j] = u[j]
        upad[...] = jnp.zeros((Nsp + 2 * SP, Nrp + 2 * R), upad.dtype)
        upad[SP:SP + Nsp, R:R + Nrp] = u_ref[0]

        def strip_start(t):
            # clamp the tail strip: overlapping rows recompute the same
            # values, so the duplicate store is benign.  Requires
            # 8 | Nsp and 8 | T so every start stays sublane-aligned.
            return pl.multiple_of(jnp.minimum(t * T, Nsp - T), 8)

        def dma(slot, t):
            return pltpu.make_async_copy(
                coef_ref.at[e, :, pl.ds(strip_start(t), T), :],
                cbuf.at[slot], sem.at[slot])

        dma(0, 0).start()

        def step(t, _):
            slot = jax.lax.rem(t, 2)

            @pl.when(t + 1 < nt)
            def _():
                dma(1 - slot, t + 1).start()

            dma(slot, t).wait()
            st = strip_start(t)
            # one aligned window load, then static in-register shifts
            strip = upad[pl.ds(st, T + 2 * SP), :]
            acc = jnp.zeros((T, Nrp), dtype=out_ref.dtype)
            for k, (ds, dr) in enumerate(offsets):
                sh = jax.lax.slice(strip, (SP + ds, R + dr),
                                   (SP + ds + T, R + dr + Nrp))
                acc = acc + cbuf[slot, k] * sh
            out_ref[0, pl.ds(st, T), :] = acc
            return ()

        jax.lax.fori_loop(0, nt, step, (), unroll=False)

    pl.run_scoped(
        body,
        upad=pltpu.VMEM((Nsp + 2 * SP, Nrp + 2 * R), out_ref.dtype),
        # the DMA source dtype must match: bf16-stored stacks stream as
        # bf16 and upcast at the multiply (coef * strip promotes)
        cbuf=pltpu.VMEM((2, noff, T, Nrp), coef_ref.dtype),
        sem=pltpu.SemaphoreType.DMA((2,)),
    )


@partial(jax.jit, static_argnames=("offsets", "T", "interpret"))
def _dia_apply_pallas_tiled(coefs, u, offsets, T=16, interpret=False):
    """coefs: (E, noff, Nsp, Nrp); u: (E, Nsp, Nrp)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    E, noff, Nsp, Nrp = coefs.shape
    S = max(abs(ds) for ds, _ in offsets)
    R = max(abs(dr) for _, dr in offsets)
    T = min(T, Nsp)
    assert Nsp % 8 == 0 and T % 8 == 0 and S <= 8, \
        "tiled kernel needs 8-aligned strips (8 | Nsp, 8 | T, |ds| <= 8)"

    return pl.pallas_call(
        partial(_kernel_tiled, offsets, Nsp, Nrp, S, R, T),
        grid=(E,),
        in_specs=[
            pl.BlockSpec((1, Nsp, Nrp),
                         lambda e: (e, 0, 0), memory_space=pltpu.VMEM),
            # ANY-space blocks must cover the whole array (trivial
            # index map); the kernel indexes by program_id in the DMA
            pl.BlockSpec((E, noff, Nsp, Nrp),
                         lambda e: (0, 0, 0, 0), memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, Nsp, Nrp), lambda e: (e, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, Nsp, Nrp), u.dtype),
        interpret=interpret,
    )(u, coefs)


def _kernel_shared(offsets, Nsp, Nrp, S, R, u_ref, coef_ref, out_ref):
    up = jnp.pad(u_ref[0], ((S, S), (R, R)))
    acc = jnp.zeros((Nsp, Nrp), dtype=out_ref.dtype)
    for k, (ds, dr) in enumerate(offsets):
        shifted = jax.lax.slice(up, (S + ds, R + dr),
                                (S + ds + Nsp, R + dr + Nrp))
        acc = acc + coef_ref[k] * shifted
    out_ref[0] = acc


def dia_apply_shared(coefs, u, offsets, *, use_pallas=None,
                     interpret=False):
    """Shared-coefficient batched DIA apply: every block uses the SAME
    operator (structured/affine meshes, replicated-geometry ensembles).

    Measured on v5e (133 planes, 8 x 128^2, r2): the shared layout cuts
    the XLA apply from ~103 us (per-block stacks) to **45.9 us** —
    coefficient traffic amortizes across blocks.  The Pallas variants
    (constant-index-map residency: 49.8 us; single-program DMA
    streaming: 61.1 us) do NOT beat the XLA fusion — at high plane
    counts the op becomes VPU shift+fma bound and XLA vectorizes that
    better — so XLA is the default here too.

    coefs: (noff, Nsp, Nrp) — one stack, no block axis; u: (E, Nsp, Nrp).
    """
    if use_pallas is None:
        # auto: same heuristic as dia_apply_batched — XLA wins at every
        # measured plane count on the shared layout too (RESULTS.md)
        use_pallas = False
    if not (use_pallas or interpret):
        Nsp, Nrp = u.shape[-2:]
        E = u.shape[0]
        S = max(abs(ds) for ds, _ in offsets)
        R = max(abs(dr) for _, dr in offsets)
        up = jnp.pad(u, ((0, 0), (S, S), (R, R)))
        out = jnp.zeros_like(u)
        for k, (ds, dr) in enumerate(offsets):
            sh = jax.lax.slice(up, (0, S + ds, R + dr),
                               (E, S + ds + Nsp, R + dr + Nrp))
            out = out + coefs[k][None] * sh
        return out
    return _dia_apply_pallas_shared(coefs, u, tuple(offsets),
                                    interpret=interpret)


@partial(jax.jit, static_argnames=("offsets", "interpret"))
def _dia_apply_pallas_shared(coefs, u, offsets, interpret=False):
    """Pallas form of the shared apply (constant-index-map coefficient
    residency).  Kept as an option with a correctness gate; measured
    slower than the XLA form (see :func:`dia_apply_shared`)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    E, Nsp, Nrp = u.shape
    noff = len(offsets)
    S = max(abs(ds) for ds, _ in offsets)
    R = max(abs(dr) for _, dr in offsets)

    return pl.pallas_call(
        partial(_kernel_shared, offsets, Nsp, Nrp, S, R),
        grid=(E,),
        in_specs=[
            pl.BlockSpec((1, Nsp, Nrp),
                         lambda e: (e, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((noff, Nsp, Nrp),
                         lambda e: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Nsp, Nrp), lambda e: (e, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, Nsp, Nrp), u.dtype),
        # the shared stack is large; raise the scoped-VMEM limit above
        # the 16 MB default (v5e has 128 MB physical VMEM) — Mosaic
        # still double-buffers the constant block
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(u, coefs)


def _kernel_shared_stream(offsets, E, Nsp, Nrp, S, R,
                          u_hbm, coef_ref, out_hbm):
    """Single-program variant: the shared coefficient stack is loaded
    into VMEM exactly once, and the u/out blocks are streamed through
    double-buffered manual DMA — coefficient HBM traffic amortizes over
    all E blocks (the per-dof traffic drops from (noff+2) planes to
    noff/E + 2)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def body(ubuf, obuf, sin, sout):
        def dma_in(slot, e):
            return pltpu.make_async_copy(u_hbm.at[e], ubuf.at[slot],
                                         sin.at[slot])

        def dma_out(slot, e):
            return pltpu.make_async_copy(obuf.at[slot], out_hbm.at[e],
                                         sout.at[slot])

        dma_in(0, 0).start()

        def step(e, _):
            slot = jax.lax.rem(e, 2)

            @pl.when(e + 1 < E)
            def _():
                dma_in(1 - slot, e + 1).start()

            dma_in(slot, e).wait()
            up = jnp.pad(ubuf[slot], ((S, S), (R, R)))
            acc = jnp.zeros((Nsp, Nrp), dtype=obuf.dtype)
            for k, (ds, dr) in enumerate(offsets):
                sh = jax.lax.slice(up, (S + ds, R + dr),
                                   (S + ds + Nsp, R + dr + Nrp))
                acc = acc + coef_ref[k] * sh

            # reuse of this out slot: wait for its previous store
            @pl.when(e >= 2)
            def _():
                dma_out(slot, e - 2).wait()

            obuf[slot] = acc
            dma_out(slot, e).start()
            return ()

        jax.lax.fori_loop(0, E, step, (), unroll=False)
        # drain the last one or two stores
        dma_out(jax.lax.rem(E - 1, 2), E - 1).wait()

        @pl.when(E >= 2)
        def _():
            dma_out(jax.lax.rem(E - 2, 2), E - 2).wait()

    pl.run_scoped(
        body,
        # field-side buffers carry the FIELD dtype (u/out DMA endpoints
        # must match; a bf16 coef stack upcasts at the multiply and the
        # accumulator stays full precision)
        ubuf=pltpu.VMEM((2, Nsp, Nrp), u_hbm.dtype),
        obuf=pltpu.VMEM((2, Nsp, Nrp), out_hbm.dtype),
        sin=pltpu.SemaphoreType.DMA((2,)),
        sout=pltpu.SemaphoreType.DMA((2,)),
    )


@partial(jax.jit, static_argnames=("offsets", "interpret"))
def dia_apply_shared_stream(coefs, u, offsets, interpret=False):
    """coefs: (noff, Nsp, Nrp) shared; u: (E, Nsp, Nrp)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    E, Nsp, Nrp = u.shape
    S = max(abs(ds) for ds, _ in offsets)
    R = max(abs(dr) for _, dr in offsets)

    return pl.pallas_call(
        partial(_kernel_shared_stream, offsets, E, Nsp, Nrp, S, R),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((E, Nsp, Nrp), u.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(u, coefs)


def _kernel_flat_stream(offsets_flat, nflat, Nvol, Lpad, KO, EB, sym,
                        shared, u_ref, coef_hbm, out_ref):
    """Flat-layout streaming kernel: EB blocks' fields are staged once in
    VMEM (padded by the max linear offset), and the flat coefficient
    stack — the dominant HBM traffic — is streamed in KO-offset strips
    with double-buffered manual DMA, overlapping the next strip's DMA
    with the current strip's VPU fma work.  The strip loop is a static
    Python unroll because each linear offset must be a static slice
    start (Mosaic lane-rotates misaligned loads).

    ``EB`` blocks per program ride the SUBLANE axis: a (1, Nvol) field
    uses 1 of 8 sublanes per vreg, so the EB=1 form runs the fma work
    at ~1/8 VPU throughput (measured 4051 us vs 1040 us XLA at the
    flagship shape, r3); EB=8 packs full (8, 128) tiles.

    ``sym``: the stack holds only o >= 0 diagonals (see
    stencil.flatten_dia_sym) and each o > 0 plane also contributes its
    transpose side shift(C_o * u, -o) — half the DMA traffic."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # shared stacks keep their broadcast (extent-1) block axis in HBM —
    # every program streams block 0 (no E-fold materialized copy)
    g = pl.program_id(0)
    nstrips = -(nflat // -KO)            # last strip may be ragged

    def nk(t):
        return min(KO, nflat - t * KO)   # offsets in strip t (static)

    def body(cbuf, sem):
        # halo-pad the resident fields once as a value (aligned base:
        # Lpad is a lane multiple, so each shift pays one rotate — the
        # same relayout cost the XLA flat form pays).  u blocks arrive
        # as (EB, 1, Nvol) — the unit middle axis exists only to satisfy
        # Mosaic's (sublane, lane) block-shape rule on the (E, 1, Nvol)
        # operand view; drop it here.
        uval = u_ref[..., 0, :]                       # (EB, Nvol)
        upv = jnp.pad(uval, ((0, 0), (Lpad, Lpad)))

        def dma(slot, t):
            if shared:
                return pltpu.make_async_copy(
                    coef_hbm.at[0, pl.ds(t * KO, nk(t)), :],
                    cbuf.at[slot, pl.ds(0, nk(t))], sem.at[slot])
            return pltpu.make_async_copy(
                coef_hbm.at[pl.ds(g * EB, EB), pl.ds(t * KO, nk(t)), :],
                cbuf.at[slot, :, pl.ds(0, nk(t))], sem.at[slot])

        dma(0, 0).start()
        acc = jnp.zeros((EB, Nvol), dtype=out_ref.dtype)
        for t in range(nstrips):
            slot = t % 2
            if t + 1 < nstrips:
                dma(1 - slot, t + 1).start()
            dma(slot, t).wait()
            cv = cbuf[slot]
            for k in range(nk(t)):
                off = offsets_flat[t * KO + k]
                # shared: one coefficient row broadcasts over the EB
                # sublane-packed blocks; per-block: each sublane gets
                # its own block's row
                c = cv[k][None, :] if shared else cv[:, k, :]
                sh = jax.lax.slice(upv, (0, Lpad + off),
                                   (EB, Lpad + off + Nvol))
                acc = acc + c * sh
                if sym and off:
                    wp = jnp.pad(c * uval, ((0, 0), (Lpad, Lpad)))
                    acc = acc + jax.lax.slice(
                        wp, (0, Lpad - off), (EB, Lpad - off + Nvol))
        out_ref[...] = acc[:, None, :]

    cshape = (2, KO, Nvol) if shared else (2, EB, KO, Nvol)
    pl.run_scoped(
        body,
        cbuf=pltpu.VMEM(cshape, coef_hbm.dtype),
        sem=pltpu.SemaphoreType.DMA((2,)),
    )


@partial(jax.jit, static_argnames=("offsets_flat", "KO", "EB", "sym",
                                   "interpret"))
def _dia_apply_flat_pallas(coefs_flat, u, offsets_flat, KO=8, EB=None,
                           sym=False, interpret=False):
    """coefs_flat: (E, nflat, Nvol) or (1, nflat, Nvol) shared; u: (E, Nvol)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    E = u.shape[0]
    Ec, nflat, Nvol = coefs_flat.shape
    shared = Ec == 1 and E > 1            # broadcast stack stays 1 in HBM
    if EB is None:
        # blocks per program ride the sublane axis: full (8, 128) tiles
        # whenever E allows.  Padding E up to an EB multiple (<= 7
        # zero blocks) beats falling back to narrower tiles: the
        # measured EB=1 path is ~4x slower (compute-bound), far more
        # than the worst-case padded-DMA overhead.
        EB = min(8, E)
    EB = min(EB, E)
    E_pad = -(E // -EB) * EB
    L = max(abs(o) for o in offsets_flat)
    Lpad = -(L // -128) * 128            # aligned halo: u lands on a
    #                                      lane-aligned base, shifts pay
    #                                      one rotate each (as XLA does)
    # Mosaic DMA slices must be tile-aligned: pad the lane (volume) dim
    # to a 128 multiple and the strip (offset) dim to a KO multiple.
    # Tail zeros in u reproduce the unpadded form's halo zeros exactly,
    # and zero coefficient rows (offset 0) are no-ops; the coefficient
    # pad is loop-invariant, so XLA hoists it out of solver loops.
    Nvp = -(Nvol // -128) * 128
    nfp = -(nflat // -KO) * KO
    if Nvp != Nvol:
        u = jnp.pad(u, ((0, 0), (0, Nvp - Nvol)))
        coefs_flat = jnp.pad(coefs_flat,
                             ((0, 0), (0, 0), (0, Nvp - Nvol)))
    if nfp != nflat:
        coefs_flat = jnp.pad(coefs_flat,
                             ((0, 0), (0, nfp - nflat), (0, 0)))
        offsets_flat = tuple(offsets_flat) + (0,) * (nfp - nflat)
    if not shared and coefs_flat.shape[0] > E:
        coefs_flat = coefs_flat[:E]       # drop caller-side chunk pad
    if E_pad != E:
        u = jnp.pad(u, ((0, E_pad - E), (0, 0)))
        if not shared:
            coefs_flat = jnp.pad(
                coefs_flat,
                ((0, E_pad - coefs_flat.shape[0]), (0, 0), (0, 0)))
    # the field rides a (E, 1, Nvol) view so the VMEM block's last two
    # dims (1, Nvol) EQUAL the operand's last two dims — Mosaic's
    # block-shape rule rejects a (1, Nvol) block of an (E, Nvol) array
    # whenever E is not the block extent (measured on-chip, r3)
    Ecp = coefs_flat.shape[0]
    out = pl.pallas_call(
        partial(_kernel_flat_stream, tuple(offsets_flat), nfp, Nvp,
                Lpad, KO, EB, sym, shared),
        grid=(E_pad // EB,),
        in_specs=[
            pl.BlockSpec((EB, 1, Nvp), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            # ANY-space blocks must cover the whole array (trivial
            # index map); the kernel indexes by program_id in the DMA
            pl.BlockSpec((Ecp, nfp, Nvp), lambda g: (0, 0, 0),
                         memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((EB, 1, Nvp), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E_pad, 1, Nvp), u.dtype),
        # per-block cbuf is (2, EB, KO, Nvp): ~10 MB at the flagship
        # shape with EB=KO=8 — above the 16 MB default together with
        # the field blocks, well under physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(u[:, None, :], coefs_flat)
    return out[:E, 0, :Nvol]


def dia_apply_flat_stream(coefs_flat, offsets_flat, u, *, KO=8, EB=None,
                          sym=False, interpret=False):
    """Pallas flat-layout apply (see :func:`.stencil.dia_apply_flat`
    for the XLA form and :func:`.stencil.flatten_dia` for the layout).

    The r3 frontier kernel (TODO.md): flat HBM coefficient storage
    (no lane-padding waste) + double-buffered strip DMA + VMEM-resident
    fields, ``EB`` blocks per program packed along the sublane axis
    (default min(8, E) — full (8, 128) vregs for the fma work; E pads
    up to an EB multiple with zero blocks).  ``sym=True`` streams a
    symmetric
    (o >= 0 only) stack from :func:`.stencil.flatten_dia_sym` — half
    the DMA traffic.  u: (E, Nsp, Nrp) or (E, Nvol)."""
    out_shape = u.shape
    Nvol = coefs_flat.shape[-1]
    if u.shape[-1] != Nvol:
        u = u.reshape(u.shape[0], Nvol)
    out = _dia_apply_flat_pallas(coefs_flat, u, tuple(offsets_flat),
                                 KO=KO, EB=EB, sym=sym,
                                 interpret=interpret)
    return out.reshape(out_shape)


def dia_apply_batched(op_coefs, offsets, u, *, use_pallas=None,
                      interpret=False):
    """Batched DIA apply.  op_coefs: (E, noff, Nsp, Nrp); u: (E, Nsp, Nrp).

    Auto mode (use_pallas=None) selects **XLA** everywhere: the
    question was settled with on-chip data (r1-r2, RESULTS.md).  XLA's
    fused form sits at the irreducible (noff+2)-plane HBM roofline at
    every measured plane count — p=2/9 planes: 99% (286 us vs pallas
    296); p=6/33: 78% (72 vs 73); fully-curved p=6/133 planes: ~83%
    (103 us vs s-tiled-DMA pallas 109).  The r1 hypothesis that XLA
    re-reads the shifted field per offset is FALSE — one block's field
    (<=264 KB) stays on-chip, so the op is coefficient-traffic-bound
    and that traffic is irreducible.  At very high plane counts the op
    turns VPU shift+fma bound, where XLA also vectorizes better than
    Mosaic.  The kernels remain available (use_pallas=True: whole-block
    VMEM staging, or the s-tiled double-buffered manual-DMA variant
    when the stack exceeds VMEM) and correctness-gated.  For meshes
    where blocks share one operator, use :func:`dia_apply_shared`
    (2.3x, also XLA).
    """
    E, noff = op_coefs.shape[:2]
    Nsp, Nrp = u.shape[-2:]
    if use_pallas is None:
        use_pallas = False
    if use_pallas or interpret:
        coef_mb = noff * Nsp * Nrp * op_coefs.dtype.itemsize / 1e6
        S = max(abs(ds) for ds, _ in offsets)
        can_tile = Nsp % 8 == 0 and S <= 8 and Nsp >= 16
        if coef_mb > 4.0 and can_tile:
            return _dia_apply_pallas_tiled(op_coefs, u, tuple(offsets),
                                           interpret=interpret)
        return _dia_apply_pallas(op_coefs, u, tuple(offsets),
                                 interpret=interpret)
    return jax.vmap(lambda c, ue: dia_apply(
        DiaOperator(coefs=c, offsets=tuple(offsets)), ue))(op_coefs, u)
