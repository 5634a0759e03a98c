"""Batched + sharded multiblock hybrid solver (the device/ICI path).

The reference's inter-block coupling is one sparse trace operator inside a
single address space (SURVEY §5.8).  Here blocks become a leading batch
axis: per-block operators are DIA stencils (vmapped), and the only
cross-block data motion is the exchange of face traces — implemented with
an ``all_gather`` of the small per-block face-trace tensor over the
device mesh's ``block`` axis (ICI), exactly the collective the hybrid
formulation calls for.

Solved system: the eliminated-displacement SPD form (square_circle.jl:389-394)

    C u = (M - Fbar' D^{-1} Fbar) u = g - Fbar' D^{-1} g_delta

by preconditioned CG whose matvec is: local DIA apply + face-trace
gather/combine/scatter.  Orientation flips across mismatched faces are
static index reversals.

Parallelism mapping (this framework's analogue of dp/tp/...):
  - block axis sharded over the mesh = domain decomposition (the dp-like
    axis; the only parallel axis the math exposes at block granularity)
  - within-block spatial sharding of the s axis (sp/tp-like) composes on
    top via the same DIA halo structure (max |ds| halo) — see
    ``shard_map`` notes in parallel/.
"""
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import BC_JUMP_INTERFACE, BC_LOCKED_INTERFACE
from ..ops1d import vd2_tables
from .cg import cg



class FaceOps(NamedTuple):
    """Banded layer-restricted face->volume maps F_e[lf] for all blocks.

    The SAT face coupling is *banded along the face*: a trace point k
    couples into volume point (layer l, along-face a) only for
    a - k in a narrow static offset set (pointwise for diagonal-metric
    faces, D1-stencil-wide when crs != 0; measured +-1 at p=2, +-5 at
    p=6).  Storing the dense (nlay, A, L) tensors made the face terms
    50-70% of the coupled matvec's HBM traffic (r2 finding); the banded
    form reduces them to O(nlay*nband) 1D rows — negligible.

    Tb[lf]:     (E, nlay, nband, A) band coefficients,
                Tb[e, l, b, a] = F_e[(layer_l, a), k=a - offs[lf][b]]
    offs[lf]:   static along-face offsets (ints)
    layers[lf]: static volume layer positions (r-indices for west/east,
                s-indices for south/north)
    """
    Tb: Tuple[jnp.ndarray, ...]
    offs: Tuple[Tuple[int, ...], ...]
    layers: Tuple[Tuple[int, ...], ...]


class BlockedHybrid(NamedTuple):
    """Everything the device multiblock solve needs (static metadata as
    numpy; field data as jnp arrays with leading block axis E).

    Two storage-level optimizations of the coefficient stack (the
    dominant HBM stream of the hot matvec — see pallas_stencil):

    - ``shared=True``: every block uses the SAME operator, so ``coefs``
      carries a single stack with a broadcast block axis of extent 1
      (structured/replicated meshes; auto-detected by
      :func:`build_blocked`).  The apply routes through
      ``dia_apply_shared`` — measured 2.3x on-chip.
    - ``coefs`` may be stored in a narrower dtype than the fields
      (``build_blocked(..., coef_dtype=jnp.bfloat16)`` or
      :func:`with_coef_dtype`): the multiply upcasts on-chip, HBM
      coefficient traffic halves.  Solves against the bf16-perturbed
      operator carry ~1e-3 relative error; wrap with
      :func:`hybridsbp_tpu.tpu.refine.refined_displacement_solve` to
      recover full working-precision accuracy.
    """
    coefs: jnp.ndarray            # (E|1, noff, Nsp, Nrp) DIA planes
    offsets: Tuple[Tuple[int, int], ...]
    faces: FaceOps
    Dinv: jnp.ndarray             # (nfaces, L): 1/D per interior face, 0 else
    FToE: np.ndarray              # (2, nfaces) static
    FToLF: np.ndarray
    EToF: np.ndarray              # (4, E)
    flip: np.ndarray              # (4, E) bool: plus-side orientation flip
    interior: np.ndarray          # (nfaces,) bool
    JH: jnp.ndarray               # (E, Nsp, Nrp) quadrature (for norms)
    fd: object = None             # stacked FastDiag (block preconditioner)
    # static orientation-reversal permutations for the L-padded trace
    # layout (rectangular blocks: a face's true length Lf may be < L,
    # so a whole-row [::-1] would shuffle padding into data).
    # perm_lf[lf]: reversal within the local-face length (4, L);
    # perm_face[f]: reversal within face f's trace length (nfaces, L).
    perm_lf: np.ndarray = None
    perm_face: np.ndarray = None
    shared: bool = False          # coefs block axis is broadcast (extent 1)
    # optional 1D raveled-diagonal companion layout (see
    # stencil.flatten_dia / :func:`with_flat_layout`): avoids the TPU
    # lane-dim tile padding of the 2D planes at 128-unaligned Nrp
    # (measured 2.3x apply speedup at the flagship 137x137 shape).
    coefs_flat: jnp.ndarray = None       # (E_pad|1, nflat, Nsp*Nrp)
    offsets_flat: Tuple[int, ...] = None
    flat_chunk: int = None               # lax.map chunk size (static)
    # symmetric flat storage: offsets_flat holds only o >= 0 and the
    # apply supplies the o < 0 diagonals from operator symmetry —
    # halves the coefficient stream (see stencil.flatten_dia_sym)
    flat_sym: bool = False

    @property
    def grid_shape(self):
        # from JH (always per-block (E, Nsp, Nrp)): ``coefs`` may be
        # None in the flat-only memory mode (with_flat_layout
        # drop_planes=True — the plane stack is ~1.5x the flat one at
        # 128-unaligned shapes and is dead weight when every apply
        # routes through the flat layout)
        return self.JH.shape[1:]

    @property
    def nblocks(self):
        """True block count E (coefs may carry a broadcast axis when
        ``shared``; JH is always per-block)."""
        return self.JH.shape[0]

    def _rev_lf(self, w, lf):
        """Reverse (E, L) trace rows within local face lf's length."""
        if self.perm_lf is None:
            return w[:, ::-1]
        return w[:, self.perm_lf[lf]]

    def _rev_face(self, t):
        """Reverse (nfaces, L) rows within each face's own length."""
        if self.perm_face is None:
            return t[:, ::-1]
        nf = self.perm_face.shape[0]
        return t[np.arange(nf)[:, None], self.perm_face]


def _bp_dtype(bp: "BlockedHybrid"):
    """Working dtype of the operator (coefs may be None in the
    flat-only memory mode)."""
    return (bp.coefs if bp.coefs is not None else bp.coefs_flat).dtype


def bp_arrays(bp: "BlockedHybrid"):
    """The large jnp-array fields of a BlockedHybrid as a pytree dict.

    Pass these as jit *arguments* (rebuilding the operator inside the
    traced function with :func:`bp_with`) instead of closing over the
    BlockedHybrid: closure arrays are serialized into the lowered HLO
    as literal constants — once per while-loop computation that reads
    them — which multiplies the program size by the coefficient-stack
    footprint and blows past the axon remote-compile request limit
    (HTTP 413; measured 87 MB proto for a 10 MB operator)."""
    return {"coefs": bp.coefs, "Tb": bp.faces.Tb, "Dinv": bp.Dinv,
            "JH": bp.JH, "fd": bp.fd, "coefs_flat": bp.coefs_flat}


def bp_with(bp: "BlockedHybrid", arrs) -> "BlockedHybrid":
    """Rebuild a BlockedHybrid around the (traced) array dict from
    :func:`bp_arrays`; static metadata is taken from ``bp``."""
    return bp._replace(coefs=arrs["coefs"], Dinv=arrs["Dinv"],
                       JH=arrs["JH"],
                       faces=bp.faces._replace(Tb=arrs["Tb"]),
                       fd=arrs["fd"],
                       coefs_flat=arrs.get("coefs_flat"))


def _auto_echunk(E, nplanes, Nsp, Nrp, itemsize, shared):
    """lax.map chunk size for the flat apply ('auto' policy).

    Bound the STAGED chunk (XLA materializes each lax.map body's
    coefficient slice in scratch memory — the r4 HLO reads show it in
    memory space 1): at the flagship shape 8 blocks = 80 MB and fits;
    at N=272 8 blocks = 317 MB and the program faults the device
    (scoped-memory overflow).  Scale the chunk so the staged slice
    stays ~<= 96 MB, capped at the measured-optimal 8."""
    if E >= 16 and not shared and jax.default_backend() not in ("cpu",):
        bpb = nplanes * Nsp * Nrp * itemsize
        return max(1, min(8, int(96e6 // max(bpb, 1))))
    return None


def _pad_flat_chunks(coefs_flat, E, echunk):
    """Zero-pad the flat stack's block axis to a chunk multiple (padding
    blocks cost <= one chunk of extra work, sliced off the result)."""
    pad = (-E) % echunk if echunk else 0
    if pad:
        coefs_flat = jax.jit(lambda c: jnp.concatenate(
            [c, jnp.zeros((pad,) + c.shape[1:], c.dtype)]))(coefs_flat)
    return coefs_flat


def with_flat_layout(bp: "BlockedHybrid", echunk="auto",
                     sym=False, drop_planes=False) -> "BlockedHybrid":
    """Attach the 1D raveled-diagonal coefficient layout (exact; see
    stencil.flatten_dia).  The flat stack avoids the (8, 128) tile
    padding of the 2D planes — at the flagship 137x137 block shape the
    lane dim pads 137 -> 256, ~1.9x wasted coefficient traffic
    (measured: 3813 -> 1668 us/apply on v5e, 2.3x).  The plane stack
    is kept (sharded paths and diag consumers read it); applies route
    through the flat stack via ``stencil='flat'`` or 'auto'.

    ``echunk``: apply the flat stencil in a ``lax.map`` over chunks of
    this many blocks.  At large batch XLA re-reads the shifted field
    once per offset; bounding the fused working set to ~8 blocks stops
    that (measured at the flagship shape: 1668 -> 1049 us, total 3.6x
    over the plane layout — 83% of the measured-bandwidth roofline).
    'auto' = 8 for per-block stacks with E >= 16 on TPU, else off;
    the stack is zero-padded to a chunk multiple (padding blocks cost
    <= one chunk of extra work and are sliced off the result).

    ``sym``: store only the o >= 0 linear diagonals and let the apply
    supply the o < 0 side from operator symmetry
    (stencil.flatten_dia_sym) — HALVES the coefficient stream at
    identical VPU cost.

    ``drop_planes``: release the 2D plane stack (``coefs=None``) once
    the flat stack exists — the flat-ONLY memory mode.  At
    128-unaligned shapes the padded planes are ~1.5x the flat stack
    (N=272: 3.2 GB vs 2.2 GB), and with fastdiag present no default
    code path reads them; the 'compact'/'unrolled' stencils and
    with_coef_dtype become unavailable on the result."""
    from .stencil import flatten_dia, flatten_dia_sym

    Nsp, Nrp = bp.grid_shape
    E = bp.coefs.shape[0]
    if echunk == "auto":
        echunk = _auto_echunk(E, len(bp.offsets), Nsp, Nrp,
                              jnp.dtype(bp.coefs.dtype).itemsize,
                              bp.shared)
    if bp.shared:
        # a shared stack has a broadcast block axis of extent 1 —
        # chunking it would zero-pad the broadcast (and the shared
        # apply's coefficient traffic already amortizes E-fold)
        echunk = None
    flatten = flatten_dia_sym if sym else flatten_dia
    all_offs = sorted({ds * Nrp + dr for ds, dr in bp.offsets})
    coefs_flat = jax.jit(
        lambda c: flatten(c, bp.offsets, Nrp)[0])(bp.coefs)
    offs = tuple(o for o in all_offs if o >= 0) if sym else tuple(all_offs)
    coefs_flat = _pad_flat_chunks(coefs_flat, E, echunk)
    bp = bp._replace(coefs_flat=coefs_flat, offsets_flat=offs,
                      flat_chunk=echunk or None, flat_sym=bool(sym))
    if drop_planes:
        assert bp.fd is not None, \
            "drop_planes needs fastdiag (the Jacobi fallback reads coefs)"
        bp = bp._replace(coefs=None)
    return bp


def _face_layer_sets(p, Nr, Ns):
    nBS = len(vd2_tables(p)[1])
    return (tuple(range(nBS)),                       # west: r-layers
            tuple(range(Nr - nBS + 1, Nr + 1)),      # east
            tuple(range(nBS)),                       # south: s-layers
            tuple(range(Ns - nBS + 1, Ns + 1)))      # north


_ASSEMBLY_DATA_CACHE = {}


def assemble_flat_chunked(data, crr, css, crs, masks, *, dtype, Nrp,
                          chunk=8, E_pad=None, sym=False, verbose=False):
    """Chunked on-device assemble + flatten: assemble ``chunk`` blocks'
    padded DIA planes at a time and immediately flatten them to the 1D
    raveled-diagonal layout, so the full padded plane stack never
    materializes (at p=6 N=272 in f64 that transient is ~6.4 GB on top
    of the 4.4 GB flat stack, vs < 1 GB per 8-block chunk).

    Chunks are written into ONE preallocated stack with donated
    ``dynamic_update_slice`` calls — peak memory is the final stack +
    one chunk.  (The first r5 implementation collected pieces and
    concatenated: at N=272 f64 that is 4.4 GB of pieces + a 4.4 GB
    result + another copy in the chunk-padding concat, and the refine
    run OOMed on chip with the f32 operator resident.)

    ``E_pad``: preallocate this many block rows (>= E; extra rows stay
    zero) — lets callers fold the lax.map echunk padding in for free.

    ``sym=True`` flattens each chunk to the SYMMETRIC layout
    (:func:`stencil.flatten_dia_sym`, only o >= 0 linear diagonals) —
    halves the stack's memory AND the apply's coefficient stream, the
    capacity mode that lets the f64 residual operator of the refined
    solve coexist with the f32 operator at sizes where both full
    stacks would exceed HBM (p=6 N=384: 8.8 GB f64 full vs 4.4 sym).

    Returns ``(coefs_flat, offsets_flat)`` — the inputs to a flat-only
    :class:`BlockedHybrid` (shared by :func:`build_blocked`'s
    ``assemble_chunk`` path and the device-problem-cache loaders, which
    re-assemble operators from cached metric planes without a host
    problem object)."""
    from .assemble_device import assemble_planes
    from .stencil import flatten_dia, flatten_dia_sym

    all_offs = tuple(data.offsets)
    flatten = flatten_dia_sym if sym else flatten_dia
    offs_flat = tuple(sorted({ds * Nrp + dr for ds, dr in all_offs}))
    if sym:
        offs_flat = tuple(o for o in offs_flat if o >= 0)
    chunk_fn = jax.jit(lambda a, b, c, m: flatten(
        jax.vmap(lambda x, y, z, w: assemble_planes(
            data, x, y, z, w))(a, b, c, m),
        all_offs, Nrp)[0])
    E = crr.shape[0]
    E_out = int(E_pad) if E_pad else E
    assert E_out >= E
    Nvol = int(np.prod(crr.shape[1:]))
    flat = jnp.zeros((E_out, len(offs_flat), Nvol), dtype=dtype)
    write = jax.jit(
        lambda full, piece, e0: jax.lax.dynamic_update_slice(
            full, piece, (e0, 0, 0)),
        donate_argnums=0)
    for e0 in range(0, E, int(chunk)):
        sl = slice(e0, min(e0 + int(chunk), E))
        piece = chunk_fn(jnp.asarray(crr[sl], dtype=dtype),
                         jnp.asarray(css[sl], dtype=dtype),
                         jnp.asarray(crs[sl], dtype=dtype),
                         jnp.asarray(masks[sl], dtype=dtype))
        flat = write(flat, piece, e0)
        flat.block_until_ready()   # bound the in-flight work
        if verbose:
            from ..utils.profiling import device_mem_gb
            gb, _src = device_mem_gb()
            print(f"    assemble chunk e0={e0}: live "
                  f"{gb if gb is None else round(gb, 2)} GB", flush=True)
    return flat, offs_flat


def build_blocked(prob, dtype=jnp.float64, with_fastdiag=True,
                  L=None, share_ops="auto",
                  coef_dtype=None, assemble_on_device=False,
                  flat="auto", flat_sym=False,
                  assemble_chunk=None, defer_assembly=False) -> BlockedHybrid:
    """Extract the device-form problem from a host HybridProblem.

    Requires a uniform block shape (rectangular Nr != Ns allowed);
    mixed-shape meshes go through :mod:`hybridsbp_tpu.tpu.bucketed`,
    which calls this once per shape bucket with a common trace extent
    ``L`` (default: this shape's own max(Nrp, Nsp)).

    ``share_ops``: 'auto' detects (by exact equality) that every block
    carries the same operator and stores one coefficient stack
    (broadcast block axis, ``shared=True`` — the 2.3x
    ``dia_apply_shared`` fast path); ``True`` asserts it; ``False``
    always stores per-block stacks.

    ``coef_dtype``: optional narrower storage dtype for the DIA planes
    only (e.g. ``jnp.bfloat16`` — halves the dominant HBM stream of
    the matvec; fields/face tensors/fastdiag stay in ``dtype``).  See
    :class:`BlockedHybrid`.

    ``flat``: also store the 1D raveled-diagonal coefficient layout
    (see :func:`with_flat_layout` — measured 2.3x apply at the
    flagship 137x137 shape).  'auto' enables it on TPU backends when
    the (8, 128) tile padding of the block shape wastes > 10%
    traffic; True forces, False disables; 'sym' forces the SYMMETRIC
    flat layout (only o >= 0 diagonals stored — halves the coefficient
    stream; see :func:`stencil.flatten_dia_sym`).  ``flat_sym=True``
    also forces the symmetric flat layout on (an explicit request
    overrides the auto shape gate, which only weighs tile padding).

    ``assemble_chunk``: with ``assemble_on_device``, assemble + flatten
    this many blocks at a time and store ONLY the flat stack
    (``coefs=None`` — the flat-only memory mode of
    ``with_flat_layout(drop_planes=True)``).  The full padded plane
    stack is never materialized: at p=6 N=272 in f64 that transient is
    ~6.4 GB on top of the 4.4 GB flat stack, vs < 1 GB per 8-block
    chunk.  This is how the f64 residual operator for
    :func:`hybridsbp_tpu.tpu.refine.make_refined_solver` fits at
    beyond-reference problem sizes.

    ``defer_assembly``: with ``assemble_on_device``, skip the
    coefficient assembly entirely and return the operator TEMPLATE
    (``coefs=None`` — face tensors, fastdiag, Dinv, static metadata).
    For device-problem caches (VERDICT r4 next #2): the template plus
    the ~L² metric planes is all a later process needs to re-assemble
    the operator on-device (:func:`assemble_flat_chunked`), so the
    cache builder never pays (or stores) a coefficient stack.
    """
    from .fastdiag import FastDiag, build_fastdiag
    from .stencil import to_dia

    assert not defer_assembly or assemble_on_device, \
        "defer_assembly is an assemble_on_device template mode"
    dtype = jax.dtypes.canonicalize_dtype(dtype)  # f64 -> f32 when x64 off

    lops = prob.lops
    E = len(lops)
    l0 = lops[0]
    p, Nr, Ns = l0.p, l0.Nr, l0.Ns
    Nrp, Nsp = Nr + 1, Ns + 1
    assert all(lops[e].Nr == Nr and lops[e].Ns == Ns for e in range(E)), \
        "uniform block shape required per batch; mixed-shape meshes go " \
        "through tpu.bucketed.build_bucketed (shape bucketing)"
    # face-trace extent: west/east faces carry Nsp points, south/north
    # Nrp; the padded layout uses the max (rectangular blocks OK)
    if L is None:
        L = max(Nrp, Nsp)
    assert L >= max(Nrp, Nsp)
    Lf_lf = (Nsp, Nsp, Nrp, Nrp)          # true trace length per local face

    if assemble_on_device:
        # --- on-device assembly from the metric planes (VERDICT r2
        # next #3): ships 3 metric planes per block (~13 MB at the
        # reference's finest level) instead of the full DIA stack
        # (~560 MB) and assembles with einsums on the accelerator.
        # Bit-parity with the host path is gated in
        # tests/test_assemble_device.py.
        from .assemble_device import assemble_planes, extract_assembly_data

        tss = {float(getattr(lops[e], "tau_scale", 2.0)) for e in range(E)}
        assert len(tss) == 1, \
            f"assemble_on_device needs a uniform tau_scale, got {tss}"
        ts = tss.pop()
        key = (p, Nr, Ns, ts)
        if key not in _ASSEMBLY_DATA_CACHE:
            _ASSEMBLY_DATA_CACHE[key] = extract_assembly_data(
                p, Nr, Ns, tau_scale=ts)
        data = _ASSEMBLY_DATA_CACHE[key]
        all_offs = list(data.offsets)
        noff = len(all_offs)
        crr = np.stack([np.asarray(lops[e].metrics.crr) for e in range(E)])
        css = np.stack([np.asarray(lops[e].metrics.css) for e in range(E)])
        crs = np.stack([np.asarray(lops[e].metrics.crs) for e in range(E)])
        from .. import BC_NEUMANN as _BCN
        masks = np.array([[1.0 if b == _BCN else 0.0
                           for b in lops[e].bctype] for e in range(E)])
        # shared-operator detection on the host INPUTS (identical
        # metrics + bc => identical operator; avoids a device fetch)
        shared = False
        same_inputs = E > 1 and all(
            np.array_equal(crr[0], crr[e]) and np.array_equal(css[0], css[e])
            and np.array_equal(crs[0], crs[e])
            and np.array_equal(masks[0], masks[e]) for e in range(1, E))
        if share_ops == "auto":
            shared = same_inputs
        elif share_ops:
            assert same_inputs, \
                "share_ops=True requires identical block operators"
            shared = True
        if shared:
            crr, css, crs, masks = (a[:1] for a in (crr, css, crs, masks))
        chunk_flat = None
        if defer_assembly:
            coefs = None
            flat = False
        elif assemble_chunk and not shared:
            # chunked assemble + flatten: each jitted call assembles
            # `assemble_chunk` blocks' padded planes (the only plane
            # transient) and immediately flattens them; the full plane
            # stack never exists on device
            assert flat is not False, \
                "assemble_chunk stores only the flat layout (flat-only)"
            chunk_sym = bool(flat_sym) or flat == "sym"
            chunk_echunk = _auto_echunk(E, noff, Nsp, Nrp,
                                        jnp.dtype(dtype).itemsize,
                                        shared)
            chunk_flat, _ = assemble_flat_chunked(
                data, crr, css, crs, masks, dtype=dtype, Nrp=Nrp,
                chunk=int(assemble_chunk), sym=chunk_sym,
                E_pad=E + ((-E) % chunk_echunk if chunk_echunk else 0))
            coefs = None
        else:
            assemble = jax.jit(jax.vmap(
                lambda a, b, c, m: assemble_planes(data, a, b, c, m)))
            coefs = assemble(jnp.asarray(crr, dtype=dtype),
                             jnp.asarray(css, dtype=dtype),
                             jnp.asarray(crs, dtype=dtype),
                             jnp.asarray(masks, dtype=dtype))
    else:
        # --- stacked DIA operators (union of offsets across blocks)
        chunk_flat = None
        dias = [to_dia(lops[e].M, Nrp, Nsp, dtype=dtype) for e in range(E)]
        all_offs = sorted({o for d in dias for o in d.offsets})
        noff = len(all_offs)
        coefs = np.zeros((E, noff, Nsp, Nrp))
        for e, d in enumerate(dias):
            idx = {o: k for k, o in enumerate(all_offs)}
            for k, o in enumerate(d.offsets):
                coefs[e, idx[o]] = np.asarray(d.coefs[k])

        shared = False
        if share_ops == "auto":
            shared = E > 1 and all(np.array_equal(coefs[0], coefs[e])
                                   for e in range(1, E))
        elif share_ops:
            assert all(np.array_equal(coefs[0], coefs[e])
                       for e in range(1, E)), \
                "share_ops=True requires identical block operators"
            shared = True
        if shared:
            coefs = coefs[:1]

    # --- banded layer-restricted face maps (see FaceOps)
    layer_sets = _face_layer_sets(p, Nr, Ns)
    Tb = []
    offs_all = []
    for lf in range(4):
        layers = layer_sets[lf]
        lay_pos = {v: i for i, v in enumerate(layers)}
        A = Nsp if lf < 2 else Nrp
        coo = []
        for e in range(E):
            F = lops[e].F[lf].tocoo()
            jj, ii = F.row // Nrp, F.row % Nrp
            if lf < 2:
                lidx = np.array([lay_pos[i] for i in ii], dtype=np.int64)
                along = jj
            else:
                lidx = np.array([lay_pos[j] for j in jj], dtype=np.int64)
                along = ii
            coo.append((lidx, along, F.col, F.data))
        offs = sorted({int(o) for (_, along, col, _) in coo
                       for o in np.unique(along - col)})
        if not offs:
            offs = [0]
        off_pos = {o: b for b, o in enumerate(offs)}
        Te = np.zeros((E, len(layers), len(offs), A))
        for e, (lidx, along, col, data) in enumerate(coo):
            bidx = np.array([off_pos[int(o)] for o in along - col],
                            dtype=np.int64)
            np.add.at(Te[e], (lidx, bidx, along), data)
        Tb.append(jnp.asarray(Te, dtype=dtype))
        offs_all.append(tuple(offs))

    # --- interior-face trace diagonal
    nfaces = len(prob.FToB)
    interior = np.array([
        b == BC_LOCKED_INTERFACE or b >= BC_JUMP_INTERFACE
        for b in prob.FToB])
    Dinv = np.zeros((nfaces, L))
    for f in range(nfaces):
        if interior[f]:
            s0, s1 = prob.FToLstarts[f], prob.FToLstarts[f + 1]
            Dinv[f, :s1 - s0] = 1.0 / prob.D[s0:s1]

    # --- connectivity metadata (static): flip[lf, e] marks faces whose
    # element ordering is reversed w.r.t. the global face ordering
    flip = ~np.asarray(prob.EToO, dtype=bool)

    # --- static reversal permutations for the L-padded trace layout
    perm_lf = np.tile(np.arange(L), (4, 1))
    for lf in range(4):
        Lf = Lf_lf[lf]
        perm_lf[lf, :Lf] = np.arange(Lf - 1, -1, -1)
    perm_face = np.tile(np.arange(L), (nfaces, 1))
    FToLF_arr = np.asarray(prob.FToLF)
    FToE_arr = np.asarray(prob.FToE)
    for f in range(nfaces):
        # reversal applies to the plus-side trace; its length is the
        # plus-side local face's extent (== minus side's by conformity)
        lfp = int(FToLF_arr[1, f]) if FToE_arr[1, f] >= 0 \
            else int(FToLF_arr[0, f])
        Lf = Lf_lf[lfp]
        perm_face[f, :Lf] = np.arange(Lf - 1, -1, -1)

    JH = np.stack([np.asarray(lops[e].JH).reshape(Nsp, Nrp)
                   for e in range(E)])

    fd = None
    if with_fastdiag:
        fds = [build_fastdiag(lops[e], dtype=dtype) for e in range(E)]
        fd = FastDiag(*(jnp.stack([getattr(f, name) for f in fds])
                        for name in FastDiag._fields))

    bp = BlockedHybrid(
        coefs=(None if coefs is None
               else jnp.asarray(coefs, dtype=coef_dtype or dtype)),
        offsets=tuple(all_offs),
        faces=FaceOps(Tb=tuple(Tb), offs=tuple(offs_all),
                      layers=layer_sets),
        Dinv=jnp.asarray(Dinv, dtype=dtype),
        FToE=FToE_arr, FToLF=FToLF_arr,
        EToF=np.asarray(prob.EToF),
        flip=flip, interior=interior, JH=jnp.asarray(JH, dtype=dtype),
        fd=fd, perm_lf=perm_lf, perm_face=perm_face, shared=shared)
    if chunk_flat is not None:
        # flat-only: attach the chunk-assembled flat stack directly
        # (already echunk-padded by assemble_flat_chunked's E_pad)
        offs_flat = tuple(sorted({ds * Nrp + dr for ds, dr in all_offs}))
        if chunk_sym:
            offs_flat = tuple(o for o in offs_flat if o >= 0)
        return bp._replace(
            coefs_flat=chunk_flat, offsets_flat=offs_flat,
            flat_chunk=chunk_echunk, flat_sym=chunk_sym)
    if flat == "auto":
        # an explicit flat_sym request forces the layout (the auto gate
        # only weighs tile-padding waste, not the symmetric halving)
        waste = (-(Nsp // -8) * 8) * (-(Nrp // -128) * 128) / (Nsp * Nrp)
        flat = flat_sym or (jax.default_backend() not in ("cpu",)
                            and waste > 1.10)
    if flat:
        bp = with_flat_layout(bp, sym=(flat == "sym") or flat_sym)
    return bp


def with_coef_dtype(bp: BlockedHybrid, dtype) -> BlockedHybrid:
    """Copy of ``bp`` with the DIA coefficient stack cast to ``dtype``
    (typically ``jnp.bfloat16``): the matvec upcasts on-chip, so only
    the HBM storage/traffic of the dominant coefficient stream changes.
    Everything else (face tensors, Dinv, JH, fastdiag) is untouched.
    A flat companion layout (if any) is cast alongside."""
    cf = None if bp.coefs_flat is None else bp.coefs_flat.astype(dtype)
    return bp._replace(coefs=bp.coefs.astype(dtype), coefs_flat=cf)


# ---------------------------------------------------------------------------
# matvec pieces
# ---------------------------------------------------------------------------
def _dia_apply_batched(bp: BlockedHybrid, u, stencil="auto"):
    """Local part: per-block DIA stencil apply. u: (E, Nsp, Nrp).

    ``stencil`` selects the kernel: 'auto' (the flat raveled-diagonal
    layout when the operator carries one — see
    :func:`with_flat_layout` — else the XLA fused plane form),
    'flat' (require the flat layout), 'flat_pallas' (the streaming
    Pallas form of the flat layout — strip-DMA'd coefficients +
    resident field, opt-in), 'pallas', 'unrolled' (force
    the XLA plane form), or 'compact' (scan-based apply with O(1)
    program size in the offset count — for programs near the
    remote-compile request-size limit, see stencil.dia_apply_compact)."""
    if stencil == "flat_pallas":
        from .pallas_stencil import dia_apply_flat_stream
        assert bp.coefs_flat is not None, \
            "stencil='flat_pallas' requires with_flat_layout(bp)"
        E = u.shape[0]
        cf = bp.coefs_flat
        if cf.shape[0] != 1:                 # per-block stack: drop any
            cf = cf[:E]                      # chunk-padding rows
        # a shared (extent-1) stack passes through as-is — the kernel
        # streams block 0 for every program (no E-fold HBM copy)
        return dia_apply_flat_stream(cf, bp.offsets_flat, u,
                                     sym=bp.flat_sym)
    if stencil == "flat" or (stencil == "auto" and bp.coefs_flat is not None):
        from .stencil import dia_apply_flat, dia_apply_flat_sym
        assert bp.coefs_flat is not None, \
            "stencil='flat' requires with_flat_layout(bp)"
        ap_one = dia_apply_flat_sym if bp.flat_sym else dia_apply_flat
        cf, K = bp.coefs_flat, bp.flat_chunk
        if not K:
            return ap_one(cf, bp.offsets_flat, u)
        # block-chunked: lax.map bounds the fused working set so XLA
        # stops re-reading the shifted field per offset at large E
        # (measured 1.6x on top of flat at the flagship shape)
        E, E_pad = u.shape[0], cf.shape[0]
        uf = u.reshape(E, -1)
        if E_pad != E:
            uf = jnp.concatenate(
                [uf, jnp.zeros((E_pad - E, uf.shape[1]), uf.dtype)])

        def chunk(cv):
            cc = cv[0]
            # narrow-dtype coefficients: upcast the WHOLE staged chunk
            # in one convert.  Left to XLA, the bf16 multiply chain
            # splits into per-plane slice+convert fusions (10 fusions,
            # 133 converts at the flagship shape) and realizes only
            # 1.26x of the halved stream; the explicit whole-chunk
            # convert restores the f32 path's single-fusion structure
            # (4 fusions, 1 convert) — measured 683.5 vs 752.1 us
            # (tools/bf16_hlo_probe.py, r4).  Exact: bf16->f32 convert
            # is value-preserving and the multiply was promoting anyway.
            if cc.dtype != cv[1].dtype:
                cc = cc.astype(cv[1].dtype)
            return ap_one(cc, bp.offsets_flat, cv[1])

        out = jax.lax.map(
            chunk,
            (cf.reshape(E_pad // K, K, *cf.shape[1:]),
             uf.reshape(E_pad // K, K, uf.shape[-1])))
        return out.reshape(E_pad, -1)[:E].reshape(u.shape)
    if stencil == "compact":
        from .stencil import DiaOperator, dia_apply_compact
        offs = bp.offsets
        if bp.shared:
            op = DiaOperator(coefs=bp.coefs[0], offsets=offs)
            return jax.vmap(lambda ue: dia_apply_compact(op, ue))(u)
        return jax.vmap(lambda c, ue: dia_apply_compact(
            DiaOperator(coefs=c, offsets=offs), ue))(bp.coefs, u)

    try:
        use_pallas = {"auto": None, "pallas": True, "unrolled": False}[stencil]
    except KeyError:
        raise ValueError(
            f"unknown stencil {stencil!r}: expected 'auto', 'flat', "
            "'flat_pallas', 'pallas', 'unrolled', or 'compact'") from None
    if bp.shared:
        from .pallas_stencil import dia_apply_shared
        return dia_apply_shared(bp.coefs[0], u, bp.offsets,
                                use_pallas=use_pallas)
    from .pallas_stencil import dia_apply_batched as _apply

    return _apply(bp.coefs, bp.offsets, u, use_pallas=use_pallas)


def banded_trace_1f(Tb_lf, offs_lf, sub,
                    precision=jax.lax.Precision.HIGHEST):
    """One face's trace from its gathered volume layers.

    Tb_lf: (E, nlay, nband, A); sub: (E, nlay, A) volume values on the
    face's layers; returns (E, A) with t[k] = sum_{l,b}
    Tb[l,b,k+off_b] * sub[l,k+off_b] (the banded form of F^T u).

    The nlay contraction defaults to Precision.HIGHEST: XLA:TPU
    pattern-matches the multiply + axis-reduce into a dot_general and
    lowers f32 operands to bf16 MXU passes — measured 1.3e-3 relative
    trace error (vs 5e-7 for the identical f32 code on CPU,
    tools/probe_banded_localize.py), which the B̃ = D − F M̃⁻¹ Fᵀ
    cancellation amplified to a 3e-2 block error in the device-probed
    trace preconditioner and which perturbs every coupled matvec's
    face values on the f32 solve path.  The contraction length is only
    nlay (≤ p/2+1), so there is no meaningful MXU saving to trade."""
    ps = jnp.einsum("elba,ela->eba", Tb_lf, sub,
                    precision=precision)                   # (E, nband, A)
    A = ps.shape[-1]
    P = max(max(abs(o) for o in offs_lf), 1)
    pad = jnp.pad(ps, ((0, 0), (0, 0), (P, P)))
    t = jnp.zeros(ps.shape[:1] + (A,), dtype=ps.dtype)
    for b, off in enumerate(offs_lf):
        t = t + jax.lax.slice(pad, (0, b, P + off),
                              (pad.shape[0], b + 1, P + off + A))[:, 0]
    return t


def banded_scatter_1f(Tb_lf, offs_lf, w,
                      precision=jax.lax.Precision.HIGHEST):
    """One face's adjoint: volume-layer values from a trace.

    w: (E, A) trace values; returns (E, nlay, A) with out[l,a] =
    sum_b Tb[l,b,a] * w[a-off_b] (the banded form of F w).
    ``precision`` defaults to HIGHEST for the same reason as
    :func:`banded_trace_1f`: the tiny nband contraction otherwise
    lowers f32 to bf16 MXU passes on TPU, perturbing the face-coupling
    term of every matvec at ~1e-3 — a pure accuracy loss with no
    meaningful MXU saving at nband ≤ 2p+1."""
    E, A = w.shape
    P = max(max(abs(o) for o in offs_lf), 1)
    padw = jnp.pad(w, ((0, 0), (P, P)))
    wst = jnp.stack([jax.lax.slice(padw, (0, P - off), (E, P - off + A))
                     for off in offs_lf], axis=1)          # (E, nband, A)
    return jnp.einsum("elba,eba->ela", Tb_lf, wst, precision=precision)


def dense_face_tensor(faces: FaceOps, lf: int, L: int):
    """Materialize one face's dense (E, nlay, A, L) tensor from the
    banded storage — only for consumers whose sharding needs the full
    along-face axis (the 2D block x space solver's west/east einsums);
    everything else applies the bands directly."""
    Tb = np.asarray(faces.Tb[lf])
    E, nlay, nband, A = Tb.shape
    T = np.zeros((E, nlay, A, L), dtype=Tb.dtype)
    for b, off in enumerate(faces.offs[lf]):
        a = np.arange(max(0, off), min(A, L + off))
        T[:, :, a, a - off] = Tb[:, :, b, a]
    return jnp.asarray(T)


def _gather_layers(u, layers, lf):
    lay = list(layers)
    return u[:, :, lay].transpose(0, 2, 1) if lf < 2 else u[:, lay, :]


def block_traces(bp: BlockedHybrid, u):
    """Per-block face traces t[e, lf, :] = F_e[lf]^T u_e (element-local
    face ordering).  u: (E, Nsp, Nrp) -> (E, 4, L) (zero-padded past
    each face's true extent)."""
    E = u.shape[0]
    L = bp.Dinv.shape[1]
    t = jnp.zeros((E, 4, L), dtype=u.dtype)
    for lf in range(4):
        sub = _gather_layers(u, bp.faces.layers[lf], lf)
        tl = banded_trace_1f(bp.faces.Tb[lf], bp.faces.offs[lf], sub)
        t = t.at[:, lf, :tl.shape[-1]].set(tl)
    return t


def face_scatter(bp: BlockedHybrid, w_faces, e_offset, E_local):
    """Adjoint: per-block volume contribution sum_lf F_e[lf] @ w(e,lf).

    w_faces: (nfaces, L) interior-face values (already D^{-1}-scaled and
    zero on boundary faces).  e_offset/E_local select the local block
    range (for the sharded path).  Returns (E_local, Nsp, Nrp).
    """
    Nsp, Nrp = bp.grid_shape
    EToF = bp.EToF[:, e_offset:e_offset + E_local]
    flip = bp.flip[:, e_offset:e_offset + E_local]
    out = jnp.zeros((E_local, Nsp, Nrp), dtype=w_faces.dtype)
    for lf in range(4):
        w = w_faces[EToF[lf], :]                           # (E_local, L)
        w = jnp.where(jnp.asarray(flip[lf])[:, None], bp._rev_lf(w, lf), w)
        Tb = bp.faces.Tb[lf][e_offset:e_offset + E_local]
        A = Tb.shape[-1]
        vals = banded_scatter_1f(Tb, bp.faces.offs[lf], w[:, :A])
        layers = list(bp.faces.layers[lf])
        if lf < 2:
            out = out.at[:, :, layers].add(vals.transpose(0, 2, 1))
        else:
            out = out.at[:, layers, :].add(vals)
    return out


def combine_traces(bp: BlockedHybrid, traces):
    """Global-face combination: (Fbar u)_f = t_minus + orient(t_plus),
    scaled by D^{-1}; zero on boundary faces.  traces: (E, 4, L) ->
    (nfaces, L)."""
    FToE, FToLF = bp.FToE, bp.FToLF
    nfaces = FToE.shape[1]
    em, fm = FToE[0], FToLF[0]
    ep, fp = FToE[1].copy(), FToLF[1].copy()
    has_plus = ep >= 0
    ep[~has_plus] = 0
    fp[~has_plus] = 0
    t_m = traces[em, fm]                                   # (nfaces, L)
    t_p = traces[ep, fp]
    pflip = bp.flip[fp, ep]                                # plus-side flips
    t_p = jnp.where(jnp.asarray(pflip)[:, None], bp._rev_face(t_p), t_p)
    t_p = jnp.where(jnp.asarray(has_plus)[:, None], t_p, 0.0)
    t = t_m + t_p
    mask = jnp.asarray(bp.interior)[:, None]
    return jnp.where(mask, t, 0.0) * bp.Dinv


def displacement_matvec(bp: BlockedHybrid, u, *, stencil="auto"):
    """C u = M u - Fbar' D^{-1} Fbar u  (single-process batched form)."""
    y = _dia_apply_batched(bp, u, stencil)
    w = combine_traces(bp, block_traces(bp, u))
    return y - face_scatter(bp, w, 0, u.shape[0])


def displacement_rhs(bp: BlockedHybrid, g, gdelta_faces):
    """RHS g - Fbar' D^{-1} g_delta, with g: (E, Nsp, Nrp) and
    gdelta_faces: (nfaces, L) (zero on boundary faces)."""
    w = gdelta_faces * bp.Dinv
    return g - face_scatter(bp, w, 0, g.shape[0])


def blocked_rhs_from_host(prob, g, gdelta):
    """Convert the host assembly's stacked (g, gdelta) vectors into the
    blocked-field layout: g -> (E, Nsp, Nrp), gdelta -> (nfaces, L)
    (zero-padded on boundary faces)."""
    E = len(prob.lops)
    Nrp = prob.lops[0].Nr + 1
    Nsp = prob.lops[0].Ns + 1
    gb = np.asarray(g).reshape(E, Nsp, Nrp)
    nfaces = len(prob.FToB)
    L = max(Nrp, Nsp)
    gd = np.zeros((nfaces, L))
    for f in range(nfaces):
        s0, s1 = prob.FToLstarts[f], prob.FToLstarts[f + 1]
        if s1 > s0:
            gd[f, :s1 - s0] = np.asarray(gdelta[s0:s1])
    return jnp.asarray(gb), jnp.asarray(gd)


class TraceInv(NamedTuple):
    """Compact dense inverse of the assembled trace Schur complement B,
    plus the index set mapping true λ DOFs into the face-padded
    (nfaces*L,) layout.  Kept compact (nλ², not (nfaces·L)²): the
    padded embedding is ~1.8x larger in memory/transfer for zero rows
    the matmul never needs."""
    Binv: jnp.ndarray            # (nlam, nlam)
    idx: jnp.ndarray             # (nlam,) flat positions in (nfaces*L,)


def build_woodbury(bp: BlockedHybrid, prob, dtype=None):
    """Two-level preconditioner data: the dense inverse of the assembled
    trace Schur complement B as a :class:`TraceInv`.

    Exact identity (Woodbury on C = M - Fbar' D^{-1} Fbar):

        C^{-1} = M^{-1} + M^{-1} Fbar' B^{-1} Fbar M^{-1},
        B = D - Fbar M^{-1} Fbar'.

    Replacing M^{-1} by the fastdiag block solve gives an SPD two-level
    preconditioner whose quality is limited only by the fastdiag error —
    iteration counts become block-count-independent.  B is small
    (interior faces x (N+1)); its dense inverse applies as one MXU
    matmul.
    """
    return trace_inv_from_B((bp.Dinv.shape), prob,
                            dtype or _bp_dtype(bp))


def trace_inv_from_B(dinv_shape, prob, dtype) -> TraceInv:
    """Core of :func:`build_woodbury`: invert the host-assembled B and
    index it into the (nfaces, L) face-padded layout given by
    ``dinv_shape`` (shared with the bucketed mixed-shape path)."""
    nfaces, L = dinv_shape
    Binv = np.linalg.inv(prob.B.toarray())
    idx = []
    for f in range(nfaces):
        s0, s1 = prob.FToLstarts[f], prob.FToLstarts[f + 1]
        idx.extend(range(f * L, f * L + (s1 - s0)))
    idx = np.asarray(idx, dtype=np.int64)
    return TraceInv(Binv=jnp.asarray(Binv, dtype=dtype),
                    idx=jnp.asarray(idx))


class TraceBanded(NamedTuple):
    """Banded face-block form of the trace Schur complement B: face f
    couples only to faces sharing one of its two elements (≤ 7 incl.
    itself on quad meshes), so B is block-sparse with (L, L) blocks on
    a bounded-degree face graph.  B^{-1} applies as ``iters`` steps of
    block-Jacobi-preconditioned CG (fixed-length fori_loop — a
    *variable* preconditioner, so the outer iteration must be
    flexible; every Woodbury/trace outer in this package already is).

    Memory/transfer is O(nif · K · L²) — at the reference's finest
    level ~50 MB vs the ~700 MB dense nλ² inverse — and setup does no
    dense nλ³ inversion (only nif L³ diagonal-block factorizations).
    Replaces the host ``inv(B.toarray())`` scaling wall (VERDICT r2
    next #3); the reference's own assembly walks the same face-pair
    block structure (global_curved.jl:743-797).
    """
    blocks: jnp.ndarray          # (nif, K, L, L) neighbor blocks of B
    diag_inv: jnp.ndarray        # (nif, L, L) inverted diagonal blocks
    nbr: np.ndarray              # static (nif, K) compact neighbor ids
    faceids: np.ndarray          # static (nif,) global face id per row
    mask: np.ndarray             # static (nif, L) valid-entry mask
    iters: int                   # static fixed CG count for B^{-1}


def traceinv_arrays(ti):
    """The device-resident arrays of a trace preconditioner, as a dict
    suitable for jit ARGUMENTS (closure arrays lower to HLO literals;
    see :func:`make_jit_solver`).  Static metadata stays behind."""
    if isinstance(ti, TraceBanded):
        return {"blocks": ti.blocks, "diag_inv": ti.diag_inv}
    return {"Binv": ti.Binv}


def traceinv_with(ti, arrs):
    """Rebuild ``ti`` with the traced arrays from :func:`traceinv_arrays`."""
    return ti._replace(**arrs)


def _banded_matvec(tb: "TraceBanded", t):
    """B t on the compact (nif, L) layout via gathered block matmuls."""
    tn = t[jnp.asarray(tb.nbr)]                       # (nif, K, L)
    return jnp.einsum("akij,akj->ai", tb.blocks, tn,
                      preferred_element_type=t.dtype)


def apply_traceinv(Binv_pad, t):
    """Apply B^{-1} to a face-padded (nfaces, L) tensor.  Accepts a
    :class:`TraceInv` (compact gather → matmul → scatter), a
    :class:`TraceBanded` (fixed-iteration block-Jacobi CG on the
    banded B — inexact: use a flexible outer), or a legacy dense
    (nfaces*L, nfaces*L) embedded matrix."""
    if isinstance(Binv_pad, TraceBanded):
        from .cg import cg_fixed
        tb = Binv_pad
        mask = jnp.asarray(tb.mask, dtype=t.dtype)
        tc = t[jnp.asarray(tb.faceids)].astype(tb.diag_inv.dtype) * mask
        jac = lambda r: jnp.einsum("aij,aj->ai", tb.diag_inv, r,
                                   preferred_element_type=r.dtype)
        yc = cg_fixed(lambda v: _banded_matvec(tb, v), tc, tb.iters,
                      precond=jac) * mask
        y = jnp.zeros(t.shape, dtype=t.dtype)
        y = y.at[jnp.asarray(tb.faceids)].set(yc.astype(t.dtype))
        return y
    if isinstance(Binv_pad, TraceInv):
        tc = t.reshape(-1)[Binv_pad.idx].astype(Binv_pad.Binv.dtype)
        yc = (Binv_pad.Binv @ tc).astype(t.dtype)
        y = jnp.zeros(t.size, dtype=t.dtype).at[Binv_pad.idx].set(yc)
        return y.reshape(t.shape)
    return (Binv_pad @ t.reshape(-1)).reshape(t.shape)


def build_woodbury_banded(bp: BlockedHybrid, prob, dtype=None,
                          iters=32) -> TraceBanded:
    """Banded-B alternative to :func:`build_woodbury`: extract the
    face-pair (L, L) blocks of the host-assembled sparse B into a
    bounded-degree neighbor tensor and invert only the diagonal
    blocks.  No dense nλ² matrix is ever formed (host or device).

    ``iters``: fixed block-Jacobi-CG count used per B^{-1} application
    (the preconditioner becomes variable — pair with flexible outers,
    which every caller in this package already uses).
    """
    return banded_from_B(bp.Dinv.shape, prob, dtype or _bp_dtype(bp),
                         iters)


def _trace_face_graph(FToLstarts, FToB, EToF, nfaces_pad, L):
    """Static face-coupling graph of the trace Schur complement B: two
    interior faces couple iff they share an element.  Returns
    (faceids, comp, nbr, K, mask, lens, slot) — ``slot[(a, b)]`` is
    the compact neighbor-slot index of face-row b in face-row a's
    ``nbr`` row (shared by the host and on-device banded builders)."""
    lens = np.diff(np.asarray(FToLstarts))
    faceids = np.nonzero(lens > 0)[0]
    nif = len(faceids)
    comp = -np.ones(len(FToB), dtype=np.int64)
    comp[faceids] = np.arange(nif)
    assert faceids.max(initial=-1) < nfaces_pad
    nbrs = [set() for _ in range(nif)]
    EToF = np.asarray(EToF)
    for e in range(EToF.shape[1]):
        fs = [comp[EToF[lf, e]] for lf in range(4)
              if comp[EToF[lf, e]] >= 0]
        for a in fs:
            nbrs[a].update(fs)
    K = max((len(s) for s in nbrs), default=1)
    nbr = np.zeros((nif, K), dtype=np.int64)
    slot = {}
    for a in range(nif):
        for kk, b in enumerate(sorted(nbrs[a])):
            nbr[a, kk] = b
            slot[(a, b)] = kk
    mask = np.zeros((nif, L), dtype=bool)
    for a, f in enumerate(faceids):
        mask[a, :lens[f]] = True
    return faceids, comp, nbr, K, mask, lens, slot


def banded_from_B(dinv_shape, prob, dtype, iters=32) -> TraceBanded:
    """Core of :func:`build_woodbury_banded`, parameterized by the
    face-padded trace layout (shared with the bucketed mixed-shape
    path, cf. :func:`trace_inv_from_B`)."""
    import scipy.sparse as sp

    nfaces_pad, L = dinv_shape
    FToLstarts = np.asarray(prob.FToLstarts)
    faceids, comp, nbr, K, mask, lens, slot = _trace_face_graph(
        FToLstarts, prob.FToB, prob.EToF, nfaces_pad, L)
    nif = len(faceids)

    rows = [[] for _ in range(nif)]      # true neighbors per face row
    for (a, bcomp), kk in slot.items():
        rows[a].append((kk, bcomp))

    B = sp.csr_matrix(prob.B)
    blocks = np.zeros((nif, K, L, L))
    diag_inv = np.zeros((nif, L, L))
    for a, f in enumerate(faceids):
        r0, r1 = FToLstarts[f], FToLstarts[f + 1]
        la = r1 - r0
        for kk, bcomp in rows[a]:
            g = faceids[bcomp]
            c0, c1 = FToLstarts[g], FToLstarts[g + 1]
            blocks[a, kk, :la, :c1 - c0] = B[r0:r1, c0:c1].toarray()
        dblk = np.eye(L)                 # identity tail: padded entries
        dblk[:la, :la] = B[r0:r1, r0:r1].toarray()   # stay decoupled
        diag_inv[a] = np.linalg.inv(dblk)
    return TraceBanded(blocks=jnp.asarray(blocks, dtype=dtype),
                       diag_inv=jnp.asarray(diag_inv, dtype=dtype),
                       nbr=nbr, faceids=faceids, mask=mask, iters=iters)


def banded_from_device(bp: BlockedHybrid, prob, dtype=None, iters=32,
                       probe_iters=24, k_chunk=8,
                       stencil="auto") -> TraceBanded:
    """Assemble the banded face-block trace preconditioner ON the
    device — no host B, no factorizations (VERDICT r3 next #2).

    Probes B̃ = D − Fbar M̃⁻¹ Fbarᵀ column-block-wise with face-basis
    vectors: for each trace index k (a ``lax.map`` over k-chunks) and
    each local face lf₂, scatter the basis into the volume
    (``banded_scatter_1f``), run ``probe_iters`` of batched
    fastdiag-preconditioned CG as M̃⁻¹ (every block probed
    simultaneously — M̃ is block-diagonal), and read all four face
    traces back (``block_traces``).  The per-element (lf₁, lf₂) probe
    tensor is then gathered into the global face-pair blocks with the
    plus-side orientation flips, entirely on-device (nothing bigger
    than the final O(nif·K·L²) block tensor is ever fetched).

    M̃⁻¹ is inexact, so B̃ is a *preconditioner*-grade trace matrix —
    exactly how :class:`TraceBanded` is consumed (fixed block-Jacobi
    CG under flexible outers).  ``prob`` supplies only static face
    metadata (FToLstarts/FToB/EToF) — a light problem without B or
    factors is fine (:func:`hybridsbp_tpu.hybrid.build_problem_light`),
    which unlocks problem sizes the host pipeline cannot reach (the
    reference stops at N=136, square_circle.jl:207-210).

    ``probe_iters=0`` probes with ONE exact fastdiag solve instead of
    CG (B̃ = trace Schur complement of the *separable* surrogate
    M_sep).  Measured NEGATIVE (tools/probe_banded_accuracy.py, CPU
    f32, N=17/34/68): the fastdiag fit error is amplified ~10× by the
    B = D − F M̃⁻¹ Fᵀ cancellation, giving rel block errors of 10-19
    and 200-iter outer stalls, while probe_iters=24 CG probing stays
    at ~3e-6 rel error / 3-iter outers at every tested N.  Kept only
    as a diagnostic mode; always probe with CG.
    """
    from .cg import cg_fixed
    from .fastdiag import fastdiag_apply

    dtype = dtype or _bp_dtype(bp)
    nfaces_pad, L = bp.Dinv.shape
    faceids, comp, nbr, K, mask, lens, slot = _trace_face_graph(
        prob.FToLstarts, prob.FToB, prob.EToF, nfaces_pad, L)
    nif = len(faceids)
    E = bp.nblocks
    Nsp, Nrp = bp.grid_shape
    EToF = np.asarray(bp.EToF)
    flip = np.asarray(bp.flip)
    assert bp.fd is not None, \
        "banded_from_device needs the fastdiag block preconditioner " \
        "(build_blocked(with_fastdiag=True))"

    # ---- static contribution lists: per element e, every ordered pair
    # of its interior local faces (lf1 rows, lf2 cols) adds
    # -R1 (F_lf1^T M^-1 F_lf2) R2^T to block (comp[f1], slot of comp[f2])
    ca, ckk, ce, cl1, cl2, ridx, cidx = [], [], [], [], [], [], []
    base = np.arange(L)
    for e in range(E):
        for lf1 in range(4):
            f = EToF[lf1, e]
            a = comp[f]
            if a < 0:
                continue
            for lf2 in range(4):
                g = EToF[lf2, e]
                b = comp[g]
                if b < 0:
                    continue
                ca.append(a)
                ckk.append(slot[(a, b)])
                ce.append(e)
                cl1.append(lf1)
                cl2.append(lf2)
                r = base.copy()
                if flip[lf1, e]:
                    r[:lens[f]] = lens[f] - 1 - base[:lens[f]]
                ridx.append(r)
                c = base.copy()
                if flip[lf2, e]:
                    c[:lens[g]] = lens[g] - 1 - base[:lens[g]]
                cidx.append(c)
    ca, ckk, ce = map(np.asarray, (ca, ckk, ce))
    cl1, cl2 = np.asarray(cl1), np.asarray(cl2)
    ridx, cidx = np.asarray(ridx), np.asarray(cidx)
    nc = len(ca)
    kk_self = np.array([slot[(a, a)] for a in range(nif)], dtype=np.int64)

    # ---- device probing (operator arrays as jit ARGUMENTS: closure
    # arrays serialize into the HLO as literals — HTTP 413 lesson)
    arrs = bp_arrays(bp)

    def _probe(arrs_, ks):
        bpl = bp_with(bp, arrs_)
        # HIGHEST: the probe's plain (non-flexible) inner CG stagnates
        # at the bf16-MXU nonlinearity floor under the TPU default f32
        # lowering, and the B = D - F M̃⁻¹ Fᵀ cancellation (~10x)
        # amplifies whatever the inner leaves behind — the same trap as
        # assemble_device's einsums, rediscovered here at N>=136.
        hp = jax.lax.Precision.HIGHEST
        fd_apply = lambda r: jax.vmap(
            lambda f, x: fastdiag_apply(f, x, precision=hp))(bpl.fd, r)

        def probe_k(k):
            vs = []
            for lf2 in range(4):
                Tb = bpl.faces.Tb[lf2]
                A = Tb.shape[-1]
                val = jnp.where(k < A, 1.0, 0.0).astype(dtype)
                w = jnp.zeros((E, A), dtype=dtype) \
                    .at[:, jnp.minimum(k, A - 1)].set(val)
                vals = banded_scatter_1f(Tb.astype(dtype),
                                         bpl.faces.offs[lf2], w,
                                         precision=hp)
                v = jnp.zeros((E, Nsp, Nrp), dtype=dtype)
                layers = list(bpl.faces.layers[lf2])
                if lf2 < 2:
                    v = v.at[:, :, layers].add(vals.transpose(0, 2, 1))
                else:
                    v = v.at[:, layers, :].add(vals)
                vs.append(v)
            v4 = jnp.stack(vs)                       # (4, E, Nsp, Nrp)
            if probe_iters == 0:
                z4 = jax.vmap(fd_apply)(v4)          # exact M_sep⁻¹
            else:
                z4 = jax.vmap(lambda b: cg_fixed(
                    lambda u: _dia_apply_batched(bpl, u, stencil), b,
                    probe_iters, precond=fd_apply))(v4)
            return jax.vmap(lambda z: block_traces(bpl, z))(z4)

        # (kb, 4lf2, E, 4lf1, L_row) -> (E, lf1, lf2, row, col)
        P = jax.lax.map(probe_k, ks, batch_size=k_chunk)
        return P.transpose(2, 3, 1, 4, 0)

    # bounded device calls: ONE lax.map over all L columns is a
    # multi-minute single execution at large N, which the tunneled
    # worker kills (UNAVAILABLE ~ the run_chunked lesson: keep device
    # launches modest).  Probe in host-level column batches and
    # concatenate on device.
    probe = jax.jit(_probe)
    cols = max(k_chunk * 4, 16)
    pieces = []
    for k0 in range(0, L, cols):
        ks = jnp.arange(k0, min(k0 + cols, L))
        pieces.append(probe(arrs, ks))
        pieces[-1].block_until_ready()
    Pm = (pieces[0] if len(pieces) == 1
          else jax.jit(lambda ps: jnp.concatenate(ps, axis=4))(pieces))

    def _assemble(Pm_, Dinv, ce_, cl1_, cl2_, ridx_, cidx_, ca_, ckk_,
                  faceids_, kk_self_, mask_):
        G = Pm_[ce_, cl1_, cl2_]                      # (nc, L, L)
        G = G[jnp.arange(nc)[:, None, None],
              ridx_[:, :, None], cidx_[:, None, :]]
        blocks = jnp.zeros((nif, K, L, L), dtype=dtype) \
            .at[ca_, ckk_].add(-G)
        dvals = jnp.where(Dinv[faceids_] > 0,
                          1.0 / jnp.where(Dinv[faceids_] > 0,
                                          Dinv[faceids_], 1.0),
                          0.0).astype(dtype)          # (nif, L)
        ll = jnp.arange(L)
        ii = jnp.arange(nif)
        blocks = blocks.at[ii[:, None], kk_self_[:, None],
                           ll[None, :], ll[None, :]].add(dvals)
        dblk = blocks[ii, kk_self_]
        # identity tail so padded entries stay decoupled (cf.
        # banded_from_B)
        dblk = dblk.at[:, ll, ll].add(1.0 - mask_.astype(dtype))
        diag_inv = jnp.linalg.inv(dblk)
        return blocks, diag_inv

    blocks, diag_inv = jax.jit(_assemble)(
        Pm, bp.Dinv, ce, cl1, cl2, ridx, cidx, ca, ckk,
        faceids, kk_self, mask)
    return TraceBanded(blocks=blocks, diag_inv=diag_inv, nbr=nbr,
                       faceids=faceids, mask=mask, iters=iters)


def _fbar_raw(bp: BlockedHybrid, u):
    """(Fbar u) in the face-padded layout (no D^{-1} scaling)."""
    t = combine_traces(bp, block_traces(bp, u))
    return t / jnp.where(bp.Dinv == 0, 1.0, bp.Dinv)


def make_woodbury_M(minv, fbar_fn, fbarT_fn, trace_inv, minv2=None):
    """Assemble the Woodbury application r -> M̃⁻¹r + M̃⁻¹Fbar'B⁻¹FbarM̃⁻¹r
    from its pieces (pytree-generic; shared by the batched and bucketed
    preconditioners).  ``minv2``: optional cheaper block solve for the
    trace-correction term (the second M̃⁻¹ multiplies a low-rank face
    correction, which can tolerate a shorter sweep than the primary
    z1 = M̃⁻¹r — tune with tools/tune_inner.py)."""
    minv2 = minv if minv2 is None else minv2

    def M(r):
        z1 = minv(r)
        y = apply_traceinv(trace_inv, fbar_fn(z1))
        z2 = minv2(fbarT_fn(y))
        return jax.tree_util.tree_map(lambda a, c: a + c, z1, z2)

    return M


def woodbury_precond(bp: BlockedHybrid, Binv_pad, inner_iters=0,
                     stencil="auto", block_precond=None,
                     inner_iters2=None):
    """SPD two-level preconditioner r -> FD r + FD Fbar' B^{-1} Fbar FD r.

    With ``inner_iters=k > 0`` the fastdiag block solve FD is upgraded
    to k iterations of fastdiag-preconditioned CG on the decoupled
    block operator M̃ — a much better M̃^{-1} on strongly curved blocks
    where the rank-1 separable fit is loose.  The preconditioner is
    then *variable* (CG is a nonlinear map at finite k): use it with a
    flexible outer iteration (``solve_displacements(...,
    flexible=True)``).

    ``block_precond``: override for the per-block preconditioner
    inside the inner sweep (e.g. a mesh-aware sharded fastdiag form —
    see parallel/sharded2d); default: fastdiag, else Jacobi.

    ``inner_iters2``: sweep length for the trace-correction term only
    (z2 = M̃⁻¹ Fbar' B⁻¹ ...); default: same as ``inner_iters``."""
    from .cg import cg_fixed
    from .fastdiag import fastdiag_apply

    if block_precond is not None:
        fd_apply = block_precond
    elif bp.fd is not None:
        fd_apply = lambda r: jax.vmap(fastdiag_apply)(bp.fd, r)
    else:
        diag = bp.coefs[:, bp.offsets.index((0, 0))]
        fd_apply = lambda r: r / diag

    def sweep(k):
        if not k:
            return fd_apply
        # fixed-length inner sweep (fori_loop): a tolerance-free CG as
        # a nested data-dependent while_loop explodes compile time
        return lambda r: cg_fixed(
            lambda u: _dia_apply_batched(bp, u, stencil), r, k,
            precond=fd_apply)

    minv = sweep(inner_iters)
    minv2 = (minv if inner_iters2 is None or inner_iters2 == inner_iters
             else sweep(inner_iters2))

    return make_woodbury_M(
        minv, lambda z: _fbar_raw(bp, z),
        lambda y: face_scatter(bp, y, 0, bp.nblocks), Binv_pad,
        minv2=minv2)


def recover_lambda(bp: BlockedHybrid, u, gdelta_faces):
    """Trace variables from a displacement solve:
    lambda_f = D^{-1}(g_delta - Fbar u) per interior face (square_circle's
    eliminated-method recovery), as a (nfaces, L) array."""
    fb = combine_traces(bp, block_traces(bp, u)) / jnp.where(
        bp.Dinv == 0, 1.0, bp.Dinv)          # un-scale to raw Fbar u
    lam = (gdelta_faces - fb) * bp.Dinv
    return jnp.where(jnp.asarray(bp.interior)[:, None], lam, 0.0)


def block_solve(bp: BlockedHybrid, y, *, tol=1e-10, maxiter=400,
                stencil="auto", x0=None):
    """Batched decoupled-block solve u = M̃^{-1} y (no face coupling):
    fastdiag-preconditioned CG on the block-diagonal operator.  The
    device replacement for the reference's per-block CHOLMOD backsolves
    (global_curved.jl:698); independent per block, hence shardable along
    the block axis with zero communication (only the CG dot products
    reduce globally)."""
    if bp.fd is not None:
        from .fastdiag import fastdiag_apply
        fd = bp.fd
        M = lambda r: jax.vmap(fastdiag_apply)(fd, r)
    else:
        diag = bp.coefs[:, bp.offsets.index((0, 0))]
        M = lambda r: r / diag
    return cg(lambda u: _dia_apply_batched(bp, u, stencil), y, x0,
              tol=tol, maxiter=maxiter, precond=M)


def trace_matvec(bp: BlockedHybrid, lam, minv):
    """B λ = D λ − Fbar M̃^{-1} Fbarᵀ λ in the face-padded (nfaces, L)
    layout, with ``minv`` the (possibly inexact) block solve.  The
    device form of the reference's assembled Schur matrix
    (global_curved.jl:743-797) applied matrix-free."""
    mask = bp.Dinv > 0
    D = jnp.where(mask, 1.0 / jnp.where(mask, bp.Dinv, 1.0), 0.0)
    u = minv(face_scatter(bp, lam, 0, bp.nblocks))
    return D * lam - _fbar_raw(bp, u)


def solve_trace(bp: BlockedHybrid, g, gdelta_faces, *, tol=1e-10,
                maxiter=500, inner_tol=1e-11, inner_maxiter=400,
                stencil="auto", Binv_pad=None, stall_iters=None,
                stall_factor=0.9):
    """Device-side hybrid trace (Schur) solve — the reference's *default*
    method (square_circle.jl:374-388) run TPU-native:

        B λ = gδ − Fbar M̃^{-1} g,   u = M̃^{-1}(g − Fbarᵀ λ),

    with flexible CG on B whose matvec performs one batched
    fastdiag-CG inner solve (``block_solve``) — no assembled matrices,
    no factorizations.  Outer FCG tolerates the inexact inner solves.

    Outer preconditioning: by default the readily available trace
    diagonal D (Jacobi); pass ``Binv_pad`` (the dense embedded B^{-1}
    from :func:`build_woodbury` — one host assembly at setup) to apply
    the exact trace inverse as one MXU matmul per iteration, which
    drops the outer count to O(1)–O(10) (limited only by inner-solve
    inexactness).

    g: (E, Nsp, Nrp); gdelta_faces: (nfaces, L) raw gδ (zero-padded).
    Returns (u, lam, outer CGResult).
    """
    E = bp.nblocks
    mask = bp.Dinv > 0
    minv = lambda y: block_solve(bp, y, tol=inner_tol,
                                 maxiter=inner_maxiter, stencil=stencil).x
    if Binv_pad is None:
        precond = lambda r: r * bp.Dinv
    else:
        precond = lambda r: apply_traceinv(Binv_pad, r)
    b = jnp.where(mask, gdelta_faces, 0.0) - _fbar_raw(bp, minv(g))
    res = cg(lambda lam: trace_matvec(bp, lam, minv), b,
             tol=tol, maxiter=maxiter, flexible=True, precond=precond,
             stall_iters=stall_iters, stall_factor=stall_factor)
    u = minv(g - face_scatter(bp, res.x, 0, E))
    return u, res.x, res


def make_jit_solver(bp: BlockedHybrid, *, method="displacements",
                    trace_inv=None, tol=1e-6, maxiter=200,
                    inner_iters=8, inner_iters2=None, stencil="auto",
                    precond_coef_dtype=None, trace_inner_tol=None,
                    stall_iters="auto", stall_factor=0.9):
    """One-compile serving solver: returns ``solve(g, gdelta_faces)``
    — a single jitted program for the whole hybrid solve.

    This is the supported way to run repeated solves on an
    accelerator: the operator arrays enter the program as jit
    arguments (see :func:`bp_arrays` — closure arrays lower to HLO
    literals duplicated per while-loop computation), and nothing
    outside the CG while_loop dispatches eagerly (each eager op costs
    a host-device round trip).

    ``method``: 'displacements' (CG on the eliminated SPD system;
    Woodbury two-level preconditioning when ``trace_inv`` is given,
    else fastdiag) or 'trace' (the reference's default Schur-on-the-
    trace method, square_circle.jl:374-388; requires ``trace_inv`` for
    the O(1)-iteration outer preconditioner, else Jacobi-D).
    ``trace_inv``: a :func:`build_woodbury` result.

    ``precond_coef_dtype``: optional narrower dtype (e.g.
    ``jnp.bfloat16``) for the coefficient stacks INSIDE the Woodbury
    preconditioner's inner sweeps only — the outer matvec (and hence
    any converged answer) stays exact.  MEASURED NEGATIVE at reference
    scale (RESULTS.md r3): at p=6 N=68 the bf16 ~3e-3 operator
    perturbation (which fine-level conditioning amplifies — the same
    sensitivity as the assembly-precision trap) stagnates the flexible
    outer (200 iters, no convergence) despite converging on small
    problems.  Left as an explicit opt-in for well-conditioned cases;
    do not enable by default.

    ``stall_iters``: outer-FCG stagnation guard (VERDICT r4 next #3).
    'auto' enables a 10-iteration window when ``trace_inv`` is present
    (healthy two-level-preconditioned outers converge in <= ~15
    iterations, so 10 windowed iterations with < 10% progress means the
    preconditioner is broken or ``tol`` sits below the attainable f32
    floor — bail in minutes instead of burning maxiter × 36 s at
    N=272); None/0 disables; an int sets the window.  The result's
    ``stalled`` flag distinguishes the bail from plain
    non-convergence."""
    if method not in ("displacements", "trace"):
        raise ValueError(f"unknown method {method!r}")
    if stall_iters == "auto":
        stall_iters = 10 if trace_inv is not None else None
    stall_iters = stall_iters or None
    arrs = bp_arrays(bp)
    if trace_inv is not None:
        arrs["Binv"] = traceinv_arrays(trace_inv)

    def solve_fn(a, g, gdelta_faces):
        bp2 = bp_with(bp, a)
        ti2 = (traceinv_with(trace_inv, a["Binv"])
               if trace_inv is not None else None)
        if method == "trace":
            # inner_tol default tol*0.2: measured on-chip (p=6 N=68,
            # tools/tune_inner.py --method trace --check-host) —
            # identical solution error to tol*0.05 at 10% less time;
            # inner_tol = tol costs 4.6x in solution error (inexact
            # inner solves perturb the reconstruction, TODO.md r2)
            u, lam, res = solve_trace(
                bp2, g, gdelta_faces, tol=tol, maxiter=maxiter,
                inner_tol=(tol * 0.2 if trace_inner_tol is None
                           else trace_inner_tol),
                inner_maxiter=200,
                stencil=stencil, Binv_pad=ti2,
                stall_iters=stall_iters, stall_factor=stall_factor)
            return res._replace(x=u)
        if ti2 is not None:
            bp_pre = bp2
            if precond_coef_dtype is not None:
                # narrower coefficient storage for the PRECONDITIONER's
                # inner matvecs only (the outer matvec stays exact):
                # the Woodbury apply is inexact by design (flexible
                # outer), and bf16 stacks cut its dominant HBM stream.
                # The casts are loop-invariant — XLA hoists them out of
                # the CG while_loop (one-time cast, cached in HBM).
                bp_pre = with_coef_dtype(bp2, precond_coef_dtype)
            precond = woodbury_precond(bp_pre, ti2,
                                       inner_iters=inner_iters,
                                       inner_iters2=inner_iters2,
                                       stencil=stencil)
            flexible = True
        else:
            precond, flexible = "auto", False
        return solve_displacements(bp2, g, gdelta_faces, tol=tol,
                                   maxiter=maxiter, precond=precond,
                                   flexible=flexible, stencil=stencil,
                                   stall_iters=stall_iters,
                                   stall_factor=stall_factor)

    solve_jit = jax.jit(solve_fn)

    def solve(g, gdelta_faces):
        return solve_jit(arrs, g, gdelta_faces)

    # exposed for chained (RTT-free) timing and for embedding the solve
    # in larger jitted programs: ``fn(arrs, g, gd)`` is the traced body,
    # ``arrs`` the operator arrays to pass as jit arguments
    solve.fn = solve_fn
    solve.arrs = arrs
    return solve


def solve_displacements(bp: BlockedHybrid, g, gdelta_faces, *, tol=1e-10,
                        maxiter=2000, precond="auto", stencil="auto",
                        flexible=False, stall_iters=None,
                        stall_factor=0.9):
    """CG on the eliminated SPD system (batched).

    ``precond``: 'auto' (fastdiag when available), 'fastdiag', 'jacobi',
    or a callable r -> P^{-1} r (e.g. :func:`woodbury_precond`).
    ``stencil``: kernel choice for the block matvec — 'auto', 'pallas',
    'unrolled', or 'compact' (see :func:`_dia_apply_batched`).
    ``flexible``: Polak–Ribière CG for variable preconditioners (e.g.
    Woodbury with inner CG).  ``stall_iters``: stagnation guard window
    (see :func:`hybridsbp_tpu.tpu.cg.cg`)."""
    M = _resolve_displacement_precond(bp, precond)
    b = displacement_rhs(bp, g, gdelta_faces)
    res = cg(lambda u: displacement_matvec(bp, u, stencil=stencil), b,
             tol=tol, maxiter=maxiter, precond=M, flexible=flexible,
             stall_iters=stall_iters, stall_factor=stall_factor)
    return res


def _resolve_displacement_precond(bp: BlockedHybrid, precond):
    """Shared precond resolution for the coupled-system solves."""
    if precond == "auto":
        precond = "fastdiag" if bp.fd is not None else "jacobi"
    if callable(precond):
        return precond
    if precond == "fastdiag":
        from .fastdiag import fastdiag_apply
        fd = bp.fd
        return lambda r: jax.vmap(fastdiag_apply)(fd, r)
    if precond == "jacobi":
        diag = None
        for k, (ds, dr) in enumerate(bp.offsets):
            if ds == 0 and dr == 0:
                diag = bp.coefs[:, k]
        return lambda r: r / diag
    raise ValueError(f"unknown precond {precond!r}")


def solve_displacements_implicit(bp: BlockedHybrid, g, gdelta_faces, *,
                                 tol=1e-10, maxiter=2000, precond="auto",
                                 stencil="auto", flexible=False,
                                 trace_inv=None, inner_iters=8):
    """Differentiable coupled solve: u = C^{-1} rhs(g, gδ) with implicit
    (adjoint) gradients.

    Same system as :func:`solve_displacements`, wrapped in
    ``lax.custom_linear_solve(symmetric=True)`` so reverse/forward-mode
    derivatives re-solve the (self-transposed, SPD) system instead of
    differentiating through the CG iteration — the adjoint-state method
    through the MULTIBLOCK hybrid solve.  Gradients flow to ``g`` /
    ``gdelta_faces`` (boundary/slip data — see
    :func:`..inverse.make_slip_inversion`) and, because the matvec
    closure is lifted by ``custom_linear_solve``, to the operator
    arrays as well.  Returns ``u`` only (no iteration stats — the
    residual is not part of the differentiable value).

    ``trace_inv``: a :func:`build_woodbury` result — switches to the
    Woodbury two-level preconditioner (``inner_iters`` block sweeps)
    with a flexible outer iteration, the O(1)-outer-iteration
    configuration that makes inversion loops cheap."""
    from .cg import cg_solve

    if trace_inv is not None:
        precond = woodbury_precond(bp, trace_inv, inner_iters=inner_iters,
                                   stencil=stencil)
        flexible = True
    M = _resolve_displacement_precond(bp, precond)
    b = displacement_rhs(bp, g, gdelta_faces)
    return cg_solve(lambda u: displacement_matvec(bp, u, stencil=stencil),
                    b, tol=tol, maxiter=maxiter, precond=M,
                    flexible=flexible)
