"""Localize the TPU-only B-tilde probe error to a pipeline stage.

State (probe_banded_tpu2): on TPU the probed blocks carry 2.97e-2 rel
error regardless of layout/data/iters, vs 3.5e-6 on CPU f32.  The probe
pipeline per column k is: scatter (pinned HIGHEST, exact) -> inner
cg_fixed(24, fastdiag-precond pinned HIGHEST) -> banded traces.  This
script replicates that pipeline for one column chunk and prints, per
stage, what only the platform can change:

  - TRUE inner residual ||M z - v|| / ||v|| after cg_fixed (f32): if
    ~1e-7 the inner solve is fine and the error is downstream; if
    ~3e-3 the inner CG stagnates on TPU only.
  - f64 probe of the same columns ON THE SAME PLATFORM: z4_32 vs
    z4_64 and traces_32 vs traces_64 rel errors — if f64 fixes it,
    a setup-time f64 probe is the cure.
  - apply-path split: stencil='auto' vs 'unrolled' (XLA) z4 diff.

Usage: python tools/probe_banded_localize.py          (TPU)
       HYBRIDSBP_PLATFORM=cpu python tools/probe_banded_localize.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "drivers"))

import numpy as np  # noqa: E402
import square_circle as sc  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hybridsbp_tpu.tpu import build_blocked  # noqa: E402
from hybridsbp_tpu.tpu.cg import cg_fixed  # noqa: E402
from hybridsbp_tpu.tpu.fastdiag import fastdiag_apply  # noqa: E402
from hybridsbp_tpu.tpu.multiblock import (  # noqa: E402
    _dia_apply_batched, banded_scatter_1f, block_traces, bp_arrays,
    bp_with)


def probe_chunk(bp, ks, dtype, probe_iters=24, stencil="auto"):
    """Replicates banded_from_device._probe's probe_k for columns ks,
    returning (v4, z4, traces) stacked over ks."""
    E = bp.nblocks
    Nsp, Nrp = bp.grid_shape
    hp = jax.lax.Precision.HIGHEST
    arrs = bp_arrays(bp)
    if dtype == jnp.float64:
        arrs = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float64)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, arrs)

    def _run(arrs_, ks_):
        bpl = bp_with(bp, arrs_)
        fd = bpl.fd
        if dtype == jnp.float64:
            fd = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.float64)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, fd)
        fd_apply = lambda r: jax.vmap(
            lambda f, x: fastdiag_apply(f, x, precision=hp))(fd, r)

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
            v4 = jnp.stack(vs)
            z4 = jax.vmap(lambda b: cg_fixed(
                lambda u: _dia_apply_batched(bpl, u, stencil), b,
                probe_iters, precond=fd_apply))(v4)
            # true residual per lf2: ||M z - v|| / ||v||
            Mz = jax.vmap(lambda z: _dia_apply_batched(bpl, z, stencil))(z4)
            rnum = jnp.sqrt(jnp.sum((Mz - v4) ** 2, axis=(1, 2, 3)))
            rden = jnp.sqrt(jnp.sum(v4 ** 2, axis=(1, 2, 3)))
            resid = rnum / jnp.where(rden == 0, 1.0, rden)
            tr = jax.vmap(lambda z: block_traces(bpl, z))(z4)
            return v4, z4, resid, tr

        return jax.lax.map(probe_k, ks_, batch_size=len(ks))

    out = jax.jit(_run)(arrs, ks)
    return jax.tree_util.tree_map(np.asarray, out)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 34
    p = 6
    plat = jax.devices()[0].platform
    print(f"platform={plat}, health={float(jnp.sum(jnp.ones(4)))}",
          flush=True)
    t0 = time.time()
    prob, g, gdelta, *_ = sc.assemble_level(p, N)
    print(f"host assembly p={p} N={N}: {time.time() - t0:.0f}s", flush=True)
    bp = build_blocked(prob, dtype=jnp.float32,
                       assemble_on_device=True, flat=False)
    ks = jnp.arange(0, 8)

    v32, z32, r32, t32 = probe_chunk(bp, ks, jnp.float32)
    print(f"f32 auto   : max true inner resid {r32.max():.3e}", flush=True)
    v64, z64, r64, t64 = probe_chunk(bp, ks, jnp.float64)
    print(f"f64 auto   : max true inner resid {r64.max():.3e}", flush=True)

    def rel(a, b, tag):
        scale = np.abs(b).max() or 1.0
        print(f"  {tag}: max abs {np.abs(a - b).max():.3e} "
              f"(rel {np.abs(a - b).max() / scale:.3e})", flush=True)

    print("f32 vs f64 (same platform):", flush=True)
    rel(v32, v64, "v4  ")
    rel(z32, z64, "z4  ")
    rel(t32, t64, "trace")

    _, z32u, r32u, t32u = probe_chunk(bp, ks, jnp.float32,
                                      stencil="unrolled")
    print(f"f32 unroll : max true inner resid {r32u.max():.3e}", flush=True)
    rel(z32u, z32, "z4 unrolled vs auto")

    np.savez(f"/tmp/probe_loc_{plat}_N{N}.npz",
             v=v32, z=z32, r=r32, t=t32, z64=z64, t64=t64)
    print(f"saved /tmp/probe_loc_{plat}_N{N}.npz", flush=True)


if __name__ == "__main__":
    main()
