"""TPU-side banded_from_device accuracy probe (round-4 device-only
convergence stall at N>=136).

CPU f32 facts (tools/probe_banded_accuracy.py): planes-path CG probing
(probe_iters=24) gives ~3e-6 rel block error and 3-iter outers at
N=17/34/68; host-exact blocks behave identically.  On TPU at N=136/272
the device-probed B~ buys NOTHING (200-iter stalls).  This script runs
the SAME comparison on the real TPU at small N to separate:

  (a) the flat-only (drop_planes + echunk) apply path used on TPU, vs
  (b) TPU-specific numerics (f32 einsums in fastdiag_apply lower to
      bf16 MXU passes unless precision-pinned — the known trap).

Usage: python tools/probe_banded_tpu.py [N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "drivers"))
import square_circle as sc  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hybridsbp_tpu.tpu import build_blocked  # noqa: E402
from hybridsbp_tpu.tpu.multiblock import (  # noqa: E402
    banded_from_device, build_woodbury_banded, blocked_rhs_from_host,
    make_jit_solver, with_flat_layout)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 34
    p = 6
    print("worker health probe:", float(jnp.sum(jnp.ones(8))), flush=True)
    t0 = time.time()
    prob, g, gdelta, *_ = sc.assemble_level(p, N)
    print(f"host assembly p={p} N={N}: {time.time() - t0:.0f}s",
          flush=True)
    bp = build_blocked(prob, dtype=jnp.float32,
                       assemble_on_device=True, flat=False)
    tb_host = build_woodbury_banded(bp, prob, iters=32)
    Bh = np.asarray(tb_host.blocks, dtype=np.float64)
    gb, gd = blocked_rhs_from_host(prob, g, gdelta)
    gb, gd = gb.astype(jnp.float32), gd.astype(jnp.float32)

    variants = [
        ("planes", bp),
        ("flat-only (echunk=8)", with_flat_layout(bp, echunk=8,
                                                  drop_planes=True)),
    ]
    for tag, bpv in variants:
        t0 = time.time()
        tb = banded_from_device(bpv, prob, iters=32, probe_iters=24,
                                k_chunk=8)
        jax.block_until_ready(tb.blocks)
        Bd = np.asarray(tb.blocks, dtype=np.float64)
        rel = np.abs(Bd - Bh).max() / np.abs(Bh).max()
        sj = make_jit_solver(bpv, method="displacements", trace_inv=tb,
                             tol=1e-6, maxiter=200, inner_iters=8)
        res = sj(gb, gd)
        print(f"{tag}: rel block err {rel:.3e} "
              f"({time.time() - t0:.0f}s); iters={int(res.iters)} "
              f"conv={bool(res.converged)} "
              f"resnorm={float(res.resnorm):.2e}", flush=True)
    # host-exact baseline through the flat-only apply (separates the
    # preconditioner question from the apply-path question)
    bpf = variants[1][1]
    sj = make_jit_solver(bpf, method="displacements", trace_inv=tb_host,
                         tol=1e-6, maxiter=200, inner_iters=8)
    res = sj(gb, gd)
    print(f"host-exact blocks via flat-only apply: iters={int(res.iters)}"
          f" conv={bool(res.converged)} "
          f"resnorm={float(res.resnorm):.2e}", flush=True)


if __name__ == "__main__":
    main()
