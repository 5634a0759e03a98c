"""Isolate the flat-only (drop_planes + echunk) apply path inside
banded_from_device — the config run_device_only uses on TPU at
N=136/272 where the probed B-tilde degraded, while the planes-path CPU
diagnostic (tools/probe_banded_accuracy.py) is clean at N=17/34/68.

Usage: HYBRIDSBP_PLATFORM=cpu python tools/probe_banded_flat.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("HYBRIDSBP_PLATFORM", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "drivers"))
import square_circle as sc  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from hybridsbp_tpu.tpu import build_blocked  # noqa: E402
from hybridsbp_tpu.tpu.multiblock import (  # noqa: E402
    banded_from_device, build_woodbury_banded, blocked_rhs_from_host,
    make_jit_solver, with_flat_layout)


def main():
    p, N = 6, 34
    prob, g, gdelta, *_ = sc.assemble_level(p, N)
    bp = build_blocked(prob, dtype=jnp.float32,
                       assemble_on_device=True, flat=False)
    tb_host = build_woodbury_banded(bp, prob, iters=32)
    Bh = np.asarray(tb_host.blocks, dtype=np.float64)
    gb, gd = blocked_rhs_from_host(prob, g, gdelta)
    gb, gd = gb.astype(jnp.float32), gd.astype(jnp.float32)

    variants = [
        ("planes", bp),
        ("flat-keep (echunk=8)", with_flat_layout(bp, echunk=8)),
        ("flat-only (echunk=8)", with_flat_layout(bp, echunk=8,
                                                  drop_planes=True)),
        ("flat-only (echunk off)", with_flat_layout(bp, echunk=None,
                                                    drop_planes=True)),
    ]
    for tag, bpv in variants:
        t0 = time.time()
        tb = banded_from_device(bpv, prob, iters=32, probe_iters=24,
                                k_chunk=8)
        Bd = np.asarray(tb.blocks, dtype=np.float64)
        rel = np.abs(Bd - Bh).max() / np.abs(Bh).max()
        sj = make_jit_solver(bpv, method="displacements", trace_inv=tb,
                             tol=1e-6, maxiter=200, inner_iters=8)
        res = sj(gb, gd)
        print(f"{tag}: rel block err {rel:.3e} "
              f"({time.time() - t0:.0f}s); iters={int(res.iters)} "
              f"conv={bool(res.converged)} "
              f"resnorm={float(res.resnorm):.2e}", flush=True)


if __name__ == "__main__":
    main()
