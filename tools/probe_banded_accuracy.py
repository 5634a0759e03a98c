"""Diagnose banded_from_device B-tilde accuracy vs probe_iters and N.

Round-4 device-only convergence stall (N=136/272): the probed trace
preconditioner appears to buy nothing at scale while the host-extracted
blocks give 4-iter outer convergence.  Hypothesis: B = D - F M^-1 F^T
cancels increasingly as h -> 0, so a fixed probe_iters inner CG gives a
relative B error that GROWS with N.  This script measures, on CPU:

  - rel block error of banded_from_device vs build_woodbury_banded
    at several (N, probe_iters),
  - the cancellation ratio ||B|| / ||D|| per N,
  - outer FCG iteration counts with each preconditioner.

Usage: HYBRIDSBP_PLATFORM=cpu python tools/probe_banded_accuracy.py
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
    make_jit_solver)


def main():
    p = 6
    for N in (17, 34, 68):
        t0 = time.time()
        prob, g, gdelta, *_ = sc.assemble_level(p, N)
        t_asm = time.time() - t0
        bp = build_blocked(prob, dtype=jnp.float32,
                           assemble_on_device=True, flat=False)
        tb_host = build_woodbury_banded(bp, prob, iters=32)
        Bh = np.asarray(tb_host.blocks, dtype=np.float64)
        # cancellation: diag-block magnitude vs the D (penalty) diagonal
        Dvals = 1.0 / np.asarray(bp.Dinv)[tb_host.faceids]
        print(f"N={N}: assembled {t_asm:.0f}s, ||B_blocks||_max="
              f"{np.abs(Bh).max():.3e}, ||D||_max={Dvals.max():.3e}, "
              f"ratio={np.abs(Bh).max() / Dvals.max():.3e}", flush=True)
        gb, gd = blocked_rhs_from_host(prob, g, gdelta)
        gb, gd = gb.astype(jnp.float32), gd.astype(jnp.float32)
        for pi in (24, 0):
            t0 = time.time()
            tb_dev = banded_from_device(bp, prob, iters=32,
                                        probe_iters=pi, k_chunk=8)
            t_probe = time.time() - t0
            Bd = np.asarray(tb_dev.blocks, dtype=np.float64)
            rel = np.abs(Bd - Bh).max() / np.abs(Bh).max()
            sj = make_jit_solver(bp, method="displacements",
                                 trace_inv=tb_dev, tol=1e-6, maxiter=200,
                                 inner_iters=8)
            res = sj(gb, gd)
            print(f"  probe_iters={pi}: rel block err {rel:.3e} "
                  f"({t_probe:.0f}s); outer iters={int(res.iters)} "
                  f"conv={bool(res.converged)} "
                  f"resnorm={float(res.resnorm):.2e}", flush=True)
        sj = make_jit_solver(bp, method="displacements",
                             trace_inv=tb_host, tol=1e-6, maxiter=200,
                             inner_iters=8)
        res = sj(gb, gd)
        print(f"  host-exact blocks: outer iters={int(res.iters)} "
              f"conv={bool(res.converged)} "
              f"resnorm={float(res.resnorm):.2e}", flush=True)


if __name__ == "__main__":
    main()
