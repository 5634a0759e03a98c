#!/usr/bin/env python
"""Measure trace-preconditioner SETUP cost: dense nλ² inverse vs banded
face-block extraction (VERDICT r2 next #3), on the 56-block curved
square_circle mesh at a given refinement.  Host-only (the transfer win
is measured separately on the TPU); prints one JSON line.
"""
import argparse
import json
import os
import sys
import time

os.environ.setdefault("HYBRIDSBP_PLATFORM", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "drivers"))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p", type=int, default=6)
    ap.add_argument("--N", type=int, default=68)
    a = ap.parse_args()

    import numpy as np
    import square_circle
    from hybridsbp_tpu.tpu import build_blocked, build_woodbury
    from hybridsbp_tpu.tpu.multiblock import build_woodbury_banded

    t0 = time.time()
    prob, g, gd, _, _, _, _ = square_circle.assemble_level(a.p, a.N)
    t_asm = time.time() - t0

    import jax.numpy as jnp
    t0 = time.time()
    bp = build_blocked(prob, dtype=jnp.float32)
    t_ext = time.time() - t0

    nlam = int(prob.FToLstarts[-1])

    t0 = time.time()
    dense = build_woodbury(bp, prob, dtype=jnp.float32)
    np.asarray(dense.Binv)
    t_dense = time.time() - t0
    dense_mb = dense.Binv.size * dense.Binv.dtype.itemsize / 1e6

    t0 = time.time()
    banded = build_woodbury_banded(bp, prob, dtype=jnp.float32)
    np.asarray(banded.blocks)
    t_banded = time.time() - t0
    banded_mb = (banded.blocks.size + banded.diag_inv.size) * 4 / 1e6

    print(json.dumps({
        "p": a.p, "N": a.N, "nlam": nlam,
        "assembly_s": round(t_asm, 1),
        "blocked_extract_s": round(t_ext, 1),
        "dense_inv_s": round(t_dense, 1),
        "dense_inv_MB": round(dense_mb, 1),
        "banded_build_s": round(t_banded, 1),
        "banded_MB": round(banded_mb, 1)}))


if __name__ == "__main__":
    main()
