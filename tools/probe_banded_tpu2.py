"""Localize the TPU-only B~ probe error (round-4, N>=34).

probe_banded_tpu.py showed: on TPU the probed blocks carry a flat
~3e-2 rel error regardless of apply layout, while the identical code
on CPU f32 reaches 3.5e-6.  Precision-pinning fastdiag_apply and the
probe scatter fixed the outer stall (200 -> 18 iters) but NOT the
block error.  This script splits data-vs-compute:

  1. compare build_blocked(assemble_on_device=True) arrays (Dinv,
     faces.Tb, coefs) against the host-extracted build_blocked(...) on
     the same TPU process,
  2. run banded_from_device on the HOST-extracted bp — if clean, the
     on-device assembly data is the culprit; if still 3e-2, the probe
     compute is,
  3. error localization: worst face/slot entries + self-slot vs
     neighbor-slot error split, probe_iters=24 vs 96.

Usage: python tools/probe_banded_tpu2.py [N]
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
    banded_from_device, build_woodbury_banded)


def _cmp(tag, a, b):
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    scale = np.abs(b).max() or 1.0
    print(f"  {tag}: max abs diff {np.abs(a - b).max():.3e} "
          f"(rel {np.abs(a - b).max() / scale:.3e})", flush=True)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 34
    p = 6
    print("worker health probe:", float(jnp.sum(jnp.ones(8))), flush=True)
    prob, g, gdelta, *_ = sc.assemble_level(p, N)
    bp_dev = build_blocked(prob, dtype=jnp.float32,
                           assemble_on_device=True, flat=False)
    bp_host = build_blocked(prob, dtype=jnp.float32,
                            assemble_on_device=False, flat=False)
    print("== on-device assembly vs host extraction ==", flush=True)
    _cmp("Dinv", bp_dev.Dinv, bp_host.Dinv)
    for lf in range(4):
        _cmp(f"faces.Tb[{lf}]", bp_dev.faces.Tb[lf], bp_host.faces.Tb[lf])
    _cmp("coefs", bp_dev.coefs, bp_host.coefs)

    tb_ref = build_woodbury_banded(bp_host, prob, iters=32)
    Bh = np.asarray(tb_ref.blocks, dtype=np.float64)
    smax = np.abs(Bh).max()

    def report(tag, tb):
        Bd = np.asarray(tb.blocks, dtype=np.float64)
        err = np.abs(Bd - Bh)
        nif, K, L, _ = err.shape
        kk_self = {a: kk for a, kk in
                   zip(range(nif), np.asarray(tb.faceids) * 0)}
        # self-slot vs rest via tb.nbr: self slot = where nbr == row
        nbr = np.asarray(tb.nbr)
        selfmask = np.zeros((nif, K), dtype=bool)
        for a in range(nif):
            for kk in range(K):
                if nbr[a, kk] == a:
                    selfmask[a, kk] = True
        e_self = err[selfmask].max()
        e_nbr = err[~selfmask].max() if (~selfmask).any() else 0.0
        flat = err.max(axis=(2, 3))
        a, kk = np.unravel_index(np.argmax(flat), flat.shape)
        print(f"{tag}: rel {err.max() / smax:.3e} "
              f"(self-slot {e_self / smax:.3e}, nbr {e_nbr / smax:.3e}; "
              f"worst face {a} slot {kk} self={bool(selfmask[a, kk])})",
              flush=True)

    for tag, bpv in (("host-extracted bp", bp_host),
                     ("device-assembled bp", bp_dev)):
        for pi in (24, 96):
            t0 = time.time()
            tb = banded_from_device(bpv, prob, iters=32, probe_iters=pi,
                                    k_chunk=8)
            jax.block_until_ready(tb.blocks)
            report(f"{tag} probe_iters={pi} ({time.time() - t0:.0f}s)",
                   tb)


if __name__ == "__main__":
    main()
