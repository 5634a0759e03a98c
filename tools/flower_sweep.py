#!/usr/bin/env python
"""Flower fault-network refinement sweep (VERDICT r2 next #6): the
prescribed-slip jump error on flower_v2 at N=8/16/32, p=2 and 4,
straight and curved (arc sagitta 0.1).  Prints one JSON line with the
error table and observed rates.
"""
import json
import os
import sys

os.environ.setdefault("HYBRIDSBP_PLATFORM", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "drivers"))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np  # noqa: E402

import flower  # noqa: E402


def main():
    Ns = (8, 16, 32)
    out = {"N": list(Ns)}
    for profile in (None, "smooth"):
        for p in (2, 4):
            for curved in (0.0, 0.1):
                key = (f"p{p}" + ("_curved" if curved else "")
                       + (f"_{profile}" if profile else ""))
                errs = []
                for N in Ns:
                    _, _, _, worst = flower.run(p=p, N=N, verbose=False,
                                                curved=curved,
                                                profile=profile)
                    errs.append(float(worst))
                    print(f"# {key} N={N}: {worst:.3e}", file=sys.stderr,
                          flush=True)
                rates = [float(np.log2(errs[i] / errs[i + 1]))
                         for i in range(len(errs) - 1)]
                out[key] = {"err": [float(f"{e:.4g}") for e in errs],
                            "rate": [round(r, 2) for r in rates]}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
