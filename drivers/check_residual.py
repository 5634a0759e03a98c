#!/usr/bin/env python
"""SBP compatibility residual check.

Reference parity: check_residual.jl — verifies that the variable-
coefficient stiffness M is compatible with the wide-form first-derivative
operator: R = M - D1' H diag(b) D1 must be symmetric PSD (the
"borrowability" condition of SBP theory).  Prints eigenvalue extrema for
p in {2, 4, 6} with the oscillating coefficient b_i = (i mod 2) + 1.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hybridsbp_tpu.ops1d import build_d1, build_vard2  # noqa: E402


def main(N=20):
    lam = np.array([i % 2 + 1.0 for i in range(N + 1)])
    for p in (2, 4, 6):
        _, _, _, _, _, M, _ = build_vard2(p, N, lam)
        D1, _, H, _ = build_d1(p, N)
        R = M - D1.T @ H @ np.diag(lam) @ D1
        w = np.linalg.eigvals(R)
        print(f"SBP order = {p}")
        print(f"  real eigenvalue extrema: ({w.real.min():.6e}, "
              f"{w.real.max():.6e})")
        print(f"  imag eigenvalue extrema: ({w.imag.min():.6e}, "
              f"{w.imag.max():.6e})")
        assert w.real.min() > -1e-10, "residual not PSD"
    print("PASS: compatibility residual PSD for p in (2, 4, 6)")


if __name__ == "__main__":
    main()
