"""Golden-value regression pins.

Exact numeric fingerprints of the round-1 implementation on small
configurations.  These are not physics assertions (the gate tests cover
those); they pin the discrete operators bit-for-bit-ish so future
refactors can't silently change the numerics.
"""
import sys
import os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "drivers"))

import square_circle  # noqa: E402

from hybridsbp_tpu.ops1d import build_d1, build_vard2  # noqa: E402
from hybridsbp_tpu.ops2d import locoperator  # noqa: E402


def test_golden_square_circle_level1():
    eps, teps, _, _ = square_circle.run(p=2, N0=8, levels=1, verbose=False)
    np.testing.assert_allclose(eps[0], 0.001325479029935771, rtol=1e-9)
    np.testing.assert_allclose(teps[0], 0.014002742261364992, rtol=1e-9)


def test_golden_operator_fingerprints():
    # 1D operator entry sums (exercise the extracted tables end-to-end)
    D, HI, H, r = build_d1(6, 30)
    np.testing.assert_allclose(np.abs(D).sum(), 870.8628665578485, rtol=1e-12)
    Dv, S0, SN, HIv, Hv, M, _ = build_vard2(4, 24, lambda x: 2 + x**2)
    np.testing.assert_allclose(np.abs(M).sum(), 3502.241806152819, rtol=1e-12)

    # assembled block operator fingerprint (identity metrics, p=4)
    lop = locoperator(4, 12, 14)
    Msum = np.abs(lop.M.toarray()).sum()
    np.testing.assert_allclose(Msum, 2617.418871528932, rtol=1e-12)
    np.testing.assert_allclose(float(lop.tau[0].sum()), 1436.6865084154592,
                               rtol=1e-12)
