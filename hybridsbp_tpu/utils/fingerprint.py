"""Numerics fingerprint for operator caches.

A small locoperator assembled through the same tables/code path as the
real workloads — its |M| sum changes whenever the SBP coefficient
tables or the locoperator assembly numerics change, so a stale cached
operator artifact (bench DIA planes, flagship device-problem cache) is
detected and rebuilt instead of silently reused (ADVICE r1).
"""
import numpy as np


def op_fingerprint():
    from ..mesh import create_metrics
    from ..ops2d import locoperator
    from ..seas.bp1 import BP1Params, tan_stretch_maps

    par = BP1Params(N=16, el=10.0)
    xt, yt = tan_stretch_maps(par)
    lop = locoperator(2, 16, 16, create_metrics(2, 16, 16, xt, yt))
    return float(np.abs(lop.M).sum())
