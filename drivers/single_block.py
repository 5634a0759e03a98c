#!/usr/bin/env python
"""Single-block constant-solution smoke test.

Reference parity: seas/BP1/single_block.jl — pushes u == 1 through the
full mesh -> metrics -> locoperator -> factorization -> BC -> solve path
on the tan-stretched 1-block mesh and prints the solution extrema.
"""
import os
import sys

import numpy as np
import scipy.sparse.linalg as spla

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hybridsbp_tpu import BC_DIRICHLET, BC_JUMP_INTERFACE, BC_NEUMANN  # noqa: E402
from hybridsbp_tpu.mesh import create_metrics, read_inp_2d  # noqa: E402
from hybridsbp_tpu.ops2d import locbcarray_mod, locoperator  # noqa: E402
from hybridsbp_tpu.seas.bp1 import BP1Params, LFTOB, tan_stretch_maps  # noqa: E402

MESH = os.path.join(os.path.dirname(__file__), "..", "meshes", "seas_bp1",
                    "1_1_block.inp")


def main(N=8, p=2):
    bc_map = [BC_DIRICHLET, BC_DIRICHLET, BC_NEUMANN, BC_NEUMANN,
              BC_JUMP_INTERFACE]
    verts, EToV, EToF, FToB, EToDomain = read_inp_2d(MESH, bc_map=bc_map)
    print(f"mesh: {EToV.shape[1]} element(s), {len(FToB)} faces")

    par = BP1Params(N=N, p=p, el=10.0)
    xt, yt = tan_stretch_maps(par)
    metrics = create_metrics(p, N, N, xt, yt)
    lop = locoperator(p, N, N, metrics, LFTOB)

    ge = locbcarray_mod(lop, LFTOB,
                        lambda lf, x, y: np.ones_like(x),
                        lambda lf, x, y, nx, ny: np.zeros_like(x))
    u = spla.spsolve(lop.M, ge)
    err = np.abs(u - 1.0).max()
    print(f"numerical solution: min {u.min():.15f} max {u.max():.15f}")
    print(f"max |u - 1| = {err:.3e}")
    assert err < 1e-9, "constant solution not reproduced"
    print("PASS")


if __name__ == "__main__":
    main()
