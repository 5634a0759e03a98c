"""Mesh connectivity arrays (host-side preprocessing).

Reference parity: ``connectivityarrays`` (global_curved.jl:82-132), with
0-based ids.  Conventions (0-based local faces):

  face 0: west  (r=-1), vertices (0, 2)
  face 1: east  (r=+1), vertices (1, 3)
  face 2: south (s=-1), vertices (0, 1)
  face 3: north (s=+1), vertices (2, 3)

- ``FToE[:, f]``  the (minus, plus) elements sharing global face f
  (plus entry is -1 on physical boundaries)
- ``FToLF[:, f]`` their local face numbers (-1 where no element)
- ``EToO[lf, e]`` True if element e's face lf is oriented the same way
  as the global face (the minus side always is)
- ``EToS[lf, e]`` 0 if (e, lf) is the minus side of its global face,
  1 if the plus side
"""
import numpy as np

from .inp import LF_TO_LV


def connectivityarrays(EToV, EToF):
    nelems = EToV.shape[1]
    nfaces = int(EToF.max()) + 1

    FToE = np.full((2, nfaces), -1, dtype=np.int64)
    FToLF = np.full((2, nfaces), -1, dtype=np.int64)
    EToO = np.zeros((4, nelems), dtype=bool)
    EToS = np.zeros((4, nelems), dtype=np.int64)

    for e in range(nelems):
        for lf in range(4):
            gf = EToF[lf, e]
            if FToE[0, gf] < 0:
                FToE[0, gf] = e
                FToLF[0, gf] = lf
                EToO[lf, e] = True
                EToS[lf, e] = 0
            else:
                if FToE[1, gf] >= 0:
                    raise ValueError(f"face {gf} shared by >2 elements")
                FToE[1, gf] = e
                FToLF[1, gf] = lf
                EToS[lf, e] = 1
                ne, nf = FToE[0, gf], FToLF[0, gf]
                nv = [EToV[v, ne] for v in LF_TO_LV[nf]]
                lv = [EToV[v, e] for v in LF_TO_LV[lf]]
                if nv == lv:
                    EToO[lf, e] = True
                elif nv[::-1] == lv:
                    EToO[lf, e] = False
                else:
                    raise ValueError(f"connectivity problem at face {gf}")
    return FToE, FToLF, EToO, EToS
