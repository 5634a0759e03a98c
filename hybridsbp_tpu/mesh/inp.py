"""Cubit/Trelis Abaqus ``.inp`` mesh reader (host-side preprocessing).

Parses the quad meshes exported by Cubit into the framework's 0-based
z-order connectivity.  Reference parity: ``read_inp_2d``
(global_curved.jl:802-947), including its conventions:

- element vertices are re-ordered from Abaqus counter-clockwise
  (v1,v2,v4,v3) into z-order (v1,v2,v3,v4)
- Cubit side numbers map to z-order local faces via ``[3, 2, 4, 1]``
  (1-based), i.e. Cubit side 1 -> bottom, 2 -> right, 3 -> top, 4 -> left
- local faces (0-based here) are 0:west (r=-1), 1:east (r=+1),
  2:south (s=-1), 3:north (s=+1)
- a side-set code that maps to 3 is forced to BC_LOCKED_INTERFACE
  (global_curved.jl:933-935)
- faces not named by any side set default to BC_LOCKED_INTERFACE
"""
import re

import numpy as np

from .. import BC_DIRICHLET, BC_JUMP_INTERFACE, BC_LOCKED_INTERFACE, BC_NEUMANN

# z-order local face -> its two local vertices (0-based)
LF_TO_LV = ((0, 2), (1, 3), (0, 1), (2, 3))
# Cubit .inp side number (1..4) -> 0-based z-order local face
_INP_TO_ZORDER = (2, 1, 3, 0)


def read_inp_2d(filename, bc_map=None):
    """Read a 2D quad mesh from an Abaqus .inp file.

    Returns ``(verts, EToV, EToF, FToB, EToBlock)``:
      verts    (2, nverts) float coordinates
      EToV     (4, nelems) int, 0-based vertex ids in z-order
      EToF     (4, nelems) int, 0-based global face ids
      FToB     (nfaces,)   int boundary-condition code per face
      EToBlock (nelems,)   int block/domain id (as written in the file)
    """
    with open(filename) as f:
        lines = f.readlines()

    def seek(sub, first=0):
        for i in range(first, len(lines)):
            if re.search(sub, lines[i]):
                return i
        return -1

    # ---- nodes ----------------------------------------------------------
    ln = seek("NSET=ALLNODES")
    if ln < 0:
        raise ValueError(f"{filename}: no ALLNODES node set")
    data_re = re.compile(r"^\s*[0-9]+\s*,")
    nodes = {}
    for i in range(ln + 1, len(lines)):
        if not data_re.match(lines[i]):
            break
        parts = [p for p in re.split(r"[,\s]+", lines[i].strip()) if p]
        nodes[int(parts[0])] = (float(parts[1]), float(parts[2]))
    nverts = len(nodes)
    verts = np.full((2, nverts), np.nan)
    for num, (x, y) in nodes.items():
        verts[:, num - 1] = (x, y)

    # ---- elements (possibly several *ELEMENT blocks, one per Cubit block)
    elems = {}
    eblock = {}
    ln = seek(r"ELEMENT")
    while ln >= 0:
        block_nums = re.findall(r"[0-9]+", lines[ln])
        block_id = int(block_nums[-1]) if block_nums else 0
        for i in range(ln + 1, len(lines)):
            parts = [p for p in re.split(r"[,\s]+", lines[i].strip()) if p]
            if len(parts) < 5:
                break
            try:
                e, v1, v2, v4, v3 = (int(parts[k]) for k in range(5))
            except ValueError:
                break
            elems[e] = (v1 - 1, v2 - 1, v3 - 1, v4 - 1)  # to z-order, 0-based
            eblock[e] = block_id
        ln = seek(r"ELEMENT", ln + 1)
    if not elems:
        raise ValueError(f"{filename}: no elements found")
    nelems = len(elems)
    EToV = np.zeros((4, nelems), dtype=np.int64)
    EToBlock = np.zeros(nelems, dtype=np.int64)
    for e, vs in elems.items():
        EToV[:, e - 1] = vs
        EToBlock[e - 1] = eblock[e]

    # ---- global faces from sorted vertex pairs --------------------------
    EToF = np.zeros((4, nelems), dtype=np.int64)
    face_ids = {}
    for e in range(nelems):
        for lf in range(4):
            a, b = (EToV[v, e] for v in LF_TO_LV[lf])
            key = (a, b) if a < b else (b, a)
            EToF[lf, e] = face_ids.setdefault(key, len(face_ids))
    nfaces = len(face_ids)

    # ---- side sets -> boundary codes ------------------------------------
    FToB = np.full(nfaces, BC_LOCKED_INTERFACE, dtype=np.int64)
    ln = seek(r"\*ELSET")
    while ln >= 0:
        nums = re.findall(r"[0-9]+", lines[ln])
        sideset, side = int(nums[0]), int(nums[1])
        bc = bc_map[sideset - 1] if bc_map is not None else sideset
        lf = _INP_TO_ZORDER[side - 1]
        for i in range(ln + 1, len(lines)):
            if not re.match(r"^\s*[0-9]+", lines[i]):
                break
            for tok in re.split(r"[,\s]+", lines[i].strip()):
                if not tok:
                    continue
                e = int(tok) - 1
                code = BC_LOCKED_INTERFACE if bc == 3 else bc
                FToB[EToF[lf, e]] = code
                if not (code in (BC_DIRICHLET, BC_NEUMANN, BC_LOCKED_INTERFACE)
                        or code >= BC_JUMP_INTERFACE):
                    raise ValueError(f"invalid bc code {code}")
        ln = seek(r"\*ELSET", ln + 1)

    return verts, EToV, EToF, FToB, EToBlock
