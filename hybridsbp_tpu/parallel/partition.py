"""Block partitioning for multi-slice (ICI + DCN) scale-out.

The sharded solvers' only cross-device traffic is the all_gather of
per-block face traces along the ``block`` mesh axis.  On one slice that
collective rides ICI and block order is irrelevant.  Scaling past a
slice (Mesh axes ('slice', 'block') over DCN-connected slices), the
traffic that matters is *faces whose two blocks live on different
slices* — so blocks should be laid out slice-contiguously with the
face-cut between slices minimized (the classic domain-decomposition
partitioning argument; the reference is single-process and has no
counterpart, SURVEY §5.8).

This module provides that layout: a greedy BFS graph-growing
partitioner (METIS-lite — the block counts here are O(100), so
optimality matters less than balance) + the element permutation that
makes each part contiguous along the block axis.  Apply the
permutation to the *mesh* (EToV/EToF columns) before ``build_problem``
— every downstream structure (host assembly, BlockedHybrid, sharded
solvers) then inherits the slice-contiguous order, and an (s, b) mesh
maps part boundaries onto the DCN axis.
"""
from typing import List, NamedTuple, Tuple

import numpy as np


class PartitionResult(NamedTuple):
    parts: np.ndarray        # (E,) part id per block
    perm: np.ndarray         # (E,) element permutation: new_e = perm[i]
    sizes: np.ndarray        # (nparts,) blocks per part
    cut_faces: int           # interior faces crossing a part boundary
    interior_faces: int      # total interior (two-sided) faces


def block_adjacency(FToE: np.ndarray, nelems: int) -> List[List[int]]:
    """Adjacency lists of the block graph: one edge per two-sided face."""
    adj: List[List[int]] = [[] for _ in range(nelems)]
    FToE = np.asarray(FToE)
    for f in range(FToE.shape[1]):
        em, ep = int(FToE[0, f]), int(FToE[1, f])
        if em >= 0 and ep >= 0 and em != ep:
            adj[em].append(ep)
            adj[ep].append(em)
    return adj


def partition_blocks(FToE: np.ndarray, nelems: int,
                     nparts: int) -> PartitionResult:
    """Greedy BFS graph-growing partition into ``nparts`` balanced,
    connected(ish) parts minimizing the face cut.

    Each part grows from a fresh boundary seed (min remaining degree)
    by BFS, preferring frontier blocks with the most already-assigned
    neighbors *in this part* (locally minimizes new cut edges), up to
    the capacity ceil(E/nparts).
    """
    assert 1 <= nparts <= nelems
    adj = block_adjacency(FToE, nelems)
    cap = -(-nelems // nparts)
    parts = np.full(nelems, -1, dtype=np.int64)

    for pid in range(nparts):
        unassigned = np.where(parts < 0)[0]
        if len(unassigned) == 0:
            break
        # seed: unassigned block with fewest unassigned neighbors
        # (domain corners first — keeps parts compact)
        seed = min(unassigned,
                   key=lambda e: sum(parts[n] < 0 for n in adj[e]))
        parts[seed] = pid
        size = 1
        frontier = {n for n in adj[seed] if parts[n] < 0}
        while size < cap and frontier:
            # absorb the frontier block with the most neighbors already
            # in this part (ties: smallest outward degree)
            nxt = max(frontier, key=lambda e: (
                sum(parts[n] == pid for n in adj[e]),
                -sum(parts[n] < 0 for n in adj[e])))
            frontier.discard(nxt)
            parts[nxt] = pid
            size += 1
            frontier.update(n for n in adj[nxt] if parts[n] < 0)
    # leftovers (BFS pockets / disconnected graphs): absorb blocks with
    # the most assigned neighbors first, into an under-capacity neighbor
    # part when one exists (contiguity), else the globally smallest part
    # (balance wins over contiguity; max size stays <= cap)
    remaining = list(np.where(parts < 0)[0])
    while remaining:
        sizes = np.bincount(parts[parts >= 0], minlength=nparts)
        e = max(remaining,
                key=lambda e: sum(parts[n] >= 0 for n in adj[e]))
        cand = {int(parts[n]) for n in adj[e] if parts[n] >= 0}
        under = [p for p in cand if sizes[p] < cap]
        if under:
            parts[e] = min(under, key=lambda p: sizes[p])
        else:
            parts[e] = int(np.argmin(sizes))
        remaining.remove(e)

    sizes = np.bincount(parts, minlength=nparts)
    cut = interior = 0
    FToE = np.asarray(FToE)
    for f in range(FToE.shape[1]):
        em, ep = int(FToE[0, f]), int(FToE[1, f])
        if em >= 0 and ep >= 0 and em != ep:
            interior += 1
            if parts[em] != parts[ep]:
                cut += 1
    perm = np.argsort(parts, kind="stable")
    return PartitionResult(parts=parts, perm=perm, sizes=sizes,
                           cut_faces=cut, interior_faces=interior)


def permute_elements(EToV: np.ndarray, EToF: np.ndarray,
                     perm: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Reorder mesh elements (columns) by ``perm`` — feed the result to
    ``build_problem`` so the block axis is slice-contiguous.  Face ids
    and vertex ids are unchanged; only element order moves."""
    return np.asarray(EToV)[:, perm], np.asarray(EToF)[:, perm]
