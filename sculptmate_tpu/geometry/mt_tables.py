"""Marching-tetrahedra tables for a Freudenthal-subdivided cube lattice.

The reference loads an irregular precomputed tet soup
(``sf3d/models/isosurface.py:71-81``; the ``160_tets.npz`` blob is absent from
the repo) and dedups edges with ``torch.unique`` — gather/scatter-heavy and
shape-dynamic. The TPU-native redesign: tetrahedralize the regular lattice
with the Freudenthal/Kuhn split (6 tets per cube along the main diagonal,
consistent across neighbors), under which every tet edge is one of exactly
**7 direction classes** anchored at a lattice vertex:

    e_x, e_y, e_z, e_x+e_y, e_x+e_z, e_y+e_z, e_x+e_y+e_z

so cut-edge detection/dedup becomes 7 dense sign-test grids with a cumsum —
the same structure-of-arrays scheme as ``marching_cubes.py``, no unique().

Tables generated here (per tet, per 4-bit sign case) carry triangle corner
slots into the tet's 6 edges (ordered like the reference's ``base_tet_edges``:
(0,1),(0,2),(0,3),(1,2),(1,3),(2,3)), oriented so normals point away from the
inside (sdf > 0) region.
"""

from __future__ import annotations

import functools
import itertools
from typing import List, Tuple

import numpy as np

# 7 edge direction classes
EDGE_DIRS = np.array(
    [
        [1, 0, 0],
        [0, 1, 0],
        [0, 0, 1],
        [1, 1, 0],
        [1, 0, 1],
        [0, 1, 1],
        [1, 1, 1],
    ],
    dtype=np.int32,
)
_DIR_INDEX = {tuple(d): i for i, d in enumerate(EDGE_DIRS)}

# 6 Freudenthal tets per cube: vertex chains 000 -> e_p0 -> e_p0+e_p1 -> 111
TET_PERMS = list(itertools.permutations(range(3)))


def _tet_vertices(perm) -> np.ndarray:
    v = np.zeros((4, 3), dtype=np.int32)
    v[1][perm[0]] = 1
    v[2] = v[1].copy()
    v[2][perm[1]] = 1
    v[3] = (1, 1, 1)
    return v


# tet-local edge slots, ordered like the reference base_tet_edges
TET_EDGE_PAIRS: List[Tuple[int, int]] = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]


@functools.lru_cache(maxsize=1)
def build_tet_tables():
    """Returns:
    edge_class  (6, 6)  int32: direction class of each tet edge slot
    edge_anchor (6, 6, 3) int32: lattice offset (within the cube) of each
                edge slot's anchor (lower) vertex
    tri_table   (6, 16, 2, 3) int32: per tet, per case, up to 2 triangles of
                edge-slot ids, -1 padded
    tri_count   (6, 16) int32
    tet_corners (6, 4, 3) int32: lattice offsets of each tet's vertices
    """
    edge_class = np.zeros((6, 6), dtype=np.int32)
    edge_anchor = np.zeros((6, 6, 3), dtype=np.int32)
    tri_table = np.full((6, 16, 2, 3), -1, dtype=np.int32)
    tri_count = np.zeros((6, 16), dtype=np.int32)
    tet_corners = np.zeros((6, 4, 3), dtype=np.int32)

    for t, perm in enumerate(TET_PERMS):
        verts = _tet_vertices(perm)
        tet_corners[t] = verts
        for s, (a, b) in enumerate(TET_EDGE_PAIRS):
            d = verts[b] - verts[a]
            # vertices are monotone along the chain, so b - a is non-negative
            edge_class[t, s] = _DIR_INDEX[tuple(d)]
            edge_anchor[t, s] = verts[a]

        for case in range(16):
            inside = [(case >> i) & 1 for i in range(4)]
            n_in = sum(inside)
            if n_in in (0, 4):
                continue
            cut_slots = [
                s
                for s, (a, b) in enumerate(TET_EDGE_PAIRS)
                if inside[a] != inside[b]
            ]
            mids = {s: (verts[TET_EDGE_PAIRS[s][0]] + verts[TET_EDGE_PAIRS[s][1]]) / 2.0 for s in cut_slots}
            inside_centroid = np.mean([verts[i] for i in range(4) if inside[i]], axis=0)
            outside_centroid = np.mean([verts[i] for i in range(4) if not inside[i]], axis=0)
            out_dir = outside_centroid - inside_centroid

            def orient(tri):
                p = [mids[s] for s in tri]
                n = np.cross(p[1] - p[0], p[2] - p[0])
                return tri if np.dot(n, out_dir) > 0 else (tri[0], tri[2], tri[1])

            tris = []
            if n_in in (1, 3):
                assert len(cut_slots) == 3
                tris.append(orient(tuple(cut_slots)))
            else:  # 2 inside: quad -> 2 triangles; order the 4 cut edges cyclically
                assert len(cut_slots) == 4
                ins = [i for i in range(4) if inside[i]]
                outs = [i for i in range(4) if not inside[i]]

                def slot_of(a, b):
                    pair = (min(a, b), max(a, b))
                    return TET_EDGE_PAIRS.index(pair)

                # cycle: (in0,out0) (in0,out1) (in1,out1) (in1,out0)
                cyc = [
                    slot_of(ins[0], outs[0]),
                    slot_of(ins[0], outs[1]),
                    slot_of(ins[1], outs[1]),
                    slot_of(ins[1], outs[0]),
                ]
                tris.append(orient((cyc[0], cyc[1], cyc[2])))
                tris.append(orient((cyc[0], cyc[2], cyc[3])))

            tri_count[t, case] = len(tris)
            for k, tri in enumerate(tris):
                tri_table[t, case, k] = tri

    return edge_class, edge_anchor, tri_table, tri_count, tet_corners
