"""Marching tetrahedra on the Freudenthal lattice: analytic-SDF correctness."""

import numpy as np

from sculptmate_tpu.geometry.marching_tets import lattice_size, marching_tets_host
from sculptmate_tpu.geometry.mt_tables import build_tet_tables, TET_PERMS


def _edge_stats(faces):
    edges = {}
    for tri in faces:
        for a, b in ((tri[0], tri[1]), (tri[1], tri[2]), (tri[2], tri[0])):
            edges[(a, b)] = edges.get((a, b), 0) + 1
    dup = sum(1 for c in edges.values() if c != 1)
    unmatched = sum(1 for e in edges if (e[1], e[0]) not in edges)
    return len(edges) // 2, dup, unmatched


def _sphere_sdf(res, r=0.3, center=0.5):
    N = lattice_size(res)
    g = np.arange(N) / res
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    return (r - np.sqrt((X - center) ** 2 + (Y - center) ** 2 + (Z - center) ** 2)).ravel().astype(np.float32)


def test_tet_tables_cover_cube():
    edge_class, edge_anchor, tri_table, tri_count, tet_corners = build_tet_tables()
    assert len(TET_PERMS) == 6
    # each tet's 4 corners include 000 and 111
    for t in range(6):
        assert (tet_corners[t][0] == 0).all()
        assert (tet_corners[t][3] == 1).all()
    # case 0 and 15 emit nothing; single-vertex cases emit 1 triangle
    assert (tri_count[:, 0] == 0).all() and (tri_count[:, 15] == 0).all()
    for case in (1, 2, 4, 8, 7, 11, 13, 14):
        assert (tri_count[:, case] == 1).all()
    for case in (3, 5, 6, 9, 10, 12):
        assert (tri_count[:, case] == 2).all()


def test_sphere_no_deform():
    res = 24
    sdf = _sphere_sdf(res)
    v, f = marching_tets_host(sdf, None, res)
    assert len(v) > 100 and len(f) > 100
    r = np.linalg.norm(v - 0.5, axis=1)
    assert abs(r.mean() - 0.3) < 0.01
    E, dup, unmatched = _edge_stats(f)
    assert dup == 0 and unmatched == 0
    assert len(v) - E + len(f) == 2  # sphere
    # outward orientation (away from inside = positive sdf region)
    n = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
    c = (v[f[:, 0]] + v[f[:, 1]] + v[f[:, 2]]) / 3 - 0.5
    assert ((n * c).sum(1) > 0).mean() > 0.99


def test_sphere_with_deform(rng):
    res = 20
    N = lattice_size(res)
    sdf = _sphere_sdf(res)
    deform = rng.standard_normal((N**3, 3)).astype(np.float32)
    v, f = marching_tets_host(sdf, deform, res)
    assert len(v) > 100
    E, dup, unmatched = _edge_stats(f)
    assert dup == 0 and unmatched == 0
    assert len(v) - E + len(f) == 2
    # deformation bounded by 1/res per axis
    r = np.linalg.norm(v - 0.5, axis=1)
    assert abs(r.mean() - 0.3) < np.sqrt(3) / res + 0.01


def test_empty():
    res = 8
    N = lattice_size(res)
    sdf = -np.ones((N**3,), np.float32)
    v, f = marching_tets_host(sdf, None, res)
    assert len(v) == 0 and len(f) == 0
