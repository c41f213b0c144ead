"""Marching cubes: analytic-SDF correctness (sphere/torus), watertightness,
orientation, and table sanity — the golden-kernel strategy SURVEY.md section 4
prescribes in place of the reference's absent tests."""

import numpy as np
import jax.numpy as jnp

from sculptmate_tpu.geometry.marching_cubes import marching_cubes_host
from sculptmate_tpu.geometry.mc_tables import build_tables


def _edge_stats(faces):
    edges = {}
    for tri in faces:
        for a, b in ((tri[0], tri[1]), (tri[1], tri[2]), (tri[2], tri[0])):
            edges[(a, b)] = edges.get((a, b), 0) + 1
    dup = sum(1 for c in edges.values() if c != 1)
    unmatched = sum(1 for e in edges if (e[1], e[0]) not in edges)
    return len(edges) // 2, dup, unmatched


def _grid(R):
    g = np.linspace(-1, 1, R)
    return np.meshgrid(g, g, g, indexing="ij")


def test_tables():
    tri_table, tri_count, maxtri = build_tables()
    assert maxtri == 5  # classic MC bound
    assert tri_count[0] == 0 and tri_count[255] == 0
    assert tri_count[1] == 1 and tri_count[254] == 1
    # NOTE: complement symmetry does NOT hold by design — the fixed
    # "inside corners stay connected" ambiguity rule picks opposite
    # diagonals for complementary cases; that is exactly what makes
    # adjacent cubes agree and the mesh watertight.
    # every emitted triangle uses valid edge ids
    assert tri_table[tri_table >= 0].max() <= 11


def test_sphere():
    R = 32
    X, Y, Z = _grid(R)
    level = 0.6 - np.sqrt(X**2 + Y**2 + Z**2)
    v, f = marching_cubes_host(jnp.asarray(level, jnp.float32))
    assert len(v) > 100 and len(f) > 100
    vv = v / (R - 1) * 2 - 1
    r = np.linalg.norm(vv, axis=1)
    assert abs(r.mean() - 0.6) < 0.01
    E, dup, unmatched = _edge_stats(f)
    assert dup == 0 and unmatched == 0  # watertight manifold
    assert len(v) - E + len(f) == 2  # sphere Euler characteristic
    # outward orientation
    n = np.cross(vv[f[:, 1]] - vv[f[:, 0]], vv[f[:, 2]] - vv[f[:, 0]])
    c = (vv[f[:, 0]] + vv[f[:, 1]] + vv[f[:, 2]]) / 3
    assert ((n * c).sum(1) > 0).mean() > 0.99


def test_torus_topology():
    R = 48
    X, Y, Z = _grid(R)
    Rmaj, rmin = 0.6, 0.25
    q = np.sqrt(X**2 + Y**2) - Rmaj
    level = rmin - np.sqrt(q**2 + Z**2)
    v, f = marching_cubes_host(jnp.asarray(level, jnp.float32))
    E, dup, unmatched = _edge_stats(f)
    assert dup == 0 and unmatched == 0
    assert len(v) - E + len(f) == 0  # torus Euler characteristic


def test_random_field_watertight(rng):
    R = 16
    level = rng.standard_normal((R, R, R)).astype(np.float32)
    # smooth it to avoid pathological aliasing, keep it noisy
    from scipy import ndimage

    level = ndimage.gaussian_filter(level, 1.2)
    v, f = marching_cubes_host(jnp.asarray(level))
    if len(f):
        edges = {}
        for tri in f:
            for a, b in ((tri[0], tri[1]), (tri[1], tri[2]), (tri[2], tri[0])):
                edges[(a, b)] = edges.get((a, b), 0) + 1
        # no non-manifold duplicates ever
        assert all(c == 1 for c in edges.values())
        # unmatched (open) edges are allowed ONLY where the isosurface
        # exits the domain: both endpoints on the grid boundary
        for a, b in edges:
            if (b, a) not in edges:
                for vtx in (v[a], v[b]):
                    assert np.any((vtx <= 0) | (vtx >= R - 1)), (
                        f"interior open edge at {v[a]} {v[b]}"
                    )


def test_block_overflow_detected():
    """A too-small block capacity must be reported (silent truncation would
    emit a corrupt mesh — this bit us at 512^3)."""
    import jax
    from sculptmate_tpu.geometry.marching_cubes import marching_cubes

    R = 32
    X, Y, Z = _grid(R)
    level = 0.6 - np.sqrt(X**2 + Y**2 + Z**2)
    full = jax.jit(marching_cubes, static_argnums=(1, 2, 3))(
        jnp.asarray(level, jnp.float32), 32 * R * R, 64 * R * R, 0
    )
    tiny = jax.jit(marching_cubes, static_argnums=(1, 2, 3))(
        jnp.asarray(level, jnp.float32), 32 * R * R, 64 * R * R, 8
    )
    assert int(tiny.num_active_blocks) == int(full.num_active_blocks)
    assert int(tiny.num_active_blocks) > 8  # caller can detect and retry
    # and with the correct capacity the meshes agree
    v, f = marching_cubes_host(jnp.asarray(level, jnp.float32))
    assert len(v) == int(full.num_verts)


def test_empty_and_full():
    R = 8
    v, f = marching_cubes_host(jnp.asarray(np.full((R, R, R), -1.0, np.float32)))
    assert len(v) == 0 and len(f) == 0
    v, f = marching_cubes_host(jnp.asarray(np.full((R, R, R), 1.0, np.float32)))
    assert len(v) == 0 and len(f) == 0
