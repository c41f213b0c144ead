"""Isotropic remesher: edge-length control, manifoldness, shape preservation."""

import numpy as np
import jax.numpy as jnp

from sculptmate_tpu.geometry.marching_cubes import marching_cubes_host
from sculptmate_tpu.geometry.remesh import isotropic_remesh


def _sphere_mesh(R=32, r=0.6):
    g = np.linspace(-1, 1, R)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    level = r - np.sqrt(X**2 + Y**2 + Z**2)
    v, f = marching_cubes_host(jnp.asarray(level, jnp.float32))
    return v / (R - 1) * 2 - 1, f


def _edge_lengths(v, f):
    e = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    e = np.unique(np.sort(e, axis=1), axis=0)
    return np.linalg.norm(v[e[:, 0]] - v[e[:, 1]], axis=1)


def test_remesh_targets_edge_length():
    v, f = _sphere_mesh()
    h0 = _edge_lengths(v, f).mean()
    target = 2.0 * h0
    v2, f2 = isotropic_remesh(v, f, target_edge_length=target, iterations=6)
    assert len(f2) < len(f)  # coarsened
    h2 = _edge_lengths(v2, f2)
    assert abs(h2.mean() - target) / target < 0.4
    # shape preserved
    r = np.linalg.norm(v2, axis=1)
    assert abs(r.mean() - 0.6) < 0.03


def test_remesh_refines():
    v, f = _sphere_mesh(R=16)
    h0 = _edge_lengths(v, f).mean()
    v2, f2 = isotropic_remesh(v, f, target_edge_length=0.5 * h0, iterations=4)
    assert len(f2) > len(f)
    # still watertight-ish: every edge shared by exactly two faces
    e = np.concatenate([f2[:, [0, 1]], f2[:, [1, 2]], f2[:, [2, 0]]])
    e_sorted = np.sort(e, axis=1)
    uniq, counts = np.unique(e_sorted, axis=0, return_counts=True)
    assert (counts == 2).mean() > 0.97


def test_remesh_empty():
    v2, f2 = isotropic_remesh(np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64))
    assert len(v2) == 0 and len(f2) == 0
