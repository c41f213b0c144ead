"""Quadric decimator quality gates (native/quadric_decimate.cpp).

The production SF3D path (``systems/sf3d.py:run_image``) feeds marching-tets
meshes through ``geometry.decimate.decimate``; the reference's equivalent is
the gpytoolbox quadric pass inside triangle_remesh (StableFast
``sf3d/models/mesh.py:96-139``) and the standalone ``mesh_simplify.py``
script. These tests gate the decimated OUTPUT, independent of speed:
watertightness, Euler characteristic, geometric (Hausdorff-style two-sided)
error against the analytic surface, budget adherence, and normals parity.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from sculptmate_tpu.geometry.decimate import decimate  # noqa: E402
from sculptmate_tpu.geometry.marching_tets import (  # noqa: E402
    lattice_size,
    mt_wire_device,
)
from sculptmate_tpu.geometry import mt_wire  # noqa: E402


RES = 48
RADIUS = 0.3


@pytest.fixture(scope="module")
def sphere_mesh():
    """Dense marching-tets sphere in [0,1] lattice coords."""
    N = lattice_size(RES)
    g = np.arange(N) / RES
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    sdf = (
        RADIUS - np.sqrt((X - 0.5) ** 2 + (Y - 0.5) ** 2 + (Z - 0.5) ** 2)
    ).ravel().astype(np.float32)
    mv = 200000
    wire = np.asarray(
        jax.jit(mt_wire_device, static_argnums=(4, 5, 6))(
            jnp.asarray(sdf), None, None, None, RES, mv, 0
        )
    )
    v, f, _ = mt_wire.decode_wire(wire, RES, mv)
    return v, f


def _directed_edges(faces):
    return np.concatenate(
        [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]
    )


def _watertight(faces):
    """Every directed edge appears exactly once and has its reverse."""
    e = _directed_edges(faces)
    key = e[:, 0].astype(np.int64) * (faces.max() + 1) + e[:, 1]
    rkey = e[:, 1].astype(np.int64) * (faces.max() + 1) + e[:, 0]
    uniq, counts = np.unique(key, return_counts=True)
    if (counts != 1).any():
        return False
    return np.isin(rkey, uniq).all()


@pytest.mark.parametrize("ratio", [0.5, 0.2])
def test_decimate_sphere_quality(sphere_mesh, ratio):
    v, f = sphere_mesh
    dv, df = decimate(v, f, target_ratio=ratio)

    # budget: face count lands near the target (the sweep stops once
    # deleted >= target, so it can only undershoot by one iteration's batch)
    assert len(df) <= ratio * len(f) * 1.10
    assert len(df) >= ratio * len(f) * 0.50

    # referenced-vertex compaction: no orphans, valid indices
    assert df.min() >= 0 and df.max() < len(dv)
    assert len(np.unique(df)) == len(dv)

    # no degenerate faces
    assert (
        (df[:, 0] != df[:, 1]) & (df[:, 1] != df[:, 2]) & (df[:, 0] != df[:, 2])
    ).all()

    # closed stays closed
    assert _watertight(f)
    assert _watertight(df)

    # Euler characteristic of a sphere survives decimation
    ne = len(np.unique(np.sort(_directed_edges(df), axis=1), axis=0))
    assert len(dv) - ne + len(df) == 2

    # geometric error, both directions (Hausdorff-style):
    # (a) every decimated vertex stays near the analytic sphere
    r = np.linalg.norm(dv - 0.5, axis=1)
    cell = 1.0 / RES
    assert np.abs(r - RADIUS).max() < 3.5 * cell
    # (b) the original surface stays near the decimated mesh: sample the
    # original vertices against decimated-vertex proximity (conservative —
    # point-to-vertex upper-bounds point-to-surface)
    from scipy.spatial import cKDTree

    d = cKDTree(dv).query(v, k=1)[0]
    # coarser mesh: nearest-vertex spacing grows ~1/sqrt(ratio)
    assert d.max() < 6.0 * cell / np.sqrt(ratio)


def test_decimate_fused_normals_match_recompute(sphere_mesh):
    v, f = sphere_mesh
    dv, df, n = decimate(v, f, target_ratio=0.4, return_normals=True)
    from sculptmate_tpu.geometry.mesh import Mesh

    expect = Mesh(dv.copy(), np.asarray(df, np.int64)).v_nrm
    assert np.allclose(n, expect, atol=1e-5)
    # outward on a sphere: normal aligns with the radial direction
    radial = dv - 0.5
    radial /= np.linalg.norm(radial, axis=1, keepdims=True)
    cos = (n * radial).sum(axis=1)
    assert (cos > 0.5).mean() > 0.99


def test_decimate_preserves_input(sphere_mesh):
    v, f = sphere_mesh
    v0, f0 = v.copy(), f.copy()
    decimate(v, f, target_ratio=0.3)
    assert np.array_equal(v, v0) and np.array_equal(f, f0)
