"""UV unwrap: atlas bounds, island separation, native/numpy overlap parity."""

import numpy as np
import jax.numpy as jnp
import pytest

from sculptmate_tpu.geometry.marching_cubes import marching_cubes_host
from sculptmate_tpu.geometry.uv_unwrap import unwrap, assign_atlas_index
from sculptmate_tpu.geometry.mesh import Mesh


def _sphere(R=24, r=0.6):
    g = np.linspace(-1, 1, R)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    level = r - np.sqrt(X**2 + Y**2 + Z**2)
    v, f = marching_cubes_host(jnp.asarray(level, jnp.float32))
    return Mesh(v / (R - 1) * 2 - 1, f)


def test_unwrap_bounds_and_shapes():
    mesh = _sphere()
    uv, idx = unwrap(mesh.v_pos, mesh.v_nrm, mesh.t_pos_idx)
    assert idx.shape == mesh.t_pos_idx.shape
    assert uv.min() >= 0.0 and uv.max() <= 1.0
    assert idx.max() < len(uv)
    # a sphere's cube projection should populate several primary slices
    # (exact layout depends on the overlap pass)
    assert len(np.unique(np.round(uv, 4), axis=0)) == len(uv)


def test_native_vs_numpy_overlap():
    from sculptmate_tpu.geometry import native, uv_unwrap

    mesh = _sphere(16)
    v, n, f = mesh.v_pos, mesh.v_nrm, mesh.t_pos_idx
    v2, n2 = uv_unwrap._align_with_main_axis(v, n)
    face_uv, face_index, vpn = uv_unwrap._box_assign(v2, n2, f)
    face_uv = uv_unwrap._rotate_slices(v2, n2, f, face_uv, face_index)

    got_native = assign_atlas_index(vpn, f, face_uv, face_index)

    real_load = native.load_native
    try:
        native._LIBS["unwrap_overlap"] = None  # force numpy fallback
        got_numpy = assign_atlas_index(vpn, f, face_uv, face_index)
    finally:
        native._LIBS.pop("unwrap_overlap", None)

    # same semantics up to depth tie-breaking (std::sort vs np.argsort
    # stability on a symmetric mesh with many equal depths)
    agree = (got_native == got_numpy).mean()
    assert agree > 0.9, f"native/numpy overlap divergence: {1-agree:.3%}"
    # both must produce valid atlas indices and keep primaries dominant
    for got in (got_native, got_numpy):
        assert set(np.unique(got)) <= set(range(13))
        assert (got < 6).mean() > 0.5


def test_mesh_unwrap_uv_duplicates_vertices():
    mesh = _sphere(16)
    nf = len(mesh.t_pos_idx)
    mesh.unwrap_uv()
    assert len(mesh.v_pos) == 3 * nf
    assert mesh.v_tex.shape == (3 * nf, 2)
    assert np.isfinite(mesh.v_tng).all()


def test_device_unwrap_matches_host_semantics():
    """The device unwrap (one TPU program) must agree with the host path on
    everything except overlap-resolution edge cases (different raster)."""
    from sculptmate_tpu.geometry.uv_unwrap_device import unwrap_device

    mesh = _sphere(16)
    uv_h, idx_h = unwrap(mesh.v_pos, mesh.v_nrm, mesh.t_pos_idx)
    uv_d, idx_d = unwrap_device(mesh.v_pos, mesh.t_pos_idx)

    assert idx_d.shape == mesh.t_pos_idx.shape
    assert uv_d.min() >= 0.0 and uv_d.max() <= 1.0
    assert idx_d.max() < len(uv_d)

    fh = uv_h[idx_h].reshape(-1, 2)
    fd = uv_d[idx_d].reshape(-1, 2)
    d = np.abs(fh - fd)
    # device uses a face-level tangent estimator for the slice rotation
    # (sub-degree angle differences -> few-texel UV shifts) and a different
    # overlap raster; islands must still match for the bulk of corners
    assert np.median(d) < 5e-3
    assert (d.max(axis=1) < 0.05).mean() > 0.8


def test_host_uv_reconstruction_matches_device():
    """The SF3D bake wire ships only atlas_index (1 B/face) + the 12
    per-slice rotation angles; the host rebuilds the per-corner UVs
    (``reconstruct_uvs_host``) from the same dequantized inputs. Against the
    device's own uv6 (u16) the reconstruction must agree to within the u16
    quantization step — it replaces a 12 B/face D2H section bit-comparably."""
    from sculptmate_tpu.geometry.uv_unwrap_device import (
        _unwrap_jit,
        default_multi_capacity,
        default_pair2_capacity,
        RASTER_RES,
        reconstruct_uvs_host,
    )

    mesh = _sphere(16)
    v_pos, faces = mesh.v_pos, mesh.t_pos_idx
    nv, nf = len(v_pos), len(faces)

    # quantize/dequantize exactly like SF3D.unwrap_bake_async/_unwrap_bake_jit
    bb_min = v_pos.min(0).astype(np.float32)
    bb_max = v_pos.max(0).astype(np.float32)
    rng_ = np.maximum(bb_max - bb_min, 1e-12).astype(np.float32)
    q_pos = np.round((v_pos - bb_min) / rng_ * 65535.0).astype(np.uint16)
    scale = ((bb_max - bb_min) / np.float32(65535.0)).astype(np.float32)
    rp = (q_pos.astype(np.float32) * scale + bb_min).astype(np.float32)

    pair_cap = 1 << 16
    caps = (
        pair_cap,
        default_pair2_capacity(RASTER_RES),
        default_multi_capacity(pair_cap),
    )
    pad = 0.02
    uv6, atlas_index, counters, angles = _unwrap_jit(
        *(jnp.asarray(rp.T[c]) for c in range(3)),
        jnp.asarray(faces.T[0].astype(np.int32)),
        jnp.asarray(faces.T[1].astype(np.int32)),
        jnp.asarray(faces.T[2].astype(np.int32)),
        nv, nf, pad, caps,
    )
    fine, coarse, nmulti = (int(x) for x in np.asarray(counters))
    assert fine <= caps[0] and coarse <= caps[1] and nmulti <= caps[2]
    # the atlas byte carries the axis pick in % 6 and the class in // 6
    atlas_np = np.asarray(atlas_index)[:nf]
    assert atlas_np.min() >= 0 and atlas_np.max() < 18

    uv_dev = (
        np.asarray(uv6).T.reshape(-1, 3, 2)[:nf].astype(np.float32) / 65535.0
    )
    ang = np.asarray(angles)
    uv_host = reconstruct_uvs_host(
        rp, faces, atlas_np, ang[0], ang[1], pad
    )
    assert uv_host.shape == (nf, 3, 2)
    assert uv_host.min() >= 0.0 and uv_host.max() <= 1.0
    # device values are u16-rounded; the reconstruction is the pre-quantized
    # float — agreement must be within one quantization step (plus fp noise,
    # far below a bake texel)
    d = np.abs(uv_host - uv_dev)
    assert d.max() < 3e-4, d.max()


def test_native_uv_reconstruction_matches_numpy():
    """The C++ reconstruction kernel must agree with the numpy reference to
    fp ulps on a mesh exercising all three atlas classes (main slices,
    overlap slices, individual squares)."""
    from sculptmate_tpu.geometry.native import load_native
    from sculptmate_tpu.geometry.uv_unwrap_device import (
        reconstruct_uvs_host,
        reconstruct_uvs_numpy,
    )

    if load_native("uv_reconstruct") is None:
        pytest.skip("native toolchain unavailable")

    rng = np.random.default_rng(7)
    mesh = _sphere(16)
    rp = mesh.v_pos.astype(np.float32)
    faces = mesh.t_pos_idx.astype(np.int32)
    nf = len(faces)
    # synthetic atlas bytes covering all classes x indices (0..17, incl.
    # empty overlap slices)
    atlas = (rng.integers(0, 18, nf)).astype(np.int32)
    ang = rng.uniform(-0.2, 0.2, 6).astype(np.float32)
    ca6 = np.cos(ang).astype(np.float32)
    sa6 = np.sin(ang).astype(np.float32)

    got = reconstruct_uvs_host(rp, faces, atlas, ca6, sa6, 0.02)
    ref = reconstruct_uvs_numpy(rp, faces, atlas, ca6, sa6, 0.02)
    np.testing.assert_allclose(got, ref, atol=2e-6)
    assert got.min() >= 0.0 and got.max() <= 1.0
