"""Wire-format extraction: device pack -> host (C++/numpy) reconstruction
must reproduce the device marching-cubes mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sculptmate_tpu.geometry import mc_wire
from sculptmate_tpu.geometry.marching_cubes import (
    marching_cubes,
    mc_wire_device,
    pack_bits_u8,
)


def _sphere(R, r=0.35):
    g = (np.arange(R) + 0.5) / R
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    return (
        r - np.sqrt((X - 0.5) ** 2 + (Y - 0.5) ** 2 + (Z - 0.5) ** 2)
    ).astype(np.float32)


def _reference_mesh(level, mv, mf):
    res = jax.jit(marching_cubes, static_argnums=(1, 2, 3, 4))(
        jnp.asarray(level), mv, mf, 0, True  # dense path = cell-major order
    )
    nv, nf = int(res.num_verts), int(res.num_faces)
    assert nv <= mv and nf <= mf
    verts = np.stack(
        [np.asarray(res.vx[:nv]), np.asarray(res.vy[:nv]), np.asarray(res.vz[:nv])],
        axis=-1,
    )
    faces = np.stack(
        [np.asarray(res.fa[:nf]), np.asarray(res.fb[:nf]), np.asarray(res.fc[:nf])],
        axis=-1,
    )
    return verts, faces


def _color_fn(vx, vy, vz, valid):
    scale = 1.0 / 64.0
    return vx * scale, vy * scale, vz * scale


def _blockmajor_perm(level):
    """Exact permutation between the wire's BLOCK-MAJOR vertex numbering and
    the packed path's flat z-order numbering, derived from the level field
    with the shared conventions (valid_x = x < RX-1).

    Returns ``perm`` with wire vertex k == z-order vertex ``perm[k]``."""
    RX, RY, RZ = level.shape
    inside = level > 0
    masks = []
    mx = np.zeros(level.shape, bool)
    mx[: RX - 1] = inside[:-1] != inside[1:]
    masks.append(mx)
    my = np.zeros(level.shape, bool)
    my[:, : RY - 1] = inside[:, :-1] != inside[:, 1:]
    masks.append(my)
    mz = np.zeros(level.shape, bool)
    mz[:, :, : RZ - 1] = inside[:, :, :-1] != inside[:, :, 1:]
    masks.append(mz)

    n3 = RX * RY * RZ
    nbx, nby, nbz = RX // 8, RY // 8, RZ // 8

    def blocked(m):
        return (
            m.reshape(nbx, 8, nby, 8, nbz, 8)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(nbx * nby * nbz, 512)
        )

    mask_z = np.concatenate([m.ravel() for m in masks])
    zvid = np.cumsum(mask_z) - 1  # z-order vid at each flat slot
    idx3 = np.arange(n3).reshape(level.shape)
    bidx = np.concatenate(
        [blocked(idx3).ravel() + a * n3 for a in range(3)]
    )  # block-major slot -> flat z slot
    sel = np.concatenate([blocked(m).ravel() for m in masks])
    return zvid[bidx[sel]]


def _assert_wire_matches_zorder(level, verts, faces, ref_v, ref_f, tol=2e-4):
    """Wire mesh == packed (z-order) mesh under the analytic permutation:
    positions within u16-t quantization, faces identical after remap."""
    assert verts.shape == ref_v.shape
    assert faces.shape == ref_f.shape
    perm = _blockmajor_perm(level)
    assert len(perm) == len(verts)
    assert np.max(np.abs(verts - ref_v[perm])) < tol
    inv = np.empty(len(perm), np.int64)
    inv[perm] = np.arange(len(perm))
    assert np.array_equal(np.asarray(faces, np.int64), inv[np.asarray(ref_f, np.int64)])
    return perm


def _roundtrip(level, mv=20000, mf=40000):
    wire = np.asarray(
        jax.jit(mc_wire_device, static_argnums=(1, 2, 4))(
            jnp.asarray(level), mv, 0, None, _color_fn
        )
    )
    return mc_wire.decode_wire(wire, level.shape, mv)


def test_pack_bits_u8():
    rng = np.random.default_rng(0)
    flags = rng.random(1024) > 0.5
    packed = np.asarray(pack_bits_u8(jnp.asarray(flags)))
    assert np.array_equal(np.unpackbits(packed, bitorder="little"), flags)


@pytest.mark.parametrize("shape", [(32, 32, 32), (40, 32, 24)])
def test_wire_matches_device_mc(shape):
    R = shape[0]
    g = [(np.arange(s) + 0.5) / max(shape) for s in shape]
    X, Y, Z = np.meshgrid(*g, indexing="ij")
    level = (
        0.3 - np.sqrt((X - 0.35) ** 2 + (Y - 0.3) ** 2 + (Z - 0.25) ** 2)
    ).astype(np.float32)

    verts, faces, colors, counts = _roundtrip(level)
    ref_v, ref_f = _reference_mesh(level, 20000, 40000)

    _assert_wire_matches_zorder(level, verts, faces, ref_v, ref_f)
    # colors come back as uint8 of the position-based color_fn
    expect = np.clip(np.round(verts / 64.0 * 255), 0, 255) / 255.0
    assert np.max(np.abs(colors - expect)) < 2e-3


def test_wire_noise_field(rng):
    level = rng.standard_normal((32, 32, 32)).astype(np.float32)
    verts, faces, colors, counts = _roundtrip(level, mv=80000, mf=160000)
    ref_v, ref_f = _reference_mesh(level, 80000, 160000)
    _assert_wire_matches_zorder(level, verts, faces, ref_v, ref_f)
    assert len(verts) > 1000


def test_wire_sparse_field_mxu_branch():
    """Isolated inside-voxels: <= 6 cut edges per 8^3 block, far below the
    K=64 per-row width -> exercises the one-hot (MXU) compaction branch of
    ``_vertex_side_wire``; the 50%-cut noise of ``test_wire_noise_field``
    exercises the direct-scatter fallback."""
    level = -np.ones((32, 32, 32), np.float32)
    r = np.random.default_rng(3)
    pts = r.integers(2, 30, (40, 3))
    level[pts[:, 0], pts[:, 1], pts[:, 2]] = 1.0
    verts, faces, colors, counts = _roundtrip(level, mv=4096, mf=8192)
    ref_v, ref_f = _reference_mesh(level, 4096, 8192)
    assert len(verts) > 0
    _assert_wire_matches_zorder(level, verts, faces, ref_v, ref_f)


def test_wire_empty():
    level = -np.ones((16, 16, 16), np.float32)
    verts, faces, colors, counts = _roundtrip(level, mv=1024, mf=2048)
    assert len(verts) == 0 and len(faces) == 0


def test_wire_without_colors():
    level = _sphere(32)
    mv = 20000
    wire = np.asarray(
        jax.jit(mc_wire_device, static_argnums=(1, 2, 4))(
            jnp.asarray(level), mv, 0, None, None
        )
    )
    v1, f1, _, _ = mc_wire.decode_wire(wire, level.shape, mv, has_colors=False)
    ref_v, ref_f = _reference_mesh(level, mv, 40000)
    _assert_wire_matches_zorder(level, v1, f1, ref_v, ref_f)
    # colorless wire is 3 * mv bytes smaller
    o = mc_wire.wire_layout(level.shape, mv, mc_wire.N_WIRE_COUNTS, False)
    assert wire.size == o[-1]


def test_wire_numpy_fallback_matches_native():
    level = _sphere(32)
    mv = 20000
    wire = np.asarray(
        jax.jit(mc_wire_device, static_argnums=(1, 2, 4))(
            jnp.asarray(level), mv, 0, None, _color_fn
        )
    )
    v1, f1, c1, _ = mc_wire.decode_wire(wire, level.shape, mv)
    o = mc_wire.wire_layout(level.shape, mv, mc_wire.N_WIRE_COUNTS)
    occ, t_lo, t_hi = wire[: o[1]], wire[o[1] : o[2]], wire[o[2] : o[3]]
    cr, cg, cb = wire[o[3] : o[4]], wire[o[4] : o[5]], wire[o[5] : o[6]]
    counts = mc_wire.wire_counts(wire, mc_wire.N_WIRE_COUNTS)
    v2, f2, c2, _ = mc_wire._decode_numpy(
        occ, t_lo, t_hi, cr, cg, cb, level.shape, int(counts[0]), counts
    )
    assert np.array_equal(f1, f2)
    assert np.allclose(v1, v2)
    assert np.allclose(c1, c2)


def test_wire_overflow_detected():
    level = _sphere(32)
    wire = np.asarray(
        jax.jit(mc_wire_device, static_argnums=(1, 2, 4))(
            jnp.asarray(level), 64, 0, None, None
        )
    )
    with pytest.raises(OverflowError):
        mc_wire.decode_wire(wire, level.shape, 64, has_colors=False)
