"""MT wire format: device pack -> native host reconstruction must reproduce
the device marching-tets mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sculptmate_tpu.geometry import mt_wire
from sculptmate_tpu.geometry.marching_tets import (
    lattice_size,
    marching_tets,
    mt_wire_device,
)


def _sphere_sdf(res, r=0.3):
    N = lattice_size(res)
    g = np.arange(N) / res
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    return (
        r - np.sqrt((X - 0.5) ** 2 + (Y - 0.5) ** 2 + (Z - 0.5) ** 2)
    ).ravel().astype(np.float32)


def _canon(faces):
    """Rotate each face so its smallest vid is first (winding preserved),
    then sort rows — face ORDER differs between device (block-major) and
    host (cube-major) reconstruction."""
    f = np.asarray(faces, np.int64)
    k = np.argmin(f, axis=1)
    rows = np.arange(len(f))[:, None]
    rot = np.stack([f[rows[:, 0], (k + s) % 3] for s in range(3)], axis=1)
    order = np.lexsort((rot[:, 2], rot[:, 1], rot[:, 0]))
    return rot[order]


def _blockmajor_perm_mt(sdf, res):
    """Exact permutation between the wire's BLOCK-MAJOR vertex numbering and
    the packed path's class-major z-order numbering, derived from the sdf
    with the shared conventions (padded lattice, 7 edge classes).

    Returns ``perm`` with wire vertex k == z-order vertex ``perm[k]``."""
    from sculptmate_tpu.geometry.mt_tables import EDGE_DIRS

    N = lattice_size(res)
    Np = -(-N // 8) * 8
    occ = np.zeros((Np, Np, Np), bool)
    occ[:N, :N, :N] = sdf.reshape(N, N, N) > 0
    ar = np.arange(Np)
    masks = []
    for d in range(7):
        dx, dy, dz = (int(v) for v in EDGE_DIRS[d])
        m = occ != np.roll(occ, (-dx, -dy, -dz), (0, 1, 2))
        dom = (
            (ar[:, None, None] < N - dx)
            & (ar[None, :, None] < N - dy)
            & (ar[None, None, :] < N - dz)
        )
        masks.append(m & dom)

    n3p = Np**3
    nb = Np // 8

    def blocked(m):
        return (
            m.reshape(nb, 8, nb, 8, nb, 8)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(-1, 512)
        )

    mask_z = np.concatenate([m.ravel() for m in masks])
    zvid = np.cumsum(mask_z) - 1
    idx3 = np.arange(n3p).reshape(Np, Np, Np)
    bidx = np.concatenate([blocked(idx3).ravel() + d * n3p for d in range(7)])
    sel = np.concatenate([blocked(m).ravel() for m in masks])
    return zvid[bidx[sel]]


def _assert_wire_matches_device(sdf, res, wv, wf, dv, df, tol=2e-4):
    perm = _blockmajor_perm_mt(sdf, res)
    assert len(perm) == len(wv) == len(dv)
    assert np.max(np.abs(wv - dv[perm])) < tol
    inv = np.empty(len(perm), np.int64)
    inv[perm] = np.arange(len(perm))
    assert np.array_equal(_canon(wf), _canon(inv[np.asarray(df, np.int64)]))


def _device_mesh(sdf, deform, res, mv=60000, mf=120000):
    dx = dy = dz = None
    if deform is not None:
        dx, dy, dz = (jnp.asarray(deform[:, c]) for c in range(3))
    r = jax.jit(marching_tets, static_argnums=(4, 5, 6))(
        jnp.asarray(sdf), dx, dy, dz, res, mv, mf
    )
    nv, nf = int(r.num_verts), int(r.num_faces)
    assert nv <= mv and nf <= mf
    verts = np.stack(
        [np.asarray(r.vx[:nv]), np.asarray(r.vy[:nv]), np.asarray(r.vz[:nv])], -1
    )
    faces = np.stack(
        [np.asarray(r.fa[:nf]), np.asarray(r.fb[:nf]), np.asarray(r.fc[:nf])], -1
    )
    return verts, faces


def _wire_mesh(sdf, deform, res, mv=60000):
    dx = dy = dz = None
    if deform is not None:
        dx, dy, dz = (jnp.asarray(deform[:, c]) for c in range(3))
    wire = np.asarray(
        jax.jit(mt_wire_device, static_argnums=(4, 5, 6))(
            jnp.asarray(sdf), dx, dy, dz, res, mv, 0
        )
    )
    return mt_wire.decode_wire(wire, res, mv)


@pytest.mark.parametrize("with_deform", [False, True])
def test_mt_wire_matches_device(rng, with_deform):
    res = 24
    sdf = _sphere_sdf(res)
    deform = None
    if with_deform:
        N = lattice_size(res)
        deform = rng.standard_normal((N**3, 3)).astype(np.float32)

    dv, df = _device_mesh(sdf, deform, res)
    wv, wf, counts = _wire_mesh(sdf, deform, res)

    # uint16 quantization over ~1.008 range; wire ids are block-major
    _assert_wire_matches_device(sdf, res, wv, wf, dv, df)


def test_mt_wire_noise(rng):
    res = 16
    N = lattice_size(res)
    sdf = rng.standard_normal(N**3).astype(np.float32)
    dv, df = _device_mesh(sdf, None, res, mv=120000, mf=240000)
    wv, wf, _ = _wire_mesh(sdf, None, res, mv=120000)
    assert len(wv) == len(dv) > 100
    _assert_wire_matches_device(sdf, res, wv, wf, dv, df)


def test_mt_wire_empty():
    res = 8
    N = lattice_size(res)
    sdf = -np.ones(N**3, np.float32)
    wv, wf, _ = _wire_mesh(sdf, None, res, mv=4096)
    assert len(wv) == 0 and len(wf) == 0


def test_mt_wire_overflow_detected():
    res = 16
    sdf = _sphere_sdf(res)
    wire = np.asarray(
        jax.jit(mt_wire_device, static_argnums=(4, 5, 6))(
            jnp.asarray(sdf), None, None, None, res, 64, 0
        )
    )
    with pytest.raises(OverflowError):
        mt_wire.decode_wire(wire, res, 64)


def _edge_pairing(faces):
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    fwd = set(map(tuple, e.tolist()))
    unpaired = sum((b, a) not in fwd for a, b in fwd)
    return unpaired


def test_mt_wire_snap_weld(rng):
    """Device snap_eps + decoder weld: fewer verts/faces, closed stays
    closed, displacement bounded by the snap radius, raw count preserved."""
    res = 32
    sdf = _sphere_sdf(res)
    N = lattice_size(res)
    deform = rng.standard_normal((N**3, 3)).astype(np.float32)
    dx, dy, dz = (jnp.asarray(deform[:, c]) for c in range(3))

    mv = 60000
    eps = 0.25
    wire0 = np.asarray(
        jax.jit(mt_wire_device, static_argnums=(4, 5, 6))(
            jnp.asarray(sdf), dx, dy, dz, res, mv, 0
        )
    )
    v0, f0, c0 = mt_wire.decode_wire(wire0, res, mv)

    wire = np.asarray(
        jax.jit(mt_wire_device, static_argnums=(4, 5, 6))(
            jnp.asarray(sdf), dx, dy, dz, res, mv, 0, (), eps
        )
    )
    v1, f1, c1 = mt_wire.decode_wire(wire, res, mv, weld=True)

    # counts[0] still reports the RAW vertex count (budget semantics)
    assert int(c1[0]) == int(c0[0]) == len(v0)
    # the weld actually removed something, and meaningfully so at eps=0.25
    assert len(v1) < len(v0) and len(f1) < len(f0)
    assert len(f1) < 0.95 * len(f0)
    # face ids reference the compacted vertex array exactly
    assert f1.max() == len(v1) - 1
    assert len(np.unique(f1)) == len(v1)  # no orphan vertices survive
    # no degenerate faces
    assert (
        (f1[:, 0] != f1[:, 1]) & (f1[:, 1] != f1[:, 2]) & (f1[:, 0] != f1[:, 2])
    ).all()
    # closed stays closed (every directed edge has its reverse)
    assert _edge_pairing(f0) == 0
    assert _edge_pairing(f1) == 0
    # displacement bound, both directions: a snapped vertex moves by at most
    # eps * deformed_edge_len; with tanh deform each endpoint shifts <=
    # sqrt(3)/res, so deformed edges are <= 3*sqrt(3)/res long
    from scipy.spatial import cKDTree

    bound = eps * 3 * np.sqrt(3) / res + 1e-3
    d = cKDTree(v0).query(v1, k=1)[0]
    assert d.max() <= bound
    dsurf = cKDTree(v1).query(v0, k=1)[0]
    assert dsurf.max() <= bound


def test_mt_wire_snap_zero_is_noop(rng):
    """snap_eps=0.0 must reproduce the unsnapped wire bit-for-bit (the
    production jit passes a TRACED eps; 0.0 selects the raw path)."""
    res = 16
    sdf = _sphere_sdf(res)
    mv = 20000
    w0 = np.asarray(
        jax.jit(mt_wire_device, static_argnums=(4, 5, 6))(
            jnp.asarray(sdf), None, None, None, res, mv, 0
        )
    )
    w1 = np.asarray(
        jax.jit(mt_wire_device, static_argnums=(4, 5, 6))(
            jnp.asarray(sdf), None, None, None, res, mv, 0, (), jnp.float32(0.0)
        )
    )
    assert np.array_equal(w0, w1)


def test_vertex_normals_native_matches_numpy(rng):
    from sculptmate_tpu.geometry.decimate import vertex_normals
    from sculptmate_tpu.geometry.mesh import Mesh

    res = 16
    sdf = _sphere_sdf(res)
    v, f, _ = _wire_mesh(sdf, None, res, mv=20000)
    n_native = vertex_normals(v, f)
    n_numpy = Mesh(v.copy(), np.asarray(f, np.int64)).v_nrm
    assert np.allclose(n_native, n_numpy, atol=1e-6)
