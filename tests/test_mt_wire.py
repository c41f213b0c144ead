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

    assert len(wv) == len(dv)
    # same vid order on both sides; uint16 quantization over ~1.008 range
    assert np.max(np.abs(wv - dv)) < 2e-4
    assert np.array_equal(_canon(wf), _canon(df))


def test_mt_wire_noise(rng):
    res = 16
    N = lattice_size(res)
    sdf = rng.standard_normal(N**3).astype(np.float32)
    dv, df = _device_mesh(sdf, None, res, mv=120000, mf=240000)
    wv, wf, _ = _wire_mesh(sdf, None, res, mv=120000)
    assert len(wv) == len(dv) > 100
    assert np.max(np.abs(wv - dv)) < 2e-4
    assert np.array_equal(_canon(wf), _canon(df))


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
