"""Mesh decimation: quadric edge collapse (C++), vertex clustering fallback.

Fills two reference roles: the live SF3D vertex-budget reduction
(gpytoolbox.decimate at ``sf3d/models/mesh.py:195-199``) and the offline
quadric decimator (``mesh_simplify.py`` — same algorithm family: quadric
error metrics + threshold-sweep edge collapse with flip prevention).
"""

from __future__ import annotations

import ctypes
from typing import Tuple

import numpy as np

from sculptmate_tpu.geometry.native import load_native


def decimate(
    verts: np.ndarray,
    faces: np.ndarray,
    target_ratio: float = 0.5,
    aggressiveness: float = 7.0,
    return_normals: bool = False,
):
    """Reduce face count to ~target_ratio. Returns (verts, faces) or, with
    ``return_normals``, (verts, faces, vertex_normals) — the normals come
    out of the native compaction stream for ~free (vs a separate host
    bincount pass) with ``Mesh._compute_vertex_normal`` semantics."""
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    if target_ratio >= 1.0 or len(faces) < 8:
        if return_normals:
            from sculptmate_tpu.geometry.mesh import Mesh

            return verts, faces, Mesh(verts, faces).v_nrm
        return verts, faces

    lib = load_native("quadric_decimate")
    if lib is not None:
        return _decimate_native(
            lib, verts, faces, target_ratio, aggressiveness, return_normals
        )
    import warnings

    warnings.warn(
        "native quadric_decimate unavailable - falling back to uniform vertex "
        "clustering (noticeably lower output quality; check that g++ can "
        "build geometry/native/quadric_decimate.cpp)",
        RuntimeWarning,
        stacklevel=2,
    )
    v, f = _decimate_cluster(verts, faces, target_ratio)
    if return_normals:
        from sculptmate_tpu.geometry.mesh import Mesh

        return v, f, Mesh(v, f).v_nrm
    return v, f


def vertex_normals(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals (``Mesh._compute_vertex_normal``
    semantics) via the native kernel; numpy fallback when unavailable.
    For meshes that skip decimation (e.g. the snap-weld already hit the
    vertex budget) but still need normals on the hot path."""
    verts = np.ascontiguousarray(verts, np.float32)
    faces32 = np.ascontiguousarray(faces, np.int32)
    lib = load_native("quadric_decimate")
    if lib is None or not hasattr(lib, "mesh_vertex_normals"):
        from sculptmate_tpu.geometry.mesh import Mesh

        return Mesh(verts, np.asarray(faces, np.int64)).v_nrm
    fn = lib.mesh_vertex_normals
    if not getattr(lib, "_normals_configured", False):
        fn.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        fn.restype = None
        lib._normals_configured = True
    out = np.empty_like(verts)
    fn(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(verts),
        faces32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(faces32),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def _decimate_native(
    lib, verts, faces, target_ratio, aggressiveness, return_normals=False
):
    # stale-ABI guard: the out_normals arg landed in the same rebuild as the
    # mesh_vertex_normals symbol. A pre-normals .so surviving the mtime check
    # (preserved-mtime installs) exports quadric_decimate with one fewer
    # param — cdecl would silently leave out_nrm as uninitialized memory.
    if return_normals and not hasattr(lib, "mesh_vertex_normals"):
        v, f = _decimate_native(
            lib, verts, faces, target_ratio, aggressiveness, False
        )
        from sculptmate_tpu.geometry.mesh import Mesh

        return v, f, Mesh(v, f).v_nrm
    fn = lib.quadric_decimate
    fn.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_float),
    ]
    fn.restype = None

    nv, nf = len(verts), len(faces)
    out_verts = np.empty_like(verts)
    out_faces = np.empty_like(faces)
    out_nrm = np.empty_like(verts) if return_normals else None
    out_nv = ctypes.c_int64(0)
    out_nf = ctypes.c_int64(0)
    fn(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nv,
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), nf,
        float(target_ratio), float(aggressiveness),
        out_verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(out_nv),
        out_faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.byref(out_nf),
        out_nrm.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        if out_nrm is not None
        else ctypes.POINTER(ctypes.c_float)(),
    )
    v = out_verts[: out_nv.value].copy()
    f = out_faces[: out_nf.value].astype(np.int64).copy()
    if return_normals:
        return v, f, out_nrm[: out_nv.value].copy()
    return v, f


def _decimate_cluster(verts, faces, target_ratio):
    """Fallback: uniform vertex clustering to roughly hit the budget."""
    target_verts = max(4, int(len(verts) * target_ratio))
    res = max(2, int(np.ceil(target_verts ** (1.0 / 3.0)) * 2))
    lo = verts.min(0)
    span = np.maximum(verts.max(0) - lo, 1e-12)
    cell = np.clip(((verts - lo) / span * (res - 1)).astype(np.int64), 0, res - 1)
    key = (cell[:, 0] * res + cell[:, 1]) * res + cell[:, 2]
    uniq, inv = np.unique(key, return_inverse=True)
    new_verts = np.zeros((len(uniq), 3), np.float64)
    counts = np.bincount(inv, minlength=len(uniq)).astype(np.float64)
    for c in range(3):
        new_verts[:, c] = np.bincount(inv, weights=verts[:, c], minlength=len(uniq))
    new_verts /= counts[:, None]
    new_faces = inv[faces]
    good = (
        (new_faces[:, 0] != new_faces[:, 1])
        & (new_faces[:, 1] != new_faces[:, 2])
        & (new_faces[:, 0] != new_faces[:, 2])
    )
    return new_verts.astype(np.float32), new_faces[good].astype(np.int64)
