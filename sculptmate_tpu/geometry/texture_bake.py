"""Texture baking: UV rasterization + attribute interpolation + island padding.

Device (XLA) replacement for the reference's C++ ``texture_baker.dll``
(``sf3d/texture_baker/baker.py:12-141``), following the *vectorized* spec the
reference ships alongside the DLL (``texture_baker/common.py:144-211``): for
every texel, barycentric point-in-triangle tests against candidate faces; the
lowest-index covering face wins; output is barycentrics + face id. That
formulation is embarrassingly parallel per texel — exactly what the TPU wants
— where the DLL's BVH walk is not.

Layout notes: the rasterization buffer is kept channels-first (4, res, res)
on device; face data enters as flat SoA arrays. Pixels map to UV like the
reference: pixel (y, x) -> (x/res, 1 - y/res)... the torch spec uses
linspace(0,1) pixel centers at cell corners; we follow the torch version
(linspace over [0, 1]).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _rasterize_core(u0, v0, u1, v1, u2, v2, resolution: int, row_chunk: int):
    """SoA triangle corner UVs (F,) each -> (4, res, res) [bu, bv, bw, tid].

    Double-chunked: lax.map over pixel-row chunks, fori_loop over face
    chunks with a running lowest-face-id merge — peak intermediate is
    (row_chunk, res, face_chunk), never O(res^2 * F) (the dense version
    tried to allocate 64 GB at 512^2 x 65K faces).
    """
    F = u0.shape[0]
    FACE_CHUNK = min(F, 8192)
    # sort faces by their min-v so each pixel-row chunk only visits the face
    # chunks whose v-range overlaps it (winner selection is by min original
    # face id, so processing order does not change the result)
    vmin_f = jnp.minimum(jnp.minimum(v0, v1), v2)
    vmax_f = jnp.maximum(jnp.maximum(v0, v1), v2)
    order = jnp.argsort(vmin_f)
    fid_sorted = order.astype(jnp.int32)
    u0, v0, u1, v1, u2, v2, vmin_f, vmax_f = (
        a[order] for a in (u0, v0, u1, v1, u2, v2, vmin_f, vmax_f)
    )

    # pad faces to a chunk multiple with degenerates that never overlap
    Fp = -(-F // FACE_CHUNK) * FACE_CHUNK
    padf = lambda a: jnp.pad(a, (0, Fp - F))
    u0p, v0p, u1p, v1p, u2p, v2p = map(padf, (u0, v0, u1, v1, u2, v2))
    fid_p = jnp.pad(fid_sorted, (0, Fp - F), constant_values=2**30)
    vmin_p = jnp.pad(vmin_f, (0, Fp - F), constant_values=jnp.inf)
    vmax_p = jnp.pad(vmax_f, (0, Fp - F), constant_values=-jnp.inf)
    n_fchunks = Fp // FACE_CHUNK
    chunk_vlo = vmin_p.reshape(n_fchunks, FACE_CHUNK).min(axis=1)
    chunk_vhi = vmax_p.reshape(n_fchunks, FACE_CHUNK).max(axis=1)

    px = jnp.linspace(0.0, 1.0, resolution)
    py_full = jnp.linspace(0.0, 1.0, resolution)

    def do_rows(y0):
        py = jax.lax.dynamic_slice(py_full, (y0 * row_chunk,), (row_chunk,))
        gx = px[None, :, None]
        gy = py[:, None, None]
        row_v0 = py[0]
        row_v1 = py[-1]

        def face_block_body(ci, state):
            best_id, best_bu, best_bv, best_bw = state
            sl = lambda a: jax.lax.dynamic_slice(a, (ci * FACE_CHUNK,), (FACE_CHUNK,))
            fu0, fv0, fu1, fv1, fu2, fv2 = map(sl, (u0p, v0p, u1p, v1p, u2p, v2p))
            fid_chunk = sl(fid_p)
            e1u, e1v = fu1 - fu0, fv1 - fv0
            e2u, e2v = fu2 - fu0, fv2 - fv0
            d00 = e1u * e1u + e1v * e1v
            d01 = e1u * e2u + e1v * e2v
            d11 = e2u * e2u + e2v * e2v
            denom = d00 * d11 - d01 * d01
            denom_safe = jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)

            pu = gx - fu0[None, None, :]  # (rows, res, FACE_CHUNK)
            pv = gy - fv0[None, None, :]
            d20 = pu * e1u + pv * e1v
            d21 = pu * e2u + pv * e2v
            bv = (d11 * d20 - d01 * d21) / denom_safe
            bw = (d00 * d21 - d01 * d20) / denom_safe
            bu = 1.0 - bv - bw
            fid = fid_chunk[None, None, :]
            inside = (
                (bu >= 0) & (bv >= 0) & (bw >= 0)
                & (jnp.abs(denom) >= 1e-12)
                & (fid < F)
            )
            cand = jnp.where(inside, fid, jnp.int32(2**30))
            loc = jnp.argmin(cand, axis=-1)  # first covering face in chunk
            take = lambda arr: jnp.take_along_axis(arr, loc[..., None], -1)[..., 0]
            cid = take(cand)
            better = cid < best_id
            return (
                jnp.where(better, cid, best_id),
                jnp.where(better, take(bu), best_bu),
                jnp.where(better, take(bv), best_bv),
                jnp.where(better, take(bw), best_bw),
            )

        eps = 1.0 / resolution

        def face_block(ci, state):
            overlap = (chunk_vlo[ci] <= row_v1 + eps) & (chunk_vhi[ci] >= row_v0 - eps)
            return jax.lax.cond(
                overlap, lambda s: face_block_body(ci, s), lambda s: s, state
            )

        init = (
            jnp.full((row_chunk, resolution), 2**30, jnp.int32),
            jnp.zeros((row_chunk, resolution), jnp.float32),
            jnp.zeros((row_chunk, resolution), jnp.float32),
            jnp.zeros((row_chunk, resolution), jnp.float32),
        )
        best_id, bu, bv, bw = jax.lax.fori_loop(0, n_fchunks, face_block, init)
        hit = best_id < 2**30
        out = jnp.stack(
            [
                jnp.where(hit, bu, 0.0),
                jnp.where(hit, bv, 0.0),
                jnp.where(hit, bw, 0.0),
                jnp.where(hit, best_id.astype(jnp.float32), -1.0),
            ]
        )
        return out  # (4, rows, res)

    n_chunks = resolution // row_chunk
    rows = jax.lax.map(do_rows, jnp.arange(n_chunks))  # (n, 4, rows, res)
    return jnp.transpose(rows, (1, 0, 2, 3)).reshape(4, resolution, resolution)


_rasterize_jit = jax.jit(_rasterize_core, static_argnums=(6, 7))


def _pick_row_chunk(resolution: int, n_faces: int) -> int:
    # bound the (rows, res, face_chunk) intermediate to ~64M elements
    fc = min(max(n_faces, 1), 8192)
    rc = max(1, min(64, (64 * 1024 * 1024) // (resolution * fc)))
    while resolution % rc:
        rc -= 1
    return rc


def rasterize_device(u0, v0, u1, v1, u2, v2, resolution: int) -> jnp.ndarray:
    """Trace-friendly rasterize: SoA per-corner UVs already on device."""
    F = u0.shape[0]
    row_chunk = _pick_row_chunk(resolution, F)
    return _rasterize_core(u0, v0, u1, v1, u2, v2, resolution, row_chunk)


def interpolate_device(attr_cf: jnp.ndarray, rast: jnp.ndarray, fa, fb, fc) -> jnp.ndarray:
    """Trace-friendly interpolate: attr (K, Nv) channels-first on device,
    face corner ids as flat arrays. Returns (K, res, res)."""
    res = rast.shape[-1]
    tid = jnp.maximum(rast[3].astype(jnp.int32), 0).ravel()
    valid = (rast[3] >= 0).ravel()
    out = (
        attr_cf[:, fa[tid]] * rast[0].ravel()[None, :]
        + attr_cf[:, fb[tid]] * rast[1].ravel()[None, :]
        + attr_cf[:, fc[tid]] * rast[2].ravel()[None, :]
    )
    out = jnp.where(valid[None, :], out, 0.0)
    return out.reshape(-1, res, res)


def rasterize(uv: np.ndarray, faces: np.ndarray, resolution: int) -> jnp.ndarray:
    """uv (Nv, 2), faces (F, 3) -> (4, res, res) device array."""
    uv = np.asarray(uv, np.float32)
    faces = np.asarray(faces)
    tri = uv[faces]  # (F, 3, 2)
    row_chunk = _pick_row_chunk(resolution, len(faces))
    return _rasterize_jit(
        jnp.asarray(tri[:, 0, 0]),
        jnp.asarray(tri[:, 0, 1]),
        jnp.asarray(tri[:, 1, 0]),
        jnp.asarray(tri[:, 1, 1]),
        jnp.asarray(tri[:, 2, 0]),
        jnp.asarray(tri[:, 2, 1]),
        resolution,
        row_chunk,
    )


def get_mask(rast: jnp.ndarray) -> jnp.ndarray:
    """(res, res) bool: texels covered by any face (``baker.py:59-69``)."""
    return rast[3] >= 0


def interpolate(attr: np.ndarray, rast: jnp.ndarray, faces: np.ndarray) -> jnp.ndarray:
    """Interpolate per-vertex attributes into the atlas.

    attr (Nv, K), faces (F, 3), rast (4, res, res) -> (K, res, res)
    channels-first device array; invalid texels are 0.
    """
    attr = jnp.asarray(np.asarray(attr, np.float32))
    fa = jnp.asarray(np.asarray(faces[:, 0], np.int32))
    fb = jnp.asarray(np.asarray(faces[:, 1], np.int32))
    fc = jnp.asarray(np.asarray(faces[:, 2], np.int32))

    @jax.jit
    def run(attr, rast, fa, fb, fc):
        res = rast.shape[-1]
        tid = jnp.maximum(rast[3].astype(jnp.int32), 0).ravel()
        valid = (rast[3] >= 0).ravel()
        out = (
            attr[fa[tid]] * rast[0].ravel()[:, None]
            + attr[fb[tid]] * rast[1].ravel()[:, None]
            + attr[fc[tid]] * rast[2].ravel()[:, None]
        )
        out = jnp.where(valid[:, None], out, 0.0)
        return jnp.transpose(out, (1, 0)).reshape(-1, res, res)

    return run(attr, rast, fa, fb, fc)


def dilate_fill(img: jnp.ndarray, mask: jnp.ndarray, iterations: int) -> jnp.ndarray:
    """UV island edge padding (``sf3d/models/utils.py:96-133``): iteratively
    propagate valid border colors outward into the empty region.

    img: (K, res, res), mask: (res, res) bool valid. Returns (K, res, res).
    """

    @functools.partial(jax.jit, static_argnums=(2,))
    def run(img, mask, iterations):
        def body(_, state):
            img, mask = state
            m = mask.astype(img.dtype)[None]
            # 3x3 neighborhood sum of valid colors / counts
            k = jnp.ones((3, 3), img.dtype)

            def conv2(x):
                return jax.lax.conv_general_dilated(
                    x[:, None],  # (K, 1, H, W)
                    k[None, None],
                    (1, 1),
                    "SAME",
                )[:, 0]

            neigh_sum = conv2(img * m)
            neigh_cnt = conv2(jnp.broadcast_to(m, img.shape))
            fill = neigh_sum / jnp.maximum(neigh_cnt, 1.0)
            new_mask = neigh_cnt[0] > 0
            img = jnp.where(mask[None], img, fill)
            return img, mask | new_mask

        img, mask = jax.lax.fori_loop(0, iterations, body, (img, mask))
        return img

    return run(img, mask, max(int(iterations), 1))


def float32_to_uint8(
    arr: np.ndarray, dither: bool = True, dither_mask: np.ndarray | None = None, seed: int = 0
) -> np.ndarray:
    """Quantize [0,1] float image to uint8 with optional dithering
    (``sf3d/models/utils.py:136-149``)."""
    arr = np.clip(np.asarray(arr, np.float32), 0.0, 1.0)
    if dither:
        rng = np.random.default_rng(seed)
        noise = (rng.random(arr.shape, dtype=np.float32) - 0.5) / 255.0
        if dither_mask is not None:
            noise = noise * (1.0 - dither_mask)
        arr = np.clip(arr + noise, 0.0, 1.0)
    return (arr * 255.0 + 0.5).astype(np.uint8)
