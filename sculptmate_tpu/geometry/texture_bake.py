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
    """SoA triangle corner UVs (F,) each -> (4, res, res) [bu, bv, bw, tid]."""
    F = u0.shape[0]
    e1u, e1v = u1 - u0, v1 - v0
    e2u, e2v = u2 - u0, v2 - v0
    d00 = e1u * e1u + e1v * e1v
    d01 = e1u * e2u + e1v * e2v
    d11 = e2u * e2u + e2v * e2v
    denom = d00 * d11 - d01 * d01
    denom_safe = jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)

    px = jnp.linspace(0.0, 1.0, resolution)

    def do_rows(y0):
        py = jax.lax.dynamic_slice(
            jnp.linspace(0.0, 1.0, resolution), (y0 * row_chunk,), (row_chunk,)
        )
        # pixel grid (chunk, res)
        gx = px[None, :, None]  # (1, res, 1)
        gy = py[:, None, None]  # (chunk, 1, 1)
        pu = gx - u0[None, None, :]  # (chunk, res, F)
        pv = gy - v0[None, None, :]
        d20 = pu * e1u + pv * e1v
        d21 = pu * e2u + pv * e2v
        bv = (d11 * d20 - d01 * d21) / denom_safe
        bw = (d00 * d21 - d01 * d20) / denom_safe
        bu = 1.0 - bv - bw
        inside = (bu >= 0) & (bv >= 0) & (bw >= 0) & (jnp.abs(denom) >= 1e-12)
        any_inside = jnp.any(inside, axis=-1)
        tid = jnp.argmax(inside, axis=-1)  # first covering face
        take = lambda arr: jnp.take_along_axis(arr, tid[..., None], axis=-1)[..., 0]
        out = jnp.stack(
            [
                jnp.where(any_inside, take(bu), 0.0),
                jnp.where(any_inside, take(bv), 0.0),
                jnp.where(any_inside, take(bw), 0.0),
                jnp.where(any_inside, tid.astype(jnp.float32), -1.0),
            ]
        )  # (4, chunk, res)
        return out

    n_chunks = resolution // row_chunk
    rows = jax.lax.map(do_rows, jnp.arange(n_chunks))  # (n, 4, chunk, res)
    return jnp.transpose(rows, (1, 0, 2, 3)).reshape(4, resolution, resolution)


_rasterize_jit = jax.jit(_rasterize_core, static_argnums=(6, 7))


def rasterize_device(u0, v0, u1, v1, u2, v2, resolution: int) -> jnp.ndarray:
    """Trace-friendly rasterize: SoA per-corner UVs already on device."""
    F = u0.shape[0]
    row_chunk = max(1, min(64, 4096 * 64 // max(F, 1)))
    while resolution % row_chunk:
        row_chunk -= 1
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
    row_chunk = max(1, min(64, 4096 * 64 // max(len(faces), 1)))
    while resolution % row_chunk:
        row_chunk -= 1
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
