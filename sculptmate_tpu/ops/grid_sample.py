"""Bilinear grid sampling, TPU-first.

Two paths:

1. ``grid_sample_2d`` — general scattered points, gather-based. Matches torch
   ``F.grid_sample(mode="bilinear", padding_mode="zeros")`` for both
   ``align_corners`` conventions (TripoSR uses False at
   ``tsr/models/nerf_renderer.py:61-66``; SF3D uses True at
   ``sf3d/system.py:170-198``). Used for arbitrary-position queries
   (mesh-vertex colors, texture-bake positions).

2. ``sample_triplane_regular_grid`` — the TPU fast path. When query points
   form a separable grid (the marching-cubes / marching-tets lattice), the
   bilinear sample factorizes into two small dense interpolation matrices per
   plane: ``out = Wv @ P @ Wu^T``. This turns the reference's 16.7M-point
   gather storm (2 048 serial chunks, ``tsr/utils.py:166``) into three tiny
   MXU matmuls with *zero* gathers, reproducing grid_sample semantics exactly
   (including the zero-padding boundary halving at g = ±1).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def _unnormalize(coords: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    """Map normalized [-1, 1] coords to float pixel indices (torch convention)."""
    if align_corners:
        return (coords + 1.0) * 0.5 * (size - 1)
    return ((coords + 1.0) * size - 1.0) * 0.5


def interp_matrix_1d(coords: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    """Build an (N, size) bilinear interpolation matrix for 1D sample coords.

    Row n holds the two-tap weights that reproduce
    ``grid_sample(padding_mode="zeros")`` along one axis: out-of-range taps get
    weight zero rather than being clamped.
    """
    fx = _unnormalize(coords.astype(jnp.float32), size, align_corners)
    x0 = jnp.floor(fx)
    w1 = fx - x0
    w0 = 1.0 - w1
    x0i = x0.astype(jnp.int32)
    x1i = x0i + 1

    taps = jnp.arange(size)[None, :]  # (1, size)
    m0 = (taps == x0i[:, None]).astype(jnp.float32) * w0[:, None]
    m1 = (taps == x1i[:, None]).astype(jnp.float32) * w1[:, None]
    # taps outside [0, size) simply never match -> weight 0 == zero padding
    return m0 + m1


def resample_plane(
    plane: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray, align_corners: bool
) -> jnp.ndarray:
    """Sample (C, H, W) plane on the separable grid (v x u) -> (C, Nv, Nu).

    ``u`` indexes the W (x) axis, ``v`` the H (y) axis — torch grid_sample's
    (x, y) grid convention.
    """
    Wu = interp_matrix_1d(u, plane.shape[-1], align_corners)  # (Nu, W)
    Wv = interp_matrix_1d(v, plane.shape[-2], align_corners)  # (Nv, H)
    out = jnp.einsum("vh,chw,uw->cvu", Wv, plane, Wu, preferred_element_type=jnp.float32)
    return out


def sample_triplane_regular_grid(
    triplane: jnp.ndarray,
    coords_x: jnp.ndarray,
    coords_y: jnp.ndarray,
    coords_z: jnp.ndarray,
    align_corners: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pre-resample the 3 planes for a separable 3D query lattice.

    ``triplane``: (3, C, H, W) — planes ordered (xy, xz, yz) as in the
    reference's ``indices2D`` stack (``nerf_renderer.py:57-59``): plane 0 is
    sampled at (u=x, v=y), plane 1 at (u=x, v=z), plane 2 at (u=y, v=z).

    Returns ``(Fxy, Fxz, Fyz)`` with
      Fxy[c, j, i] = plane0 at (x_i, y_j)
      Fxz[c, k, i] = plane1 at (x_i, z_k)
      Fyz[c, k, j] = plane2 at (y_j, z_k)
    so the full 120-d feature of lattice point (i, j, k) is
    ``concat(Fxy[:, j, i], Fxz[:, k, i], Fyz[:, k, j])``.
    """
    Fxy = resample_plane(triplane[0], coords_x, coords_y, align_corners)
    Fxz = resample_plane(triplane[1], coords_x, coords_z, align_corners)
    Fyz = resample_plane(triplane[2], coords_y, coords_z, align_corners)
    return Fxy, Fxz, Fyz


def grid_sample_2d(
    input: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
    align_corners: bool = False,
) -> jnp.ndarray:
    """Gather-based bilinear sample of (C, H, W) at scattered points.

    ``px``/``py`` are flat (N,) coords in [-1, 1]: x indexes W, y indexes H
    (torch grid convention). Zero padding outside. Returns (C, N).

    TPU layout note: coordinates are separate flat arrays, not (N, 2) — a
    large (N, 2) array is tile-padded to (N, 128) on TPU (64x memory).
    """
    C, H, W = input.shape
    fx = _unnormalize(px.astype(jnp.float32), W, align_corners)
    fy = _unnormalize(py.astype(jnp.float32), H, align_corners)

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx1 = fx - x0
    wy1 = fy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = input.reshape(C, H * W)

    def tap(xi, yi, w):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        vals = jnp.take(flat, idx, axis=1)  # (C, N)
        return vals * (w * valid.astype(jnp.float32))[None, :]

    out = (
        tap(x0i, y0i, (1 - wx1) * (1 - wy1))
        + tap(x0i + 1, y0i, wx1 * (1 - wy1))
        + tap(x0i, y0i + 1, (1 - wx1) * wy1)
        + tap(x0i + 1, y0i + 1, wx1 * wy1)
    )
    return out


def sample_triplane(
    triplane: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
    pz: jnp.ndarray,
    align_corners: bool = False,
) -> jnp.ndarray:
    """Sample a (3, C, H, W) triplane at scattered positions in [-1, 1].

    Coordinates are flat (N,) arrays (SoA — see grid_sample_2d layout note).
    Returns (3*C, N) channels-first features ordered (xy, xz, yz) to match
    ``rearrange(out, "Np Cp () N -> N (Np Cp)")`` in the reference (after the
    caller's transpose).
    """
    f_xy = grid_sample_2d(triplane[0], px, py, align_corners)
    f_xz = grid_sample_2d(triplane[1], px, pz, align_corners)
    f_yz = grid_sample_2d(triplane[2], py, pz, align_corners)
    return jnp.concatenate([f_xy, f_xz, f_yz], axis=0)
