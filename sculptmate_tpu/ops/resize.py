"""Image resize ops.

- ``resize_bilinear_antialias``: matches torch ``F.interpolate(mode="bilinear",
  align_corners=False, antialias=True)`` used by the reference's
  ``ImagePreprocessor`` (``tsr/utils.py:82-88``). jax.image.resize with
  ``method="linear", antialias=True`` implements the same half-pixel-center
  triangle-filter algorithm.
- ``resize_lanczos``: PIL ``Image.LANCZOS`` (a=3) equivalent via
  ``method="lanczos3"`` — used for the 1024x1024 frontend resize
  (``preprocessing.py:126``).

Both run on device inside jit; the frontend fuses them with the
pad/crop/composite math.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def torch_bicubic_matrix(in_size: int, out_size: int, scale: float = 0.0) -> np.ndarray:
    """Dense (out_size, in_size) interpolation matrix reproducing torch
    ``F.interpolate(mode="bicubic", align_corners=False, antialias=False)``
    bit-for-bit (cubic convolution kernel A=-0.75, half-pixel centers,
    replicate borders).

    Used for ViT/DINOv2 position-table interpolation
    (``transformers ViTEmbeddings.interpolate_pos_encoding``,
    ``sf3d/models/tokenizers/dinov2.py:89-133``): a 2D bicubic resize of the
    (P, P, C) table is ``M @ table`` along each spatial axis. Static shapes,
    so it folds into the jitted program as a constant.

    ``scale`` (out/in): when nonzero, source coords use the caller's explicit
    scale factor like torch's ``interpolate(scale_factor=...)`` — the vendored
    DINOv2 passes ``(grid + 0.1) / base`` (``dinov2.py:111-124``), which is
    NOT the same grid mapping as ``size=``-mode for non-integer ratios.
    """
    if in_size == out_size and not scale:
        return np.eye(in_size, dtype=np.float32)
    A = -0.75

    def w0(t):
        return A * ((t + 1) ** 3) - 5 * A * ((t + 1) ** 2) + 8 * A * (t + 1) - 4 * A

    def w1(t):
        return (A + 2) * t**3 - (A + 3) * t**2 + 1

    inv_scale = (1.0 / scale) if scale else (in_size / out_size)
    M = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        src = (i + 0.5) * inv_scale - 0.5
        i0 = int(np.floor(src))
        t = src - i0
        weights = [w0(t), w1(t), w1(1 - t), w0(1 - t)]
        for k, w in zip(range(i0 - 1, i0 + 3), weights):
            M[i, min(max(k, 0), in_size - 1)] += w
    return M.astype(np.float32)


def interpolate_pos_table(patch_pos: jnp.ndarray, grid_h: int, grid_w: int) -> jnp.ndarray:
    """(P*P, C) position table -> (grid_h*grid_w, C), torch-bicubic semantics."""
    base = int(round(patch_pos.shape[0] ** 0.5))
    C = patch_pos.shape[-1]
    x = patch_pos.reshape(base, base, C)
    Mh = jnp.asarray(torch_bicubic_matrix(base, grid_h))
    Mw = jnp.asarray(torch_bicubic_matrix(base, grid_w))
    x = jnp.einsum("hH,HWc->hWc", Mh, x)
    x = jnp.einsum("wW,hWc->hwc", Mw, x)
    return x.reshape(grid_h * grid_w, C)


def _resize_hw(image: jnp.ndarray, height: int, width: int, method: str, antialias: bool) -> jnp.ndarray:
    """Resize the leading-2 spatial dims of an (H, W, C) or (B, H, W, C) array."""
    if image.ndim == 3:
        out_shape = (height, width, image.shape[-1])
    elif image.ndim == 4:
        out_shape = (image.shape[0], height, width, image.shape[-1])
    else:
        raise ValueError(f"expected (H,W,C) or (B,H,W,C), got {image.shape}")
    return jax.image.resize(image, out_shape, method=method, antialias=antialias)


def resize_bilinear_antialias(image: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    return _resize_hw(image, height, width, "linear", True)


def resize_bilinear(image: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    return _resize_hw(image, height, width, "linear", False)


def resize_lanczos(image: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    return _resize_hw(image, height, width, "lanczos3", True)
