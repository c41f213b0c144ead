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

import jax
import jax.numpy as jnp


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
