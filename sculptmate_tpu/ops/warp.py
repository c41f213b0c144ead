"""Dynamic-scale separable resampling with static shapes.

The reference frontend (``preprocessing.py:73-128``) crops to the alpha bbox,
pads to square, pads again by a framing ratio, and LANCZOS-resizes to 1024^2.
The crop/pad geometry is *data-dependent* (bbox of the matte), which under XLA
would mean dynamic shapes. The TPU-native formulation: keep the source image
static-shape and express the whole crop->pad->resize chain as one separable
affine resample, where the interpolation *matrices* are built in-graph from
traced scalars (bbox edges). Shapes stay static; only values are dynamic.

``resample_matrix``: rows = output pixels, cols = source pixels, Lanczos-3 or
bilinear taps evaluated at dynamically-computed source positions, weights
renormalized per row (PIL semantics); sources outside the crop window get
weight 0 (transparent padding).
"""

from __future__ import annotations

import jax.numpy as jnp


def _lanczos3(x: jnp.ndarray) -> jnp.ndarray:
    """Lanczos-3 kernel, numerically safe sinc evaluation."""
    ax = jnp.abs(x)
    safe = jnp.where(ax < 1e-6, 1e-6, ax)
    k = (
        jnp.sinc(safe) * jnp.sinc(safe / 3.0)
    )
    k = jnp.where(ax < 1e-6, 1.0, k)
    return jnp.where(ax < 3.0, k, 0.0)


def resample_matrix(
    src_size: int,
    out_size: int,
    region_start,
    region_stop,
    method: str = "lanczos3",
) -> jnp.ndarray:
    """Build an (out_size, src_size) matrix resampling source pixels in
    [region_start, region_stop) onto out_size output pixels.

    region_start/stop are traced float scalars (source pixel units). Output
    pixel i's center maps to source coordinate
    ``region_start + (i + 0.5) * scale`` with ``scale = region/out``.
    When downscaling, the kernel support dilates by ``scale`` (PIL/antialias
    convention); weights are renormalized to sum to 1 over in-region taps.
    """
    region = region_stop - region_start
    scale = region / out_size
    support_scale = jnp.maximum(scale, 1.0)

    centers = region_start + (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale
    taps = jnp.arange(src_size, dtype=jnp.float32) + 0.5
    d = (taps[None, :] - centers[:, None]) / support_scale

    if method == "lanczos3":
        w = _lanczos3(d)
    elif method == "linear":
        w = jnp.maximum(0.0, 1.0 - jnp.abs(d))
    else:
        raise ValueError(method)

    in_region = (taps[None, :] >= region_start) & (taps[None, :] < region_stop)
    w = w * in_region.astype(w.dtype)
    denom = jnp.sum(w, axis=1, keepdims=True)
    w = w / jnp.where(denom == 0, 1.0, denom)
    return w


def separable_resample(
    image: jnp.ndarray,
    out_hw,
    row_window,
    col_window,
    method: str = "lanczos3",
) -> jnp.ndarray:
    """Resample (H, W, C) image: rows in row_window -> out_hw[0], cols in
    col_window -> out_hw[1]. Windows are (start, stop) traced float scalars."""
    Wr = resample_matrix(image.shape[0], out_hw[0], row_window[0], row_window[1], method)
    Wc = resample_matrix(image.shape[1], out_hw[1], col_window[0], col_window[1], method)
    out = jnp.einsum(
        "oh,hwc->owc", Wr, image, preferred_element_type=jnp.float32
    )
    out = jnp.einsum(
        "pw,owc->opc", Wc, out, preferred_element_type=jnp.float32
    )
    return out
