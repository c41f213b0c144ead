"""Image preprocessing: matte -> bbox crop -> square pad -> ratio pad -> resize.

Host path (``preprocess_image``) replicates the reference
``preprocessing.py:73-128`` exactly, including its quirks: the bbox crop uses
``alpha.max()`` as an *exclusive* bound (dropping the last foreground
row/column), the gray composite happens before uint8 quantization, and inputs
whose padded square is narrower than 250 px are rejected (returns None).

Device path (``preprocess_batch_device``) is the fused TPU variant used by the
batched asset farm: fixed-size inputs, alpha bbox via masked min/max, and the
entire crop->pad->LANCZOS-resize chain as one separable dynamic-window
resample (``ops/warp.py``) — static shapes, one XLA program, no host sync.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from sculptmate_tpu.ops.warp import separable_resample

OUTPUT_SIZE = 1024


def preprocess_image(
    image: Image.Image,
    ratio: float = 0.85,
    use_alpha: bool = False,
    session=None,
) -> Optional[Image.Image]:
    """Reference-parity host path. RGBA in (or any PIL image -> matted)."""
    from sculptmate_tpu.frontend.matting import remove

    input_raw = image.convert("RGBA") if use_alpha else image
    input_raw = remove(input_raw, session=session)

    arr = np.asarray(input_raw)
    ys, xs = np.where(arr[..., 3] > 0)
    if len(ys) == 0:
        return None
    y1, y2, x1, x2 = ys.min(), ys.max(), xs.min(), xs.max()
    fg = arr[y1:y2, x1:x2]  # exclusive max bound, as in the reference
    if fg.size == 0:
        return None

    size = max(fg.shape[0], fg.shape[1])
    ph0, pw0 = (size - fg.shape[0]) // 2, (size - fg.shape[1]) // 2
    ph1, pw1 = size - fg.shape[0] - ph0, size - fg.shape[1] - pw0
    fg = np.pad(fg, ((ph0, ph1), (pw0, pw1), (0, 0)), mode="constant")

    new_size = int(size / ratio)
    p0 = (new_size - size) // 2
    p1 = new_size - size - p0
    fg = np.pad(fg, ((p0, p1), (p0, p1), (0, 0)), mode="constant")

    if use_alpha:
        return Image.fromarray(fg, mode="RGBA")

    f = fg.astype(np.float32) / 255.0
    rgb = f[:, :, :3] * f[:, :, 3:4] + (1 - f[:, :, 3:4]) * 0.5
    out = Image.fromarray((rgb * 255.0).astype(np.uint8))
    if out.size[0] < 250:
        return None
    return out.resize((OUTPUT_SIZE, OUTPUT_SIZE), Image.Resampling.LANCZOS)


def sam_segment(image: Image.Image, bbox, session=None) -> Image.Image:
    """SAM-assisted cutout (the reference's dormant ``sam_out_nosave`` path,
    ``preprocessing.py:22-39``): box-prompted SAM mask as alpha."""
    import json

    if session is None:
        from sculptmate_tpu.frontend.sessions import new_session

        session = new_session("sam")
    prompt = [{"type": "rectangle", "data": list(map(float, bbox))}]
    mask = session.predict(image, sam_prompt=json.dumps(prompt))[0]
    out = np.zeros((image.height, image.width, 4), np.uint8)
    out[:, :, :3] = np.asarray(image.convert("RGB"))
    out[:, :, 3] = np.asarray(mask)
    return Image.fromarray(out, mode="RGBA")


def image_preprocess_sam(
    input_image: Image.Image, lower_contrast: bool = True, rescale: bool = True
) -> Tuple[Image.Image, float]:
    """The reference's dormant SAM-path preprocessing
    (``preprocessing.py:42-70``): optional contrast lowering, alpha-bbox
    recenter onto a square canvas, LANCZOS to 1024^2, gray->white composite.
    Returns (rgb image, foreground scale)."""
    arr = np.asarray(input_image).copy()
    in_w = arr.shape[0]

    if lower_contrast:
        # convertScaleAbs(alpha=0.8): scale + clip, then re-solidify alpha
        arr = np.clip(arr.astype(np.float32) * 0.8, 0, 255).astype(np.uint8)
        arr[arr[..., -1] > 200, -1] = 255

    alpha = np.asarray(input_image)[..., -1]
    ys, xs = np.where(alpha > 1)
    if len(ys) == 0:
        return input_image.convert("RGB"), 1.0
    y, x = ys.min(), xs.min()
    h = ys.max() - ys.min() + 1
    w = xs.max() - xs.min() + 1
    max_size = max(w, h)
    side_len = int(max_size / 0.75) if rescale else in_w
    scale = in_w / w
    padded = np.zeros((side_len, side_len, 4), np.uint8)
    center = side_len // 2
    padded[
        center - h // 2 : center - h // 2 + h, center - w // 2 : center - w // 2 + w
    ] = arr[y : y + h, x : x + w]
    rgba = Image.fromarray(padded).resize((OUTPUT_SIZE, OUTPUT_SIZE), Image.LANCZOS)
    f = np.asarray(rgba).astype(np.float32) / 255.0
    rgb = f[..., :3] * f[..., -1:] + (1 - f[..., -1:])
    return Image.fromarray((rgb * 255).astype(np.uint8)), scale


def _alpha_bbox(alpha: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """Masked bbox of alpha > 0 for one (H, W) plane. Returns y1,y2,x1,x2
    (max bounds exclusive-style like np.where().max())."""
    H, W = alpha.shape
    rows = jnp.any(alpha > 0, axis=1)
    cols = jnp.any(alpha > 0, axis=0)
    ridx = jnp.arange(H)
    cidx = jnp.arange(W)
    y1 = jnp.min(jnp.where(rows, ridx, H))
    y2 = jnp.max(jnp.where(rows, ridx, -1))
    x1 = jnp.min(jnp.where(cols, cidx, W))
    x2 = jnp.max(jnp.where(cols, cidx, -1))
    return y1, y2, x1, x2


def preprocess_device_one(
    rgba: jnp.ndarray,
    ratio: float,
    out_size: int = OUTPUT_SIZE,
    background: float = 0.5,
) -> jnp.ndarray:
    """Fused device preprocessing of one (H, W, 4) float [0,1] image.

    Equivalent to crop(bbox) -> square pad -> ratio pad -> gray composite ->
    LANCZOS resize, expressed as a single dynamic-window separable resample:
    the output canvas maps to a centered source window of side
    ``max(h, w) / ratio`` around the bbox center; pixels outside the image
    contribute alpha 0 (composited to background). Returns (out_size,
    out_size, 3).
    """
    y1, y2, x1, x2 = _alpha_bbox(rgba[..., 3])
    h = (y2 - y1).astype(jnp.float32)
    w = (x2 - x1).astype(jnp.float32)
    size = jnp.maximum(h, w)
    new_size = jnp.floor(size / ratio)

    # center of the cropped region in source pixels (matching integer pad
    # arithmetic on average; sub-pixel centering differences are < 1px)
    cy = y1.astype(jnp.float32) + h / 2.0
    cx = x1.astype(jnp.float32) + w / 2.0

    row_win = (cy - new_size / 2.0, cy + new_size / 2.0)
    col_win = (cx - new_size / 2.0, cx + new_size / 2.0)

    premult = jnp.concatenate(
        [rgba[..., :3] * rgba[..., 3:4], rgba[..., 3:4]], axis=-1
    )
    out = separable_resample(premult, (out_size, out_size), row_win, col_win)
    rgb = out[..., :3] + background * (1.0 - out[..., 3:4])
    return jnp.clip(rgb, 0.0, 1.0)


def preprocess_batch_device(
    rgba: jnp.ndarray, ratio: float, out_size: int = OUTPUT_SIZE
) -> jnp.ndarray:
    """Batched fused preprocessing: (B, H, W, 4) -> (B, out, out, 3)."""
    fn = lambda im: preprocess_device_one(im, ratio, out_size)
    return jax.vmap(fn)(rgba)
