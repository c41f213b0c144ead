"""Background removal (rembg.remove equivalent) on JAX.

Mirrors the reference pipeline ``rembg/bg.py:149-238`` with the u2net session
recipe (``rembg/sessions/u2net.py:16-46``, ``sessions/base.py:44-69``):

  input -> LANCZOS resize to 320^2 -> /max -> ImageNet mean/std -> u2net ->
  min-max normalize d0 -> resize mask back (LANCZOS) -> mask as alpha.

The network + normalization run as one jitted program on device; only the
variable-size boundary resizes use PIL (exactly like the reference). Optional
post-processing (morphological open + blur + threshold, ``bg.py:97-107``) is
provided with cv2 for parity.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image, ImageOps

from sculptmate_tpu.frontend.u2net import U2Net

U2NET_SIZE = 320
_MEAN = (0.485, 0.456, 0.406)
_STD = (0.229, 0.224, 0.225)


class U2NetMatting:
    """Holds u2net params and the jitted predictor."""

    def __init__(self, params=None, seed: int = 0, dtype=jnp.float32):
        self.module = U2Net(dtype=dtype)
        if params is None:
            from sculptmate_tpu.runtime.init import jitted_init

            dummy = jnp.zeros((1, U2NET_SIZE, U2NET_SIZE, 3), jnp.float32)
            params = jitted_init(self.module, seed, dummy)
        self.variables = params

        @jax.jit
        def _predict(variables, img):
            # img: (B, 320, 320, 3) raw [0,1]-ish; base.py normalizes by /max
            maxv = jnp.maximum(jnp.max(img, axis=(1, 2, 3), keepdims=True), 1e-6)
            x = img / maxv
            x = (x - jnp.asarray(_MEAN)) / jnp.asarray(_STD)
            d0, _ = self.module.apply(variables, x)
            pred = jax.nn.sigmoid(d0[..., 0])  # (B, H, W)
            mn = jnp.min(pred, axis=(1, 2), keepdims=True)
            mx = jnp.max(pred, axis=(1, 2), keepdims=True)
            return (pred - mn) / jnp.maximum(mx - mn, 1e-8)

        self._predict = _predict

    def predict_mask(self, image: Image.Image) -> Image.Image:
        """PIL image -> PIL 'L' mask at original size."""
        small = image.convert("RGB").resize(
            (U2NET_SIZE, U2NET_SIZE), Image.Resampling.LANCZOS
        )
        arr = np.asarray(small, dtype=np.float32) / 255.0
        mask = np.asarray(self._predict(self.variables, arr[None]))[0]
        mask_img = Image.fromarray((mask * 255).astype(np.uint8), mode="L")
        return mask_img.resize(image.size, Image.Resampling.LANCZOS)

    def predict(self, image: Image.Image, *args, **kwargs):
        """Registry-session-compatible surface: list of masks
        (``rembg/sessions/base.py:17-31`` returns ``List[PILImage]``)."""
        return [self.predict_mask(image)]

    def predict_mask_batch(self, images: jnp.ndarray) -> jnp.ndarray:
        """Device path: (B, 320, 320, 3) in [0,1] -> (B, 320, 320) masks."""
        return self._predict(self.variables, images)


@functools.lru_cache(maxsize=1)
def default_session() -> U2NetMatting:
    from sculptmate_tpu.runtime.checkpoint import try_load_u2net_params

    params = try_load_u2net_params()
    return U2NetMatting(params=params)


def post_process_mask(mask: np.ndarray) -> np.ndarray:
    """Morphological open + Gaussian blur + threshold (``bg.py:97-107``)."""
    import cv2

    kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (3, 3))
    m = cv2.morphologyEx(mask, cv2.MORPH_OPEN, kernel)
    m = cv2.GaussianBlur(m, (5, 5), sigmaX=2, sigmaY=2, borderType=cv2.BORDER_DEFAULT)
    m = np.where(m < 127, 0, 255).astype(np.uint8)
    return m


def _concat_v_multi(imgs):
    """Vertical concat of multiple cutouts onto RGBA canvases
    (``bg.py:64-94``): width comes from the first image, each subsequent
    image is pasted below the previous pivot."""
    pivot = imgs[0]
    for im in imgs[1:]:
        dst = Image.new("RGBA", (pivot.width, pivot.height + im.height))
        dst.paste(pivot, (0, 0))
        dst.paste(im, (0, pivot.height))
        pivot = dst
    return pivot


def remove(
    image: Image.Image,
    session=None,
    session_name: Optional[str] = None,
    post_process: bool = False,
    only_mask: bool = False,
    putalpha: bool = False,
    bgcolor=None,
    **session_kwargs,
) -> Image.Image:
    """rembg.remove equivalent, matching the live surface of
    ``bg.py:149-238`` option-for-option:

    - EXIF re-orientation first (``fix_image_orientation``,
      ``bg.py:128-138,198``): phone-rotated JPEGs are transposed upright
      before matting
    - default: ``naive_cutout`` — the image is composited onto an empty
      RGBA canvas through the mask (``bg.py:33-46,217``), so RGB under
      partial alpha blends toward (0,0,0) exactly like ``Image.composite``
    - ``putalpha=True``: keep the original RGB, mask becomes the alpha
      channel (``bg.py:49-61,195,214-215``)
    - ``only_mask=True``: return the mask(s) (``bg.py:210-211``);
      ``bgcolor`` is then ignored, as in the reference (``bg.py:225``)
    - ``post_process``: morphological open + blur + threshold (``bg.py:97-107``)
    - ``bgcolor``: RGBA tuple composited behind the cutout (``bg.py:110-125``)
    - multi-mask sessions (cloth_seg yields up to 3 masks) produce one
      cutout per mask, vertically concatenated (``bg.py:64-94,205-223``);
      extra kwargs (e.g. ``cc="upper"``) are forwarded to the session's
      ``predict``

    The reference's ``alpha_matting*`` kwargs are accepted there
    (``bg.py:151-154``) but dead — never read in the body — so they are
    intentionally not ported.

    ``session`` may be any object with ``predict`` (list of masks) or
    ``predict_mask`` (a ``U2NetMatting`` or a registry session from
    ``frontend.sessions.new_session``); ``session_name`` selects from the
    registry."""
    if session is None and session_name is not None:
        from sculptmate_tpu.frontend.sessions import new_session

        session = new_session(session_name)
    session = session or default_session()
    image = ImageOps.exif_transpose(image)
    if hasattr(session, "predict"):
        masks = session.predict(image, **session_kwargs)
    else:
        masks = [session.predict_mask(image)]

    cutouts = []
    for mask in masks:
        if post_process:
            mask = Image.fromarray(post_process_mask(np.asarray(mask)))
        if only_mask:
            cutout = mask
        elif putalpha:
            cutout = image.convert("RGB").copy()
            cutout.putalpha(mask)
        else:
            empty = Image.new("RGBA", image.size, 0)
            cutout = Image.composite(image, empty, mask)
        cutouts.append(cutout)

    cutout = _concat_v_multi(cutouts) if cutouts else image
    if bgcolor is not None and not only_mask:
        bg = Image.new("RGBA", cutout.size, tuple(bgcolor))
        # the RGBA cutout itself is the paste mask (its alpha band), as in
        # apply_background_color (bg.py:123)
        bg.paste(cutout, mask=cutout)
        cutout = bg
    return cutout
