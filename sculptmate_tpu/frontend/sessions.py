"""Matting session registry — rembg's session zoo on JAX.

Mirrors ``rembg/session_factory.py`` + ``rembg/sessions/`` (u2net, u2netp,
u2net_human_seg, silueta, dis_anime, dis_general_use, u2net_cloth_seg,
u2net_custom) with the ONNX runtime replaced by jitted flax models. Each
session implements ``predict(PIL) -> [PIL masks]`` with the exact recipe of
its reference counterpart (input size, normalization, min-max rescale,
LANCZOS resize back — e.g. ``sessions/u2net.py:16-46``,
``sessions/dis_anime.py:25-45``, ``sessions/u2net_cloth_seg.py:58-145``).

The SAM session (prompt-driven segmentation, ``sessions/sam.py:133-330``) is
fully implemented in flax (``frontend/sam.py``: windowed-attention ViT image
encoder, prompt encoder, two-way mask decoder) and registered as
``sam`` / ``sam_prompt``.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple, Type

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image
from PIL.Image import Image as PILImage


class JaxSessionBase:
    """Common predict plumbing: resize -> /max -> mean/std -> net -> minmax."""

    input_size: Tuple[int, int] = (320, 320)
    mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    std: Tuple[float, float, float] = (0.229, 0.224, 0.225)

    def __init__(self, params=None, seed: int = 0, weights_name: Optional[str] = None):
        self.weights_name = weights_name
        self.module = self.build_module()
        if params is None and weights_name:
            from sculptmate_tpu.runtime.checkpoint import try_load_session_params

            params = try_load_session_params(weights_name)
        if params is None:
            from sculptmate_tpu.runtime.init import jitted_init

            dummy = jnp.zeros((1, *self.input_size, 3), jnp.float32)
            params = jitted_init(self.module, seed, dummy)
        self.variables = params
        self._predict = jax.jit(self._predict_fn)

    def build_module(self):
        from sculptmate_tpu.frontend.u2net import U2Net

        return U2Net()

    def _predict_fn(self, variables, img):
        maxv = jnp.maximum(jnp.max(img, axis=(1, 2, 3), keepdims=True), 1e-6)
        x = img / maxv
        x = (x - jnp.asarray(self.mean)) / jnp.asarray(self.std)
        d0, _ = self.module.apply(variables, x)
        pred = jax.nn.sigmoid(d0[..., 0])
        mn = jnp.min(pred, axis=(1, 2), keepdims=True)
        mx = jnp.max(pred, axis=(1, 2), keepdims=True)
        return (pred - mn) / jnp.maximum(mx - mn, 1e-8)

    def predict(self, img: PILImage, *args, **kwargs) -> List[PILImage]:
        small = img.convert("RGB").resize(self.input_size, Image.Resampling.LANCZOS)
        arr = np.asarray(small, dtype=np.float32) / 255.0
        pred = np.asarray(self._predict(self.variables, arr[None]))[0]
        mask = Image.fromarray((pred * 255).astype(np.uint8), mode="L")
        return [mask.resize(img.size, Image.Resampling.LANCZOS)]

    # U2NetMatting-compatible surface
    def predict_mask(self, image: PILImage) -> PILImage:
        return self.predict(image)[0]


class U2netSession(JaxSessionBase):
    pass


class U2netpSession(JaxSessionBase):
    def build_module(self):
        from sculptmate_tpu.frontend.u2net import U2Net

        return U2Net(variant="small")


class U2netHumanSegSession(JaxSessionBase):
    """Same recipe as u2net, human-segmentation weights
    (``sessions/u2net_human_seg.py``)."""


class SiluetaSession(JaxSessionBase):
    """Same architecture/recipe, silueta weights (``sessions/silueta.py``)."""


class DisSessionBase(JaxSessionBase):
    input_size = (1024, 1024)
    std = (1.0, 1.0, 1.0)

    def build_module(self):
        from sculptmate_tpu.frontend.isnet import ISNet

        return ISNet()


class DisAnimeSession(DisSessionBase):
    pass


class DisGeneralSession(DisSessionBase):
    pass


# cloth palette masks (upper / lower / full), from u2net_cloth_seg.py
_CLOTH_CLASSES = {"upper": 1, "lower": 2, "full": 3}


class ClothSegSession(JaxSessionBase):
    input_size = (768, 768)

    def build_module(self):
        from sculptmate_tpu.frontend.u2net import U2Net

        return U2Net(out_channels=4)

    def _predict_fn(self, variables, img):
        maxv = jnp.maximum(jnp.max(img, axis=(1, 2, 3), keepdims=True), 1e-6)
        x = img / maxv
        x = (x - jnp.asarray(self.mean)) / jnp.asarray(self.std)
        d0, _ = self.module.apply(variables, x)
        # log_softmax + argmax over the 4 class channels (cloth_seg recipe)
        return jnp.argmax(jax.nn.log_softmax(d0, axis=-1), axis=-1)

    def predict(self, img: PILImage, *args, **kwargs) -> List[PILImage]:
        small = img.convert("RGB").resize(self.input_size, Image.Resampling.LANCZOS)
        arr = np.asarray(small, dtype=np.float32) / 255.0
        classes = np.asarray(self._predict(self.variables, arr[None]))[0]
        cls_img = Image.fromarray(classes.astype(np.uint8), mode="L").resize(
            img.size, Image.Resampling.NEAREST
        )
        cls_arr = np.asarray(cls_img)

        category = kwargs.get("cc") or kwargs.get("cloth_category")
        wanted = (
            [category] if category in _CLOTH_CLASSES else list(_CLOTH_CLASSES)
        )
        masks = []
        for name in wanted:
            m = (cls_arr == _CLOTH_CLASSES[name]).astype(np.uint8) * 255
            masks.append(Image.fromarray(m, mode="L"))
        return masks


_REGISTRY: Dict[str, Type[JaxSessionBase]] = {
    "u2net": U2netSession,
    "u2netp": U2netpSession,
    "u2net_human_seg": U2netHumanSegSession,
    "silueta": SiluetaSession,
    "isnet-anime": DisAnimeSession,
    "dis_anime": DisAnimeSession,
    "isnet-general-use": DisGeneralSession,
    "dis_general_use": DisGeneralSession,
    "u2net_cloth_seg": ClothSegSession,
    "u2net_custom": U2netSession,
}


@functools.lru_cache(maxsize=4)
def new_session(model_name: str = "u2net"):
    """Session factory (``rembg/session_factory.py:11-44``)."""
    if model_name == "sam":
        from sculptmate_tpu.frontend.sam import SamSession

        return SamSession()
    if model_name not in _REGISTRY:
        raise ValueError(
            f"unknown session '{model_name}'; available: "
            + ", ".join(sorted(_REGISTRY) + ["sam"])
        )
    return _REGISTRY[model_name](weights_name=model_name)
