"""ISNet (DIS) matting network — the dis_anime / dis_general_use sessions.

The reference ships these as ONNX blobs (``rembg/sessions/dis_anime.py``,
1024^2 input, std=(1,1,1)); this is a flax implementation of the ISNet-DIS
architecture (Qin et al., Highly Accurate Dichotomous Image Segmentation):
a stride-2 input conv (the DIS repo's ``myrebnconv`` stem; its pool is
disabled in the original forward) followed by a U^2-Net-style RSU
encoder/decoder with side outputs upsampled to the input resolution.

Checkpoint conversion: ``runtime/checkpoint.py:convert_isnet_state_dict``
maps the ISNetDIS torch/onnx layout (``conv_in.conv/.bn``,
``stageN[d].rebnconvX[d].conv_s1/bn_s1``, ``sideN``) onto this tree.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from sculptmate_tpu.frontend.u2net import (
    REBNCONV,
    RSU,
    RSU4F,
    _maxpool2,
    _upsample_like,
)


class ISNet(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, Sequence[jnp.ndarray]]:
        """x: (B, H, W, 3) normalized. Returns (d1, [d1..d6]) logits at
        full input resolution."""
        hin = REBNCONV(64, stride=2, dtype=self.dtype, name="conv_in")(x)

        hx1 = RSU(7, 32, 64, dtype=self.dtype, name="stage1")(hin)
        hx = _maxpool2(hx1)
        hx2 = RSU(6, 32, 128, dtype=self.dtype, name="stage2")(hx)
        hx = _maxpool2(hx2)
        hx3 = RSU(5, 64, 256, dtype=self.dtype, name="stage3")(hx)
        hx = _maxpool2(hx3)
        hx4 = RSU(4, 128, 512, dtype=self.dtype, name="stage4")(hx)
        hx = _maxpool2(hx4)
        hx5 = RSU4F(256, 512, dtype=self.dtype, name="stage5")(hx)
        hx = _maxpool2(hx5)
        hx6 = RSU4F(256, 512, dtype=self.dtype, name="stage6")(hx)

        h = _upsample_like(hx6, hx5)
        hx5d = RSU4F(256, 512, dtype=self.dtype, name="stage5d")(
            jnp.concatenate([h, hx5], axis=-1)
        )
        h = _upsample_like(hx5d, hx4)
        hx4d = RSU(4, 128, 256, dtype=self.dtype, name="stage4d")(
            jnp.concatenate([h, hx4], axis=-1)
        )
        h = _upsample_like(hx4d, hx3)
        hx3d = RSU(5, 64, 128, dtype=self.dtype, name="stage3d")(
            jnp.concatenate([h, hx3], axis=-1)
        )
        h = _upsample_like(hx3d, hx2)
        hx2d = RSU(6, 32, 64, dtype=self.dtype, name="stage2d")(
            jnp.concatenate([h, hx2], axis=-1)
        )
        h = _upsample_like(hx2d, hx1)
        hx1d = RSU(7, 16, 64, dtype=self.dtype, name="stage1d")(
            jnp.concatenate([h, hx1], axis=-1)
        )

        sides = []
        for i, feat in enumerate([hx1d, hx2d, hx3d, hx4d, hx5d, hx6]):
            d = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype, name=f"side{i + 1}")(feat)
            sides.append(_upsample_like(d, x))
        return sides[0], tuple(sides)
