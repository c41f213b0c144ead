"""U^2-Net salient-object matting network in flax.

Replaces the reference's vendored rembg + onnxruntime u2net path
(``rembg/sessions/u2net.py:16-46``, ``rembg/sessions/base.py:34-69``) with a
native JAX implementation of the same architecture (Qin et al., U^2-Net), so
background removal runs on-device inside the same XLA program as the rest of
the frontend instead of through a separate ONNX runtime.

Structure (full u2net, matching the u2net.onnx weights for conversion):
6 encoder stages (RSU7/6/5/4/4F/4F) with 2x maxpool between, 5 decoder stages
on skip concats, 6 side heads fused by a 1x1 conv. Inference uses side output
d0 after sigmoid, min-max normalized (``sessions/u2net.py:34-39``).

All convs are 3x3 with BatchNorm (inference: running stats) + ReLU; RSU-"F"
variants use dilation instead of pooling. Upsampling is bilinear,
align_corners=False, matching torch ``F.upsample``.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class REBNCONV(nn.Module):
    out_ch: int
    dilation: int = 1
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.out_ch,
            (3, 3),
            strides=self.stride,
            padding=self.dilation,
            kernel_dilation=self.dilation,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, epsilon=1e-5, dtype=self.dtype, name="bn"
        )(x)
        return nn.relu(x)


def _maxpool2(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def _upsample_like(x, ref):
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, ref.shape[1], ref.shape[2], C), method="linear")


class RSU(nn.Module):
    """Residual U-block of depth L with pooling encoder/decoder."""

    depth: int  # L (7 for RSU7 ... 4 for RSU4)
    mid_ch: int
    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hxin = REBNCONV(self.out_ch, dtype=self.dtype, name="rebnconvin")(x)

        enc = []
        h = hxin
        for i in range(1, self.depth):
            h = REBNCONV(self.mid_ch, dtype=self.dtype, name=f"rebnconv{i}")(h)
            enc.append(h)
            if i != self.depth - 1:
                h = _maxpool2(h)
        # bottom, dilated
        h = REBNCONV(self.mid_ch, dilation=2, dtype=self.dtype, name=f"rebnconv{self.depth}")(h)

        for i in range(self.depth - 1, 0, -1):
            skip = enc[i - 1]
            if h.shape[1] != skip.shape[1] or h.shape[2] != skip.shape[2]:
                h = _upsample_like(h, skip)
            ch = self.out_ch if i == 1 else self.mid_ch
            h = REBNCONV(ch, dtype=self.dtype, name=f"rebnconv{i}d")(
                jnp.concatenate([h, skip], axis=-1)
            )
        return hxin + h


class RSU4F(nn.Module):
    """Dilation-only residual U-block (no pooling)."""

    mid_ch: int
    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hxin = REBNCONV(self.out_ch, dtype=self.dtype, name="rebnconvin")(x)
        h1 = REBNCONV(self.mid_ch, dilation=1, dtype=self.dtype, name="rebnconv1")(hxin)
        h2 = REBNCONV(self.mid_ch, dilation=2, dtype=self.dtype, name="rebnconv2")(h1)
        h3 = REBNCONV(self.mid_ch, dilation=4, dtype=self.dtype, name="rebnconv3")(h2)
        h4 = REBNCONV(self.mid_ch, dilation=8, dtype=self.dtype, name="rebnconv4")(h3)
        h3d = REBNCONV(self.mid_ch, dilation=4, dtype=self.dtype, name="rebnconv3d")(
            jnp.concatenate([h4, h3], axis=-1)
        )
        h2d = REBNCONV(self.mid_ch, dilation=2, dtype=self.dtype, name="rebnconv2d")(
            jnp.concatenate([h3d, h2], axis=-1)
        )
        h1d = REBNCONV(self.out_ch, dilation=1, dtype=self.dtype, name="rebnconv1d")(
            jnp.concatenate([h2d, h1], axis=-1)
        )
        return hxin + h1d


# (encoder depth/mid/out, decoder depth/mid/out) per stage; "F" = dilated RSU4F
FULL_CONFIG = {
    "enc": [(7, 32, 64), (6, 32, 128), (5, 64, 256), (4, 128, 512), ("F", 256, 512), ("F", 256, 512)],
    "dec": [("F", 256, 512), (4, 128, 256), (5, 64, 128), (6, 32, 64), (7, 16, 64)],
}
# u2netp: uniform small widths (the rembg u2netp.onnx variant)
SMALL_CONFIG = {
    "enc": [(7, 16, 64), (6, 16, 64), (5, 16, 64), (4, 16, 64), ("F", 16, 64), ("F", 16, 64)],
    "dec": [("F", 16, 64), (4, 16, 64), (5, 16, 64), (6, 16, 64), (7, 16, 64)],
}


def _make_rsu(spec, name, dtype):
    depth, mid, out = spec
    if depth == "F":
        return RSU4F(mid, out, dtype=dtype, name=name)
    return RSU(depth, mid, out, dtype=dtype, name=name)


class U2Net(nn.Module):
    """U^2-Net; ``variant`` selects full (u2net.onnx) or small (u2netp)
    widths, ``out_channels`` > 1 gives the cloth-seg class maps."""

    variant: str = "full"
    out_channels: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, Sequence[jnp.ndarray]]:
        """x: (B, H, W, 3) normalized. Returns (d0, [d1..d6]) logits
        (B, H, W, out_channels)."""
        cfg = FULL_CONFIG if self.variant == "full" else SMALL_CONFIG

        enc = []
        h = x
        for i, spec in enumerate(cfg["enc"]):
            h = _make_rsu(spec, f"stage{i + 1}", self.dtype)(h)
            enc.append(h)
            if i != len(cfg["enc"]) - 1:
                h = _maxpool2(h)

        # decoder with skip concats
        dec = [enc[-1]]  # hx6
        h = enc[-1]
        for i, spec in enumerate(cfg["dec"]):
            skip = enc[len(cfg["enc"]) - 2 - i]
            h = _upsample_like(h, skip)
            h = _make_rsu(spec, f"stage{len(cfg['dec']) - i}d", self.dtype)(
                jnp.concatenate([h, skip], axis=-1)
            )
            dec.append(h)

        # side heads: d1 from the last decoder stage ... d6 from the bottom
        sides = []
        for i, feat in enumerate(reversed(dec)):  # [stage1d, stage2d, ..., hx6]
            d = nn.Conv(
                self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                name=f"side{i + 1}",
            )(feat)
            if d.shape[1] != x.shape[1]:
                d = _upsample_like(d, x)
            sides.append(d)
        d0 = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="outconv")(
            jnp.concatenate(sides, axis=-1)
        )
        return d0, tuple(sides)
