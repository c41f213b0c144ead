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
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.out_ch,
            (3, 3),
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


class U2Net(nn.Module):
    """Full U^2-Net (matches u2net.onnx layout for weight conversion)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, Sequence[jnp.ndarray]]:
        """x: (B, H, W, 3) normalized. Returns (d0, [d1..d6]) logits (B,H,W,1)."""
        hx1 = RSU(7, 32, 64, dtype=self.dtype, name="stage1")(x)
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
        hx6up = _upsample_like(hx6, hx5)

        hx5d = RSU4F(256, 512, dtype=self.dtype, name="stage5d")(
            jnp.concatenate([hx6up, hx5], axis=-1)
        )
        hx5dup = _upsample_like(hx5d, hx4)
        hx4d = RSU(4, 128, 256, dtype=self.dtype, name="stage4d")(
            jnp.concatenate([hx5dup, hx4], axis=-1)
        )
        hx4dup = _upsample_like(hx4d, hx3)
        hx3d = RSU(5, 64, 128, dtype=self.dtype, name="stage3d")(
            jnp.concatenate([hx4dup, hx3], axis=-1)
        )
        hx3dup = _upsample_like(hx3d, hx2)
        hx2d = RSU(6, 32, 64, dtype=self.dtype, name="stage2d")(
            jnp.concatenate([hx3dup, hx2], axis=-1)
        )
        hx2dup = _upsample_like(hx2d, hx1)
        hx1d = RSU(7, 16, 64, dtype=self.dtype, name="stage1d")(
            jnp.concatenate([hx2dup, hx1], axis=-1)
        )

        d1 = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype, name="side1")(hx1d)
        d2 = _upsample_like(
            nn.Conv(1, (3, 3), padding=1, dtype=self.dtype, name="side2")(hx2d), x
        )
        d3 = _upsample_like(
            nn.Conv(1, (3, 3), padding=1, dtype=self.dtype, name="side3")(hx3d), x
        )
        d4 = _upsample_like(
            nn.Conv(1, (3, 3), padding=1, dtype=self.dtype, name="side4")(hx4d), x
        )
        d5 = _upsample_like(
            nn.Conv(1, (3, 3), padding=1, dtype=self.dtype, name="side5")(hx5d), x
        )
        d6 = _upsample_like(
            nn.Conv(1, (3, 3), padding=1, dtype=self.dtype, name="side6")(hx6), x
        )
        d0 = nn.Conv(1, (1, 1), dtype=self.dtype, name="outconv")(
            jnp.concatenate([d1, d2, d3, d4, d5, d6], axis=-1)
        )
        return d0, (d1, d2, d3, d4, d5, d6)
