"""Triplane upsampling heads.

- ``TriplaneUpsampleNetwork`` — TripoSR: ConvTranspose2d k2 s2 per plane,
  1024ch 32^2 -> 40ch 64^2 (``tsr/models/network_utils.py:11-32``).
- ``PixelShuffleUpsampleNetwork`` — SF3D: 4 conv(k3) + PixelShuffle x4,
  1024ch 96^2 -> 40ch 384^2 (``sf3d/models/network.py:29-74``).

Planes are processed channels-last internally (TPU conv layout), with
(B, 3, C, H, W) channels-first at the API boundary to match the reference's
triplane layout.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def _planes_to_nhwc(triplanes: jnp.ndarray) -> jnp.ndarray:
    """(B, 3, C, H, W) -> (B*3, H, W, C)."""
    B, Np, C, H, W = triplanes.shape
    x = triplanes.reshape(B * Np, C, H, W)
    return jnp.transpose(x, (0, 2, 3, 1))


def _nhwc_to_planes(x: jnp.ndarray, batch: int) -> jnp.ndarray:
    """(B*3, H, W, C) -> (B, 3, C, H, W)."""
    BN, H, W, C = x.shape
    x = jnp.transpose(x, (0, 3, 1, 2))
    return x.reshape(batch, 3, C, H, W)


class TriplaneUpsampleNetwork(nn.Module):
    in_channels: int = 1024
    out_channels: int = 40
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, triplanes: jnp.ndarray) -> jnp.ndarray:
        B = triplanes.shape[0]
        x = _planes_to_nhwc(triplanes)
        x = nn.ConvTranspose(
            self.out_channels,
            kernel_size=(2, 2),
            strides=(2, 2),
            padding="VALID",
            dtype=self.dtype,
            name="upsample",
        )(x)
        return _nhwc_to_planes(x, B)


def pixel_shuffle(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """(B, H, W, C*r^2) -> (B, H*r, W*r, C), torch PixelShuffle ordering.

    Torch PixelShuffle on NCHW views channels as (C, r, r); in NHWC that means
    the input channel index factors as c*r*r + i*r + j.
    """
    B, H, W, Crr = x.shape
    C = Crr // (factor * factor)
    x = x.reshape(B, H, W, C, factor, factor)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))  # B, H, r, W, r, C
    return x.reshape(B, H * factor, W * factor, C)


class PixelShuffleUpsampleNetwork(nn.Module):
    in_channels: int = 1024
    out_channels: int = 40
    scale_factor: int = 4
    conv_layers: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, triplanes: jnp.ndarray) -> jnp.ndarray:
        B = triplanes.shape[0]
        x = _planes_to_nhwc(triplanes)
        out_rr = self.out_channels * self.scale_factor * self.scale_factor
        for i in range(self.conv_layers):
            # reference keeps in_channels width until the last conv, ReLU between
            # (sf3d/models/network.py:40-62)
            features = out_rr if i == self.conv_layers - 1 else self.in_channels
            x = nn.Conv(
                features,
                kernel_size=(3, 3),
                padding="SAME",
                dtype=self.dtype,
                name=f"conv_{i}",
            )(x)
            if i != self.conv_layers - 1:
                x = nn.relu(x)
        x = pixel_shuffle(x, self.scale_factor)
        return _nhwc_to_planes(x, B)
