"""DINOv2 image encoder with AdaLN camera modulation (SF3D tokenizer).

Re-implements the reference's vendored ``Dinov2Model`` with its local
modification — per-layer AdaLN ``Modulation`` applied to the norm1/norm2
outputs, conditioned on the camera embedding
(``sf3d/models/tokenizers/dinov2.py:499-544``,
``sf3d/models/transformers/attention.py:5-31``) — as flax modules:

- conv patch embed (patch 14), CLS token, bicubic-interpolated position table
- 24 pre-LN layers: [LN -> modulate -> MHA -> layerscale -> +res,
  LN -> modulate -> MLP(GELU) -> layerscale -> +res]
- final LayerNorm; returns last_hidden_state (CLS + patches).

Modulation is x * (1 + scale) + shift with zero-init scale/shift projection
(single_layer=True variant: one Linear cond -> 2*hidden).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from sculptmate_tpu.ops.attention import dot_product_attention
from sculptmate_tpu.ops.resize import torch_bicubic_matrix

from sculptmate_tpu.models.vit import IMAGENET_MEAN, IMAGENET_STD


class Modulation(nn.Module):
    """AdaLN scale/shift from a condition vector; zero-init output."""

    embedding_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, condition):
        emb = nn.Dense(
            self.embedding_dim * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="linear2",
        )(jax.nn.silu(condition))
        scale, shift = jnp.split(emb, 2, axis=-1)
        return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


class LayerScale(nn.Module):
    dim: int
    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        lam = self.param(
            "lambda1",
            nn.initializers.constant(self.init_value),
            (self.dim,),
            jnp.float32,
        )
        return x * lam.astype(x.dtype)


class Dinov2Layer(nn.Module):
    hidden_size: int
    num_heads: int
    intermediate_size: int
    layer_norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, modulation_cond=None):
        head_dim = self.hidden_size // self.num_heads

        h = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype, name="norm1")(x)
        if modulation_cond is not None:
            h = Modulation(self.hidden_size, dtype=self.dtype, name="norm1_modulation")(
                h, modulation_cond
            )
        q = nn.Dense(self.hidden_size, dtype=self.dtype, name="query")(h)
        k = nn.Dense(self.hidden_size, dtype=self.dtype, name="key")(h)
        v = nn.Dense(self.hidden_size, dtype=self.dtype, name="value")(h)
        B, Nt, _ = q.shape
        q = q.reshape(B, Nt, self.num_heads, head_dim)
        k = k.reshape(B, Nt, self.num_heads, head_dim)
        v = v.reshape(B, Nt, self.num_heads, head_dim)
        attn = dot_product_attention(q, k, v).reshape(B, Nt, self.hidden_size)
        attn = nn.Dense(self.hidden_size, dtype=self.dtype, name="attn_output")(attn)
        attn = LayerScale(self.hidden_size, name="layer_scale1")(attn)
        x = x + attn

        h = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype, name="norm2")(x)
        if modulation_cond is not None:
            h = Modulation(self.hidden_size, dtype=self.dtype, name="norm2_modulation")(
                h, modulation_cond
            )
        h = nn.Dense(self.intermediate_size, dtype=self.dtype, name="mlp_fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.hidden_size, dtype=self.dtype, name="mlp_fc2")(h)
        h = LayerScale(self.hidden_size, name="layer_scale2")(h)
        return x + h


def _interp_pos_embed(pos_embed: jnp.ndarray, grid_h: int, grid_w: int) -> jnp.ndarray:
    """Torch-exact bicubic with the vendored model's scale_factor=+0.1 hack
    (``sf3d/models/tokenizers/dinov2.py:89-133``)."""
    cls_pos = pos_embed[:, :1]
    patch_pos = pos_embed[:, 1:]
    base = int(round(patch_pos.shape[1] ** 0.5))
    if base * base == patch_pos.shape[1] and base == grid_h == grid_w:
        return pos_embed
    C = patch_pos.shape[-1]
    x = patch_pos.reshape(base, base, C)
    Mh = jnp.asarray(torch_bicubic_matrix(base, grid_h, scale=(grid_h + 0.1) / base))
    Mw = jnp.asarray(torch_bicubic_matrix(base, grid_w, scale=(grid_w + 0.1) / base))
    x = jnp.einsum("hH,HWc->hWc", Mh, x)
    x = jnp.einsum("wW,hWc->hwc", Mw, x)
    return jnp.concatenate([cls_pos, x.reshape(1, grid_h * grid_w, C)], axis=1)


class Dinov2Encoder(nn.Module):
    """DINOv2 backbone (defaults = facebook/dinov2-large)."""

    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    patch_size: int = 14
    base_image_size: int = 518
    layer_norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images, modulation_cond=None):
        """images: (B, H, W, 3) normalized; modulation_cond: (B, Cc) or None."""
        B, H, W, _ = images.shape
        gh, gw = H // self.patch_size, W // self.patch_size

        x = nn.Conv(
            self.hidden_size,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(images)
        x = x.reshape(B, gh * gw, self.hidden_size)

        cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.hidden_size), jnp.float32
        )
        base_grid = self.base_image_size // self.patch_size
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, 1 + base_grid * base_grid, self.hidden_size),
            jnp.float32,
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (B, 1, self.hidden_size)).astype(x.dtype), x],
            axis=1,
        )
        x = x + _interp_pos_embed(pos_embed, gh, gw).astype(x.dtype)

        for i in range(self.num_layers):
            x = Dinov2Layer(
                self.hidden_size,
                self.num_heads,
                self.intermediate_size,
                self.layer_norm_eps,
                dtype=self.dtype,
                name=f"layer_{i}",
            )(x, modulation_cond)

        return nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype, name="layernorm")(x)


class DINOV2SingleImageTokenizer(nn.Module):
    """ImageNet-normalize + camera-modulated DINOv2; returns (B, C, Nt)."""

    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    patch_size: int = 14
    base_image_size: int = 518
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images, modulation_cond: Optional[jnp.ndarray] = None):
        """images: (B, H, W, 3) in [0, 1]."""
        mean = jnp.asarray(IMAGENET_MEAN, images.dtype)
        std = jnp.asarray(IMAGENET_STD, images.dtype)
        x = (images - mean) / std
        tokens = Dinov2Encoder(
            hidden_size=self.hidden_size,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            intermediate_size=self.intermediate_size,
            patch_size=self.patch_size,
            base_image_size=self.base_image_size,
            dtype=self.dtype,
            name="dinov2",
        )(x, modulation_cond)
        return jnp.swapaxes(tokens, 1, 2)
