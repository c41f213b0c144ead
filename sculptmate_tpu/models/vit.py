"""ViT-B/16 image encoder (DINO) — TripoSR's image tokenizer.

Re-implements HF ``ViTModel`` semantics used by the reference
(``tsr/models/tokenizers/image.py:22-60``; config at
``TripoSR/checkpoints/config.json``: hidden 768, 12 layers, 12 heads,
intermediate 3072, patch 16, LN eps 1e-12) as flax modules:

- Conv patch embedding, learned CLS token, learned position embeddings for a
  base 224^2 grid (14x14) interpolated to the actual grid (32x32 at 512^2
  input) — ``interpolate_pos_encoding=True``, torch-exact bicubic (a=-0.75,
  ``ops/resize.py:torch_bicubic_matrix``).
- 12 pre-LN encoder layers: LN -> MHA (qkv bias) -> +res, LN -> MLP(GELU) ->
  +res, then a final LayerNorm.

``DINOSingleImageTokenizer`` wraps the encoder with ImageNet normalization and
returns channels-first local features (B, C, Nt), matching the reference's
token layout.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from sculptmate_tpu.ops.attention import dot_product_attention
from sculptmate_tpu.ops.resize import interpolate_pos_table

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class ViTSelfAttention(nn.Module):
    hidden_size: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        head_dim = self.hidden_size // self.num_heads
        q = nn.Dense(self.hidden_size, dtype=self.dtype, name="query")(x)
        k = nn.Dense(self.hidden_size, dtype=self.dtype, name="key")(x)
        v = nn.Dense(self.hidden_size, dtype=self.dtype, name="value")(x)
        B, N, _ = q.shape
        q = q.reshape(B, N, self.num_heads, head_dim)
        k = k.reshape(B, N, self.num_heads, head_dim)
        v = v.reshape(B, N, self.num_heads, head_dim)
        out = dot_product_attention(q, k, v).reshape(B, N, self.hidden_size)
        return nn.Dense(self.hidden_size, dtype=self.dtype, name="output")(out)


class ViTLayer(nn.Module):
    hidden_size: int
    num_heads: int
    intermediate_size: int
    layer_norm_eps: float = 1e-12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype, name="layernorm_before")(x)
        x = x + ViTSelfAttention(self.hidden_size, self.num_heads, dtype=self.dtype, name="attention")(h)
        h = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype, name="layernorm_after")(x)
        h = nn.Dense(self.intermediate_size, dtype=self.dtype, name="intermediate")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.hidden_size, dtype=self.dtype, name="mlp_output")(h)
        return x + h


def interpolate_pos_embed(pos_embed: jnp.ndarray, grid_size: int) -> jnp.ndarray:
    """Resize the (1, 1+P^2, C) position table to a (1, 1+grid^2, C) table.

    Torch-exact bicubic (A=-0.75, align_corners=False), matching HF
    ``ViTEmbeddings.interpolate_pos_encoding`` (interpolate_pos_encoding=True
    at ``tsr/models/tokenizers/image.py:50``)."""
    cls_pos = pos_embed[:, :1]
    patch_pos = pos_embed[:, 1:]
    base = int(round(patch_pos.shape[1] ** 0.5))
    if base == grid_size:
        return pos_embed
    patch_pos = interpolate_pos_table(patch_pos[0], grid_size, grid_size)[None]
    return jnp.concatenate([cls_pos, patch_pos], axis=1)


class ViTEncoder(nn.Module):
    """ViT backbone returning last_hidden_state (B, 1 + grid^2, hidden)."""

    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    patch_size: int = 16
    base_image_size: int = 224
    layer_norm_eps: float = 1e-12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        """images: (B, H, W, 3) channels-last, already normalized."""
        B, H, W, _ = images.shape
        grid = H // self.patch_size

        x = nn.Conv(
            self.hidden_size,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(images)
        x = x.reshape(B, grid * grid, self.hidden_size)

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
        x = jnp.concatenate([jnp.broadcast_to(cls_token, (B, 1, self.hidden_size)).astype(x.dtype), x], axis=1)
        x = x + interpolate_pos_embed(pos_embed, grid).astype(x.dtype)

        for i in range(self.num_layers):
            x = ViTLayer(
                self.hidden_size,
                self.num_heads,
                self.intermediate_size,
                self.layer_norm_eps,
                dtype=self.dtype,
                name=f"layer_{i}",
            )(x)

        return nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype, name="layernorm")(x)


class DINOSingleImageTokenizer(nn.Module):
    """ImageNet-normalize + ViT encode; returns (B, C, Nt) channels-first.

    Defaults are the reference's ViT-B/16 (``TripoSR/checkpoints/config.json``).
    """

    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    patch_size: int = 16
    base_image_size: int = 224
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        """images: (B, H, W, 3) in [0, 1]."""
        mean = jnp.asarray(IMAGENET_MEAN, images.dtype)
        std = jnp.asarray(IMAGENET_STD, images.dtype)
        x = (images - mean) / std
        tokens = ViTEncoder(
            hidden_size=self.hidden_size,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            intermediate_size=self.intermediate_size,
            patch_size=self.patch_size,
            base_image_size=self.base_image_size,
            dtype=self.dtype,
            name="vit",
        )(x)
        return jnp.swapaxes(tokens, 1, 2)
