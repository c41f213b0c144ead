"""CLIP ViT-B/32 visual encoder (for the SF3D material estimator).

Replaces the reference's frozen open_clip dependency
(``sf3d/models/image_estimator/clip_based_estimator.py:44-47``) with a flax
implementation of the open_clip/OpenAI visual tower: conv patch embed (32),
class embedding, learned position table, pre-LN transformer (12 x width 768,
heads 12, GELU MLP x4) wrapped by ln_pre/ln_post, projected to 512-d image
features.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from sculptmate_tpu.ops.attention import dot_product_attention

OPENAI_DATASET_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_DATASET_STD = (0.26862954, 0.26130258, 0.27577711)


class CLIPBlock(nn.Module):
    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        head_dim = self.width // self.heads
        h = nn.LayerNorm(dtype=self.dtype, name="ln_1")(x)
        qkv = nn.Dense(self.width * 3, dtype=self.dtype, name="in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        B, N, _ = q.shape
        q = q.reshape(B, N, self.heads, head_dim)
        k = k.reshape(B, N, self.heads, head_dim)
        v = v.reshape(B, N, self.heads, head_dim)
        attn = dot_product_attention(q, k, v).reshape(B, N, self.width)
        x = x + nn.Dense(self.width, dtype=self.dtype, name="out_proj")(attn)

        h = nn.LayerNorm(dtype=self.dtype, name="ln_2")(x)
        h = nn.Dense(self.width * 4, dtype=self.dtype, name="mlp_fc")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.width, dtype=self.dtype, name="mlp_proj")(h)
        return x + h


class CLIPVisual(nn.Module):
    """ViT-B/32 visual tower -> (B, embed_dim) image features."""

    width: int = 768
    layers: int = 12
    heads: int = 12
    patch_size: int = 32
    image_size: int = 224
    embed_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        """images: (B, 224, 224, 3), already CLIP-normalized."""
        B, H, W, _ = images.shape
        grid = H // self.patch_size
        x = nn.Conv(
            self.width,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            use_bias=False,
            dtype=self.dtype,
            name="patch_embed",
        )(images)
        x = x.reshape(B, grid * grid, self.width)

        class_emb = self.param(
            "class_embedding", nn.initializers.normal(0.02), (self.width,), jnp.float32
        )
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.02),
            (1 + grid * grid, self.width),
            jnp.float32,
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(class_emb[None, None], (B, 1, self.width)).astype(x.dtype), x],
            axis=1,
        )
        x = x + pos.astype(x.dtype)[None]
        x = nn.LayerNorm(dtype=self.dtype, name="ln_pre")(x)

        for i in range(self.layers):
            x = CLIPBlock(self.width, self.heads, dtype=self.dtype, name=f"block_{i}")(x)

        cls = nn.LayerNorm(dtype=self.dtype, name="ln_post")(x[:, 0])
        proj = self.param(
            "proj", nn.initializers.normal(0.02), (self.width, self.embed_dim), jnp.float32
        )
        return cls @ proj.astype(cls.dtype)
