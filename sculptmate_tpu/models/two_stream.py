"""Two-stream interleave transformer — SF3D's triplane backbone.

Mirrors ``sf3d/models/transformers/backbone.py:398-515`` in flax: a latent
stream (projected image tokens + 1792 learned latents) and the 27 648-token
triplane stream, interleaved through ``num_blocks`` TwoStreamBlocks:
FuseBlock-in (latent <- triplane cross-attn), ``num_basic_blocks`` BasicBlocks
(latent self-attn + cross-attn to raw image tokens + GEGLU FF), FuseBlock-out
(triplane <- latent), with GroupNorm/proj in and proj-out + residual on the
triplane stream.

Also ports the reference's two present-but-unused modules for component
parity: ``SingleStreamTransformer`` (``backbone.py:151-208``) and the
plane-intersection-masked ``TriplaneAttention`` (``backbone.py:250-332``) —
dead code upstream (nothing in ``sf3d/system.py`` instantiates either), kept
here so checkpoints or configs that reference them still map.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from sculptmate_tpu.ops.attention import dot_product_attention
from sculptmate_tpu.ops.sharding import replicate_tokens, shard_heads

from sculptmate_tpu.models.transformer import FeedForward


class CrossAttention(nn.Module):
    """wq/wk/wv attention (q from x_q, kv from x_kv), reference naming."""

    dim: int
    kv_dim: Optional[int] = None
    num_heads: int = 16
    qkv_bias: bool = False
    tp_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_q, x_kv):
        head_dim = self.dim // self.num_heads
        q = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype, name="wq")(x_q)
        k = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype, name="wk")(x_kv)
        v = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype, name="wv")(x_kv)
        B, Nq, _ = q.shape
        Nk = k.shape[1]
        q = shard_heads(q.reshape(B, Nq, self.num_heads, head_dim), self.tp_axis)
        k = shard_heads(k.reshape(B, Nk, self.num_heads, head_dim), self.tp_axis)
        v = shard_heads(v.reshape(B, Nk, self.num_heads, head_dim), self.tp_axis)
        out = dot_product_attention(q, k, v, allow_flash=self.tp_axis is None).reshape(B, Nq, self.dim)
        out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
        return replicate_tokens(out, self.tp_axis)


class BasicBlock(nn.Module):
    """self-attn -> cross-attn -> GEGLU FF, pre-LN residuals
    (``backbone.py:107-148``)."""

    dim: int
    kv_dim: Optional[int] = None
    num_heads: int = 16
    qkv_bias: bool = False
    tp_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, x):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(z)
        z = z + CrossAttention(
            self.dim, num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            tp_axis=self.tp_axis, dtype=self.dtype, name="attn1",
        )(h, h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(z)
        z = z + CrossAttention(
            self.dim, kv_dim=self.kv_dim, num_heads=self.num_heads,
            qkv_bias=self.qkv_bias, tp_axis=self.tp_axis, dtype=self.dtype, name="attn2",
        )(h, x if x is not None else h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(z)
        z = z + FeedForward(self.dim, tp_axis=self.tp_axis, dtype=self.dtype, name="ff")(h)
        return z


class FuseBlock(nn.Module):
    """Fuse stream x into stream z by cross-attention (``backbone.py:211-247``)."""

    dim_z: int
    dim_x: int
    num_heads: int = 16
    qkv_bias: bool = False
    norm_x_input: bool = False
    tp_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, x):
        if self.norm_x_input:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_x")(x)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_z1")(z)
        z = z + CrossAttention(
            self.dim_z, kv_dim=self.dim_x, num_heads=self.num_heads,
            qkv_bias=self.qkv_bias, tp_axis=self.tp_axis, dtype=self.dtype, name="attn",
        )(h, x)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_z2")(z)
        z = z + FeedForward(self.dim_z, tp_axis=self.tp_axis, dtype=self.dtype, name="ff")(h)
        return z


class TwoStreamBlock(nn.Module):
    dim_latent: int
    dim_input: int
    num_basic_blocks: int = 3
    num_heads: int = 16
    qkv_bias: bool = False
    norm_x_input: bool = False
    dim_cross: Optional[int] = None
    tp_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, latent, input, cross_input):
        latent = FuseBlock(
            self.dim_latent, self.dim_input, self.num_heads, self.qkv_bias,
            self.norm_x_input, tp_axis=self.tp_axis, dtype=self.dtype,
            name="fuse_block_in",
        )(latent, input)
        for i in range(self.num_basic_blocks):
            latent = BasicBlock(
                self.dim_latent, kv_dim=self.dim_cross, num_heads=self.num_heads,
                qkv_bias=self.qkv_bias, tp_axis=self.tp_axis, dtype=self.dtype,
                name=f"transformer_block_{i}",
            )(latent, cross_input)
        input = FuseBlock(
            self.dim_input, self.dim_latent, self.num_heads, self.qkv_bias,
            self.norm_x_input, tp_axis=self.tp_axis, dtype=self.dtype,
            name="fuse_block_out",
        )(input, latent)
        return latent, input


class TwoStreamInterleaveTransformer(nn.Module):
    num_attention_heads: int = 16
    attention_head_dim: int = 64
    raw_triplane_channels: int = 1024
    triplane_channels: int = 1024
    raw_image_channels: int = 1024
    num_latents: int = 1792
    num_blocks: int = 4
    num_basic_blocks: int = 3
    latent_init_std: float = 0.02
    norm_num_groups: int = 32
    attention_bias: bool = False
    norm_x_input: bool = False
    cross_attention_dim: int = 1024
    mix_latent: bool = True
    tp_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, encoder_hidden_states):
        """hidden_states: (B, C_triplane, N_triplane) channels-first tokens;
        encoder_hidden_states: (B, N_image, C_image)."""
        latent_dim = self.num_attention_heads * self.attention_head_dim
        B = hidden_states.shape[0]
        residual = hidden_states

        x = jnp.swapaxes(hidden_states, 1, 2)  # (B, N, C)
        x = nn.GroupNorm(
            num_groups=self.norm_num_groups, epsilon=1e-6, dtype=self.dtype,
            name="norm_triplane",
        )(x)
        triplane_tokens = nn.Dense(
            self.triplane_channels, dtype=self.dtype, name="proj_triplane"
        )(x)

        if self.mix_latent:
            img = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_image")(encoder_hidden_states)
            image_tokens = nn.Dense(latent_dim, dtype=self.dtype, name="proj_image")(img)

        latent_init = self.param(
            "latent_init",
            nn.initializers.normal(self.latent_init_std),
            (1, self.num_latents, latent_dim),
            jnp.float32,
        )
        lat = jnp.broadcast_to(latent_init, (B, self.num_latents, latent_dim)).astype(
            triplane_tokens.dtype
        )
        lat = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_latent")(lat)
        lat = nn.Dense(latent_dim, dtype=self.dtype, name="proj_latent")(lat)
        latent_tokens = (
            jnp.concatenate([image_tokens, lat], axis=1) if self.mix_latent else lat
        )

        for i in range(self.num_blocks):
            latent_tokens, triplane_tokens = TwoStreamBlock(
                latent_dim,
                self.triplane_channels,
                num_basic_blocks=self.num_basic_blocks,
                num_heads=self.num_attention_heads,
                qkv_bias=self.attention_bias,
                norm_x_input=self.norm_x_input,
                dim_cross=self.cross_attention_dim,
                tp_axis=self.tp_axis,
                dtype=self.dtype,
                name=f"main_blocks_{i}",
            )(latent_tokens, triplane_tokens, encoder_hidden_states)

        out = nn.Dense(self.raw_triplane_channels, dtype=self.dtype, name="proj_out")(
            triplane_tokens
        )
        out = jnp.swapaxes(out, 1, 2)
        return (out + residual).astype(residual.dtype)


class SingleStreamTransformer(nn.Module):
    """Reference ``SingleStreamTransformer`` (``backbone.py:151-208``):
    GroupNorm + proj_in, N BasicBlocks over the triplane tokens (optional
    cross-attn source), proj_out + residual. Unused by the live SF3D wiring;
    ported for component parity."""

    num_attention_heads: int = 16
    attention_head_dim: int = 88
    in_channels: int = 1024
    num_layers: int = 16
    norm_num_groups: int = 32
    cross_attention_dim: Optional[int] = None
    attention_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, encoder_hidden_states=None):
        """hidden_states: (B, C, N) channels-first tokens."""
        inner = self.num_attention_heads * self.attention_head_dim
        residual = hidden_states
        x = jnp.swapaxes(hidden_states, 1, 2)
        x = nn.GroupNorm(
            num_groups=self.norm_num_groups, epsilon=1e-6, dtype=self.dtype, name="norm"
        )(x)
        x = nn.Dense(inner, dtype=self.dtype, name="proj_in")(x)
        for i in range(self.num_layers):
            x = BasicBlock(
                inner,
                kv_dim=self.cross_attention_dim,
                num_heads=self.num_attention_heads,
                qkv_bias=self.attention_bias,
                dtype=self.dtype,
                name=f"transformer_blocks_{i}",
            )(x, encoder_hidden_states)
        x = nn.Dense(self.in_channels, dtype=self.dtype, name="proj_out")(x)
        x = jnp.swapaxes(x, 1, 2)
        return (x + residual).astype(residual.dtype)


def triplane_attention_bias(res: int) -> np.ndarray:
    """(3 res^2, 3 res^2) additive bias restricting attention to
    plane-intersection lines (``backbone.py:251-272``). O(N^2) memory — only
    usable at small plane resolutions, like the reference's."""
    mask = np.zeros((3, res, res, 3, res, res), bool)
    i, j = np.meshgrid(np.arange(res), np.arange(res), indexing="ij")
    mask[0, i, j, 1, i, :] = True
    mask[0, i, j, 2, j, :] = True
    mask[1, i, j, 0, i, :] = True
    mask[1, i, j, 2, :, j] = True
    mask[2, i, j, 0, :, i] = True
    mask[2, i, j, 1, :, j] = True
    N = 3 * res * res
    bias = np.where(mask.reshape(N, N), 0.0, -np.inf).astype(np.float32)
    return bias


class TriplaneAttention(nn.Module):
    """Reference ``TriplaneAttention`` (``backbone.py:275-332``): self
    attention over the 3 res^2 triplane tokens, optionally masked so each
    token only attends along the intersection lines of the other two planes.
    Unused by the live SF3D wiring; ported for component parity."""

    dim: int
    resolution: int
    num_heads: int = 16
    qkv_bias: bool = False
    full_attention: bool = False
    dtype: jnp.dtype = jnp.float32
    tp_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        assert N == 3 * self.resolution**2, (N, self.resolution)
        head_dim = self.dim // self.num_heads
        q = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype, name="wq")(x)
        k = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype, name="wk")(x)
        v = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype, name="wv")(x)
        q = q.reshape(B, N, self.num_heads, head_dim)
        k = k.reshape(B, N, self.num_heads, head_dim)
        v = v.reshape(B, N, self.num_heads, head_dim)
        if self.full_attention:
            out = dot_product_attention(q, k, v, allow_flash=self.tp_axis is None)
        else:
            bias = jnp.asarray(triplane_attention_bias(self.resolution))
            out = jax.nn.dot_product_attention(q, k, v, bias=bias[None, None])
        out = out.reshape(B, N, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
