"""Triplane transformer backbone (TripoSR "Lean" path).

Re-implements the diffusers-style stack the reference vendors
(``tsr/models/transformer/transformer_1d.py:50-219``,
``basic_transformer_block.py``, ``attention.py``) as flax.linen modules:
pre-LN self-attention over the 3 072 triplane tokens, cross-attention into the
1 025 DINO image tokens, GEGLU feed-forward (mult 4), with a GroupNorm(32) +
linear projection in/out and a residual around the whole backbone.

Attention uses ``jax.nn.dot_product_attention`` so XLA lowers it to the fused
TPU attention path; computation dtype is configurable (bfloat16 by default on
TPU) while parameters stay float32.

Parameter names mirror the torch state-dict keys (to_q/to_k/to_v/to_out,
ff.net.0.proj/ff.net.2, norm1/2/3, proj_in/proj_out) so checkpoint conversion
is a pure name-map (see ``sculptmate_tpu/runtime/checkpoint.py``).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from sculptmate_tpu.ops.attention import dot_product_attention
from sculptmate_tpu.ops.sharding import replicate_tokens, shard_heads, shard_hidden


class Attention(nn.Module):
    """Multi-head attention with optional cross-attention source."""

    query_dim: int
    heads: int = 16
    dim_head: int = 64
    cross_attention_dim: Optional[int] = None
    bias: bool = False
    out_bias: bool = True
    tp_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, encoder_hidden_states=None):
        inner = self.heads * self.dim_head
        context = hidden_states if encoder_hidden_states is None else encoder_hidden_states

        q = nn.Dense(inner, use_bias=self.bias, dtype=self.dtype, name="to_q")(hidden_states)
        k = nn.Dense(inner, use_bias=self.bias, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(inner, use_bias=self.bias, dtype=self.dtype, name="to_v")(context)

        B, Nq, _ = q.shape
        Nk = k.shape[1]
        q = shard_heads(q.reshape(B, Nq, self.heads, self.dim_head), self.tp_axis)
        k = shard_heads(k.reshape(B, Nk, self.heads, self.dim_head), self.tp_axis)
        v = shard_heads(v.reshape(B, Nk, self.heads, self.dim_head), self.tp_axis)

        out = dot_product_attention(q, k, v, allow_flash=self.tp_axis is None)
        out = out.reshape(B, Nq, inner)
        out = nn.Dense(inner, use_bias=self.out_bias, dtype=self.dtype, name="to_out")(out)
        return replicate_tokens(out, self.tp_axis)


class GEGLU(nn.Module):
    dim_out: int
    tp_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = shard_hidden(h, self.tp_axis)
        gate = shard_hidden(gate, self.tp_axis)
        # torch F.gelu defaults to the exact erf form (basic_transformer_block.py:262-334)
        return h * jax.nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    tp_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        x = GEGLU(inner, tp_axis=self.tp_axis, dtype=self.dtype, name="net_0")(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="net_2")(x)
        return replicate_tokens(x, self.tp_axis)


class BasicTransformerBlock(nn.Module):
    """Pre-LN: self-attn -> cross-attn -> GEGLU FF, each with residual.

    Mirrors ``basic_transformer_block.py:149-206``.
    """

    dim: int
    heads: int
    dim_head: int
    cross_attention_dim: Optional[int] = None
    tp_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, encoder_hidden_states=None):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = x + Attention(
            self.dim, self.heads, self.dim_head, tp_axis=self.tp_axis,
            dtype=self.dtype, name="attn1"
        )(h)

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        x = x + Attention(
            self.dim,
            self.heads,
            self.dim_head,
            cross_attention_dim=self.cross_attention_dim,
            tp_axis=self.tp_axis,
            dtype=self.dtype,
            name="attn2",
        )(h, encoder_hidden_states)

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        x = x + FeedForward(self.dim, tp_axis=self.tp_axis, dtype=self.dtype, name="ff")(h)
        return x


class Transformer1D(nn.Module):
    """16-block cross-attention backbone over triplane tokens.

    Input/output layout is (B, C, N) channels-first to match the reference's
    token stream (``transformer_1d.py:179-218``); internally (B, N, C).
    """

    in_channels: int = 1024
    num_attention_heads: int = 16
    attention_head_dim: int = 64
    num_layers: int = 16
    cross_attention_dim: Optional[int] = 768
    norm_num_groups: int = 32
    tp_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, encoder_hidden_states=None):
        inner = self.num_attention_heads * self.attention_head_dim
        residual = hidden_states

        # GroupNorm over the channel dim of (B, C, N): flax GroupNorm expects
        # channels last, so operate on the transposed view.
        x = jnp.swapaxes(hidden_states, 1, 2)  # (B, N, C)
        x = nn.GroupNorm(
            num_groups=self.norm_num_groups, epsilon=1e-6, dtype=self.dtype, name="norm"
        )(x)
        x = nn.Dense(inner, dtype=self.dtype, name="proj_in")(x)

        for i in range(self.num_layers):
            x = BasicTransformerBlock(
                inner,
                self.num_attention_heads,
                self.attention_head_dim,
                cross_attention_dim=self.cross_attention_dim,
                tp_axis=self.tp_axis,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x, encoder_hidden_states)

        x = nn.Dense(self.in_channels, dtype=self.dtype, name="proj_out")(x)
        x = jnp.swapaxes(x, 1, 2)  # (B, C, N)
        return (x + residual).astype(residual.dtype)
