"""Triplane token embeddings.

- ``Triplane1DTokenizer`` — TripoSR: learned (3, C, H, W) embeddings
  broadcast to the batch and flattened to a (B, C, 3*H*W) token stream
  (``tsr/models/tokenizers/triplane.py:11-45``), init N(0,1)/sqrt(C).
- ``TriplaneLearnablePositionalEmbedding`` — SF3D: same idea at 96x96 with
  a (B, N, C) channels-last detokenize convention
  (``sf3d/models/tokenizers/triplane.py``).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def _scaled_normal(channels):
    def init(key, shape, dtype=jnp.float32):
        return nn.initializers.normal(1.0)(key, shape, dtype) / jnp.sqrt(channels)

    return init


class Triplane1DTokenizer(nn.Module):
    plane_size: int = 32
    num_channels: int = 1024

    def setup(self):
        self.embeddings = self.param(
            "embeddings",
            _scaled_normal(self.num_channels),
            (3, self.num_channels, self.plane_size, self.plane_size),
        )

    def __call__(self, batch_size: int) -> jnp.ndarray:
        """Returns (B, C, 3*H*W) token stream."""
        tokens = self.embeddings.reshape(1, 3, self.num_channels, -1)  # (1, 3, C, HW)
        tokens = jnp.swapaxes(tokens, 1, 2).reshape(1, self.num_channels, -1)
        return jnp.broadcast_to(tokens, (batch_size,) + tokens.shape[1:])

    def detokenize(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """(B, C, 3*H*W) -> (B, 3, C, H, W)."""
        B, C, _ = tokens.shape
        x = tokens.reshape(B, C, 3, self.plane_size, self.plane_size)
        return jnp.swapaxes(x, 1, 2)


class TriplaneLearnablePositionalEmbedding(nn.Module):
    plane_size: int = 96
    num_channels: int = 1024

    def setup(self):
        self.embeddings = self.param(
            "embeddings",
            _scaled_normal(self.num_channels),
            (3, self.num_channels, self.plane_size, self.plane_size),
        )

    def __call__(self, batch_size: int) -> jnp.ndarray:
        """Returns (B, 3*H*W, C) channels-last token stream."""
        tokens = self.embeddings.reshape(1, 3, self.num_channels, -1)
        tokens = jnp.swapaxes(tokens, 1, 2).reshape(1, self.num_channels, -1)
        tokens = jnp.swapaxes(tokens, 1, 2)  # (1, 3HW, C)
        return jnp.broadcast_to(tokens, (batch_size,) + tokens.shape[1:])

    def detokenize(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """(B, 3*H*W, C) -> (B, 3, C, H, W)."""
        B, _, C = tokens.shape
        x = jnp.swapaxes(tokens, 1, 2)  # (B, C, 3HW)
        x = x.reshape(B, C, 3, self.plane_size, self.plane_size)
        return jnp.swapaxes(x, 1, 2)
