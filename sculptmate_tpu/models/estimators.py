"""Global material / illumination estimators (SF3D).

- ``ClipBasedHeadEstimator``: frozen CLIP ViT-B/32 features -> per-head
  Beta(a, b) parameters (two softplus stacks) evaluated at the mode,
  producing the global roughness/metallic scalars routed into the decoder
  (``sf3d/models/image_estimator/clip_based_estimator.py:90-168``,
  consumed via ``decoder_``-prefixed keys at ``sf3d/system.py:392-394``).
- ``MultiHeadEstimator``: strided convs over concatenated triplanes ->
  max-pool -> heads (illumination spherical-gaussian amplitudes), gated by
  ``estimate_illumination`` (``sf3d/models/global_estimator/``).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from sculptmate_tpu.models.clip import (
    CLIPVisual,
    OPENAI_DATASET_MEAN,
    OPENAI_DATASET_STD,
)
from sculptmate_tpu.ops.activations import get_activation
from sculptmate_tpu.ops.resize import resize_bilinear


def beta_mode(alpha: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """Mode of Beta(a, b) matching torch.distributions.Beta.mode semantics
    (defined for a, b > 1; clamped into [0, 1] otherwise)."""
    return jnp.clip((alpha - 1.0) / jnp.maximum(alpha + beta - 2.0, 1e-6), 0.0, 1.0)


class _HeadStack(nn.Module):
    hidden: int
    n_layers: int
    activation: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.activation)
        for i in range(self.n_layers):
            x = act(nn.Dense(self.hidden, dtype=self.dtype, name=f"dense_{i}")(x))
        return x


class ClipBasedHeadEstimator(nn.Module):
    heads: Tuple[Dict[str, Any], ...] = (
        {
            "name": "roughness",
            "out_channels": 1,
            "n_hidden_layers": 3,
            "output_activation": "linear",
            "add_to_decoder_features": True,
            "output_bias": 1.0,
            "shape": (-1, 1, 1),
        },
        {
            "name": "metallic",
            "out_channels": 1,
            "n_hidden_layers": 3,
            "output_activation": "linear",
            "add_to_decoder_features": True,
            "output_bias": 1.0,
            "shape": (-1, 1, 1),
        },
    )
    hidden_features: int = 512
    activation: str = "relu"
    clip_width: int = 768
    clip_layers: int = 12
    clip_heads: int = 12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cond_image: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """cond_image: (B, H, W, 3) masked rgb in [0, 1]."""
        x = resize_bilinear(cond_image, 224, 224)
        x = (x - jnp.asarray(OPENAI_DATASET_MEAN, x.dtype)) / jnp.asarray(
            OPENAI_DATASET_STD, x.dtype
        )
        feats = CLIPVisual(
            width=self.clip_width,
            layers=self.clip_layers,
            heads=self.clip_heads,
            embed_dim=self.hidden_features,
            dtype=self.dtype,
            name="clip",
        )(x)  # (B, hidden_features)

        out: Dict[str, jnp.ndarray] = {}
        for head in self.heads:
            name = head["name"]
            shared = _HeadStack(
                self.hidden_features,
                int(head.get("n_hidden_layers", 3)),
                self.activation,
                dtype=self.dtype,
                name=f"{name}_shared",
            )(feats)
            params = []
            for pi in range(2):
                h = _HeadStack(
                    self.hidden_features, 1, self.activation,
                    dtype=self.dtype, name=f"{name}_p{pi}",
                )(shared)
                h = nn.Dense(1, dtype=self.dtype, name=f"{name}_p{pi}_out")(h)[..., 0]
                params.append(h)
            bias = float(head.get("output_bias", 0.0))
            a = jax.nn.softplus(params[0] + bias)
            b = jax.nn.softplus(params[1] + bias)
            val = get_activation(head.get("output_activation"))(beta_mode(a, b))
            if head.get("shape"):
                val = val.reshape(tuple(head["shape"]))
            key = f"decoder_{name}" if head.get("add_to_decoder_features") else name
            out[key] = val
        return out


class MultiHeadEstimator(nn.Module):
    """Triplane -> pooled features -> illumination heads
    (``sf3d/models/global_estimator/multi_head_estimator.py``)."""

    heads: Tuple[Dict[str, Any], ...] = (
        {
            "name": "sg_amplitudes",
            "out_channels": 24,
            "n_hidden_layers": 3,
            "output_activation": "softplus",
            "output_bias": 1.0,
            "shape": (-1, 24, 1),
        },
    )
    triplane_features: int = 1024
    pool_features: int = 512
    hidden_features: int = 512
    activation: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, triplane: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """triplane: (B, 3, C, H, W) raw (non-postprocessed) codes."""
        B, Np, C, H, W = triplane.shape
        x = triplane.reshape(B, Np * C, H, W)
        x = jnp.transpose(x, (0, 2, 3, 1))  # NHWC
        act = get_activation(self.activation)
        # reference: Conv2d k3 s2 padding 0 (multi_head_estimator.py:42-50)
        x = act(
            nn.Conv(
                self.pool_features, (3, 3), strides=(2, 2), padding="VALID",
                dtype=self.dtype, name="conv1",
            )(x)
        )
        x = act(
            nn.Conv(
                self.pool_features, (3, 3), strides=(2, 2), padding="VALID",
                dtype=self.dtype, name="conv2",
            )(x)
        )
        x = jnp.max(x, axis=(1, 2))  # global max pool -> (B, pool)

        out: Dict[str, jnp.ndarray] = {}
        for head in self.heads:
            name = head["name"]
            h = _HeadStack(
                self.hidden_features,
                int(head.get("n_hidden_layers", 3)),
                self.activation,
                dtype=self.dtype,
                name=f"{name}_stack",
            )(x)
            h = nn.Dense(int(head["out_channels"]), dtype=self.dtype, name=f"{name}_out")(h)
            h = h + float(head.get("output_bias", 0.0))
            h = get_activation(head.get("output_activation"))(h)
            if head.get("shape"):
                h = h.reshape(tuple(head["shape"]))
            out[name] = h
        return out
