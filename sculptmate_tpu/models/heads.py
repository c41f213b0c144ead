"""MLP decoder heads over triplane features.

- ``NeRFMLP`` — TripoSR's density+color decoder
  (``tsr/models/network_utils.py:35-124``): 120 -> 64, 9 hidden layers, SiLU,
  out 4 = density(1) + features(3).
- ``MaterialMLP`` — SF3D's multi-head decoder
  (``sf3d/models/network.py:148-210``): shared input, per-head hidden stacks
  with per-head output activation/bias, head selection by include/exclude.

Both also expose their raw weight stacks so the fused separable grid query
(``sculptmate_tpu/ops/density_grid.py``) can consume them directly.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from sculptmate_tpu.ops.activations import get_activation


class MLPStack(nn.Module):
    """Linear/act alternating stack: in -> n_neurons x n_layers -> out."""

    n_neurons: int
    n_hidden_layers: int
    out_channels: int
    activation: str = "silu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.activation)
        for i in range(self.n_hidden_layers):
            x = nn.Dense(self.n_neurons, dtype=self.dtype, name=f"dense_{i}")(x)
            x = act(x)
        return nn.Dense(self.out_channels, dtype=self.dtype, name="dense_out")(x)


class NeRFMLP(nn.Module):
    in_channels: int = 120
    n_neurons: int = 64
    n_hidden_layers: int = 9
    activation: str = "silu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        feats = MLPStack(
            self.n_neurons,
            self.n_hidden_layers,
            4,
            self.activation,
            dtype=self.dtype,
            name="layers",
        )(x)
        return {"density": feats[..., 0:1], "features": feats[..., 1:4]}


class MaterialMLP(nn.Module):
    """SF3D decoder: shared 120-d input, independent per-head MLPs.

    ``heads`` is a tuple of dicts with keys: name, out_channels,
    n_hidden_layers, output_activation, out_bias (optional).
    The reference appends estimator outputs via ``decoder_``-prefixed keys
    added to the feature dict before the head runs (``sf3d/system.py:392-394``)
    — handled by the caller passing ``extra`` biases per head.
    """

    heads: Tuple[Dict[str, Any], ...]
    in_channels: int = 120
    n_neurons: int = 64
    activation: str = "silu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        include: Optional[Sequence[str]] = None,
        exclude: Optional[Sequence[str]] = None,
        extra: Optional[Dict[str, jnp.ndarray]] = None,
    ) -> Dict[str, jnp.ndarray]:
        selected = []
        for head in self.heads:
            name = head["name"]
            if include is not None and name not in include:
                continue
            if exclude is not None and name in exclude:
                continue
            selected.append(head)

        out: Dict[str, jnp.ndarray] = {}
        # NOTE: initialize with include=None (all heads) so every head's params
        # are created; later calls may select subsets.
        for head in selected:
            name = head["name"]
            h = MLPStack(
                self.n_neurons,
                int(head.get("n_hidden_layers", 2)),
                int(head["out_channels"]),
                self.activation,
                dtype=self.dtype,
                name=f"head_{name}",
            )(x)
            h = h + float(head.get("out_bias", 0.0))
            if extra and name in extra:
                h = h + extra[name]
            h = get_activation(head.get("output_activation"))(h)
            out[name] = h
        return out
