"""Activation registry.

Covers the activations the reference dispatches by name:
``tsr/utils.py:234-252`` (exp/sigmoid/tanh/softplus/silu/...) and
``sf3d/models/network.py:77-136`` (trunc_exp, normalize_channel_last,
lin2srgb). ``trunc_exp`` clamps the gradient's exponent to avoid overflow,
matching the torch-ngp custom autograd op semantics.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x):
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


def normalize_channel_last(x, eps: float = 1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


def lin2srgb(x):
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(x <= 0.0031308, 12.92 * x, 1.055 * jnp.power(jnp.maximum(x, 1e-8), 1 / 2.4) - 0.055)


def normalize_channel_first(x, eps: float = 1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), eps)


# registry covers both dispatch tables: tsr/utils.py:234-252 and
# sf3d/models/network.py:98-136
_REGISTRY = {
    "none": lambda x: x,
    "linear": lambda x: x,
    "identity": lambda x: x,
    "exp": jnp.exp,
    "shifted_exp": lambda x: jnp.exp(x - 1.0),
    "trunc_exp": trunc_exp,
    "shifted_trunc_exp": lambda x: trunc_exp(x - 1.0),
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "softplus": jax.nn.softplus,
    "shifted_softplus": lambda x: jax.nn.softplus(x - 1.0),
    "scale_-11_01": lambda x: x * 0.5 + 0.5,
    "negative": lambda x: -x,
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),  # torch F.gelu = erf form
    "normalize_channel_last": normalize_channel_last,
    "normalize_channel_first": normalize_channel_first,
    "lin2srgb": lin2srgb,
}


def get_activation(name: Optional[str]) -> Callable:
    if name is None:
        return lambda x: x
    key = name.lower()
    if key not in _REGISTRY:
        raise ValueError(f"Unknown activation: {name}")
    return _REGISTRY[key]
