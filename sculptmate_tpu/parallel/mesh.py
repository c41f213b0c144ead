"""Device-mesh helpers: the framework's scale-out substrate.

The reference has no distributed code at all (SURVEY.md section 2.6); here
parallelism is a first-class layer built on ``jax.sharding``:

- ``dp`` axis: data parallelism over assets (the v5e-8 "asset farm").
- ``sp`` axis: grid-axis sharding of the density lattice / marching-cubes
  volume (the sequence-parallel analog for 512^3 extraction).
- ``tp`` axis: triplane-token / attention-head sharding of the backbone.

All communication is XLA GSPMD collectives over ICI: annotate shardings, let
the compiler insert all-gather/reduce-scatter.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("dp",),
    devices=None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    assert int(np.prod(shape)) == n, f"mesh {shape} != {n} devices"
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def factor2(n: int) -> Tuple[int, int]:
    """Split n into the most-square (a, b) factoring, a*b == n."""
    a = int(np.sqrt(n))
    while n % a:
        a -= 1
    return a, n // a


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(mesh: Mesh, tree, axis: str = "dp"):
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(tree, sharding)


def batch_spec(axis: str = "dp") -> P:
    return P(axis)
