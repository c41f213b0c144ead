"""Sharding-constraint helpers for tensor-parallel modules.

Modules take an optional ``tp_axis`` mesh-axis name; when set, they annotate
their internal activations with bare ``PartitionSpec`` constraints and GSPMD
inserts the collectives (the Megatron pattern: attention heads and FF hidden
units column-sharded, output projections row-sharded with an implicit
reduce). Bare specs require an ambient mesh — callers wrap tracing in
``jax.sharding.set_mesh(mesh)`` (see ``parallel/farm.py``,
``__graft_entry__.py``).
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import PartitionSpec as P


def _ambient_mesh_empty() -> bool:
    try:
        return jax.sharding.get_abstract_mesh().empty
    except Exception:
        return True


def constrain(x, *spec):
    """``with_sharding_constraint`` with a bare PartitionSpec; a no-op when
    no ambient mesh is set (e.g. param init, single-chip runs)."""
    if _ambient_mesh_empty():
        return x
    return jax.lax.with_sharding_constraint(x, P(*spec))


def shard_heads(x, tp_axis: Optional[str]):
    """(B, N, H, D) attention tensor: shard heads over tp."""
    if tp_axis is None:
        return x
    return constrain(x, None, None, tp_axis, None)


def shard_hidden(x, tp_axis: Optional[str]):
    """(B, N, F) FF hidden: shard features over tp."""
    if tp_axis is None:
        return x
    return constrain(x, None, None, tp_axis)


def replicate_tokens(x, tp_axis: Optional[str]):
    """(B, N, C): force replication (the row-parallel reduce point)."""
    if tp_axis is None:
        return x
    return constrain(x, None, None, None)
