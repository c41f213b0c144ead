"""Cross-process persistence for observed device-buffer capacities.

The extraction/bake programs dispatch with *static* buffer capacities:
conservative defaults are 20-40x the observed counts, and scatter cost on
TPU scales with capacity, not live count — so the first call in a fresh
process used to pay a giant-capacity execution (~2 min at 738 K faces
through the tunnel) plus a recompile once the capacities shrank to the
observed values. The in-process caches (``TSR._cap_cache``,
``SF3D._ub_caps``, ...) already fix this within a process; this module
persists them next to the XLA compile cache so a fresh process starts at
the steady-state capacities (whose compiled programs the XLA persistent
cache then serves).

Stale entries are harmless by construction: every consumer detects
overflow from exact wire counters and retries with grown capacities
(never truncates), so a too-small persisted value costs one retry and a
too-large one only costs speed.

Set ``SCULPTMATE_CAP_CACHE`` to a directory to relocate the store, or to
``0`` to disable persistence (tests point it at a per-session temp dir so
runs stay hermetic).
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Optional, Sequence, Tuple

_FILENAME = "capacity_cache.json"


def _path() -> Optional[str]:
    d = os.environ.get("SCULPTMATE_CAP_CACHE")
    if d == "0":
        return None
    if not d:
        d = os.environ.get("SCULPTMATE_JAX_CACHE", "/tmp/sculptmate_jax_cache")
    return os.path.join(d, _FILENAME)


def _read_all(path: str) -> dict:
    try:
        with open(path) as f:
            data = json.load(f)
        return data if isinstance(data, dict) else {}
    except (OSError, ValueError):
        return {}


def load(key: str) -> Optional[Tuple[int, ...]]:
    """Persisted capacities for ``key``, or None. Values are ints."""
    path = _path()
    if path is None:
        return None
    vals = _read_all(path).get(key)
    if not isinstance(vals, list) or not all(
        isinstance(v, int) and v >= 0 for v in vals
    ):
        return None
    return tuple(vals)


def tighten(
    current: int,
    observed: int,
    *,
    slack: float = 1.35,
    bucket: int = 65536,
    shrink_at: float = 2.0,
) -> int:
    """Capacity to persist after a SUCCESSFUL run that observed ``observed``
    live entries. Capacities only ever grew on overflow, so one giant asset
    permanently poisoned the cache: every later dispatch paid its buffer in
    scatter updates and D2H bytes (a 17 M-vert capacity from one noise mesh
    made a 2.9 M-vert extraction fetch ~200 MB instead of ~40 MB, +5 s
    through the tunnel). Shrink back toward ``slack * observed``
    (bucket-rounded, so capacities stay a small set of compiled program
    variants) — but only when the overshoot exceeds ``shrink_at`` x the
    target (hysteresis: normal asset-to-asset fluctuation must not flap the
    capacity and recompile every call). A later bigger asset costs one
    detected-overflow retry, never a truncation."""
    target = max(bucket, bucket * -(-int(slack * observed) // bucket))
    return target if current > shrink_at * target else current


def store(key: str, caps: Sequence[int]) -> None:
    """Read-modify-write with an atomic replace; a lost race between two
    processes drops one update, never corrupts the file."""
    path = _path()
    if path is None:
        return
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        data = _read_all(path)
        data[key] = [int(v) for v in caps]
        fd, tmp = tempfile.mkstemp(
            dir=os.path.dirname(path), prefix=".capcache-"
        )
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(data, f)
            os.replace(tmp, path)
        except BaseException:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise
    except OSError:
        # persistence is best-effort: a read-only cache dir must never
        # break the pipeline
        pass
