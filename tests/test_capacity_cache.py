"""runtime.capacity_cache: cross-process persistence of observed device
buffer capacities (warm-start hints; overflow-retry keeps staleness safe)."""

import json
import os

import pytest

from sculptmate_tpu.runtime import capacity_cache


@pytest.fixture
def cap_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("SCULPTMATE_CAP_CACHE", str(tmp_path))
    return tmp_path


def test_roundtrip(cap_dir):
    assert capacity_cache.load("k") is None
    capacity_cache.store("k", (368640, 128, 50104))
    assert capacity_cache.load("k") == (368640, 128, 50104)
    # second key does not clobber the first
    capacity_cache.store("k2", [1, 2])
    assert capacity_cache.load("k") == (368640, 128, 50104)
    assert capacity_cache.load("k2") == (1, 2)


def test_overwrite(cap_dir):
    capacity_cache.store("k", (10,))
    capacity_cache.store("k", (20,))
    assert capacity_cache.load("k") == (20,)


def test_disabled(monkeypatch, tmp_path):
    monkeypatch.setenv("SCULPTMATE_CAP_CACHE", "0")
    capacity_cache.store("k", (1,))
    assert capacity_cache.load("k") is None
    assert not os.path.exists(tmp_path / "capacity_cache.json")


def test_corrupt_file_ignored(cap_dir):
    path = cap_dir / "capacity_cache.json"
    path.write_text("{not json")
    assert capacity_cache.load("k") is None
    capacity_cache.store("k", (5,))  # recovers by rewriting
    assert capacity_cache.load("k") == (5,)


def test_bad_value_shapes_rejected(cap_dir):
    path = cap_dir / "capacity_cache.json"
    path.write_text(json.dumps({"a": "nope", "b": [1, -2], "c": [1.5], "d": [3]}))
    assert capacity_cache.load("a") is None
    assert capacity_cache.load("b") is None
    assert capacity_cache.load("c") is None
    assert capacity_cache.load("d") == (3,)


def test_atomic_write_leaves_no_temp_files(cap_dir):
    capacity_cache.store("k", (1, 2, 3))
    leftovers = [p for p in os.listdir(cap_dir) if p.startswith(".capcache-")]
    assert leftovers == []


def test_tighten_shrinks_poisoned_capacity():
    # one 14M-vert noise mesh inflated the cap; a 2.9M-vert asset must
    # shrink it back to ~1.35x observed (bucket-rounded)
    cap = capacity_cache.tighten(17_104_896, 2_900_000)
    assert cap == 65536 * -(-int(1.35 * 2_900_000) // 65536)
    assert cap < 4_100_000


def test_tighten_hysteresis_keeps_steady_capacity():
    # normal fluctuation (observed within ~half the capacity) must NOT
    # flap the capacity — recompiles every call would cost more than the
    # slack
    for obs in (2_000_000, 2_400_000, 1_700_000):
        assert capacity_cache.tighten(4_000_000, obs) == 4_000_000
    # and a grown-then-matching capacity stays put
    assert capacity_cache.tighten(3_538_944, 2_900_000) == 3_538_944


def test_tighten_floor_and_buckets():
    # never below one bucket, always bucket-aligned
    assert capacity_cache.tighten(10_000_000, 0) == 65536
    assert capacity_cache.tighten(10_000_000, 10, bucket=4096) == 4096
    c = capacity_cache.tighten(10_000_000, 123_456, bucket=4096, slack=1.3)
    assert c % 4096 == 0 and c >= int(1.3 * 123_456)


def test_unwritable_store_is_best_effort(cap_dir, monkeypatch):
    # root ignores file modes, so simulate the read-only-site-packages case
    # by making the atomic replace fail
    def boom(*a, **k):
        raise OSError("read-only filesystem")

    monkeypatch.setattr(os, "replace", boom)
    capacity_cache.store("k", (1,))  # must not raise
    assert capacity_cache.load("k") is None
