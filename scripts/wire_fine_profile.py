"""Fine-grained breakdown of the block-major wire vertex side at 256^3.

Each stage is jitted standalone on realistic inputs (bench.py's noise
surface sizing: bc ~36K active block-rows, MV 786432) so its cost is
visible in isolation; XLA fuses some of these together in the real
program, so the sum is an upper bound on the fused pipeline.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import sculptmate_tpu  # noqa: F401
from sculptmate_tpu.geometry.marching_cubes import (
    BS,
    _block_bases,
    _block_local_offsets,
    _compacted_positions,
    _cut_masks,
    _vertex_side_wire,
    pack_bits_u8,
    scatter_compact_rows,
    to_blocked_rows,
)

R = 256
MV = 786432
BC = 36864


def timeit(name, fn, *args, n=3):
    fn(*args).block_until_ready()
    out = fn(*args)
    np.asarray(out.ravel()[0])  # scalar sync (block_until_ready lies on axon)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out.ravel()[0])
        ts.append(time.perf_counter() - t0)
    print(f"{name:42s} {sorted(ts)[n // 2] * 1e3:8.1f} ms", flush=True)


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(0)
    level = jnp.asarray(rng.standard_normal((R, R, R), np.float32))
    valid_x = jnp.arange(R) < R - 1

    masks_j = jax.jit(
        lambda lv: sum(
            m.sum(dtype=jnp.int32) for m in _cut_masks(lv > 0, valid_x)
        )
    )
    timeit("cut masks (3 full-grid elementwise)", masks_j, level)

    nb1 = R // BS
    NB = nb1**3

    def counts_f(lv):
        masks = _cut_masks(lv > 0, valid_x)
        vcnt = jnp.concatenate(
            [
                m.reshape(nb1, BS, nb1, BS, nb1, BS)
                .sum(axis=(1, 3, 5), dtype=jnp.int32)
                .ravel()
                for m in masks
            ]
        )
        return jnp.cumsum(vcnt) - vcnt

    timeit("masks + block counts + cumsum", jax.jit(counts_f), level)

    def blocked_f(lv):
        masks = _cut_masks(lv > 0, valid_x)
        return sum(
            to_blocked_rows(m).sum(dtype=jnp.int32) for m in masks
        )

    timeit("masks + to_blocked_rows x3", jax.jit(blocked_f), level)

    def gather_f(lv):
        masks = _cut_masks(lv > 0, valid_x)
        mask_b = jnp.concatenate([to_blocked_rows(m) for m in masks])
        ids = jnp.arange(BC, dtype=jnp.int32) % (3 * NB)
        return mask_b[ids].sum(dtype=jnp.int32)

    timeit("  + (BC, 512) row gather", jax.jit(gather_f), level)

    local_off = jnp.asarray(_block_local_offsets(R, R))
    gmask = jnp.asarray(rng.random((BC, 512)) < 0.018)  # ~9 cuts/row avg
    vrow = jnp.cumsum(gmask.sum(axis=1, dtype=jnp.int32))
    vrow = vrow - gmask.sum(axis=1, dtype=jnp.int32)
    srcb = jnp.arange(BC, dtype=jnp.int32) * 512

    scat = jax.jit(
        lambda g, vb, sb: scatter_compact_rows(
            g, vb, sb, local_off, MV, 3 * R * R * R
        ).sum()
    )
    timeit("scatter_compact_rows (hybrid, BC rows)", scat, gmask, vrow, srcb)

    edge_idx = jnp.asarray(
        rng.integers(0, 3 * R * R * R, MV, endpoint=False), jnp.int32
    )
    pos = jax.jit(
        lambda lv, ei: sum(
            p.sum() for p in _compacted_positions(lv, ei)[:4]
        )
    )
    timeit("_compacted_positions (t + gathers)", pos, level, edge_idx)

    timeit(
        "pack_bits_u8 (occupancy)",
        jax.jit(lambda lv: pack_bits_u8((lv > 0).ravel())),
        level,
    )

    full = jax.jit(
        lambda lv: _vertex_side_wire(lv, lv > 0, valid_x, MV, BC)[0].sum()
    )
    timeit("FULL _vertex_side_wire", full, level)


if __name__ == "__main__":
    sys.exit(main())
