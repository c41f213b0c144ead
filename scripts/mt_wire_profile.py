"""Fine-grained breakdown of the SF3D MT-wire extraction program at the
production operating point (res 160 -> N 161 lattice, ~575K raw verts on the
bench's noise surface). Each stage is jitted standalone; XLA fuses some of
these in the real program, so the sum upper-bounds the fused pipeline.

Usage: python scripts/mt_wire_profile.py  (real TPU)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import sculptmate_tpu  # noqa: F401
from sculptmate_tpu.geometry.marching_cubes import (
    pack_bits_u8,
    scatter_compact_rows,
    to_blocked_rows,
)
from sculptmate_tpu.geometry.marching_tets import (
    BS,
    EDGE_DIRS,
    _block_bases,
    _block_local_offsets,
    _mt_positions,
    _mt_vertex_side_wire,
    lattice_size,
    mt_wire_device,
)

RES = 160
N = lattice_size(RES)
NP_ = -(-N // BS) * BS
N3P = NP_**3
NB = (NP_ // BS) ** 3
MV = 655360  # ~1.14x the bench noise surface's 575K raw verts
BC = 106496  # active vert blocks (bench capacity after tighten)


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    np.asarray(jax.tree_util.tree_leaves(outs[-1])[0].ravel()[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{name:46s} {dt * 1e3:8.1f} ms", flush=True)
    return dt


def main():
    print(f"device: {jax.devices()[0].device_kind}  N={N} Np={NP_}", flush=True)
    rng = np.random.default_rng(0)
    sdf = jnp.asarray(rng.standard_normal(N**3).astype(np.float32))
    dx = jnp.asarray(rng.standard_normal(N**3).astype(np.float32))
    dy = jnp.asarray(rng.standard_normal(N**3).astype(np.float32))
    dz = jnp.asarray(rng.standard_normal(N**3).astype(np.float32))

    # the 161^3 two-head density+offset query (merged-head path)
    from sculptmate_tpu.models.heads import MaterialMLP
    from sculptmate_tpu.ops.density_grid import (
        DensityGridSpec,
        lattice_coords_tets,
        mlp_weights_from_params,
        query_grid_multihead,
    )
    from sculptmate_tpu.systems.sf3d import DEFAULT_HEADS

    mlp = MaterialMLP(heads=DEFAULT_HEADS)
    params = mlp.init(jax.random.PRNGKey(0), jnp.zeros((1, 120)))["params"]
    heads = {
        n: mlp_weights_from_params(params[f"head_{n}"])
        for n in ("density", "vertex_offset")
    }
    tri = jnp.asarray(rng.standard_normal((3, 40, 384, 384)).astype(np.float32))
    spec = DensityGridSpec(
        resolution=RES, align_corners=True, slab=7, compute_dtype=jnp.bfloat16
    )
    coords = lattice_coords_tets(RES)

    q = jax.jit(
        lambda t: sum(
            g.sum() for gs in query_grid_multihead(t, heads, coords, spec).values()
            for g in gs
        )
    )
    timeit("161^3 query 2 heads bf16 (merged)", q, tri)

    # cut masks (7 rolls) + block counts + cumsum
    def pad3(a, fill):
        a = a.reshape(N, N, N)
        return jnp.pad(a, ((0, NP_ - N),) * 3, constant_values=fill)

    ar = jnp.arange(NP_)

    def masks_of(s):
        occ3 = pad3(s, -1.0) > 0
        out = []
        for d in range(7):
            ddx, ddy, ddz = (int(v) for v in EDGE_DIRS[d])
            m = occ3 != jnp.roll(occ3, (-ddx, -ddy, -ddz), (0, 1, 2))
            dom = (
                (ar[:, None, None] < N - ddx)
                & (ar[None, :, None] < N - ddy)
                & (ar[None, None, :] < N - ddz)
            )
            out.append(m & dom)
        return out

    timeit(
        "7 cut masks (rolls)",
        jax.jit(lambda s: sum(m.sum(dtype=jnp.int32) for m in masks_of(s))),
        sdf,
    )

    def counts_f(s):
        ms = masks_of(s)
        nb1 = NP_ // BS
        vcnt = jnp.concatenate(
            [
                m.reshape(nb1, BS, nb1, BS, nb1, BS)
                .sum(axis=(1, 3, 5), dtype=jnp.int32)
                .ravel()
                for m in ms
            ]
        )
        return jnp.cumsum(vcnt) - vcnt

    timeit("+ block counts + cumsum", jax.jit(counts_f), sdf)

    def blocked_f(s):
        ms = masks_of(s)
        return sum(to_blocked_rows(m).sum(dtype=jnp.int32) for m in ms)

    timeit("+ to_blocked_rows x7", jax.jit(blocked_f), sdf)

    local_off = jnp.asarray(_block_local_offsets(NP_))
    gmask = jnp.asarray(rng.random((BC, 512)) < 0.011)  # ~5.5 cuts/row
    vrow = jnp.cumsum(gmask.sum(axis=1, dtype=jnp.int32))
    vrow = vrow - gmask.sum(axis=1, dtype=jnp.int32)
    srcb = jnp.arange(BC, dtype=jnp.int32) * 512

    timeit(
        "scatter_compact_rows (hybrid, k=32)",
        jax.jit(
            lambda g, vb, sb: scatter_compact_rows(
                g, vb, sb, local_off, MV, 7 * N3P, k=32
            ).sum()
        ),
        gmask, vrow, srcb,
    )

    edge_idx = jnp.asarray(
        rng.integers(0, 7 * N3P, MV, endpoint=False), jnp.int32
    )
    sdfp = jnp.asarray(rng.standard_normal(N3P).astype(np.float32))
    dxp = jnp.asarray(rng.standard_normal(N3P).astype(np.float32))
    dyp = jnp.asarray(rng.standard_normal(N3P).astype(np.float32))
    dzp = jnp.asarray(rng.standard_normal(N3P).astype(np.float32))

    timeit(
        "_mt_positions (full-grid + stacked take)",
        jax.jit(
            lambda s, a, b, c, e: sum(
                x.sum()
                for x in _mt_positions(s, a, b, c, e, RES, NP_, 0.2)[:3]
            )
        ),
        sdfp, dxp, dyp, dzp, edge_idx,
    )

    timeit(
        "pack_bits_u8 (occ)",
        jax.jit(lambda s: pack_bits_u8((pad3(s, -1.0) > 0).ravel())),
        sdf,
    )

    timeit(
        "FULL mt_wire_device",
        jax.jit(
            lambda s, a, b, c: mt_wire_device(
                s, a, b, c, RES, MV, BC, snap_eps=0.2
            ).sum()
        ),
        sdf, dx, dy, dz,
    )


if __name__ == "__main__":
    sys.exit(main())
