"""Microbench for device-decimation primitives at SF3D mesh sizes.

Decides the design of the TPU quadric decimator: per-round cost is dominated
by endpoint-quadric gathers, per-vertex scatter-mins (matching), and face
remap gathers. Measures each at the 741K-face noise-mesh scale.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, n=5, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    # axon block_until_ready underreports; sync via scalar fetch
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.ravel()[0])
    return (time.perf_counter() - t0) / n


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    NV = 400_000
    F = 741_000
    E = 3 * F

    Q16 = jnp.asarray(rng.random((NV, 16), np.float32))
    Q8 = jnp.asarray(rng.random((NV, 8), np.float32))
    Q128 = jnp.asarray(rng.random((NV, 128), np.float32))
    pos = jnp.asarray(rng.random((NV,), np.float32))
    eidx = jnp.asarray(rng.integers(0, NV, E).astype(np.int32))
    fidx = jnp.asarray(rng.integers(0, NV, 3 * F).astype(np.int32))
    errs = jnp.asarray(rng.integers(0, 2**30, E).astype(np.int32))
    rows10 = jnp.asarray(rng.random((3 * F, 16), np.float32))

    def bench(name, fn, elems):
        dt = timed(jax.jit(fn))
        print(f"{name}: {dt*1e3:7.1f} ms  ({elems/dt/1e6:8.1f} M elem/s)")

    bench("row gather (NV,16)[E]", lambda: Q16[eidx], E * 16)
    bench("row gather (NV,8)[E]", lambda: Q8[eidx], E * 8)
    bench("row gather (NV,128)[E]", lambda: Q128[eidx], E * 128)
    bench("elem gather (NV,)[E] x3", lambda: (pos[eidx], pos[eidx], pos[eidx]), 3 * E)
    bench("elem gather (NV,)[3F] x1", lambda: pos[fidx], 3 * F)
    bench(
        "scatter-min i32 (NV,)[E]",
        lambda: jnp.full((NV,), 2**31 - 1, jnp.int32).at[eidx].min(errs),
        E,
    )
    bench(
        "scatter-add rows (3F,16)->(NV,16)",
        lambda: jnp.zeros((NV, 16), jnp.float32).at[fidx].add(rows10),
        3 * F * 16,
    )
    bench(
        "scatter-add elem (3F,)->(NV,) x10",
        lambda: [jnp.zeros((NV,), jnp.float32).at[fidx].add(rows10[:, c]) for c in range(10)],
        3 * F * 10,
    )
    bench("sort 2.2M i32 keys", lambda: jnp.sort(errs), E)
    bench(
        "argsort+segsum route",
        lambda: jax.ops.segment_sum(rows10[:, 0], fidx, num_segments=NV),
        3 * F,
    )
    # one-hot matmul alternative for quadric accumulation: (3F,16)^T @ onehot
    # is O(3F*NV) - infeasible. skip.


if __name__ == "__main__":
    main()
