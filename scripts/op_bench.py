"""Honest per-op TPU microbenchmarks (sync via scalar D2H, defeating any
async-scheduler underreporting)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

import sculptmate_tpu  # noqa: F401  (compilation cache)


def timed(name, fn, *args, n=3):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        _sync(fn(*args))
    print(f"{name:36s} {(time.perf_counter() - t0) / n * 1e3:9.1f} ms")


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])  # force a real device round trip


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)

    R = 256
    lvl_np = rng.standard_normal((R, R, R)).astype(np.float32)
    lvl = jnp.asarray(lvl_np)

    timed("cumsum 150M i32", jax.jit(lambda x: jnp.cumsum((x > 0).ravel().astype(jnp.int32))), jnp.asarray(rng.standard_normal(3 * R**3).astype(np.float32)))

    mask = jnp.asarray(rng.random(3 * R**3) < 0.04)
    nz = jax.jit(lambda m: jnp.nonzero(m, size=2_097_152, fill_value=m.shape[0])[0])
    timed("nonzero size=2M over 50M", nz, mask)

    idx = jnp.asarray(rng.integers(0, R**3, size=2_097_152).astype(np.int32))
    table = jnp.asarray(rng.standard_normal(R**3).astype(np.float32))
    timed("gather 2M from 16.7M", jax.jit(lambda t, i: t[i]), table, idx)

    idx6 = jnp.asarray(rng.integers(0, 3 * R**3, size=12_582_912).astype(np.int32))
    vid = jnp.asarray(rng.integers(0, 2**20, size=3 * R**3).astype(np.int32))
    timed("gather 12.6M from 50M", jax.jit(lambda t, i: t[i]), vid, idx6)

    from sculptmate_tpu.geometry.marching_cubes import marching_cubes

    mc = jax.jit(lambda l: marching_cubes(l, 2_097_152, 4_194_304))
    g = jnp.linspace(-1, 1, R)
    X, Y, Z = jnp.meshgrid(g, g, g, indexing="ij")
    sph = 0.6 - jnp.sqrt(X**2 + Y**2 + Z**2)
    timed("marching cubes 256^3 (sphere)", mc, sph)

    from sculptmate_tpu.models.heads import NeRFMLP
    from sculptmate_tpu.ops.density_grid import (
        DensityGridSpec,
        mlp_weights_from_params,
        query_density_grid,
    )

    mlp = NeRFMLP()
    params = mlp.init(jax.random.PRNGKey(0), jnp.zeros((1, 120)))["params"]
    w = mlp_weights_from_params(params["layers"])
    tri = jnp.asarray(rng.standard_normal((3, 40, 64, 64)).astype(np.float32))

    for dt, lbl in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        spec = DensityGridSpec(resolution=R, compute_dtype=dt)
        timed(f"density grid XLA {lbl}", jax.jit(lambda t: query_density_grid(t, w, spec)), tri)

    # encode
    from sculptmate_tpu.systems.tsr import TSR

    tsr = TSR(dtype=jnp.bfloat16)
    img = jnp.asarray(rng.random((1, 512, 512, 3)).astype(np.float32))
    timed("encode 512^2 (ViT+backbone) bf16", lambda i: tsr._forward(tsr.params, i), img)


if __name__ == "__main__":
    main()
