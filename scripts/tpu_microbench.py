"""Per-stage TPU microbenchmark / memory bisect for the TSR path."""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, n=3, warmup=1):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / n, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="all")
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--max-verts", type=int, default=1_000_000)
    ap.add_argument("--max-faces", type=int, default=2_000_000)
    ap.add_argument("--dtype", default="bf16")
    args = ap.parse_args()

    print("devices:", jax.devices())
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    if args.stage in ("all", "encode"):
        from sculptmate_tpu.systems.tsr import TSR

        tsr = TSR(dtype=dtype)
        img = jnp.asarray(np.random.rand(1, 512, 512, 3).astype(np.float32))
        dt, codes = timed(tsr.scene_codes, img)
        print(f"encode (image->scene codes): {dt*1e3:.1f} ms, codes {codes.shape}")
    else:
        codes = jnp.asarray(np.random.randn(1, 3, 40, 64, 64).astype(np.float32))

    from sculptmate_tpu.models.heads import NeRFMLP
    from sculptmate_tpu.ops.density_grid import (
        DensityGridSpec,
        mlp_weights_from_params,
        query_density_grid,
    )

    mlp = NeRFMLP()
    params = mlp.init(jax.random.PRNGKey(0), jnp.zeros((1, 120)))["params"]
    weights = mlp_weights_from_params(params["layers"])

    if args.stage in ("all", "grid"):
        spec = DensityGridSpec(resolution=args.res, compute_dtype=dtype)
        f = jax.jit(lambda tri: query_density_grid(tri, weights, spec))
        dt, dens = timed(f, codes[0])
        qps = args.res**3 / dt
        print(f"density grid {args.res}^3: {dt*1e3:.1f} ms = {qps/1e9:.2f} Gqueries/s")
    else:
        dens = jnp.zeros((args.res,) * 3, jnp.float32)

    if args.stage in ("all", "mc"):
        from sculptmate_tpu.geometry.marching_cubes import marching_cubes

        mcf = jax.jit(
            lambda lvl: marching_cubes(lvl, args.max_verts, args.max_faces)
        )
        # synthetic level with a real surface: sphere
        g = jnp.linspace(-1, 1, args.res)
        X, Y, Z = jnp.meshgrid(g, g, g, indexing="ij")
        lvl = 0.6 - jnp.sqrt(X**2 + Y**2 + Z**2)
        dt, res = timed(mcf, lvl)
        print(
            f"marching cubes {args.res}^3: {dt*1e3:.1f} ms = "
            f"{args.res**3/dt/1e6:.0f} Mvox/s, verts={int(res.num_verts)} faces={int(res.num_faces)}"
        )


if __name__ == "__main__":
    main()
