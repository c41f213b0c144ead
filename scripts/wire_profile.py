"""Stage timing of the wire-path extraction on the real TPU (scalar-synced)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

import sculptmate_tpu  # noqa: F401
from sculptmate_tpu.systems.tsr import TSR
from sculptmate_tpu.ops.density_grid import mlp_weights_from_params, query_density_grid
from sculptmate_tpu.geometry.marching_cubes import (
    _vertex_side,
    _vertex_side_wire,
    mc_wire_device,
    pack_bits_u8,
)
from sculptmate_tpu.geometry import mc_wire

import sys
R = int(sys.argv[1]) if len(sys.argv) > 1 else 256
MV = int(sys.argv[2]) if len(sys.argv) > 2 else 786432


def sync(x):
    np.asarray(jnp.ravel(x)[0])


def timeit(name, fn, *args, n=3):
    sync(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:40s} {1e3 * float(np.median(ts)):8.1f} ms")


def main():
    print("# device:", jax.devices()[0])
    tsr = TSR(dtype=jnp.bfloat16)
    img = jnp.zeros((1, 512, 512, 3))

    t0 = time.perf_counter()
    code = tsr.scene_codes(img)[0]
    sync(code)
    print(f"{'encode (compile+run)':40s} {1e3*(time.perf_counter()-t0):8.1f} ms")
    timeit("encode", lambda i: tsr.scene_codes(i)[0], img)

    weights = mlp_weights_from_params(tsr.params["decoder"]["layers"])
    spec = tsr.grid_spec(R)
    d64 = np.asarray(query_density_grid(code, weights, tsr.grid_spec(64)))
    thr = float(np.quantile(d64, 0.99 if R == 256 else 0.995))

    dens_fn = jax.jit(lambda c: query_density_grid(c, weights, spec) - thr)
    timeit("density 256^3", dens_fn, code)
    level = jax.block_until_ready(dens_fn(code))

    from sculptmate_tpu.geometry.marching_cubes import default_block_capacity
    BC = default_block_capacity(R, MV)
    print(f"# block capacity {BC}")
    vside = jax.jit(
        lambda lv: _vertex_side(
            lv, lv > 0, jnp.arange(R) < R - 1, MV, BC, False
        )[0].sum(),
        )
    timeit("vertex side z-order (packed path)", vside, level)
    vside_w = jax.jit(
        lambda lv: _vertex_side_wire(
            lv, lv > 0, jnp.arange(R) < R - 1, MV, BC
        )[0].sum(),
        )
    timeit("vertex side block-major (wire path)", vside_w, level)

    pack = jax.jit(lambda lv: pack_bits_u8((lv > 0).ravel()))
    timeit("occupancy bitpack", pack, level)

    wire_nocol = jax.jit(
        lambda lv: mc_wire_device(lv, MV, 0, None, None), static_argnums=()
    )
    timeit("mc_wire_device (no colors)", wire_nocol, level)

    full = jax.jit(
        lambda c: tsr._extract_wire_jit(c, R, thr, MV, True, BC)[0]
    )
    timeit("extract_wire (dens+verts+colors+pack)", full, code)

    wire = np.asarray(full(code))
    for _ in range(2):
        t0 = time.perf_counter()
        wire = np.asarray(full(code))
        print(f"{'D2H wire fetch':40s} {1e3*(time.perf_counter()-t0):8.1f} ms  ({wire.nbytes/1e6:.1f} MB incl device time)")

    nv = int(mc_wire.wire_counts(wire, 2)[0])
    print(f"# nv={nv}")
    for _ in range(3):
        t0 = time.perf_counter()
        verts, faces, colors, _ = mc_wire.decode_wire(
            wire, (R, R, R), MV, has_colors=False
        )
        print(f"{'host rebuild (C++)':40s} {1e3*(time.perf_counter()-t0):8.1f} ms  ({len(verts)} v {len(faces)} f)")


if __name__ == "__main__":
    main()
