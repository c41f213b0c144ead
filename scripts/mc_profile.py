"""Stage-level timing of the 256^3 extraction path on the real TPU.

Times, as separate jitted programs (so each can be synced):
  1. density grid query alone
  2. cut-edge masks + block activity reduce
  3. + global vid cumsum
  4. full marching_cubes
  5. packed extract (density + MC + colors + pack)
plus the one packed D2H fetch.

Run alone (no concurrent TPU/CPU jobs): python scripts/mc_profile.py [R]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

R = int(sys.argv[1]) if len(sys.argv) > 1 else 256


def sync(x):
    # block_until_ready underreports through the axon tunnel; force a scalar
    # transfer of a reduction
    np.asarray(jnp.ravel(x)[0])


def timeit(name, fn, *args, n=3):
    fn(*args)  # compile
    sync(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:36s} {1e3 * float(np.median(ts)):8.1f} ms")
    return float(np.median(ts))


def main():
    from sculptmate_tpu.systems.tsr import TSR
    from sculptmate_tpu.ops.density_grid import (
        mlp_weights_from_params,
        query_density_grid,
    )
    import importlib

    # plain ``import ... as mc`` resolves to the *function* re-exported by
    # geometry/__init__, not the module
    mc = importlib.import_module("sculptmate_tpu.geometry.marching_cubes")

    print(f"# device: {jax.devices()[0]}, R={R}", file=sys.stderr)
    tsr = TSR(dtype=jnp.bfloat16)
    code = tsr.scene_codes(jnp.zeros((1, 512, 512, 3)))[0]
    weights = mlp_weights_from_params(tsr.params["decoder"]["layers"])
    spec = tsr.grid_spec(R)

    # calibrated threshold for a realistic surface
    d64 = np.asarray(query_density_grid(code, weights, tsr.grid_spec(64)))
    thr = float(np.quantile(d64, 0.99))

    dens_fn = jax.jit(lambda c: query_density_grid(c, weights, spec) - thr)
    t_dens = timeit("density query", dens_fn, code)
    density = dens_fn(code)
    density = jax.block_until_ready(density)

    nb = R // 8
    NB = nb**3

    @jax.jit
    def stage_masks(level):
        inside = level > 0
        masks = []
        for axis in range(3):
            m = jnp.zeros((R, R, R), bool)
            if axis == 0:
                m = m.at[: R - 1].set(inside[:-1] != inside[1:])
            elif axis == 1:
                m = m.at[:, : R - 1].set(inside[:, :-1] != inside[:, 1:])
            else:
                m = m.at[:, :, : R - 1].set(inside[:, :, :-1] != inside[:, :, 1:])
            masks.append(m)
        blk = jnp.concatenate(
            [m.reshape(nb, 8, nb, 8, nb, 8).any(axis=(1, 3, 5)).ravel() for m in masks]
        )
        return blk.sum()

    timeit("cut masks + block reduce", stage_masks, density)

    @jax.jit
    def stage_vid(level):
        inside = level > 0
        masks = []
        for axis in range(3):
            m = jnp.zeros((R, R, R), bool)
            if axis == 0:
                m = m.at[: R - 1].set(inside[:-1] != inside[1:])
            elif axis == 1:
                m = m.at[:, : R - 1].set(inside[:, :-1] != inside[:, 1:])
            else:
                m = m.at[:, :, : R - 1].set(inside[:, :, :-1] != inside[:, :, 1:])
            masks.append(m)
        mask_flat = jnp.concatenate([m.ravel() for m in masks])
        vid = jnp.cumsum(mask_flat.astype(jnp.int32))
        return vid[-1]

    timeit("  + global vid cumsum (3R^3)", stage_vid, density)

    @jax.jit
    def stage_case(level):
        inside = (level > 0).astype(jnp.int32)
        pad = jnp.pad(inside, ((0, 1), (0, 1), (0, 1)))
        case = jnp.zeros((R, R, R), jnp.int32)
        for c in range(8):
            ox, oy, oz = c & 1, (c >> 1) & 1, (c >> 2) & 1
            case = case + (pad[ox : ox + R, oy : oy + R, oz : oz + R] << c)
        tri_table_np, tri_count_np, _ = mc.build_tables()
        ntri = jnp.asarray(tri_count_np)[case]
        return ntri.reshape(nb, 8, nb, 8, nb, 8).sum(axis=(1, 3, 5)).ravel().sum()

    timeit("cell cases + tri-count gather", stage_case, density)

    # full MC at bench capacities
    mv, mf = 786432, 1376256
    mc_jit = jax.jit(mc.marching_cubes, static_argnums=(1, 2, 3, 4))

    def run_mc(level):
        r = mc_jit(level, mv, mf, 0, False)
        return r.num_verts

    t_mc = timeit("marching_cubes (block path)", run_mc, density)

    def run_mc_dense(level):
        r = mc_jit(level, mv, mf, 0, True)
        return r.num_verts

    timeit("marching_cubes (dense path)", run_mc_dense, density)

    # packed end-to-end extract incl. colors
    def run_packed(c):
        return tsr._extract_packed_jit(c, R, thr, mv, mf, True, 0, False)

    t_pack = timeit("packed extract (dens+mc+colors)", run_packed, code)

    packed = run_packed(code)
    t0 = time.perf_counter()
    out = np.asarray(packed)
    t_d2h = time.perf_counter() - t0
    print(f"{'packed D2H fetch':36s} {1e3 * t_d2h:8.1f} ms  ({out.nbytes / 1e6:.1f} MB)")
    nv, nf = int(out[0, -4]), int(out[0, -3])
    print(f"# mesh: {nv} verts {nf} faces", file=sys.stderr)


if __name__ == "__main__":
    main()
