"""Per-stage wall-clock profile of the lean e2e pipeline on the current device."""

import time

import jax
import jax.numpy as jnp
import numpy as np

import sculptmate_tpu  # noqa: F401  (enables the compilation cache)
from sculptmate_tpu.frontend.matting import U2NetMatting, U2NET_SIZE
from sculptmate_tpu.frontend.preprocess import preprocess_batch_device
from sculptmate_tpu.systems.tsr import TSR
from sculptmate_tpu.ops.density_grid import mlp_weights_from_params, query_density_grid


def t(name, fn, n=3):
    out = jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(fn())
    print(f"{name:28s} {(time.perf_counter() - t0) / n * 1e3:8.1f} ms")
    return out


def main():
    print("device:", jax.devices()[0])
    tsr = TSR(dtype=jnp.bfloat16)
    matting = U2NetMatting()
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.random((1, 512, 512, 4), np.float32))
    raw_small = jnp.asarray(rng.random((1, U2NET_SIZE, U2NET_SIZE, 3), np.float32))

    mask = t("matting 320^2", lambda: matting.predict_mask_batch(raw_small))

    up = jax.jit(
        lambda m: jax.image.resize(m[..., None], (1, 512, 512, 1), "linear")
    )
    alpha = t("mask upsample", lambda: up(mask))

    cat = jax.jit(lambda r, a: jnp.concatenate([r[..., :3], a], axis=-1))
    rgba = t("concat alpha", lambda: cat(raw, alpha))

    pre = jax.jit(lambda x: preprocess_batch_device(x, ratio=0.75, out_size=512))
    cond = t("fused preprocess 512", lambda: pre(rgba))

    codes = t("encode (ViT+backbone)", lambda: tsr._forward(tsr.params, cond))

    w = mlp_weights_from_params(tsr.params["decoder"]["layers"])
    spec64 = tsr.grid_spec(64)
    d64 = t("calib grid 64^3", lambda: query_density_grid(codes[0], w, spec64))
    thr = float(np.quantile(np.asarray(d64), 0.99))

    mv, mf = 8 * 256 * 256, 16 * 256 * 256
    ext = t(
        "extract jit (grid+MC)",
        lambda: tsr._extract_jit(codes[0], 256, thr, mv, mf),
    )
    nv, nf = int(ext.num_verts), int(ext.num_faces)
    print(f"{'mesh size':28s} {nv} verts {nf} faces")

    from sculptmate_tpu.geometry.packing import fetch_mesh

    t0 = time.perf_counter()
    verts, faces = fetch_mesh(ext, nv, nf)
    print(f"{'D2H packed verts+faces':28s} {(time.perf_counter() - t0) * 1e3:8.1f} ms")

    bucket = 1 << max(12, int(max(nv, len(verts)) - 1).bit_length())
    comps = []
    for c in range(3):
        buf = np.zeros((bucket,), np.float32)
        buf[: len(verts)] = verts[:, c]
        comps.append(jnp.asarray(buf))
    colors = t("vertex colors", lambda: tsr._colors_jit(codes[0], *comps))
    t0 = time.perf_counter()
    _ = np.asarray(colors)[:, :nv]
    print(f"{'D2H colors':28s} {(time.perf_counter() - t0) * 1e3:8.1f} ms")

    # full public API path for comparison
    t0 = time.perf_counter()
    meshes = tsr.extract_mesh(codes, has_vertex_color=True, resolution=256, threshold=thr)
    print(f"{'extract_mesh() total':28s} {(time.perf_counter() - t0) * 1e3:8.1f} ms "
          f"({len(meshes[0][0])} verts)")


if __name__ == "__main__":
    main()
