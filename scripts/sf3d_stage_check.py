"""Full-size SF3D stage-by-stage validation with explicit syncs."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import sculptmate_tpu  # noqa: F401
from sculptmate_tpu.systems.sf3d import SF3D


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    log(f"devices: {jax.devices()}")
    sf3d = SF3D()
    log("params initialized")
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((1, 512, 512, 4), np.float32))

    mask, rgb = sf3d.prepare_image(img)
    codes, direct = sf3d.get_scene_codes(rgb)
    np.asarray(codes.ravel()[0])
    log(f"encode ok: codes {codes.shape}")

    t0 = time.perf_counter()
    codes2, _ = sf3d.get_scene_codes(rgb)
    np.asarray(codes2.ravel()[0])
    log(f"encode steady-state: {(time.perf_counter()-t0)*1e3:.0f} ms")

    est = sf3d._estimate(sf3d.params, rgb * mask)
    np.asarray(est["decoder_roughness"]).ravel()
    log("estimator ok")

    # calibrate a threshold that cuts a surface
    from sculptmate_tpu.ops.density_grid import (
        lattice_coords_tets,
        query_grid_multihead,
    )

    heads = sf3d._head_weights(["density"])
    g = query_grid_multihead(
        codes[0], heads, lattice_coords_tets(sf3d.config.isosurface_resolution),
        sf3d.grid_spec(slab=7),
    )
    d = np.exp(np.asarray(g["density"][0]) - 1.0)
    thr = float(np.quantile(d, 0.99))
    log(f"density grid ok: range {d.min():.3f}..{d.max():.3f}, thr {thr:.3f}")

    t0 = time.perf_counter()
    mesh = sf3d.run_image(img, bake_resolution=512, threshold=thr)
    log(f"run_image ok in {time.perf_counter()-t0:.1f}s")
    if mesh is None:
        log("EMPTY MESH")
        return 1
    log(
        f"mesh: {len(mesh['verts'])} verts {len(mesh['faces'])} faces, "
        f"uv {mesh['uvs'].shape}, pngs "
        f"{ {k: len(v) for k, v in mesh['texture_pngs'].items()} }"
    )

    from sculptmate_tpu.io import write_glb

    write_glb(
        "/tmp/sf3d_full.glb", mesh["verts"], mesh["faces"],
        normals=mesh["normals"], uvs=mesh["uvs"], textures=mesh["texture_pngs"],
    )
    import os

    log(f"glb written: {os.path.getsize('/tmp/sf3d_full.glb')} bytes")

    from sculptmate_tpu.runtime.logging import StageMetrics

    # the single-core host is noisy (2-4x run-to-run on host-bound stages):
    # report per-stage medians of 3
    runs = []
    for _ in range(3):
        metrics = StageMetrics()
        t0 = time.perf_counter()
        mesh = sf3d.run_image(
            img, bake_resolution=512, threshold=thr, metrics=metrics
        )
        runs.append((time.perf_counter() - t0, metrics))
        log(f"steady-state run_image: {runs[-1][0]:.2f}s")
    med = sorted(r[0] for r in runs)[1]
    log(f"median run_image: {med:.2f}s")
    for name in runs[0][1]._order:
        vals = sorted(r[1].timings[name] for r in runs)
        log(f"  stage {name:10s} median {vals[1]:7.2f}s  (min {vals[0]:.2f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
