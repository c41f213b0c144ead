"""BASELINE config 4: 512^3 chunked extraction + device MC + quadric simplify
to 20k tris, on one chip."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import sculptmate_tpu  # noqa: F401
from sculptmate_tpu.systems.tsr import TSR


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    log(f"devices: {jax.devices()}")
    tsr = TSR(dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    codes = tsr.scene_codes(jnp.asarray(rng.random((1, 512, 512, 3)), jnp.float32))
    log("codes ready")

    from sculptmate_tpu.ops.density_grid import (
        mlp_weights_from_params,
        query_density_grid,
    )

    w = mlp_weights_from_params(tsr.params["decoder"]["layers"])
    d64 = np.asarray(query_density_grid(codes[0], w, tsr.grid_spec(64)))
    thr = float(np.quantile(d64, 0.995))
    log(f"threshold {thr:.4f}")

    t0 = time.perf_counter()
    meshes = tsr.extract_mesh(codes, resolution=512, threshold=thr)
    verts, faces, _ = meshes[0]
    log(f"512^3 extraction: {time.perf_counter()-t0:.1f}s -> {len(verts)} verts {len(faces)} faces")

    t0 = time.perf_counter()
    meshes = tsr.extract_mesh(codes, resolution=512, threshold=thr)
    verts, faces, _ = meshes[0]
    dt = time.perf_counter() - t0
    log(f"steady-state 512^3: {dt:.2f}s = {512**3/dt/1e6:.0f} Mvox/s")

    from sculptmate_tpu.geometry.decimate import decimate

    t0 = time.perf_counter()
    v2, f2 = decimate(verts, faces, target_ratio=20000 / max(len(faces), 1))
    log(
        f"quadric simplify -> {len(f2)} faces in {time.perf_counter()-t0:.1f}s"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
