"""BASELINE config 2 on one chip: batched 8-image throughput.

u2net matting + fused preprocess + encode run BATCHED (one jit over B=8);
extraction runs per-asset through the pipelined wire path (all device
programs dispatched up front, so asset i's D2H + native rebuild overlaps
asset i+1's device compute). Reports sec/asset THROUGHPUT (vs bench.py's
single-asset latency).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import sculptmate_tpu  # noqa: F401
from sculptmate_tpu.frontend.matting import U2NetMatting, U2NET_SIZE
from sculptmate_tpu.frontend.preprocess import preprocess_batch_device
from sculptmate_tpu.systems.tsr import TSR
from sculptmate_tpu.ops.density_grid import (
    mlp_weights_from_params,
    query_density_grid,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
RESOLUTION = 256


def main():
    print(f"# device: {jax.devices()[0]}, batch {B}", file=sys.stderr)
    tsr = TSR(dtype=jnp.bfloat16)
    matting = U2NetMatting()
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.random((B, 512, 512, 4), np.float32))
    raw_small = jnp.asarray(rng.random((B, U2NET_SIZE, U2NET_SIZE, 3), np.float32))

    @jax.jit
    def make_cond():
        mask = matting._predict(matting.variables, raw_small)
        alpha = jax.image.resize(mask[..., None], (B, 512, 512, 1), "linear")
        rgba = jnp.concatenate([raw[..., :3], alpha], axis=-1)
        return preprocess_batch_device(rgba, ratio=0.75, out_size=512)

    codes = tsr.scene_codes(make_cond())
    w = mlp_weights_from_params(tsr.params["decoder"]["layers"])
    d = query_density_grid(codes[0], w, tsr.grid_spec(64))
    thr = float(np.quantile(np.asarray(d), 0.99))

    def run_once():
        codes = tsr.scene_codes(make_cond())
        return tsr.extract_mesh(
            codes, has_vertex_color=True, resolution=RESOLUTION, threshold=thr
        )

    meshes = run_once()  # warmup (compiles + capacity calibration)
    nv = [len(m[0]) for m in meshes]
    print(f"# warmup meshes: {nv} verts", file=sys.stderr)
    meshes = run_once()  # warm final-capacity programs

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        meshes = run_once()
        times.append((time.perf_counter() - t0) / B)
    dt = float(np.median(times))
    print(f"# per-asset times: {[round(t, 3) for t in times]}", file=sys.stderr)
    import json

    print(
        json.dumps(
            {
                "metric": "e2e_batched_throughput",
                "value": round(dt, 4),
                "unit": "sec/asset",
                "batch": B,
                "vs_baseline": round(0.5 / dt, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
