"""Single-chip benchmark: end-to-end image -> mesh seconds per asset.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
... optional per-config keys ...}.

Primary metric (the reference's canonical Lean path, SURVEY.md section 3.2):
512^2 image -> u2net matting (320^2) -> fused device preprocess -> DINO ViT +
16-block backbone -> triplane upsample -> fused 256^3 density grid -> device
marching cubes -> vertex colors -> compacted host arrays. The steady-state
loop is SOFTWARE-PIPELINED (``TSR.extract_mesh_async``/``extract_mesh_wait``):
iteration i+1's device programs are enqueued before iteration i's wire fetch,
so the tunneled D2H transfer (whose latency fluctuates 30-500 ms per sync
across a session) hides under device compute instead of being serially
exposed — exactly how a production serving loop runs. 9 timed iterations in
3 blocks of 3: ``value`` = median block, ``value_min`` = fastest block (the
contention-robust floor — tunnel spikes and host contention only ever
inflate a block), ``spread`` = (max-min)/median across blocks.

Additional BASELINE.md configs, each a median of >= 3 and gated by a wall
-clock budget (``SCULPTMATE_BENCH_BUDGET`` seconds, default 1500) so the
primary metric always lands:

- ``sf3d_sec_per_asset``: SF3D image -> UV-unwrapped baked textures
  (config 3; reference operating point ``StableFast/generate.py:34`` +
  ``sf3d/system.py:308-528``).
- ``highres512_sec``: 512^3 chunked extraction + quadric simplify to 20k
  tris (config 4's full definition; vs the reference's 256^3 x 8192-chunk
  host loop + ``mesh_simplify.py``, ``TripoSR/generate.py:11-13``).
- ``farm_sec_per_asset``: batched 8-image throughput via the AssetFarm API
  (config 5) on this chip's 1-device dp mesh.
- ``sf3d_farm_sec_per_asset``: SF3D at batch scale via ``SF3DFarm`` (host
  decode/decimate of asset i round-robined against device unwrap+bake of
  asset i+1).

Baseline: TripoSR ~0.5 s/image on an NVIDIA A100 (arxiv 2403.02151, via
PAPERS.md; the reference repo itself publishes no numbers — BASELINE.md).
``vs_baseline`` is the speedup factor vs that 0.5 s (>1 = faster).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_SEC_PER_ASSET = 0.5
RESOLUTION = 256
N_BLOCKS = 3  # timed blocks of BLOCK pipelined iterations each
BLOCK = 3  # 9 timed iterations total: fits a cold driver budget; the
# anti-spike defense is the block median PLUS the reported min-of-blocks
# (``value_min``): a tunnel-latency spike or host contention can inflate a
# block, never deflate one, so min-of-blocks is the contention-robust floor
PIPELINE_DEPTH = 3


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench_lean(tsr, matting):
    """Primary metric: pipelined steady-state lean-path sec/asset."""
    from sculptmate_tpu.frontend.matting import U2NET_SIZE
    from sculptmate_tpu.frontend.preprocess import preprocess_batch_device

    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.random((1, 512, 512, 4), np.float32))
    raw_small = jnp.asarray(rng.random((1, U2NET_SIZE, U2NET_SIZE, 3), np.float32))

    @jax.jit
    def make_cond():
        # 1. matting (device) -> alpha; 2. fused preprocess -> 512^2 cond
        mask = matting._predict(matting.variables, raw_small)
        alpha = jax.image.resize(mask[..., None], (1, 512, 512, 1), "linear")
        rgba = jnp.concatenate([raw[..., :3], alpha], axis=-1)
        return preprocess_batch_device(rgba, ratio=0.75, out_size=512)

    # calibrate threshold on the SAME conditioning pipeline so the timed
    # extraction cuts a realistically sized surface (random-init weights give
    # a noise-like field; the mean level cuts a pathological ~12M-face
    # surface, the 99th percentile a compact one comparable to a real object)
    from sculptmate_tpu.ops.density_grid import (
        mlp_weights_from_params,
        query_density_grid,
    )

    codes = tsr.scene_codes(make_cond())
    w = mlp_weights_from_params(tsr.params["decoder"]["layers"])
    d = query_density_grid(codes[0], w, tsr.grid_spec(64))
    threshold = float(np.quantile(np.asarray(d), 0.99))

    cap = 0

    def dispatch():
        codes = tsr.scene_codes(make_cond())
        return tsr.extract_mesh_async(
            codes[0],
            has_vertex_color=True,
            resolution=RESOLUTION,
            threshold=threshold,
            max_verts=cap,
        )

    # warmup (compiles) + capacity sizing off the warmup mesh (like a
    # production server would, per model checkpoint): avoids per-iteration
    # overflow retries and capacity-inflated transfers. The explicit cap is
    # honored as-given — a stale persisted capacity cannot inflate it.
    verts, faces, colors = tsr.extract_mesh_wait(dispatch())[0]
    log(f"# warmup mesh: {len(verts)} verts {len(faces)} faces")
    if len(verts) == 0:
        log("# WARNING: empty benchmark mesh - threshold miscalibrated")
    cap = 65536 * -(-int(len(verts) * 1.25) // 65536)
    verts, faces, colors = tsr.extract_mesh_wait(dispatch())[0]
    log(f"# capacities: max_verts={cap}")

    # steady state: keep PIPELINE_DEPTH iterations in flight so each wire
    # fetch + native rebuild overlaps the next iterations' device compute.
    # Retire PIPELINE_DEPTH results untimed first: the first retirement pays
    # the whole pipeline-fill latency and the next few drain the backlog
    # that built up behind it — startup transients in both directions, not
    # the steady-state rate being measured.
    inflight = [dispatch() for _ in range(PIPELINE_DEPTH)]
    for _ in range(PIPELINE_DEPTH):
        inflight.append(dispatch())
        tsr.extract_mesh_wait(inflight.pop(0), store=False)
    # time BLOCK-iteration blocks, not single retirements: retirements
    # oscillate anti-correlated around the steady rate (a slow tunnel sync
    # is followed by a fast backlog drain), so per-retirement spread
    # overstates variance that block throughput doesn't actually have
    iter_times = []
    block_times = []
    for _ in range(N_BLOCKS):
        t_block = time.perf_counter()
        for _ in range(BLOCK):
            t0 = time.perf_counter()
            inflight.append(dispatch())
            tsr.extract_mesh_wait(inflight.pop(0), store=False)
            iter_times.append(time.perf_counter() - t0)
        block_times.append((time.perf_counter() - t_block) / BLOCK)
    for h in inflight:  # drain
        tsr.extract_mesh_wait(h, store=False)

    dt = float(np.median(block_times))
    spread = (max(block_times) - min(block_times)) / dt
    log(f"# iteration times: {[round(t, 3) for t in iter_times]}")
    log(f"# block sec/asset: {[round(t, 4) for t in block_times]}")
    log(f"# median {dt:.4f}s min {min(block_times):.4f}s spread {spread:.3f}")
    # methodology: the tunneled D2H link adds 30-500 ms latency spikes and
    # the single host core is contention-sensitive; both only ever INFLATE a
    # block, so ``value`` (median of blocks) is the honest serving latency
    # under current host conditions and ``value_min`` (min of blocks) is the
    # contention-robust floor the chip itself sustains.
    return {
        "metric": "e2e_image_to_mesh",
        "value": round(dt, 4),
        "unit": "sec/asset",
        "vs_baseline": round(BASELINE_SEC_PER_ASSET / dt, 3),
        "iterations": N_BLOCKS * BLOCK,
        "spread": round(float(spread), 3),
        "value_min": round(float(min(block_times)), 4),
    }


def bench_sf3d(state):
    """Config 3: SF3D image -> UV-unwrapped baked 512^2 PBR textures."""
    from sculptmate_tpu.systems.sf3d import SF3D
    from sculptmate_tpu.ops.density_grid import (
        lattice_coords_tets,
        query_grid_multihead,
    )

    sf3d = SF3D()
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((1, 512, 512, 4), np.float32))

    mask, rgb = sf3d.prepare_image(img)
    codes, _ = sf3d.get_scene_codes(rgb)
    heads = sf3d._head_weights(["density"])
    g = query_grid_multihead(
        codes[0], heads, lattice_coords_tets(sf3d.config.isosurface_resolution),
        sf3d.grid_spec(slab=7),
    )
    d = np.exp(np.asarray(g["density"][0]) - 1.0)
    threshold = float(np.quantile(d, 0.99))
    state["sf3d"], state["sf3d_threshold"] = sf3d, threshold

    mesh = sf3d.run_image(img, bake_resolution=512, threshold=threshold)
    if mesh is None:
        raise RuntimeError("empty SF3D mesh - threshold miscalibrated")
    log(
        f"# sf3d warmup: {len(mesh['verts'])} verts {len(mesh['faces'])} faces"
    )
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        sf3d.run_image(img, bake_resolution=512, threshold=threshold)
        times.append(time.perf_counter() - t0)
    log(f"# sf3d times: {[round(t, 2) for t in times]}")
    return float(np.median(times))


def bench_sf3d_farm(state, batch: int = 2):
    """SF3D at batch scale through ``SF3DFarm`` (dp-sharded front + one
    batched MT-wire fetch + host decode/decimate round-robined against the
    device unwrap+bake). On this one-chip host dp=1; the win over the
    sequential ``run_image`` loop is the host/device overlap."""
    from jax.sharding import Mesh

    from sculptmate_tpu.parallel.sf3d_farm import SF3DFarm

    sf3d, threshold = state["sf3d"], state["sf3d_threshold"]
    devs = np.array(jax.devices())
    mesh = Mesh(devs.reshape(len(devs)), ("dp",))
    farm = SF3DFarm(sf3d, mesh)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((batch, 512, 512, 4), np.float32))

    meshes = farm.generate_batch(
        imgs, bake_resolution=512, threshold=threshold
    )  # warmup (compiles + capacity calibration)
    log(f"# sf3d farm warmup: {[len(m['verts']) for m in meshes if m]} verts")
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        farm.generate_batch(imgs, bake_resolution=512, threshold=threshold)
        times.append((time.perf_counter() - t0) / batch)
    log(f"# sf3d farm per-asset times: {[round(t, 2) for t in times]}")
    return float(np.median(times))


def bench_highres(tsr):
    """Config 4 (BASELINE.md:46, complete definition): 512^3 chunked
    extraction + device MC + quadric simplify to 20k tris, sec/asset. The
    host-side native decimation of each retired mesh runs inside the
    pipelined loop, overlapping the next assets' device extraction."""
    from sculptmate_tpu.geometry.decimate import decimate
    from sculptmate_tpu.ops.density_grid import (
        mlp_weights_from_params,
        query_density_grid,
    )

    TARGET_TRIS = 20000
    rng = np.random.default_rng(0)
    codes = tsr.scene_codes(
        jnp.asarray(rng.random((1, 512, 512, 3)), jnp.float32)
    )
    w = mlp_weights_from_params(tsr.params["decoder"]["layers"])
    d64 = np.asarray(query_density_grid(codes[0], w, tsr.grid_spec(64)))
    threshold = float(np.quantile(d64, 0.995))

    cap = 0

    def dispatch():
        return tsr.extract_mesh_async(
            codes[0], resolution=512, threshold=threshold, max_verts=cap
        )

    def retire(handle):
        (verts, faces, _), _ = tsr.extract_mesh_wait(handle, store=False)
        if len(faces) > TARGET_TRIS:
            verts, faces = decimate(
                verts, faces, target_ratio=TARGET_TRIS / len(faces)
            )
        return verts, faces

    (verts, faces, _), _ = tsr.extract_mesh_wait(dispatch())
    log(f"# 512^3 warmup: {len(verts)} verts {len(faces)} faces")
    cap = 65536 * -(-int(len(verts) * 1.25) // 65536)
    # pipelined like the lean loop (TWO extra extractions in flight: the
    # ~21 MB wire fetch is 0.2-1.5 s on the fluctuating link, so one
    # in-flight iteration cannot always cover it); timed as blocks of 2
    # (each iteration is seconds - spikes are small relative to a block),
    # median of 3 blocks
    inflight = [dispatch()]
    v, f = retire(inflight.pop(0))  # warm sized program + decimator
    log(f"# 512^3 simplified: {len(f)} faces")
    inflight = [dispatch(), dispatch()]
    block_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(2):
            inflight.append(dispatch())
            retire(inflight.pop(0))
        block_times.append((time.perf_counter() - t0) / 2)
    for h in inflight:
        tsr.extract_mesh_wait(h, store=False)
    log(f"# 512^3 block sec/asset (incl simplify): "
        f"{[round(t, 2) for t in block_times]}")
    return float(np.median(block_times))


def bench_farm(tsr, matting, batch: int = 8):
    """Config 5: batched throughput via the AssetFarm API (dp mesh over the
    devices this host exposes — one chip here; the same code path scales to
    a v5e-8 slice)."""
    from jax.sharding import Mesh

    from sculptmate_tpu.parallel.farm import AssetFarm
    from sculptmate_tpu.ops.density_grid import (
        mlp_weights_from_params,
        query_density_grid,
    )

    devs = np.array(jax.devices())
    mesh = Mesh(devs.reshape(len(devs)), ("dp",))
    farm = AssetFarm(tsr, mesh)

    rng = np.random.default_rng(0)
    rgba = jnp.asarray(rng.random((batch, 512, 512, 4), np.float32))
    codes = tsr.scene_codes(
        jnp.asarray(rng.random((1, 512, 512, 3)), jnp.float32)
    )
    w = mlp_weights_from_params(tsr.params["decoder"]["layers"])
    d = np.asarray(query_density_grid(codes[0], w, tsr.grid_spec(64)))
    threshold = float(np.quantile(d, 0.99))

    def run_once():
        return farm.generate_batch_rgba(
            rgba, matting=matting, resolution=RESOLUTION,
            threshold=threshold, has_vertex_color=True,
        )

    meshes = run_once()  # warmup (compiles + capacity calibration)
    log(f"# farm warmup: {[len(m[0]) for m in meshes]} verts")
    meshes = run_once()  # warm final-capacity programs
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_once()
        times.append((time.perf_counter() - t0) / batch)
    log(f"# farm per-asset times: {[round(t, 3) for t in times]}")
    return float(np.median(times))


def main():
    deadline = time.monotonic() + float(
        os.environ.get("SCULPTMATE_BENCH_BUDGET", "1500")
    )
    from sculptmate_tpu.frontend.matting import U2NetMatting
    from sculptmate_tpu.systems.tsr import TSR

    dev = jax.devices()[0]
    log(f"# device: {dev.platform} {getattr(dev, 'device_kind', '')}")

    tsr = TSR(dtype=jnp.bfloat16)
    matting = U2NetMatting()

    result = bench_lean(tsr, matting)
    # print the cumulative record after EVERY config: if an external budget
    # kill lands mid-config, the last complete JSON line still carries
    # everything captured so far (the driver reads the last JSON line)
    print(json.dumps(result), flush=True)

    # extra configs, each skipped if the remaining budget cannot plausibly
    # cover a cold-cache run of it. SF3D runs FIRST: measured 2.38 s idle
    # (sf3d_stage_check) but 3.4 s when captured after the farm + 512^3
    # configs had churned HBM/tunnel state — order the capture so each
    # config sees the cleanest state its own serving process would.
    # Reserves = warm-cache run time x ~2 (compiles hit the persistent
    # /tmp/sculptmate_jax_cache primed right after the final commit; a truly
    # cold cache cannot fit 5 configs in any budget, so the priming run is
    # part of the release protocol, not an optimization)
    state = {}
    extras = (
        ("sf3d_sec_per_asset", lambda: bench_sf3d(state), 240),
        ("sf3d_farm_sec_per_asset", lambda: bench_sf3d_farm(state), 150),
        ("farm_sec_per_asset", lambda: bench_farm(tsr, matting), 120),
        ("highres512_sec", lambda: bench_highres(tsr), 180),
    )
    for key, fn, reserve in extras:
        left = deadline - time.monotonic()
        if left < reserve:
            log(f"# skipping {key}: {left:.0f}s left < {reserve}s reserve")
            continue
        try:
            result[key] = round(fn(), 4)
        except Exception as e:  # an extra config must never sink the record
            log(f"# {key} FAILED: {e!r}")
        print(json.dumps(result), flush=True)

    log("# final record:")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
