"""Honest per-op TPU microbenchmarks (sync via scalar D2H, defeating any
async-scheduler underreporting), plus MFU/roofline accounting for the
compute-dominated programs (encode, density sweep) and a per-stage bound
classification of the lean serving path.

Roofline model (one TPU v5e chip): bf16 MXU peak 197 TFLOP/s, HBM
819 GB/s => ridge point ~240 FLOP/byte. FLOPs and HBM bytes come from
XLA's own post-optimization cost analysis of the compiled executable, so
fusion is already accounted for. A program is classified:

- ``compute``  if its compute-time lower bound (flops/peak) dominates,
- ``bandwidth`` if its memory-time lower bound (bytes/BW) dominates,
- ``latency``  if measured wall time exceeds 4x both bounds (dispatch,
  D2H round trips, or serialization — not the chip).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import sculptmate_tpu  # noqa: F401  (compilation cache)

PEAK_BF16_FLOPS = 197e12  # TPU v5e-1 MXU peak (bf16)
HBM_BW = 819e9  # bytes/s


def timed(name, fn, *args, n=3):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        _sync(fn(*args))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:36s} {dt * 1e3:9.1f} ms")
    return dt


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])  # force a real device round trip


def _cost(jitfn, *args):
    """(flops, hbm bytes) from XLA's cost analysis of the compiled
    executable; (None, None) when the backend can't report it."""
    try:
        ca = jitfn.lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca["flops"]), float(ca.get("bytes accessed", 0.0))
    except Exception:
        return None, None


def roofline(name, jitfn, *args, n=10, flops=None, note=""):
    """Time ``jitfn`` and print achieved TFLOP/s, MFU vs bf16 peak,
    achieved HBM GB/s, arithmetic intensity, and the bound class.

    ``flops``: analytic override. XLA's cost analysis counts a
    ``lax.map``/``while`` body ONCE, not times its trip count, so any
    slab-streamed program must pass its true count here.

    Timing is AMORTIZED: all ``n`` dispatches are enqueued back-to-back
    (they serialize on the one device stream) and synced once, so the
    tunneled D2H round trip (30-500 ms, fluctuating) is paid once/n instead
    of polluting every sample — the per-sync convention of ``timed()`` is
    honest for serving latency, but would misclassify every sub-100 ms
    program as latency-bound here."""
    out = jitfn(*args)
    _sync(out)
    xla_flops, xla_bytes = _cost(jitfn, *args)
    if flops is None:
        flops = xla_flops
    t0 = time.perf_counter()
    outs = [jitfn(*args) for _ in range(n)]
    _sync(outs[-1])
    dt = (time.perf_counter() - t0) / n

    if flops is None:
        print(f"{name:36s} {dt * 1e3:9.1f} ms   (no cost analysis)")
        return dt
    t_c = flops / PEAK_BF16_FLOPS
    t_m = (xla_bytes or 0.0) / HBM_BW
    mfu = flops / dt / PEAK_BF16_FLOPS
    if dt > 4 * max(t_c, t_m):
        bound = "latency"
    elif t_c >= t_m:
        bound = "compute"
    else:
        bound = "bandwidth"
    intensity = flops / xla_bytes if xla_bytes else float("inf")
    print(
        f"{name:36s} {dt * 1e3:9.1f} ms "
        f"{flops / 1e9:8.1f} GF {flops / dt / 1e12:6.2f} TF/s "
        f"MFU {mfu * 100:5.1f}% "
        f"{(xla_bytes or 0) / dt / 1e9:6.1f} GB/s "
        f"AI {intensity:6.1f} F/B  [{bound}]{note}"
    )
    return dt


def main(sections=("micro", "lean", "sf3d")):
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)

    if "micro" in sections:
        micro(rng)
    if "lean" in sections:
        lean(rng)
    if "sf3d" in sections:
        sf3d_breakdown(rng)


def micro(rng):
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


def lean(rng):
    R = 256
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

    print()
    print("== roofline (v5e-1: 197 TFLOP/s bf16, 819 GB/s HBM, ridge ~240 F/B) ==")
    # analytic FLOPs: XLA's cost analysis counts the z-slab lax.map body
    # once, not x32. Hidden layers dominate: R^3 points x 8 x (64x64x2),
    # plus the 64->4 output layer and the factorized first layer
    # (3 x R^2 x 40 x 64 x 2). Shape ceiling: a lone 64-wide matmul can
    # drive at most (64/128)^2 = 25% of the MXU; the z-pair block-diagonal
    # packing (ops/density_grid._pack_weights) runs two 64-wide streams per
    # 128-wide tile, raising the useful ceiling to 50%.
    dg_flops = R**3 * (8 * 64 * 64 * 2 + 64 * 4 * 2) + 3 * R**2 * 40 * 64 * 2
    for dt, lbl in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        spec = DensityGridSpec(resolution=R, compute_dtype=dt)
        roofline(
            f"density grid 256^3 {lbl}",
            jax.jit(lambda t: query_density_grid(t, w, spec)),
            tri,
            flops=dg_flops,
            note="  (64-wide z-paired: useful ceiling 50%)",
        )

    # encode: ViT-B @ 512^2 + 16-block/1024-ch backbone over 3072 tokens
    # (reference widths TripoSR/checkpoints/config.yaml:12-18)
    from sculptmate_tpu.systems.tsr import TSR

    tsr = TSR(dtype=jnp.bfloat16)
    img = jnp.asarray(rng.random((1, 512, 512, 3)).astype(np.float32))
    roofline("encode 512^2 (ViT+backbone) bf16", tsr._forward, tsr.params, img)

    stage_breakdown(tsr, rng)


def stage_breakdown(tsr, rng):
    """Per-stage roofline of the lean serving path (``bench.py``'s loop):
    matting+preprocess, encode, the one-jit wire extraction program, and the
    host tail (D2H wire fetch + native face rebuild), each classified
    compute/bandwidth/latency so the next optimization targets the real
    bottleneck instead of a guess."""
    from sculptmate_tpu.frontend.matting import U2NetMatting, U2NET_SIZE
    from sculptmate_tpu.frontend.preprocess import preprocess_batch_device
    from sculptmate_tpu.geometry import mc_wire
    from sculptmate_tpu.ops.density_grid import (
        mlp_weights_from_params,
        query_density_grid,
    )

    print()
    print("== lean-path stages (bench.py loop) ==")
    matting = U2NetMatting()
    rngs = np.random.default_rng(0)
    raw = jnp.asarray(rngs.random((1, 512, 512, 4), np.float32))
    raw_small = jnp.asarray(
        rngs.random((1, U2NET_SIZE, U2NET_SIZE, 3), np.float32)
    )

    @jax.jit
    def make_cond():
        mask = matting._predict(matting.variables, raw_small)
        alpha = jax.image.resize(mask[..., None], (1, 512, 512, 1), "linear")
        rgba = jnp.concatenate([raw[..., :3], alpha], axis=-1)
        return preprocess_batch_device(rgba, ratio=0.75, out_size=512)

    roofline("stage matting+preprocess", make_cond)
    cond = make_cond()
    roofline("stage encode", tsr._forward, tsr.params, cond)

    codes = tsr._forward(tsr.params, cond)
    w = mlp_weights_from_params(tsr.params["decoder"]["layers"])
    d = query_density_grid(codes[0], w, tsr.grid_spec(64))
    thr = float(np.quantile(np.asarray(d), 0.99))

    # size the wire program exactly like bench.py's steady state
    h = tsr.extract_mesh_async(codes[0], True, 256, thr)
    (verts, _faces, _c), (nv, _nb, mv, bc) = tsr.extract_mesh_wait(h)
    cap = 65536 * -(-int(len(verts) * 1.25) // 65536)
    mv2, bc2 = tsr._wire_caps(256, cap, explicit=True)
    # FLOPs ~= the density sweep's (the MC + color-query tail is
    # gather/scatter, bandwidth- not FLOP-shaped; XLA undercounts both
    # through the z-slab lax.map)
    dg_flops = 256**3 * (8 * 64 * 64 * 2 + 64 * 4 * 2) + 3 * 256**2 * 40 * 64 * 2
    roofline(
        "stage extract wire 256^3 (device)",
        tsr._extract_wire_jit,
        codes[0], 256, thr, mv2, True, bc2,
        flops=dg_flops,
    )

    # host tail: D2H fetch of the packed wire + native rebuild
    fut = tsr._extract_wire_jit(codes[0], 256, thr, mv2, True, bc2)
    jax.block_until_ready(fut)
    parts = fut if isinstance(fut, tuple) else (fut,)
    nbytes = sum(int(np.prod(p.shape)) * p.dtype.itemsize for p in parts)
    t0 = time.perf_counter()
    wire = np.asarray(parts[0])
    t_fetch = time.perf_counter() - t0
    nv = int(mc_wire.wire_counts(wire, mc_wire.N_WIRE_COUNTS)[0])
    t0 = time.perf_counter()
    mc_wire.decode_wire(wire, (256, 256, 256), mv2, has_colors=False)
    t_dec = time.perf_counter() - t0
    print(
        f"{'stage wire D2H fetch (host)':36s} {t_fetch * 1e3:9.1f} ms "
        f"{nbytes / 1e6:8.1f} MB {nbytes / t_fetch / 1e6:6.1f} MB/s  "
        f"[latency: tunneled link, hidden by bench.py's pipelining]"
    )
    print(
        f"{'stage native wire decode (host)':36s} {t_dec * 1e3:9.1f} ms "
        f"{nv:8d} verts  [host core]"
    )


def sf3d_breakdown(rng):
    """Per-stage roofline of the SF3D path (``SF3D.run_image``): encode,
    estimator, the fused tet-query + MT-wire program, the host tail (D2H
    fetch, native wire decode, quadric decimate), and the fused unwrap+bake
    program — device-only timings amortized over back-to-back dispatches so
    the tunnel's fluctuating D2H latency can't masquerade as device time,
    transfers measured separately."""
    from sculptmate_tpu.geometry import mt_wire
    from sculptmate_tpu.geometry.marching_tets import lattice_size
    from sculptmate_tpu.ops.density_grid import (
        lattice_coords_tets,
        query_grid_multihead,
    )
    from sculptmate_tpu.systems.sf3d import SF3D

    print()
    print("== sf3d stages (run_image path) ==")
    sf3d = SF3D()
    rngs = np.random.default_rng(0)
    img = jnp.asarray(rngs.random((1, 512, 512, 4), np.float32))
    mask, rgb = sf3d.prepare_image(img)

    from sculptmate_tpu.models.camera import (
        default_cond_c2w,
        intrinsic_from_fov_deg,
    )

    c = sf3d.config
    c2w = jnp.broadcast_to(jnp.asarray(default_cond_c2w(c.default_distance)), (1, 4, 4))
    _, Kn = intrinsic_from_fov_deg(c.default_fovy_deg, c.cond_image_size, c.cond_image_size)
    Kn = jnp.broadcast_to(jnp.asarray(Kn), (1, 3, 3))
    codes, _ = sf3d.get_scene_codes(rgb)
    _sync(codes)

    roofline(
        "stage encode 512^2 (DINOv2+2stream)",
        sf3d._encode, sf3d.params, rgb, c2w, Kn,
    )
    roofline("stage clip estimator", sf3d._estimate, sf3d.params, rgb * mask)

    # threshold like bench.py's calibration
    heads = sf3d._head_weights(["density"])
    g = query_grid_multihead(
        codes[0], heads,
        lattice_coords_tets(sf3d.config.isosurface_resolution),
        sf3d.grid_spec(slab=7),
    )
    d = np.exp(np.asarray(g["density"][0]) - 1.0)
    thr = float(np.quantile(d, 0.99))

    # size capacities like a warm server, then time the device program alone
    res = sf3d.config.isosurface_resolution
    N = lattice_size(res)
    mesh = sf3d.run_image(img, bake_resolution=512, threshold=thr)
    assert mesh is not None
    mv, bc = sf3d._cap_cache
    weld = float(sf3d.config.weld_eps)
    # analytic FLOPs: two 64-wide heads (2 hidden layers each), packed ->
    # one 128-wide stream; first layer factorized over the 3 planes
    flops = N**3 * 2 * (2 * 64 * 64 * 2 + 64 * 4 * 2) + 2 * 3 * N**2 * 40 * 64 * 2
    roofline(
        "stage tet query+MT wire (device)",
        sf3d._extract_wire_jit,
        codes[0], thr, mv, bc, weld,
        flops=flops,
    )

    fut = sf3d._extract_wire_jit(codes[0], thr, mv, bc, weld)
    jax.block_until_ready(fut)
    nbytes = int(np.prod(fut.shape)) * fut.dtype.itemsize
    t0 = time.perf_counter()
    wire = np.asarray(fut)
    t_fetch = time.perf_counter() - t0
    nv = int(mt_wire.wire_counts(wire, mt_wire.N_WIRE_COUNTS)[0])
    t0 = time.perf_counter()
    lverts, faces, _ = mt_wire.decode_wire(wire, res, mv, weld=weld > 0)
    t_dec = time.perf_counter() - t0
    print(
        f"{'stage MT wire D2H fetch (host)':36s} {t_fetch * 1e3:9.1f} ms "
        f"{nbytes / 1e6:8.1f} MB {nbytes / t_fetch / 1e6:6.1f} MB/s  [latency]"
    )
    print(
        f"{'stage native MT decode (host)':36s} {t_dec * 1e3:9.1f} ms "
        f"{nv:8d} raw verts -> {len(lverts)} welded  [host core]"
    )

    verts = lverts * (2 * sf3d.config.radius) - sf3d.config.radius
    from sculptmate_tpu.geometry.decimate import decimate

    t0 = time.perf_counter()
    dverts, dfaces = decimate(
        verts, faces, target_ratio=0.75 * nv / len(verts)
    )
    t_decim = time.perf_counter() - t0
    print(
        f"{'stage quadric decimate (host)':36s} {t_decim * 1e3:9.1f} ms "
        f"{len(faces):8d} -> {len(dfaces)} faces  [host core]"
    )

    # fused unwrap+bake: device-only (amortized), then the one D2H fetch
    global_dict = dict(sf3d._estimate(sf3d.params, rgb * mask))
    h = sf3d.unwrap_bake_async(
        dverts, dfaces, codes[0], global_dict, 512
    )
    sf3d.unwrap_bake_wait(h)  # capacity shrink + compile the steady program
    h = sf3d.unwrap_bake_async(
        dverts, dfaces, codes[0], global_dict, 512
    )
    roofline(
        "stage unwrap+bake 512^2 (device)",
        sf3d._unwrap_bake_jit,
        h.scene_code, h.packed_dev, h.nb, h.fb, h.res, h.island_padding,
        h.caps,
    )
    fut = sf3d._unwrap_bake_jit(
        h.scene_code, h.packed_dev, h.nb, h.fb, h.res, h.island_padding,
        h.caps,
    )
    jax.block_until_ready(fut)
    nbytes = int(np.prod(fut.shape)) * fut.dtype.itemsize
    t0 = time.perf_counter()
    np.asarray(fut)
    t_fetch = time.perf_counter() - t0
    print(
        f"{'stage unwrap+bake D2H fetch (host)':36s} {t_fetch * 1e3:9.1f} ms "
        f"{nbytes / 1e6:8.1f} MB {nbytes / t_fetch / 1e6:6.1f} MB/s  [latency]"
    )


if __name__ == "__main__":
    import sys

    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    main(tuple(args) if args else ("micro", "lean", "sf3d"))
