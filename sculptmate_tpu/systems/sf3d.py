"""SF3D system — the Stable Fast 3D ("Pro") image -> textured-mesh model.

Mirrors the component wiring of ``sf3d/system.py:96-528``: camera-modulated
DINOv2-large tokenizer -> learned 96^2 triplane tokens -> two-stream
interleave backbone -> pixel-shuffle upsample (3x40x384^2) -> MaterialMLP over
a 160-res marching-tetrahedra lattice (with learned vertex offsets) ->
decimate -> cube-projection UV unwrap -> texture bake (albedo / bump /
roughness / metallic) — as TPU-first XLA programs:

- one jit for image -> scene codes (+ CLIP material estimator);
- one fused jit for the tet-lattice density/offset query (separable sampling,
  ``ops/density_grid.query_grid_multihead``) + the marching-tets wire format
  (occupancy bits + u16 deformed positions; faces rebuilt by
  ``native/mt_wire.cpp``);
- the whole UV unwrap as one device program (``geometry/uv_unwrap_device``);
- device rasterize/interpolate/dilate for the bake (``geometry/texture_bake``,
  two-tier binned scatter-min rasterizer, u16-quantized attrs);
- host numpy/C++ only for the truly sequential parts (quadric decimation,
  wire-format mesh rebuilds).
"""

from __future__ import annotations

import dataclasses
import functools
import io
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sculptmate_tpu.config import load_yaml_config
from sculptmate_tpu.geometry.marching_tets import marching_tets, lattice_size
from sculptmate_tpu.geometry.mesh import Mesh
from sculptmate_tpu.geometry import texture_bake
from sculptmate_tpu.models.camera import (
    LinearCameraEmbedder,
    default_cond_c2w,
    intrinsic_from_fov_deg,
)
from sculptmate_tpu.models.dinov2 import DINOV2SingleImageTokenizer
from sculptmate_tpu.models.estimators import ClipBasedHeadEstimator, MultiHeadEstimator
from sculptmate_tpu.models.heads import MaterialMLP
from sculptmate_tpu.models.tokenizers import TriplaneLearnablePositionalEmbedding
from sculptmate_tpu.models.two_stream import TwoStreamInterleaveTransformer
from sculptmate_tpu.models.upsamplers import PixelShuffleUpsampleNetwork
from sculptmate_tpu.ops.activations import get_activation, normalize_channel_last
from sculptmate_tpu.ops.density_grid import (
    DensityGridSpec,
    lattice_coords_tets,
    mlp_weights_from_params,
    query_grid_multihead,
    query_points_multihead,
)
from sculptmate_tpu.ops.resize import resize_bilinear_antialias

DEFAULT_HEADS = (
    {"name": "density", "out_channels": 1, "out_bias": -1.0, "n_hidden_layers": 2,
     "output_activation": "trunc_exp"},
    {"name": "features", "out_channels": 3, "n_hidden_layers": 3,
     "output_activation": "sigmoid"},
    {"name": "perturb_normal", "out_channels": 3, "n_hidden_layers": 3,
     "output_activation": "normalize_channel_last"},
    {"name": "vertex_offset", "out_channels": 3, "n_hidden_layers": 2},
)


@dataclasses.dataclass(frozen=True)
class SF3DConfig:
    cond_image_size: int = 512
    isosurface_resolution: int = 160
    isosurface_threshold: float = 10.0
    radius: float = 0.87
    # snap-weld: MT interpolation t within weld_eps of {0, 1} snaps onto the
    # shared deformed lattice point; the wire decoder welds those vertices
    # and drops the degenerate slivers (20-35% fewer faces before the host
    # ever sees the mesh, displacement <= eps*sqrt(3)/res lattice units).
    # 0 restores raw marching-tets output.
    weld_eps: float = 0.2
    background_color: Tuple[float, float, float] = (0.5, 0.5, 0.5)
    default_fovy_deg: float = 40.0
    default_distance: float = 1.6

    camera_in_channels: int = 25
    camera_out_channels: int = 768
    plane_size: int = 96
    num_channels: int = 1024
    num_attention_heads: int = 16
    attention_head_dim: int = 64
    num_latents: int = 1792
    num_blocks: int = 4
    num_basic_blocks: int = 3
    upsample_out_channels: int = 40
    upsample_scale_factor: int = 4
    upsample_conv_layers: int = 4
    decoder_heads: Tuple[Dict[str, Any], ...] = DEFAULT_HEADS
    decoder_n_neurons: int = 64
    decoder_activation: str = "silu"

    # encoder sizes (defaults = facebook/dinov2-large & CLIP ViT-B/32);
    # overridable for small test configs
    dinov2_hidden_size: int = 1024
    dinov2_num_layers: int = 24
    dinov2_num_heads: int = 16
    dinov2_intermediate_size: int = 4096
    clip_width: int = 768
    clip_layers: int = 12
    clip_heads: int = 12

    @classmethod
    def from_yaml(cls, path: str) -> "SF3DConfig":
        y = load_yaml_config(path)
        heads = tuple(dict(h) for h in y["decoder"]["heads"])
        return cls(
            cond_image_size=y.get("cond_image_size", 512),
            isosurface_resolution=y.get("isosurface_resolution", 160),
            isosurface_threshold=y.get("isosurface_threshold", 10.0),
            radius=y.get("radius", 0.87),
            weld_eps=y.get("weld_eps", 0.2),
            camera_in_channels=y["camera_embedder"]["in_channels"],
            camera_out_channels=y["camera_embedder"]["out_channels"],
            plane_size=y["tokenizer"]["plane_size"],
            num_channels=y["tokenizer"]["num_channels"],
            num_attention_heads=y["backbone"]["num_attention_heads"],
            attention_head_dim=y["backbone"]["attention_head_dim"],
            num_latents=y["backbone"]["num_latents"],
            num_blocks=y["backbone"]["num_blocks"],
            num_basic_blocks=y["backbone"]["num_basic_blocks"],
            upsample_out_channels=y["post_processor"]["out_channels"],
            upsample_scale_factor=y["post_processor"]["scale_factor"],
            upsample_conv_layers=y["post_processor"]["conv_layers"],
            decoder_heads=heads,
            decoder_n_neurons=y["decoder"]["n_neurons"],
            decoder_activation=y["decoder"].get("activation", "silu"),
        )


class SF3DModule(nn.Module):
    config: SF3DConfig
    dtype: jnp.dtype = jnp.float32
    # mesh-axis name for tensor parallelism in the two-stream backbone
    tp_axis: Optional[str] = None

    def setup(self):
        c = self.config
        self.camera_embedder = LinearCameraEmbedder(
            c.camera_in_channels, c.camera_out_channels, dtype=self.dtype
        )
        self.image_tokenizer = DINOV2SingleImageTokenizer(
            hidden_size=c.dinov2_hidden_size,
            num_layers=c.dinov2_num_layers,
            num_heads=c.dinov2_num_heads,
            intermediate_size=c.dinov2_intermediate_size,
            dtype=self.dtype,
        )
        self.tokenizer = TriplaneLearnablePositionalEmbedding(
            c.plane_size, c.num_channels
        )
        self.backbone = TwoStreamInterleaveTransformer(
            num_attention_heads=c.num_attention_heads,
            attention_head_dim=c.attention_head_dim,
            raw_triplane_channels=c.num_channels,
            triplane_channels=c.num_channels,
            num_latents=c.num_latents,
            num_blocks=c.num_blocks,
            num_basic_blocks=c.num_basic_blocks,
            tp_axis=self.tp_axis,
            dtype=self.dtype,
        )
        self.post_processor = PixelShuffleUpsampleNetwork(
            in_channels=c.num_channels,
            out_channels=c.upsample_out_channels,
            scale_factor=c.upsample_scale_factor,
            conv_layers=c.upsample_conv_layers,
            dtype=self.dtype,
        )
        self.decoder = MaterialMLP(
            heads=c.decoder_heads,
            n_neurons=c.decoder_n_neurons,
            activation=c.decoder_activation,
        )
        self.image_estimator = ClipBasedHeadEstimator(
            clip_width=c.clip_width,
            clip_layers=c.clip_layers,
            clip_heads=c.clip_heads,
            dtype=self.dtype,
        )
        self.global_estimator = MultiHeadEstimator(
            triplane_features=c.num_channels, dtype=self.dtype
        )

    def __call__(self, rgb_cond, c2w_cond, intrinsic_normed_cond):
        """rgb_cond (B, S, S, 3) -> (scene_codes (B,3,40,384,384),
        direct_codes (B,3,1024,96,96))."""
        B = rgb_cond.shape[0]
        camera_embeds = self.camera_embedder(c2w_cond, intrinsic_normed_cond)
        image_tokens = self.image_tokenizer(rgb_cond, camera_embeds)  # (B, C, Nt)
        image_tokens = jnp.swapaxes(image_tokens, 1, 2)  # (B, Nt, C)
        tokens = self.tokenizer(B)  # (B, 3HW, C)
        tokens = jnp.swapaxes(tokens, 1, 2)  # (B, C, 3HW), backbone convention
        tokens = self.backbone(tokens, encoder_hidden_states=image_tokens)
        direct_codes = self.tokenizer.detokenize(jnp.swapaxes(tokens, 1, 2))
        scene_codes = self.post_processor(direct_codes)
        return scene_codes, direct_codes

    def estimate_materials(self, masked_rgb):
        return self.image_estimator(masked_rgb)

    def estimate_illumination(self, direct_codes):
        return self.global_estimator(direct_codes)

    def decode(self, features, include=None, exclude=None):
        return self.decoder(features, include=include, exclude=exclude)

    def init_all(self, rgb_cond, c2w_cond, intrinsic_normed_cond):
        codes, direct = self(rgb_cond, c2w_cond, intrinsic_normed_cond)
        feats = jnp.zeros((1, 120), jnp.float32)
        dec = self.decode(feats)
        est = self.estimate_materials(rgb_cond)
        glob = self.estimate_illumination(direct)
        return codes, dec, est, glob


@dataclasses.dataclass(frozen=True)
class _UnwrapBakeHandle:
    """In-flight fused unwrap+bake: the dispatched future plus everything
    needed to retry on raster-capacity overflow and decode the result."""

    fut: Any
    scene_code: Any
    packed_dev: Any
    nb: int
    fb: int
    nf: int
    res: int
    island_padding: float
    caps: Tuple[int, int, int, int, int]
    first_success_shrinks: bool
    ub_key: Tuple[int, int]
    ub_pkey: str
    # host-side copies for the UV reconstruction (the wire ships only the
    # 1 B/face atlas_index + 12 rotation angles; the host rebuilds the
    # per-corner uvs from the same quantized inputs it uploaded)
    host_attrs: Any = None  # (6, nb) uint16
    host_bb: Any = None  # (bb_min (3,), bb_max (3,)) of the rotated verts
    host_faces: Any = None  # (F, 3) int
    nv: int = 0


class SF3D:
    """Host wrapper around SF3DModule + the extraction/bake pipeline."""

    def __init__(
        self,
        config: Optional[SF3DConfig] = None,
        params=None,
        seed: int = 0,
        dtype: jnp.dtype = jnp.bfloat16,
        tp_axis: Optional[str] = None,
        extract_dtype: Optional[jnp.dtype] = None,
    ):
        self.config = config or SF3DConfig()
        self.module = SF3DModule(self.config, dtype=dtype, tp_axis=tp_axis)
        # density/material grid compute dtype for the production extraction
        # and bake paths; follows the model dtype like TSR.extract_dtype —
        # bf16 halves the 161^3 two-head MLP sweep and the bake's texel
        # query (f32 MXU accumulate), with field error ~2e-3, far below the
        # u16 snap quantization (extraction) and u8 texture quantization
        # (bake) downstream. Pass extract_dtype=jnp.float32 to opt out.
        self.extract_dtype = extract_dtype if extract_dtype is not None else dtype
        if params is None:
            c = self.config
            dummy_img = jnp.zeros((1, c.cond_image_size, c.cond_image_size, 3), jnp.float32)
            dummy_c2w = jnp.zeros((1, 4, 4), jnp.float32)
            dummy_k = jnp.zeros((1, 3, 3), jnp.float32)
            from sculptmate_tpu.runtime.init import jitted_init

            params = jitted_init(
                self.module, seed, dummy_img, dummy_c2w, dummy_k,
                method=SF3DModule.init_all,
            )["params"]
        self.params = params

        self._encode = jax.jit(
            lambda p, img, c2w, k: self.module.apply({"params": p}, img, c2w, k)
        )
        self._estimate = jax.jit(
            lambda p, img: self.module.apply(
                {"params": p}, img, method=SF3DModule.estimate_materials
            )
        )

    # ------------------------------------------------------------------
    def _head_weights(self, names):
        return {
            n: mlp_weights_from_params(self.params["decoder"][f"head_{n}"])
            for n in names
        }

    def grid_spec(self, slab: int = 7, compute_dtype=jnp.float32) -> DensityGridSpec:
        return DensityGridSpec(
            resolution=self.config.isosurface_resolution,
            radius=self.config.radius,
            activation=self.config.decoder_activation,
            align_corners=True,  # SF3D convention (sf3d/system.py:193)
            slab=slab,
            compute_dtype=compute_dtype,
        )

    @functools.partial(jax.jit, static_argnums=(0, 3, 4, 5, 6))
    def _extract_jit(
        self, scene_code, threshold, max_verts, max_faces, block_cap=0, cube_cap=0
    ):
        # threshold is traced (recompile-free iso-level changes)
        c = self.config
        res = c.isosurface_resolution
        N = lattice_size(res)
        # lattice size 161 = 7 * 23: slab must divide it
        slab = 7 if N % 7 == 0 else 1
        spec = self.grid_spec(slab=slab, compute_dtype=self.extract_dtype)
        heads = self._head_weights(["density", "vertex_offset"])
        coords = lattice_coords_tets(res)
        grids = query_grid_multihead(scene_code, heads, coords, spec)
        # density head: out_bias -1.0 + trunc_exp (config.yaml:49-53)
        density = jnp.exp(grids["density"][0] - 1.0)
        sdf = density - threshold
        dx, dy, dz = grids["vertex_offset"]
        return marching_tets(
            sdf, dx, dy, dz, res, max_verts, max_faces,
            block_cap, block_cap, cube_cap,
        )

    @functools.partial(jax.jit, static_argnums=(0, 3, 4))
    def _extract_wire_jit(
        self, scene_code, threshold, max_verts, block_cap=0, snap_eps=0.0
    ):
        """Wire-format extraction (``marching_tets.mt_wire_device``): padded
        occupancy bits + u16 deformed positions, ONE ~4.3 MB uint8 transfer
        (vs ~22 MB packed f32); faces/vertex ids rebuilt by
        ``native/mt_wire.cpp`` and the device face machinery drops out.
        ``snap_eps`` is TRACED (0.0 is an exact no-op) — one compiled
        program serves every weld setting."""
        from sculptmate_tpu.geometry.marching_tets import mt_wire_device

        c = self.config
        res = c.isosurface_resolution
        N = lattice_size(res)
        slab = 7 if N % 7 == 0 else 1
        spec = self.grid_spec(slab=slab, compute_dtype=self.extract_dtype)
        heads = self._head_weights(["density", "vertex_offset"])
        coords = lattice_coords_tets(res)
        grids = query_grid_multihead(scene_code, heads, coords, spec)
        density = jnp.exp(grids["density"][0] - 1.0)
        sdf = density - threshold
        dx, dy, dz = grids["vertex_offset"]
        return mt_wire_device(
            sdf, dx, dy, dz, res, max_verts, block_cap, snap_eps=snap_eps
        )

    @functools.partial(jax.jit, static_argnums=(0, 3, 4, 5, 6))
    def _extract_packed_jit(
        self, scene_code, threshold, max_verts, max_faces, block_cap=0, cube_cap=0
    ):
        """Extraction packed into one (3, W) f32 buffer (positions scaled to
        the bbox, bit-cast faces, bit-cast counts) — one D2H round trip; see
        systems/tsr.py:_extract_packed_jit for why."""
        mt = self._extract_jit(
            scene_code, threshold, max_verts, max_faces, block_cap, cube_cap
        )
        c = self.config
        verts = jnp.stack(
            [
                mt.vx * (2 * c.radius) - c.radius,
                mt.vy * (2 * c.radius) - c.radius,
                mt.vz * (2 * c.radius) - c.radius,
            ]
        )
        # exact-f32 int encoding, not bitcast: TPU flushes the denormals a
        # small-int bitcast produces (see tsr.py:_extract_packed_jit)
        assert max_verts < (1 << 24), "face ids would lose f32 precision"
        faces_f = jnp.stack([mt.fa, mt.fb, mt.fc]).astype(jnp.float32)
        counts = jnp.stack(
            [
                mt.num_verts,
                mt.num_faces,
                mt.num_active_vblocks,
                mt.num_active_fblocks,
                mt.num_active_cubes,
            ]
        ).astype(jnp.float32)
        counts_col = jnp.broadcast_to(counts[None, :], (3, 5))
        return jnp.concatenate([verts, faces_f, counts_col], axis=1)

    # ------------------------------------------------------------------
    def prepare_image(self, image: jnp.ndarray):
        """(B, H, W, 4) rgba in [0,1] -> (mask, rgb lerped onto bg)
        (``sf3d/system.py:285-306``)."""
        s = self.config.cond_image_size
        if image.shape[1] != s or image.shape[2] != s:
            image = resize_bilinear_antialias(image, s, s)
        if image.shape[-1] == 4:
            mask = image[..., 3:4]
            rgb = image[..., :3]
        else:
            mask = jnp.ones_like(image[..., :1])
            rgb = image[..., :3]
        bg = jnp.asarray(self.config.background_color, rgb.dtype)
        rgb = bg * (1.0 - mask) + rgb * mask
        return mask, jnp.clip(rgb, 0.0, 1.0)

    def get_scene_codes(self, rgb_cond: jnp.ndarray):
        B = rgb_cond.shape[0]
        c = self.config
        c2w = jnp.broadcast_to(
            jnp.asarray(default_cond_c2w(c.default_distance)), (B, 4, 4)
        )
        _, Kn = intrinsic_from_fov_deg(
            c.default_fovy_deg, c.cond_image_size, c.cond_image_size
        )
        Kn = jnp.broadcast_to(jnp.asarray(Kn), (B, 3, 3))
        return self._encode(self.params, rgb_cond, c2w, Kn)

    def run_image(
        self,
        image: jnp.ndarray,
        bake_resolution: int = 512,
        remesh: str = "triangle",
        vertex_simplification_factor: str = "high",
        estimate_illumination: bool = False,
        enable_texture: bool = True,
        threshold: Optional[float] = None,
        metrics=None,
        fused: Optional[bool] = None,
    ) -> Optional[Dict[str, Any]]:
        """image: (1, H, W, 3|4) float [0,1]. Returns a mesh dict or None.

        ``metrics``: optional ``runtime.logging.StageMetrics`` to record
        per-stage wall clock. ``fused``: force the one-program unwrap+bake
        path on/off (default: on when an accelerator backend is active)."""
        import contextlib

        stage = metrics.stage if metrics is not None else (
            lambda name: contextlib.nullcontext()
        )
        c = self.config
        with stage("encode"):
            mask, rgb = self.prepare_image(image)
            scene_codes, direct_codes = self.get_scene_codes(rgb)
            global_dict = dict(self._estimate(self.params, rgb * mask))
        if estimate_illumination:
            glob = self.module.apply(
                {"params": self.params},
                direct_codes,
                method=SF3DModule.estimate_illumination,
            )
            global_dict.update(glob)

        thr = float(c.isosurface_threshold if threshold is None else threshold)
        res = c.isosurface_resolution
        N = lattice_size(res)
        from sculptmate_tpu.geometry import mt_wire
        from sculptmate_tpu.geometry.marching_tets import default_block_capacity

        from sculptmate_tpu.runtime import capacity_cache

        if not hasattr(self, "_cap_cache"):
            self._cap_cache = capacity_cache.load(f"sf3d_mt_r{res}") or (
                24 * N * N,
                default_block_capacity(res, "verts"),
            )
        max_verts, block_cap = self._cap_cache
        weld_eps = float(c.weld_eps)
        stage_extract = stage("extract")
        stage_extract.__enter__()
        while True:
            wire = np.asarray(
                self._extract_wire_jit(
                    scene_codes[0], thr, max_verts, block_cap, weld_eps
                )
            )  # ONE device->host transfer for the whole surface
            nv, nblk = (
                int(c) for c in mt_wire.wire_counts(wire, mt_wire.N_WIRE_COUNTS)
            )
            # overflow detected, never silently truncated
            if nblk > block_cap:
                block_cap = 2 * max(block_cap, nblk)
                continue
            if nv <= max_verts:
                break
            max_verts = max(max_verts, 65536 * -(-int(1.2 * nv) // 65536))
        # tighten toward the observed counts (hysteresis in tighten()) so
        # one giant mesh can't permanently inflate every later fetch; the
        # decode below still uses the capacities this wire was built with
        self._cap_cache = (
            capacity_cache.tighten(max_verts, nv),
            capacity_cache.tighten(block_cap, nblk, slack=1.3, bucket=4096),
        )
        capacity_cache.store(f"sf3d_mt_r{res}", self._cap_cache)
        if nv == 0:
            stage_extract.__exit__(None, None, None)
            return None
        # weld the snapped vertices and drop the degenerate slivers in the
        # decoder (20-35% fewer faces before any host geometry pass)
        lverts, faces, _ = mt_wire.decode_wire(
            wire, res, max_verts, weld=weld_eps > 0
        )
        # [0,1] lattice coords -> world bbox (sf3d/system.py:193)
        verts = lverts * (2 * c.radius) - c.radius
        stage_extract.__exit__(None, None, None)

        # vertex budget (sf3d/system.py:346-351; the reference compares
        # against 'med' so the UI's 'medium' silently fell through to 0.1 —
        # we accept both spellings as 0.4). The budget counts the RAW
        # pre-weld vertices (nv) so welding doesn't shrink the reference's
        # target; the weld usually covers most of the 'high' reduction and
        # the quadric decimator mops up the remainder.
        import jax as _jax

        use_fused = enable_texture and (
            fused if fused is not None else _jax.default_backend() != "cpu"
        )

        factor = {"high": 0.75, "med": 0.4, "medium": 0.4, "low": 0.1}.get(
            vertex_simplification_factor, 0.75
        )
        vertex_count = round(factor * nv)
        v_nrm = None
        if remesh == "triangle" and vertex_count < len(verts):
            from sculptmate_tpu.geometry.decimate import decimate

            with stage("decimate"):
                # straight from the decoder's i32 faces (no Mesh/int64
                # round trip); on the non-fused path vertex normals come out
                # of the native compaction stream for free — the fused
                # device unwrap+bake consumes none (geometric face normals
                # on device, per-face duplication afterwards), so it skips
                # even that
                if use_fused:
                    verts, faces = decimate(
                        verts, faces, target_ratio=vertex_count / len(verts)
                    )
                else:
                    verts, faces, v_nrm = decimate(
                        verts, faces, target_ratio=vertex_count / len(verts),
                        return_normals=True,
                    )
        elif remesh == "triangle" and not use_fused:
            from sculptmate_tpu.geometry.decimate import vertex_normals

            with stage("decimate"):
                # weld already reached the budget: normals only (the fused
                # path skips this whole bincount pass)
                v_nrm = vertex_normals(verts, faces)
        mesh = Mesh(verts, faces.astype(np.int64))
        if v_nrm is not None:
            mesh._v_nrm = v_nrm

        if use_fused:
            # unwrap + bake as ONE device program (one upload, one compact
            # uint8 fetch) — the staged path pays ~2x the transfers plus two
            # dispatch round trips
            with stage("unwrap_bake"):
                import os as _os
                import time as _t

                _prof = bool(_os.environ.get("SCULPTMATE_BAKE_PROFILE"))
                uv_flat, textures = self.unwrap_bake(
                    mesh.v_pos, mesh.t_pos_idx, scene_codes[0],
                    global_dict, bake_resolution,
                )
                _t0 = _t.perf_counter()
                mesh.apply_flat_uv(uv_flat)
                if _prof:
                    print(
                        f"[unwrap_bake] apply_flat_uv: "
                        f"{(_t.perf_counter()-_t0)*1e3:.0f} ms"
                    )
            out: Dict[str, Any] = {
                "verts": mesh.v_pos,
                "faces": mesh.t_pos_idx,
                "uvs": mesh.v_tex,
                "normals": mesh.v_nrm,
            }
            out.update(textures)
            return out

        with stage("unwrap"):
            mesh.unwrap_uv(backend="auto")

        out = {
            "verts": mesh.v_pos,
            "faces": mesh.t_pos_idx,
            "uvs": mesh.v_tex,
            "normals": mesh.v_nrm,
            "textures": None,
            "texture_pngs": None,
            "roughness": None,
            "metallic": None,
        }
        if not enable_texture:
            return out

        with stage("bake"):
            out.update(
                self.bake_textures(mesh, scene_codes[0], global_dict, bake_resolution)
            )
        return out

    # ------------------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=(0, 6, 8, 9))
    def _bake_jit(
        self, scene_code, attrs_u16, fa, fb, fc, bake_resolution, rm_bbox,
        pair_capacity=0, pair2_capacity=0,
    ):
        """The whole bake as ONE program: rasterize -> interpolate pos ->
        material query -> bump compose -> island dilation, emitting a single
        (7, res, res) buffer (albedo rows 0-2, bump rows 3-5, row 6 =
        [roughness, metallic, raster fine/coarse/multi counters]) so the
        texture set crosses the tunnel in one transfer.

        ``attrs_u16``: (5, Nv) uint16 — pos(3) quantized over the bbox +
        uv(2) quantized over [0,1]. The upload is the bake's second-largest
        cost (~176 MB as f32 rows at 2.2M verts, ~1.5 s through the tunnel);
        u16 pos/uv cut it 4.4x, and normals/tangents are DERIVED on device
        (after per-face vertex duplication they are per-face constants, so
        the interpolated value equals the per-face value — bit-equal math to
        the host's ``mesh.unwrap_uv`` fast path).

        ``rm_bbox``: (8,) f32 [roughness, metallic, bbox_min(3), bbox_max(3)];
        ``pair_capacity``: binned-rasterizer fine-tier capacity
        (``pair2_capacity``: coarse tier for oversized faces)
        (0 = brute-force path)."""
        res = bake_resolution
        rm = rm_bbox[:2]
        bb_min = rm_bbox[2:5]
        bb_max = rm_bbox[5:8]
        scale = (bb_max - bb_min) / 65535.0
        pos_v = [
            attrs_u16[c].astype(jnp.float32) * scale[c] + bb_min[c]
            for c in range(3)
        ]  # 3 x (Nv,)
        u = attrs_u16[3].astype(jnp.float32) / 65535.0
        v = attrs_u16[4].astype(jnp.float32) / 65535.0

        albedo_img, bump_img, mask, counters = self._bake_core(
            scene_code,
            (u[fa], u[fb], u[fc]),
            (v[fa], v[fb], v[fc]),
            pos_v, fa, fb, fc, res, pair_capacity, pair2_capacity,
        )
        meta = jnp.zeros((1, res, res), jnp.float32)
        meta = (
            meta.at[0, 0, 0].set(rm[0])
            .at[0, 0, 1].set(rm[1])
            .at[0, 0, 2].set(counters[0].astype(jnp.float32))
            .at[0, 0, 3].set(counters[1].astype(jnp.float32))
            .at[0, 0, 4].set(counters[2].astype(jnp.float32))
        )
        return jnp.concatenate([albedo_img, bump_img, meta], axis=0)

    def _bake_core(
        self, scene_code, uc, vc, pos_v, fa, fb, fc, res, pair_capacity,
        pair2_capacity,
    ):
        """Shared trace-time bake: rasterize per-corner UVs, interpolate
        world positions, query materials, compose the tangent-space bump,
        dilate islands. ``uc``/``vc``: per-corner (F,) uv triples; ``pos_v``:
        3 per-vertex world coordinate rows; ``fa/fb/fc``: corner vertex ids
        (used only for winner-texel gathers). Returns
        (albedo (3,res,res), bump (3,res,res), mask (res,res) bool,
        counters (3,) int32 raster-capacity indicators)."""
        rast, total_fine, total_coarse, n_multi = texture_bake.rasterize_device(
            uc[0], vc[0], uc[1], vc[1], uc[2], vc[2], res, pair_capacity,
            pair2_capacity,
        )  # (4, res, res)
        mask = rast[3] >= 0
        tid = jnp.maximum(rast[3].astype(jnp.int32), 0).ravel()  # winner face

        # interpolate positions; derive per-face normal/tangent at the winner
        pos_cf = jnp.stack(pos_v)  # (3, Nv)
        pos = texture_bake.interpolate_device(pos_cf, rast, fa, fb, fc)

        # winner-face corner gathers as row-stacked takes (one (3, Nv) take
        # per corner + one (6, F) take for uvs — ~3x the per-row gather rate)
        ia, ib, ic = fa[tid], fb[tid], fc[tid]
        p0 = jnp.take(pos_cf, ia, axis=1)  # (3, T)
        p1 = jnp.take(pos_cf, ib, axis=1)
        p2 = jnp.take(pos_cf, ic, axis=1)
        uv_rows = jnp.take(
            jnp.stack([uc[0], vc[0], uc[1], vc[1], uc[2], vc[2]]), tid, axis=1
        )  # (6, T)
        uv0, uv1, uv2 = uv_rows[0:2], uv_rows[2:4], uv_rows[4:6]

        flat = lambda a: a.reshape(3, -1)
        px, py, pz = flat(pos)
        albedo, perturb = self._surface_query(scene_code, px, py, pz)

        def norm_cf(x):
            return x / jnp.maximum(jnp.linalg.norm(x, axis=0, keepdims=True), 1e-12)

        fn = jnp.cross(p1 - p0, p2 - p0, axis=0)  # (3, T) face normals
        fn = jnp.where((fn * fn).sum(0) <= 1e-20, jnp.asarray([0.0, 0.0, 1.0])[:, None], fn)
        duv1 = uv1 - uv0
        duv2 = uv2 - uv0
        denom_t = duv1[0] * duv2[1] - duv1[1] * duv2[0]
        tng = ((p1 - p0) * duv2[1][None] - (p2 - p0) * duv1[1][None]) / jnp.clip(
            denom_t, 1e-6, None
        )[None]
        gb_nrm = norm_cf(fn)
        gb_tng = norm_cf(tng)
        gb_tng = gb_tng - (gb_tng * gb_nrm).sum(0, keepdims=True) * gb_nrm
        gb_tng = norm_cf(gb_tng)
        gb_btng = norm_cf(jnp.cross(gb_tng, gb_nrm, axis=0))
        normal = norm_cf(perturb)
        bump = jnp.stack(
            [
                jnp.sum(normal * gb_tng, axis=0),
                jnp.sum(normal * gb_btng, axis=0),
                jnp.clip(jnp.sum(normal * gb_nrm, axis=0), 0.3, 1.0),
            ]
        )
        bump = jnp.clip(bump * 0.5 + 0.5, 0.0, 1.0)

        m = mask.ravel()[None]
        albedo_img = jnp.where(m, albedo, 0.0).reshape(3, res, res)
        # empty bump texels encode a flat +z normal (0.5, 0.5, 1)
        bump_flat = jnp.asarray([0.5, 0.5, 1.0])[:, None]
        bump_img = jnp.where(m, bump, bump_flat).reshape(3, res, res)

        iters = max(res // 150, 1)
        albedo_img = texture_bake.dilate_fill(albedo_img, mask, iters)
        bump_img = texture_bake.dilate_fill(bump_img, mask, iters)
        counters = jnp.stack([total_fine, total_coarse, n_multi])
        return albedo_img, bump_img, mask, counters

    def _surface_query(self, scene_code, px, py, pz):
        """Material query at baked surface positions (chunked, trace-time)."""
        heads = self._head_weights(["features", "perturb_normal"])
        spec = self.grid_spec(compute_dtype=self.extract_dtype)
        n = px.shape[0]
        chunk = 65536 if (n > 65536 and n % 65536 == 0) else n

        def one(args):
            cx, cy, cz = args
            out = query_points_multihead(scene_code, heads, cx, cy, cz, spec)
            albedo = jax.nn.sigmoid(out["features"])
            pn = out["perturb_normal"]
            pn = pn / jnp.maximum(jnp.linalg.norm(pn, axis=0, keepdims=True), 1e-12)
            return albedo, pn

        if n <= chunk:
            return one((px, py, pz))
        parts = jax.lax.map(
            one,
            (px.reshape(-1, chunk), py.reshape(-1, chunk), pz.reshape(-1, chunk)),
        )
        return (
            jnp.swapaxes(parts[0], 0, 1).reshape(3, n),
            jnp.swapaxes(parts[1], 0, 1).reshape(3, n),
        )

    # ------------------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=(0, 3, 4, 5, 6, 7))
    def _unwrap_bake_jit(
        self, scene_code, packed_u16, nb, fbk, bake_resolution,
        island_padding, caps,
    ):
        """UV unwrap + texture bake as ONE device program, ONE u16 input and
        ONE compact uint8 output (no host round trip between the stages;
        round 2 spent ~3.3 s there, and each extra device_put pays the
        tunnel's 30-500 ms fluctuating latency — hence a SINGLE packed
        upload).

        ``packed_u16`` layout (``nb``/``fbk`` = size-bucketed vertex/face
        counts, static):
          [0 : 3*nb]           attrs (3, nb) — PCA-ROTATED positions
                               quantized over their bbox (vertex normals do
                               NOT ride the wire: the unwrap derives the
                               geometric face normal from these positions,
                               see ``uv_unwrap_device._unwrap_core``)
          [3*nb : 3*nb+4*fbk]  faces (4, fbk) — rows 0-2 = lo16 of fa/fb/fc,
                               row 3 = the three hi words packed 5 bits each
                               (fa_hi | fb_hi<<5 | fc_hi<<10; exact while
                               nb <= 2^21 — arithmetic recombine, no
                               bitcast -> no denormal hazard)
          [-38 : -4]           17 f32 [roughness, metallic, bbox_min(3),
                               bbox_max(3), rot(9 row-major)] bit-split into
                               (lo16, hi16) pairs; reconstructed by u32
                               bitcast (values are normal floats or 0)
          [-4 :]               n_verts, n_faces as (lo16, hi16)
        ``caps`` = (unwrap_pair, unwrap_pair2, unwrap_multi, bake_pair,
        bake_pair2) static capacities.

        Output wire (uint8): [albedo u8 3*res^2][bump u8 3*res^2]
        [atlas_index u8 (Fb,)][angles f32 x12 as 48 B][counters u32 x6]
        [rm u16 x2] — the per-corner UVs do NOT cross the link at all (they
        were 12 B/face, ~9.4 MB at 786K faces — the largest section of the
        old wire on a 14-115 MB/s link): the host rebuilds them bit-
        comparably from the SAME dequantized u16 inputs it uploaded, the
        1 B/face atlas_index (raster-derived visibility classes) and the 12
        per-slice rotation angles (the only accumulation-order-dependent
        reductions in the unwrap) via
        ``uv_unwrap_device.reconstruct_uvs_host``. Bump is dithered on
        device over covered texels (``float32_to_uint8`` semantics with a
        counter-based uniform noise).
        """
        from sculptmate_tpu.geometry.uv_unwrap_device import _unwrap_core

        res = bake_resolution
        attrs_u16 = packed_u16[: 3 * nb].reshape(3, nb)
        fsec = packed_u16[3 * nb : 3 * nb + 4 * fbk].reshape(4, fbk).astype(
            jnp.int32
        )
        hi = fsec[3]  # 3 x 5-bit hi words packed (see unwrap_bake_async)
        fa = fsec[0] | ((hi & 0x1F) << 16)
        fb = fsec[1] | (((hi >> 5) & 0x1F) << 16)
        fc = fsec[2] | (((hi >> 10) & 0x1F) << 16)
        meta = packed_u16[3 * nb + 4 * fbk :].astype(jnp.uint32)
        rm_bbox_rot = jax.lax.bitcast_convert_type(
            meta[0:34:2] | (meta[1:34:2] << 16), jnp.float32
        )
        rm = rm_bbox_rot[:2]
        bb_min = rm_bbox_rot[2:5]
        bb_max = rm_bbox_rot[5:8]
        rot = rm_bbox_rot[8:17].reshape(3, 3)
        n_verts = (meta[34] | (meta[35] << 16)).astype(jnp.int32)
        n_faces = (meta[36] | (meta[37] << 16)).astype(jnp.int32)

        scale = (bb_max - bb_min) / 65535.0
        rp = [
            attrs_u16[c].astype(jnp.float32) * scale[c] + bb_min[c]
            for c in range(3)
        ]  # rotated positions, 3 x (Nv,)

        uv6, atlas_index, unwrap_counters, angles = _unwrap_core(
            rp[0], rp[1], rp[2], fa, fb, fc,
            n_verts, n_faces, island_padding, caps[:3],
        )  # (6, Fb) uint16 rows [u0, v0, u1, v1, u2, v2] (device-local)

        # world positions for the material query: world = rotated @ rot
        rp_cf = jnp.stack(rp)  # (3, Nv) rotated
        world = rot.T @ rp_cf  # (3, Nv)
        pos_v = [world[0], world[1], world[2]]

        uvf = uv6.astype(jnp.float32) / 65535.0
        uc = (uvf[0], uvf[2], uvf[4])
        vc = (uvf[1], uvf[3], uvf[5])
        albedo_img, bump_img, mask, bake_counters = self._bake_core(
            scene_code, uc, vc, pos_v, fa, fb, fc, res, caps[3], caps[4]
        )

        # device quantization (float32_to_uint8 semantics): albedo plain,
        # bump dithered over covered texels only
        albedo_u8 = jnp.clip(
            jnp.clip(albedo_img, 0.0, 1.0) * 255.0 + 0.5, 0.0, 255.0
        ).astype(jnp.uint8)
        noise = (
            jax.random.uniform(jax.random.PRNGKey(0), bump_img.shape) - 0.5
        ) / 255.0
        bump_d = jnp.clip(bump_img + noise * mask[None, :, :], 0.0, 1.0)
        bump_u8 = jnp.clip(bump_d * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)

        atlas_u8 = jnp.clip(atlas_index, 0, 255).astype(jnp.uint8)  # (Fb,)
        ang_u32 = jax.lax.bitcast_convert_type(
            angles.reshape(-1), jnp.uint32
        )  # (12,)
        ang_bytes = jnp.stack(
            [(ang_u32 >> (8 * b)) & 0xFF for b in range(4)], axis=1
        ).reshape(-1).astype(jnp.uint8)  # (48,)

        counters = jnp.concatenate(
            [unwrap_counters, bake_counters]
        ).astype(jnp.uint32)
        count_bytes = jnp.stack(
            [(counters >> (8 * b)) & 0xFF for b in range(4)], axis=1
        ).reshape(-1).astype(jnp.uint8)
        rm_q = jnp.clip(jnp.round(rm * 65535.0), 0, 65535).astype(jnp.uint32)
        rm_bytes = jnp.stack(
            [rm_q & 0xFF, (rm_q >> 8) & 0xFF], axis=1
        ).reshape(-1).astype(jnp.uint8)

        return jnp.concatenate(
            [
                albedo_u8.reshape(-1),
                bump_u8.reshape(-1),
                atlas_u8,
                ang_bytes,
                count_bytes,
                rm_bytes,
            ]
        )

    def unwrap_bake(
        self,
        v_pos: np.ndarray,
        faces: np.ndarray,
        scene_code,
        global_dict,
        bake_resolution: int,
        island_padding: float = 0.02,
    ):
        """Fused device unwrap + bake for a (non-duplicated) mesh. Returns
        (uv_flat (F, 3, 2) f32, texture dict as in ``bake_textures``). ONE
        u16-quantized upload, ONE uint8 fetch; raster capacity overflows are
        detected from the wire counters and retried, never truncated.

        Vertex normals are not needed: the device unwrap derives geometric
        face normals from the quantized positions, and the bake derives its
        own per-face normals/tangents."""
        return self.unwrap_bake_wait(
            self.unwrap_bake_async(
                v_pos, faces, scene_code, global_dict,
                bake_resolution, island_padding,
            )
        )

    def unwrap_bake_async(
        self,
        v_pos: np.ndarray,
        faces: np.ndarray,
        scene_code,
        global_dict,
        bake_resolution: int,
        island_padding: float = 0.02,
    ):
        """Host prep + non-blocking dispatch of the fused unwrap+bake program
        (its D2H copy is queued async). Returns an opaque handle for
        ``unwrap_bake_wait`` — serving loops overlap asset i's bake on device
        with asset i+1's host-side wire decode + decimation
        (``parallel.sf3d_farm.SF3DFarm``)."""
        from sculptmate_tpu.geometry.texture_bake import (
            _PAIR2_CHUNK,
            _PAIR_CHUNK,
            default_multi_capacity,
            default_pair2_capacity,
            default_pair_capacity,
        )
        from sculptmate_tpu.geometry.uv_unwrap import _main_axis_rotation
        from sculptmate_tpu.geometry.uv_unwrap_device import RASTER_RES
        from sculptmate_tpu.ops import size_bucket

        import os
        import time as _time

        prof = bool(os.environ.get("SCULPTMATE_BAKE_PROFILE"))
        t0 = _time.perf_counter()

        v_pos = np.asarray(v_pos, np.float32)
        faces = np.asarray(faces)
        # host keeps only the 3x3 PCA rotation; rotated = v @ rot.T goes up
        # quantized, world positions are recovered on device via rot
        rot = _main_axis_rotation(v_pos)
        rp = v_pos @ rot.T

        nv, nf = len(v_pos), len(faces)
        nb, fb_ = size_bucket(nv), size_bucket(nf)

        bb_min = rp.min(axis=0) if nv else np.zeros(3, np.float32)
        bb_max = rp.max(axis=0) if nv else np.ones(3, np.float32)
        bb_rng = np.maximum(bb_max - bb_min, 1e-12)
        attrs = np.zeros((3, nb), np.uint16)
        attrs[:, :nv] = np.round((rp - bb_min) / bb_rng * 65535.0).astype(
            np.uint16
        ).T

        fcomp = np.zeros((3, fb_), np.int32)
        fcomp[:, :nf] = faces.T

        rm_bbox_rot = np.concatenate(
            [
                np.asarray(
                    [
                        float(np.asarray(global_dict["decoder_roughness"]).reshape(())),
                        float(np.asarray(global_dict["decoder_metallic"]).reshape(())),
                    ],
                    np.float32,
                ),
                bb_min.astype(np.float32),
                bb_max.astype(np.float32),
                rot.astype(np.float32).reshape(-1),
            ]
        )

        # capacity cache: the conservative defaults are 20-40x the observed
        # (face, tile)-pair counts, and the binned rasterizer pays for every
        # CAPACITY slot's scatter update (TPU scatter cost scales with update
        # count, not live count). After the first successful bake the
        # observed counters (x1.5 slack) size all later programs — same
        # policy as the extraction _cap_cache; overflow is detected from the
        # wire counters and retried, never truncated.
        if not hasattr(self, "_ub_caps"):
            self._ub_caps = {}
        # keyed by (bake res, face bucket): fb_ is a static program arg, so
        # distinct mesh-size buckets are distinct programs with their own
        # observed capacities; persisted so a fresh process starts at the
        # steady-state capacities instead of the 20-40x defaults
        from sculptmate_tpu.runtime import capacity_cache

        ub_key = (bake_resolution, fb_)
        # the tile size changes what the pair counters count — tag the key
        ub_pkey = f"sf3d_ub_t{texture_bake.TILE}_{bake_resolution}_{fb_}"
        cached = self._ub_caps.get(ub_key)
        if cached is None:
            cached = capacity_cache.load(ub_pkey)
        first_success_shrinks = cached is None
        if cached is not None:
            u_pair, u_pair2, u_multi, b_pair, b_pair2 = cached
        else:
            u_pair = 1 << max(16, int(4 * fb_ - 1).bit_length())
            u_pair2 = default_pair2_capacity(RASTER_RES)
            u_multi = default_multi_capacity(u_pair)
            b_pair = (
                default_pair_capacity(nf)
                if bake_resolution % texture_bake.TILE2 == 0
                else 0
            )
            b_pair2 = default_pair2_capacity(bake_resolution)

        res = bake_resolution
        # ONE u16 upload: attrs + compact faces + bit-split f32 metadata
        # + counts (each separate device_put pays the tunnel's fluctuating
        # 30-500 ms latency; this used to be 7 transfers). Faces ship as 3
        # lo16 rows + ONE row holding all three hi words packed 5 bits each
        # (valid while nb <= 2^21, i.e. every index < 2^21 -> hi < 32): the
        # hi rows were 2/6 of the face section's bytes and carried <= 5 bits
        # of information each — at 786K faces this trims ~3.1 MB off a
        # 12.6 MB upload on a 14-115 MB/s link.
        assert nb <= (1 << 21), "face hi-bit packing needs nv < 2^21"
        packed = np.empty(3 * nb + 4 * fb_ + 38, np.uint16)
        packed[: 3 * nb] = attrs.reshape(-1)
        packed[3 * nb : 3 * nb + 3 * fb_] = (
            (fcomp & 0xFFFF).astype(np.uint16).reshape(-1)
        )
        hi = (fcomp >> 16).astype(np.uint16)
        packed[3 * nb + 3 * fb_ : 3 * nb + 4 * fb_] = (
            hi[0] | (hi[1] << 5) | (hi[2] << 10)
        )
        bits = rm_bbox_rot.astype(np.float32).view(np.uint32)
        packed[-38:-4:2] = (bits & 0xFFFF).astype(np.uint16)
        packed[-37:-4:2] = (bits >> 16).astype(np.uint16)
        packed[-4] = nv & 0xFFFF
        packed[-3] = nv >> 16
        packed[-2] = nf & 0xFFFF
        packed[-1] = nf >> 16
        if prof:
            print(f"[unwrap_bake] host prep: {(_time.perf_counter()-t0)*1e3:.0f} ms")
        packed_dev = jnp.asarray(packed)
        caps = (u_pair, u_pair2, u_multi, b_pair, b_pair2)
        fut = self._unwrap_bake_jit(
            scene_code, packed_dev, nb, fb_, res, float(island_padding), caps
        )
        fut.copy_to_host_async()
        return _UnwrapBakeHandle(
            fut=fut,
            scene_code=scene_code,
            packed_dev=packed_dev,
            nb=nb,
            fb=fb_,
            nf=nf,
            res=res,
            island_padding=float(island_padding),
            caps=caps,
            first_success_shrinks=first_success_shrinks,
            ub_key=ub_key,
            ub_pkey=ub_pkey,
            host_attrs=attrs,
            host_bb=(bb_min.astype(np.float32), bb_max.astype(np.float32)),
            host_faces=faces,
            nv=nv,
        )

    def unwrap_bake_wait(self, handle):
        """Block on a handle from ``unwrap_bake_async`` -> (uv_flat, texture
        dict). Raster capacity overflows are detected from the wire counters
        and re-dispatched, never truncated."""
        from sculptmate_tpu.geometry.texture_bake import (
            _PAIR2_CHUNK,
            _PAIR_CHUNK,
            default_multi_capacity,
        )
        from sculptmate_tpu.runtime import capacity_cache

        import os
        import time as _time

        prof = bool(os.environ.get("SCULPTMATE_BAKE_PROFILE"))
        t0 = _time.perf_counter()

        fut = handle.fut
        nb, fb_, nf, res = handle.nb, handle.fb, handle.nf, handle.res
        u_pair, u_pair2, u_multi, b_pair, b_pair2 = handle.caps
        first_success_shrinks = handle.first_success_shrinks
        first = True
        while True:
            if not first:
                fut = self._unwrap_bake_jit(
                    handle.scene_code, handle.packed_dev, nb, fb_, res,
                    handle.island_padding,
                    (u_pair, u_pair2, u_multi, b_pair, b_pair2),
                )
            first = False
            wire = np.asarray(fut)  # ONE fetch for uvs + textures
            tail = wire[-28:]
            counters = (
                tail[:24].reshape(6, 4).astype(np.uint32)
                @ (np.uint32(1) << np.arange(0, 32, 8, dtype=np.uint32))
            )
            uw_fine, uw_coarse, uw_multi, bk_fine, bk_coarse, bk_multi = (
                int(x) for x in counters
            )
            ok = True
            if uw_fine > u_pair or uw_coarse > u_pair2 or uw_multi > u_multi:
                ok = False
                if uw_fine > u_pair:
                    u_pair = -(-2 * max(u_pair, uw_fine) // _PAIR_CHUNK) * _PAIR_CHUNK
                if uw_coarse > u_pair2:
                    u_pair2 = (
                        -(-2 * max(u_pair2, uw_coarse) // _PAIR2_CHUNK) * _PAIR2_CHUNK
                    )
                if uw_multi > u_multi:
                    u_multi = 2 * max(u_multi, uw_multi)
            if b_pair > 0:
                bcap_multi = default_multi_capacity(b_pair)
                if bk_fine > b_pair or bk_coarse > b_pair2 or bk_multi > bcap_multi:
                    ok = False
                    if bk_fine > b_pair:
                        b_pair = (
                            -(-2 * max(b_pair, bk_fine) // _PAIR_CHUNK) * _PAIR_CHUNK
                        )
                    if bk_coarse > b_pair2:
                        b_pair2 = (
                            -(-2 * max(b_pair2, bk_coarse) // _PAIR2_CHUNK)
                            * _PAIR2_CHUNK
                        )
                    if bk_multi > bcap_multi:
                        pc = _PAIR_CHUNK
                        b_pair = max(b_pair, -(-64 * 2 * bk_multi // pc) * pc)
            if ok:
                break

        if first_success_shrinks:
            # shrink ONCE to observed x1.5 (chunk-rounded); later calls grow
            # only on overflow, so capacity shapes (and thus compiles) change
            # at most twice per process — and the persistent compile cache
            # amortizes those across processes
            u_pair = max(_PAIR_CHUNK, -(-int(uw_fine * 1.5) // _PAIR_CHUNK) * _PAIR_CHUNK)
            u_pair2 = max(
                _PAIR2_CHUNK, -(-int(uw_coarse * 1.5) // _PAIR2_CHUNK) * _PAIR2_CHUNK
            )
            u_multi = max(1024, 2 * uw_multi)
            if b_pair > 0:
                b_pair = max(
                    _PAIR_CHUNK,
                    -(-int(bk_fine * 1.5) // _PAIR_CHUNK) * _PAIR_CHUNK,
                    # keep default_multi_capacity(b_pair) >= observed multis
                    -(-64 * 2 * bk_multi // _PAIR_CHUNK) * _PAIR_CHUNK,
                )
                b_pair2 = max(
                    _PAIR2_CHUNK,
                    -(-int(bk_coarse * 1.5) // _PAIR2_CHUNK) * _PAIR2_CHUNK,
                )
        self._ub_caps[handle.ub_key] = (u_pair, u_pair2, u_multi, b_pair, b_pair2)
        capacity_cache.store(handle.ub_pkey, self._ub_caps[handle.ub_key])

        if prof:
            print(f"[unwrap_bake] jit+fetch: {(_time.perf_counter()-t0)*1e3:.0f} ms")
            t0 = _time.perf_counter()
        n_img = 3 * res * res
        albedo_u8 = wire[:n_img].reshape(3, res, res).transpose(1, 2, 0)
        bump_u8 = wire[n_img : 2 * n_img].reshape(3, res, res).transpose(1, 2, 0)
        atlas_index = wire[2 * n_img : 2 * n_img + fb_][: nf].astype(np.int32)
        ang_sec = wire[2 * n_img + fb_ : 2 * n_img + fb_ + 48]
        # 12 f32 little-endian: rows [ca(6), sa(6)] of the (2, 6) angles
        angles = np.frombuffer(ang_sec.astype(np.uint8).tobytes(), dtype="<f4")
        # host UV reconstruction from the SAME dequantized inputs the device
        # decoded (bit-identical f32), the atlas classes and the angles
        from sculptmate_tpu.geometry.uv_unwrap_device import (
            reconstruct_uvs_host,
        )

        attrs = handle.host_attrs
        bb_min, bb_max = handle.host_bb
        nv = handle.nv
        scale = (bb_max - bb_min) / np.float32(65535.0)
        rp = (
            attrs[0:3, :nv].astype(np.float32) * scale[:, None]
            + bb_min[:, None]
        ).T
        uv_flat = reconstruct_uvs_host(
            rp, handle.host_faces, atlas_index,
            angles[:6], angles[6:], handle.island_padding,
        )  # (F, 3, 2) f32
        rm_b = tail[24:28].astype(np.uint32)
        roughness = float((rm_b[0] | (rm_b[1] << np.uint32(8))) / 65535.0)
        metallic = float((rm_b[2] | (rm_b[3] << np.uint32(8))) / 65535.0)

        albedo_np = albedo_u8.astype(np.float32) / 255.0
        bump_np = bump_u8.astype(np.float32) / 255.0

        def png_bytes(arr_u8):
            from PIL import Image

            buf = io.BytesIO()
            # compress_level 1: ~4x faster on the single host core than the
            # zlib-6 default, marginally larger files
            Image.fromarray(arr_u8).save(buf, format="PNG", compress_level=1)
            return buf.getvalue()

        mr = np.zeros_like(albedo_u8)
        mr[..., 1] = int(np.clip(roughness, 0, 1) * 255)
        mr[..., 2] = int(np.clip(metallic, 0, 1) * 255)

        textures = {
            "textures": {"albedo": albedo_np, "bump": bump_np},
            "texture_pngs": {
                "baseColor": png_bytes(albedo_u8),
                "normal": png_bytes(bump_u8),
                "metallicRoughness": png_bytes(mr),
            },
            "roughness": roughness,
            "metallic": metallic,
        }
        if prof:
            print(f"[unwrap_bake] decode+png: {(_time.perf_counter()-t0)*1e3:.0f} ms")
        return uv_flat, textures

    def bake_textures(
        self, mesh: Mesh, scene_code, global_dict, bake_resolution: int
    ) -> Dict[str, Any]:
        """Texture baking (``sf3d/system.py:359-512``): rasterize the UV
        atlas, query materials at interpolated surface positions, compose the
        tangent-space bump map, dilate islands, quantize. One packed H2D
        upload + one jit + one D2H fetch."""
        from sculptmate_tpu.ops import size_bucket

        nv = len(mesh.v_pos)
        bucket = size_bucket(nv)
        # u16-quantized pos (over the bbox) + uv; normals/tangents are
        # derived on device (see _bake_jit) — 4.4x fewer upload bytes
        bb_min = mesh.v_pos.min(axis=0) if nv else np.zeros(3, np.float32)
        bb_max = mesh.v_pos.max(axis=0) if nv else np.ones(3, np.float32)
        bb_range = np.maximum(bb_max - bb_min, 1e-12)
        attrs = np.zeros((5, bucket), np.uint16)
        attrs[0:3, :nv] = np.round(
            (mesh.v_pos - bb_min) / bb_range * 65535.0
        ).astype(np.uint16).T
        attrs[3:5, :nv] = np.round(
            np.clip(mesh.v_tex, 0.0, 1.0) * 65535.0
        ).astype(np.uint16).T

        nf = len(mesh.t_pos_idx)
        fbucket = size_bucket(nf)
        fcomp = np.zeros((3, fbucket), np.int32)
        fcomp[:, :nf] = mesh.t_pos_idx.T
        # pad faces with a degenerate triangle at vertex 0 (never wins raster)

        rm = jnp.concatenate(
            [
                jnp.asarray(global_dict["decoder_roughness"]).reshape(1),
                jnp.asarray(global_dict["decoder_metallic"]).reshape(1),
                jnp.asarray(bb_min, jnp.float32),
                jnp.asarray(bb_max, jnp.float32),
            ]
        )
        # binned rasterizer with host-checked overflow: retry on pair-capacity
        # overflow (never truncate), fall back to the brute-force path when a
        # face spans > MAX_TSPAN tiles of the atlas
        pair_cap = (
            texture_bake.default_pair_capacity(nf)
            if bake_resolution % texture_bake.TILE2 == 0
            else 0
        )
        pair2_cap = texture_bake.default_pair2_capacity(bake_resolution)
        args = (
            scene_code,
            jnp.asarray(attrs),
            jnp.asarray(fcomp[0]),
            jnp.asarray(fcomp[1]),
            jnp.asarray(fcomp[2]),
            bake_resolution,
            rm,
        )
        while True:
            packed = np.asarray(self._bake_jit(*args, pair_cap, pair2_cap))
            if pair_cap == 0:
                break
            fine = int(round(float(packed[6, 0, 2])))
            coarse = int(round(float(packed[6, 0, 3])))
            nmulti = int(round(float(packed[6, 0, 4])))
            mcap = texture_bake.default_multi_capacity(pair_cap)
            if fine <= pair_cap and coarse <= pair2_cap and nmulti <= mcap:
                break
            if fine > pair_cap:
                pc = texture_bake._PAIR_CHUNK
                pair_cap = -(-2 * max(pair_cap, fine) // pc) * pc
            if coarse > pair2_cap:
                pc2 = texture_bake._PAIR2_CHUNK
                pair2_cap = -(-2 * max(pair2_cap, coarse) // pc2) * pc2
            if nmulti > mcap:
                # grow the fine capacity so the derived multi list covers it
                # (chunk-rounded: the pair loop runs capacity // _PAIR_CHUNK
                # chunks, so a ragged capacity would skip tail pairs)
                pc = texture_bake._PAIR_CHUNK
                pair_cap = max(pair_cap, -(-64 * 2 * nmulti // pc) * pc)
        albedo_np = np.transpose(packed[0:3], (1, 2, 0))
        bump_np = np.transpose(packed[3:6], (1, 2, 0))
        roughness = float(packed[6, 0, 0])
        metallic = float(packed[6, 0, 1])
        flat_mask = np.all(
            bump_np == np.array([0.5, 0.5, 1.0], np.float32), axis=-1, keepdims=True
        ).astype(np.float32)

        albedo_u8 = texture_bake.float32_to_uint8(albedo_np)
        bump_u8 = texture_bake.float32_to_uint8(bump_np, dither=True, dither_mask=flat_mask)

        def png_bytes(arr_u8):
            from PIL import Image

            buf = io.BytesIO()
            # compress_level 1: ~4x faster on the single host core than the
            # zlib-6 default, marginally larger files
            Image.fromarray(arr_u8).save(buf, format="PNG", compress_level=1)
            return buf.getvalue()

        # metallicRoughness texture per glTF: G=roughness, B=metallic
        mr = np.zeros_like(albedo_u8)
        mr[..., 1] = int(np.clip(roughness, 0, 1) * 255)
        mr[..., 2] = int(np.clip(metallic, 0, 1) * 255)

        return {
            "textures": {"albedo": albedo_np, "bump": bump_np},
            "texture_pngs": {
                "baseColor": png_bytes(albedo_u8),
                "normal": png_bytes(bump_u8),
                "metallicRoughness": png_bytes(mr),
            },
            "roughness": roughness,
            "metallic": metallic,
        }
