"""TSR system — the TripoSR ("Lean") image -> mesh model, TPU-native.

Mirrors the component wiring of the reference ``tsr/system.py:68-115``:
DINO ViT-B/16 tokenizer -> learned triplane tokens -> 16-block
cross-attention backbone -> ConvTranspose upsample -> NeRF MLP decoder,
but compiled as two XLA programs:

- ``scene_codes``: image (B, H, W, 3) -> triplane codes (B, 3, 40, 64, 64),
  one jit, bf16-friendly.
- ``extract``: codes -> density lattice (fused separable grid query,
  ``ops/density_grid.py``) -> device marching cubes -> (optional) vertex
  colors, all without leaving the device until final compaction.

The reference's ``chunk_size`` knob (``TripoSR/generate.py:11``) has no
equivalent here: the grid query is a single fused program streamed in z-slabs.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sculptmate_tpu.config import load_yaml_config, parse_structured
from sculptmate_tpu.geometry.marching_cubes import marching_cubes, MCResult
from sculptmate_tpu.models.heads import NeRFMLP
from sculptmate_tpu.models.tokenizers import Triplane1DTokenizer
from sculptmate_tpu.models.transformer import Transformer1D
from sculptmate_tpu.models.upsamplers import TriplaneUpsampleNetwork
from sculptmate_tpu.models.vit import DINOSingleImageTokenizer
from sculptmate_tpu.ops.density_grid import (
    DensityGridSpec,
    mlp_weights_from_params,
    query_density_grid,
    query_triplane_points,
)
from sculptmate_tpu.ops.resize import resize_bilinear_antialias


@dataclasses.dataclass(frozen=True)
class TSRConfig:
    cond_image_size: int = 512
    plane_size: int = 32
    num_channels: int = 1024
    num_attention_heads: int = 16
    attention_head_dim: int = 64
    num_layers: int = 16
    cross_attention_dim: int = 768
    upsample_out_channels: int = 40
    decoder_in_channels: int = 120
    decoder_n_neurons: int = 64
    decoder_n_hidden_layers: int = 9
    decoder_activation: str = "silu"
    radius: float = 0.87
    density_activation: str = "exp"
    density_bias: float = -1.0
    # image tokenizer (ViT-B/16 per TripoSR/checkpoints/config.json)
    vit_hidden_size: int = 768
    vit_num_layers: int = 12
    vit_num_heads: int = 12
    vit_intermediate_size: int = 3072
    vit_patch_size: int = 16
    vit_base_image_size: int = 224

    @classmethod
    def from_yaml(cls, path: str) -> "TSRConfig":
        """Load the reference's config.yaml layout
        (``TripoSR/checkpoints/config.yaml``)."""
        y = load_yaml_config(path)
        return cls(
            cond_image_size=y.get("cond_image_size", 512),
            plane_size=y["tokenizer"]["plane_size"],
            num_channels=y["tokenizer"]["num_channels"],
            num_attention_heads=y["backbone"]["num_attention_heads"],
            attention_head_dim=y["backbone"]["attention_head_dim"],
            num_layers=y["backbone"]["num_layers"],
            cross_attention_dim=y["backbone"]["cross_attention_dim"],
            upsample_out_channels=y["post_processor"]["out_channels"],
            decoder_in_channels=y["decoder"]["in_channels"],
            decoder_n_neurons=y["decoder"]["n_neurons"],
            decoder_n_hidden_layers=y["decoder"]["n_hidden_layers"],
            decoder_activation=y["decoder"].get("activation", "silu"),
            radius=y["renderer"]["radius"],
            density_activation=y["renderer"].get("density_activation", "exp"),
            density_bias=y["renderer"].get("density_bias", -1.0),
        )


class TSRModule(nn.Module):
    """Flax module holding all learned parameters of the TSR stack.

    ``tp_axis``: mesh-axis name for Megatron-style tensor parallelism inside
    the backbone (attention heads / FF hidden sharded, GSPMD-inserted
    collectives). Callers must trace under ``jax.sharding.set_mesh``.
    """

    config: TSRConfig
    dtype: jnp.dtype = jnp.float32
    tp_axis: Optional[str] = None

    def setup(self):
        c = self.config
        self.image_tokenizer = DINOSingleImageTokenizer(
            hidden_size=c.vit_hidden_size,
            num_layers=c.vit_num_layers,
            num_heads=c.vit_num_heads,
            intermediate_size=c.vit_intermediate_size,
            patch_size=c.vit_patch_size,
            base_image_size=c.vit_base_image_size,
            dtype=self.dtype,
        )
        self.tokenizer = Triplane1DTokenizer(c.plane_size, c.num_channels)
        self.backbone = Transformer1D(
            in_channels=c.num_channels,
            num_attention_heads=c.num_attention_heads,
            attention_head_dim=c.attention_head_dim,
            num_layers=c.num_layers,
            cross_attention_dim=c.cross_attention_dim,
            tp_axis=self.tp_axis,
            dtype=self.dtype,
        )
        self.post_processor = TriplaneUpsampleNetwork(
            in_channels=c.num_channels,
            out_channels=c.upsample_out_channels,
            dtype=self.dtype,
        )
        self.decoder = NeRFMLP(
            in_channels=c.decoder_in_channels,
            n_neurons=c.decoder_n_neurons,
            n_hidden_layers=c.decoder_n_hidden_layers,
            activation=c.decoder_activation,
        )

    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images: (B, H, W, 3) in [0,1] at cond_image_size. -> (B,3,C,H,W)."""
        B = images.shape[0]
        image_tokens = self.image_tokenizer(images)  # (B, 768, 1025)
        image_tokens = jnp.swapaxes(image_tokens, 1, 2)  # (B, Nt, 768)
        tokens = self.tokenizer(B)
        tokens = self.backbone(tokens, encoder_hidden_states=image_tokens)
        return self.post_processor(self.tokenizer.detokenize(tokens))

    def decode(self, features: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        return self.decoder(features)

    def init_all(self, images: jnp.ndarray):
        """Init-time entry that touches every submodule (linen creates params
        lazily, and the decoder is not on the ``__call__`` path)."""
        codes = self(images)
        feats = jnp.zeros((1, self.config.decoder_in_channels), jnp.float32)
        return codes, self.decode(feats)


@dataclasses.dataclass(frozen=True)
class _WireHandle:
    """In-flight wire extraction: the dispatched future plus everything
    needed to retry on capacity overflow and decode the result."""

    scene_code: object
    fut: object
    mv: int
    bc: int
    resolution: int
    threshold: float
    want_colors: bool


class TSR:
    """Host-side wrapper: params + jitted programs. API mirrors
    ``tsr/system.py``'s forward/extract_mesh split."""

    def __init__(
        self,
        config: Optional[TSRConfig] = None,
        params=None,
        seed: int = 0,
        dtype: jnp.dtype = jnp.bfloat16,
        tp_axis: Optional[str] = None,
        extract_dtype: Optional[jnp.dtype] = None,
    ):
        self.config = config or TSRConfig()
        self.module = TSRModule(self.config, dtype=dtype, tp_axis=tp_axis)
        # density-grid compute dtype for the production extraction paths;
        # follows the model dtype: bf16 halves the 256^3 MLP sweep (80 ->
        # 44 ms on v5e) at ~2e-3 max field error (f32 MXU accumulate) — far
        # below the u16 t quantization the wire format applies anyway
        self.extract_dtype = extract_dtype if extract_dtype is not None else dtype
        if params is None:
            dummy = jnp.zeros(
                (1, self.config.cond_image_size, self.config.cond_image_size, 3),
                jnp.float32,
            )
            from sculptmate_tpu.runtime.init import jitted_init

            params = jitted_init(
                self.module, seed, dummy, method=TSRModule.init_all
            )["params"]
        self.params = params
        self._forward = jax.jit(
            lambda p, img: self.module.apply({"params": p}, img)
        )

    # -- stage 1: image -> scene codes --------------------------------
    def scene_codes(self, images: jnp.ndarray) -> jnp.ndarray:
        """images: (B, H, W, 3) float in [0,1]; resized on device if needed."""
        s = self.config.cond_image_size
        if images.shape[1] != s or images.shape[2] != s:
            images = resize_bilinear_antialias(images, s, s)
        return self._forward(self.params, images)

    # -- stage 2: scene code -> mesh ----------------------------------
    def grid_spec(self, resolution: int, slab: int = 0, compute_dtype=jnp.float32):
        c = self.config
        if slab <= 0:  # largest divisor of the resolution <= 8
            slab = max(s for s in range(1, 9) if resolution % s == 0)
        return DensityGridSpec(
            resolution=resolution,
            radius=c.radius,
            density_activation=c.density_activation,
            density_bias=c.density_bias,
            activation=c.decoder_activation,
            align_corners=False,
            slab=slab,
            compute_dtype=compute_dtype,
        )

    @functools.partial(jax.jit, static_argnums=(0, 2, 4, 5))
    def _extract_jit(
        self, scene_code, resolution, threshold, max_verts, max_faces
    ) -> MCResult:
        # threshold is traced: a new iso level must not trigger a recompile
        weights = mlp_weights_from_params(self.params["decoder"]["layers"])
        spec = self.grid_spec(resolution)
        density = query_density_grid(scene_code, weights, spec)
        return marching_cubes(density - threshold, max_verts, max_faces)

    @functools.partial(jax.jit, static_argnums=(0, 2, 4, 5, 6, 7, 8))
    def _extract_packed_jit(
        self, scene_code, resolution, threshold, max_verts, max_faces, want_colors,
        block_capacity=0, dense=False,
    ):
        # threshold is traced: a new iso level must not trigger a recompile
        """Extraction + color query + transfer packing as ONE program with ONE
        output buffer: device->host round trips through tunneled TPU runtimes
        cost ~300 ms *each* regardless of size, so everything (positions,
        colors, bit-cast faces, bit-cast counts) rides one (3, W) f32 array.
        """
        weights = mlp_weights_from_params(self.params["decoder"]["layers"])
        spec = self.grid_spec(resolution, compute_dtype=self.extract_dtype)
        density = query_density_grid(scene_code, weights, spec)
        res = marching_cubes(
            density - threshold, max_verts, max_faces, block_capacity, dense
        )

        scale = 2 * self.config.radius / (resolution - 1.0)
        wx = res.vx * scale - self.config.radius
        wy = res.vy * scale - self.config.radius
        wz = res.vz * scale - self.config.radius
        verts = jnp.stack([wx, wy, wz])  # (3, max_verts) world coords

        parts = [verts]
        if want_colors:
            parts.append(self._color_query(scene_code, weights, spec, wx, wy, wz))

        # ints ride as exact f32 values (< 2^24), NOT bitcasts: bitcast
        # int32->f32 yields denormals for small ints and the TPU flushes
        # denormals to zero (observed: all counts came back 0)
        assert max_verts < (1 << 24), "face ids would lose f32 precision"
        faces_f = jnp.stack([res.fa, res.fb, res.fc]).astype(jnp.float32)
        parts.append(faces_f)

        counts = jnp.stack(
            [
                res.num_verts,
                res.num_faces,
                res.num_active_blocks,
                res.num_active_cells,
            ]
        ).astype(jnp.float32)
        parts.append(jnp.broadcast_to(counts[None, :], (3, 4)))
        return jnp.concatenate(parts, axis=1)

    def _trace_wire(
        self, scene_code, resolution, threshold, max_verts, want_colors,
        block_capacity,
    ):
        """Trace-time wire extraction body shared by the standalone and the
        fused (encode+extract) programs."""
        from sculptmate_tpu.geometry.marching_cubes import mc_wire_device

        weights = mlp_weights_from_params(self.params["decoder"]["layers"])
        spec = self.grid_spec(resolution, compute_dtype=self.extract_dtype)
        density = query_density_grid(scene_code, weights, spec)

        color_fn = None
        if want_colors:
            scale = 2 * self.config.radius / (resolution - 1.0)

            def color_fn(vx, vy, vz, valid):
                wx = vx * scale - self.config.radius
                wy = vy * scale - self.config.radius
                wz = vz * scale - self.config.radius
                colors = self._color_query(scene_code, weights, spec, wx, wy, wz)
                return colors[0], colors[1], colors[2]

        return mc_wire_device(
            density - threshold, max_verts, block_capacity, None, color_fn,
            split_colors=want_colors,
        )

    @functools.partial(jax.jit, static_argnums=(0, 2, 4, 5, 6))
    def _extract_wire_jit(
        self, scene_code, resolution, threshold, max_verts, want_colors,
        block_capacity=0,
    ):
        """Wire-format extraction (``geometry/marching_cubes.mc_wire_device``):
        density grid -> occupancy bits + per-cut-edge t + uint8 colors, ONE
        ~6 MB uint8 transfer at 256^3 (vs ~35 MB packed f32). Faces and
        vertex ids are rebuilt on the host by ``native/mc_wire.cpp`` — the
        tunneled D2H link (14-115 MB/s) is the lean path's bottleneck, and
        the device-side face-table machinery (~1 s at 256^3 noise surfaces)
        drops out entirely."""
        return self._trace_wire(
            scene_code, resolution, threshold, max_verts, want_colors,
            block_capacity,
        )

    @functools.partial(jax.jit, static_argnums=(0, 2, 4, 5, 6))
    def _encode_extract_wire_jit(
        self, images, resolution, threshold, max_verts, want_colors,
        block_capacity=0,
    ):
        """The WHOLE single-asset pipeline (cond image -> ViT -> backbone ->
        upsample -> density grid -> wire-format marching cubes [+ colors]) as
        ONE XLA program: one dispatch, one (split) fetch — dispatch round
        trips through the tunneled runtime cost tens of ms each."""
        codes = self.module.apply({"params": self.params}, images)
        return self._trace_wire(
            codes[0], resolution, threshold, max_verts, want_colors,
            block_capacity,
        )

    # -- shared wire-path policy -------------------------------------------
    # capacity cache, growth-on-overflow formulas and wire decode are shared
    # by ``image_to_mesh`` and ``extract_mesh`` (wire mode) so the retry
    # semantics cannot drift between the two entry points.

    def _wire_caps(self, resolution: int, max_verts: int, explicit: bool = False):
        """(mv, bc) to dispatch with at this resolution (cache-warmed).

        ``explicit``: the caller passed a deliberate vertex capacity — honor
        it as-given and let the cache fill only the block capacity. A stale
        giant persisted value must never silently inflate a caller-sized
        fetch; overflow-retry remains the safety net if the explicit value
        proves too small."""
        from sculptmate_tpu.geometry.marching_cubes import default_block_capacity

        from sculptmate_tpu.runtime import capacity_cache

        if not hasattr(self, "_wire_cap_cache"):
            self._wire_cap_cache = {}
        cached = self._wire_cap_cache.get(resolution)
        if cached is None:
            cached = capacity_cache.load(f"tsr_wire_r{resolution}")
        if cached is not None:
            mv = max_verts if explicit else max(max_verts, cached[0])
            return mv, cached[1]
        return max_verts, default_block_capacity(resolution, max_verts)

    def _wire_caps_store(self, resolution, mv, nv_seen, bc, nblocks_seen):
        # block capacity directly scales the compaction row gathers and
        # scatters (row-count-bound, ~0.75 us/row): TIGHTEN toward the
        # observed active-block count (not just grow); an occasional
        # bigger asset pays one retry. 4096-bucketed so capacity is a
        # small set of compiled program variants
        from sculptmate_tpu.runtime import capacity_cache

        bc_next = max(4096, min(bc, 4096 * -(-int(nblocks_seen * 1.3) // 4096)))
        # mv sizes the wire buffer and hence the D2H fetch: shrink it back
        # (with hysteresis) so one giant asset can't tax every later fetch
        mv_next = capacity_cache.tighten(mv, nv_seen)
        self._wire_cap_cache[resolution] = (mv_next, bc_next)
        capacity_cache.store(f"tsr_wire_r{resolution}", (mv_next, bc_next))

    @staticmethod
    def _wire_grown(nv, nblocks, mv_used, mv, bc):
        """None when the capacities held (counters within mv_used/bc);
        otherwise the grown (mv, bc) to retry with — overflow is detected
        from the exact wire counters, never silently truncated."""
        if nblocks > bc:
            return mv, max(bc + 1, int(nblocks * 1.2))
        if nv > mv_used:
            return max(mv, 65536 * -(-int(1.2 * nv) // 65536)), bc
        return None

    @staticmethod
    def _wire_dispatch_async(fut):
        """Queue every D2H copy of a (possibly split-color) wire result:
        the color bytes stream while the host decodes the geometry."""
        for part in fut if isinstance(fut, tuple) else (fut,):
            part.copy_to_host_async()
        return fut

    def _wire_decode(self, fut, wire, nv, mv_used, resolution):
        """wire buffer (+ split color plane) -> (verts world, faces i64,
        colors f32|None)."""
        from sculptmate_tpu.geometry import mc_wire

        shape = (resolution, resolution, resolution)
        verts, faces, _, _ = mc_wire.decode_wire(
            wire, shape, mv_used, has_colors=False
        )
        colors = None
        if isinstance(fut, tuple) and nv > 0:
            cb = np.asarray(fut[1])  # overlapped with the rebuild above
            colors = cb.reshape(3, mv_used)[:, :nv].T.astype(np.float32) / 255.0
        scale = 2 * self.config.radius / (resolution - 1.0)
        return verts * scale - self.config.radius, faces.astype(np.int64), colors

    def image_to_mesh(
        self,
        images: jnp.ndarray,
        has_vertex_color: bool = False,
        resolution: int = 256,
        threshold: float = 25.0,
        max_verts: int = 0,
    ):
        """Single-dispatch cond-image -> mesh: returns ONE
        (verts, faces, colors|None) triple for a (1, S, S, 3) cond image.
        Same capacity-retry semantics as ``extract_mesh`` (wire mode).

        CAVEAT: fusing the full encoder with the extraction machinery makes
        one very large XLA program whose FIRST compile at production sizes is
        far slower than the two staged programs (observed ~10x on the v5e
        remote compiler; subsequent runs hit the persistent cache). Prefer
        ``scene_codes`` + ``extract_mesh`` unless per-dispatch latency
        dominates your serving path and the compile is amortized."""
        from sculptmate_tpu.geometry import mc_wire

        s = self.config.cond_image_size
        if images.shape[1] != s or images.shape[2] != s:
            images = resize_bilinear_antialias(images, s, s)

        explicit = max_verts > 0
        if max_verts <= 0:
            max_verts = 8 * resolution * resolution
        mv, bc = self._wire_caps(resolution, max_verts, explicit)
        while True:
            fut = self._wire_dispatch_async(
                self._encode_extract_wire_jit(
                    images, resolution, float(threshold), mv,
                    bool(has_vertex_color), bc,
                )
            )
            wire = np.asarray(fut[0] if isinstance(fut, tuple) else fut)
            nv, nblocks = (
                int(c) for c in mc_wire.wire_counts(wire, mc_wire.N_WIRE_COUNTS)
            )
            grown = self._wire_grown(nv, nblocks, mv, mv, bc)
            if grown is None:
                break
            mv, bc = grown
        self._wire_caps_store(resolution, mv, nv, bc, nblocks)
        return self._wire_decode(fut, wire, nv, mv, resolution)

    def _color_query(self, scene_code, weights, spec, wx, wy, wz):
        """Trace-time chunked color-MLP query at world positions -> (3, N)."""
        n = wx.shape[0]
        chunk = 65536 if (n > 65536 and n % 65536 == 0) else n

        def one(args):
            cx, cy, cz = args
            return query_triplane_points(scene_code, weights, cx, cy, cz, spec)[
                "color"
            ]

        if n <= chunk:
            return one((wx, wy, wz))
        parts = jax.lax.map(
            one,
            (wx.reshape(-1, chunk), wy.reshape(-1, chunk), wz.reshape(-1, chunk)),
        )
        return jnp.swapaxes(parts, 0, 1).reshape(3, n)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _colors_jit(self, scene_code, px, py, pz):
        weights = mlp_weights_from_params(self.params["decoder"]["layers"])
        spec = self.grid_spec(2)  # resolution unused for point queries
        n = px.shape[0]
        chunk = min(n, 65536)  # bound gather-tap memory for million-vertex meshes

        def one(args):
            cx, cy, cz = args
            return query_triplane_points(scene_code, weights, cx, cy, cz, spec)["color"]

        if n <= chunk:
            return one((px, py, pz))
        parts = jax.lax.map(
            one,
            (
                px.reshape(-1, chunk),
                py.reshape(-1, chunk),
                pz.reshape(-1, chunk),
            ),
        )  # (n/chunk, 3, chunk)
        return jnp.swapaxes(parts, 0, 1).reshape(3, n)

    # -- novel-view rendering (reference's spherical render path:
    # -- nerf_renderer.py:93-172 + get_spherical_cameras) ----------------
    @functools.partial(jax.jit, static_argnums=(0, 4))
    def _render_rays_jit(self, scene_code, rays_o, rays_d, num_samples):
        weights = mlp_weights_from_params(self.params["decoder"]["layers"])
        spec = self.grid_spec(2)
        radius = self.config.radius

        shape = rays_o.shape[:-1]
        o = rays_o.reshape(-1, 3)
        d = rays_d.reshape(-1, 3)
        from sculptmate_tpu.ops.rays import rays_intersect_bbox

        t_near, t_far, valid = rays_intersect_bbox(o, d, radius)

        t_vals = jnp.linspace(0.0, 1.0, num_samples + 1)
        t_mid = (t_vals[:-1] + t_vals[1:]) / 2.0
        z = t_near[:, None] * (1 - t_mid)[None] + t_far[:, None] * t_mid[None]

        # sample positions, SoA per component
        px = o[:, 0:1] + z * d[:, 0:1]
        py = o[:, 1:2] + z * d[:, 1:2]
        pz = o[:, 2:3] + z * d[:, 2:3]
        out = query_triplane_points(
            scene_code, weights, px.ravel(), py.ravel(), pz.ravel(), spec
        )
        sigma = out["density_act"].reshape(z.shape)
        color = out["color"].reshape(3, *z.shape)

        delta = (t_vals[1:] - t_vals[:-1])[None]
        alpha = 1.0 - jnp.exp(-delta * sigma)
        accum = jnp.concatenate(
            [
                jnp.ones_like(alpha[:, :1]),
                jnp.cumprod(1.0 - alpha[:, :-1] + 1e-10, axis=-1),
            ],
            axis=-1,
        )
        w = alpha * accum
        rgb = jnp.einsum("ns,cns->nc", w, color)
        opacity = w.sum(-1)
        rgb = jnp.where(valid[:, None], rgb, 0.0)
        opacity = jnp.where(valid, opacity, 0.0)
        rgb = rgb + (1.0 - opacity[:, None])  # white background
        return rgb.reshape(*shape, 3)

    def render_views(
        self,
        scene_codes,
        n_views: int = 8,
        elevation_deg: float = 0.0,
        camera_distance: float = 1.9,
        fovy_deg: float = 40.0,
        height: int = 256,
        width: int = 256,
        num_samples: int = 128,
    ):
        """Render spherical novel views per scene code; returns a list of
        (n_views, H, W, 3) float arrays."""
        from sculptmate_tpu.ops.rays import get_spherical_cameras

        rays_o, rays_d = get_spherical_cameras(
            n_views, elevation_deg, camera_distance, fovy_deg, height, width
        )
        out = []
        for code in scene_codes:
            views = [
                np.asarray(self._render_rays_jit(code, rays_o[v], rays_d[v], num_samples))
                for v in range(n_views)
            ]
            out.append(np.stack(views))
        return out

    def extract_mesh(
        self,
        scene_codes,
        has_vertex_color: bool = False,
        resolution: int = 256,
        threshold: float = 25.0,
        max_verts: int = 0,
        max_faces: int = 0,
        mode: str = "wire",
    ):
        """Returns a list of (verts, faces, colors|None) numpy triples.

        verts are in (-radius, radius) world coords like the reference
        (``tsr/system.py:185-189``).

        ``mode``: "wire" (default) ships occupancy bits + t + uint8 colors
        and rebuilds faces natively on the host (~6x fewer D2H bytes, no
        device face machinery; positions within 2^-16 lattice units, colors
        uint8); "packed" ships the full f32 mesh (exact f32 colors).

        In wire mode faces are rebuilt host-side with no device face buffer,
        so ``max_faces`` has no meaning there — passing it raises; callers
        that need a face capacity (or exact f32 colors) want ``mode="packed"``.
        """
        if mode == "wire":
            if max_faces > 0:
                raise ValueError(
                    "max_faces is not applicable in wire mode (faces are "
                    "rebuilt host-side without a device face buffer); use "
                    'mode="packed" to bound the device face capacity'
                )
            return self._extract_mesh_wire(
                scene_codes, has_vertex_color, resolution, threshold, max_verts
            )
        # explicit caller capacities are honored as-given (the persisted
        # cache only fills unspecified values); overflow-retry is the net
        explicit_mv = max_verts > 0
        explicit_mf = max_faces > 0
        if max_verts <= 0:
            # ~2x a typical object's surface at this resolution; capacity
            # directly scales gather/scatter cost, and overflow auto-retries
            max_verts = 8 * resolution * resolution
        if max_faces <= 0:
            max_faces = 16 * resolution * resolution
        from sculptmate_tpu.geometry.marching_cubes import default_block_capacity

        # remember capacities that worked at this resolution so later calls
        # skip the overflow-retry extraction (a production server warms once)
        from sculptmate_tpu.runtime import capacity_cache

        if not hasattr(self, "_cap_cache"):
            self._cap_cache = {}
        cached = self._cap_cache.get(resolution)
        if cached is None:
            p = capacity_cache.load(f"tsr_packed_r{resolution}")
            if p is not None:
                cached = (p[0], p[1], p[2], bool(p[3]))

        NB = (resolution // 8) ** 3
        out = []
        for scene_code in scene_codes:
            if cached is not None:
                mv = max_verts if explicit_mv else max(max_verts, cached[0])
                mf = max_faces if explicit_mf else max(max_faces, cached[1])
                bc, dense = cached[2], cached[3]
            else:
                mv, mf = max_verts, max_faces
                bc = default_block_capacity(resolution, mv)
                dense = False
            while True:
                packed = np.asarray(
                    self._extract_packed_jit(
                        scene_code, resolution, float(threshold), mv, mf,
                        bool(has_vertex_color), bc, dense,
                    )
                )  # ONE device->host transfer for the whole mesh
                counts = np.rint(packed[0, -4:]).astype(np.int64)
                nv, nf, nblocks, ncells = (int(c) for c in counts)
                # capacity overflows are detected, never silently truncated:
                # block overflow would emit a corrupt mesh (missing verts)
                def up64k(n):
                    return 65536 * -(-n // 65536)

                if not dense and nblocks > 3 * NB // 5:
                    # block indirection loses to direct scatters on dense
                    # (noise-like) surfaces - switch compaction strategies
                    dense = True
                    continue
                if not dense and nblocks > bc:
                    bc = max(bc + 1, int(nblocks * 1.2))
                    continue
                if ncells > mf // 2:
                    mf = max(mf + 65536, up64k(int(2.2 * ncells)))
                    continue
                if nv <= mv and nf <= mf:
                    break
                mv = max(mv, up64k(int(1.2 * nv)))
                mf = max(mf, up64k(int(1.2 * nf)))
            # tighten toward this asset's observed counts (hysteresis in
            # tighten()) so one giant asset can't permanently inflate the
            # packed buffer (its capacity is paid in scatter updates AND
            # D2H bytes on every later call); the slices below still use
            # the mv/mf this packed buffer was built with. mf must also
            # cover the 2.2x ncells working margin the grow path keeps.
            t_mv = capacity_cache.tighten(mv, nv)
            t_mf = capacity_cache.tighten(mf, max(nf, int(2.2 * ncells)))
            t_bc = bc if dense else capacity_cache.tighten(
                bc, nblocks, slack=1.3, bucket=4096
            )
            self._cap_cache[resolution] = (t_mv, t_mf, t_bc, dense)
            cached = self._cap_cache[resolution]
            capacity_cache.store(
                f"tsr_packed_r{resolution}", (t_mv, t_mf, t_bc, int(dense))
            )

            verts_world = packed[:, :mv].T[:nv].copy()
            off = mv
            colors = None
            if has_vertex_color:
                colors = packed[:, off : off + mv].T[:nv].copy()
                off += mv
            faces = (
                np.rint(packed[:, off : off + mf]).T[:nf].astype(np.int64)
            )
            if nv == 0:
                colors = None
            out.append((verts_world, faces, colors))
        return out

    # -- async (pipelined) wire extraction -----------------------------
    # Serving loops overlap asset i's D2H fetch + native face rebuild with
    # asset i+1's device compute: ``extract_mesh_async`` enqueues the device
    # program AND its host copies without blocking; ``extract_mesh_wait``
    # blocks, applies the shared overflow-retry policy, and decodes.
    # ``extract_mesh`` (wire mode) and ``bench.py``'s steady-state loop are
    # both built on this pair, so the retry semantics cannot drift.

    def extract_mesh_async(
        self,
        scene_code,
        has_vertex_color: bool = False,
        resolution: int = 256,
        threshold: float = 25.0,
        max_verts: int = 0,
    ):
        """Enqueue ONE asset's wire extraction (device program + async D2H
        copies) and return an opaque handle for ``extract_mesh_wait``.
        Non-blocking: the host returns as soon as the program is dispatched."""
        explicit = max_verts > 0
        if max_verts <= 0:
            max_verts = 8 * resolution * resolution
        mv, bc = self._wire_caps(resolution, max_verts, explicit)
        fut = self._wire_dispatch_async(
            self._extract_wire_jit(
                scene_code, resolution, float(threshold), mv,
                bool(has_vertex_color), bc,
            )
        )
        return _WireHandle(
            scene_code, fut, mv, bc, resolution, float(threshold),
            bool(has_vertex_color),
        )

    def extract_mesh_wait(self, handle, store: bool = True):
        """Block on a handle from ``extract_mesh_async`` -> (verts world f32,
        faces i64, colors f32|None). Capacity overflow is detected from the
        exact wire counters and re-dispatched synchronously, never truncated.
        ``store=False`` skips the capacity-cache update (batch drivers store
        their aggregate maxima once instead)."""
        from sculptmate_tpu.geometry import mc_wire

        fut, mv_used = handle.fut, handle.mv
        mv, bc = handle.mv, handle.bc
        while True:
            wire = np.asarray(fut[0] if isinstance(fut, tuple) else fut)
            nv, nblocks = (
                int(c) for c in mc_wire.wire_counts(wire, mc_wire.N_WIRE_COUNTS)
            )
            grown = self._wire_grown(nv, nblocks, mv_used, mv, bc)
            if grown is None:
                break
            mv, bc = grown
            mv_used = mv
            fut = self._wire_dispatch_async(
                self._extract_wire_jit(
                    handle.scene_code, handle.resolution, handle.threshold,
                    mv, handle.want_colors, bc,
                )
            )
        if store:
            self._wire_caps_store(handle.resolution, mv, nv, bc, nblocks)
        return (
            self._wire_decode(fut, wire, nv, mv_used, handle.resolution),
            (nv, nblocks, mv, bc),
        )

    def _extract_mesh_wire(
        self, scene_codes, has_vertex_color, resolution, threshold, max_verts
    ):
        # pipeline: enqueue every asset's device program up front (jax
        # dispatch is async), so asset i's D2H fetch + native rebuild
        # overlaps asset i+1's device compute
        handles = [
            self.extract_mesh_async(
                code, has_vertex_color, resolution, threshold, max_verts
            )
            for code in scene_codes
        ]
        out = []
        nv_seen = nblocks_seen = 0
        mv = bc = 0
        for h in handles:
            mesh, (nv, nblocks, mv_h, bc_h) = self.extract_mesh_wait(
                h, store=False
            )
            nv_seen, nblocks_seen = max(nv_seen, nv), max(nblocks_seen, nblocks)
            mv, bc = max(mv, mv_h), max(bc, bc_h)
            out.append(mesh)
        if handles:
            self._wire_caps_store(resolution, mv, nv_seen, bc, nblocks_seen)
        return out
