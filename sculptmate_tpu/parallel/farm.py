"""Data-parallel asset farm + sharded extraction.

Implements the scale-out configs from BASELINE.md: a batch of images is
sharded over the ``dp`` mesh axis and runs the full
matting -> encode -> density-grid -> marching-cubes chain as one sharded XLA
program per stage; the 512^3 high-res extraction additionally shards the
density lattice's x-axis over ``sp`` (grid-axis sequence parallelism), and the
backbone's triplane tokens can be sharded over ``tp``.

All cross-device movement is GSPMD-inserted collectives over ICI.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sculptmate_tpu.geometry.marching_cubes import marching_cubes, MCResult
from sculptmate_tpu.ops.density_grid import (
    DensityGridSpec,
    mlp_weights_from_params,
    query_density_grid,
)


class AssetFarm:
    """Batched multi-chip generation driver for the TSR ("Lean") path."""

    def __init__(self, tsr, mesh: Mesh, dp_axis: str = "dp", tp_axis: Optional[str] = None):
        self.tsr = tsr
        self.mesh = mesh
        self.dp_axis = dp_axis
        self.tp_axis = tp_axis
        self.params = jax.device_put(tsr.params, NamedSharding(mesh, P()))

        module = tsr.module

        @functools.partial(
            jax.jit,
            in_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P(dp_axis))),
            out_shardings=NamedSharding(mesh, P(dp_axis)),
        )
        def _encode(params, images):
            codes = module.apply({"params": params}, images)
            return codes

        self._encode = _encode

        @functools.partial(
            jax.jit,
            static_argnums=(2, 3, 4, 5),
            in_shardings=(
                NamedSharding(mesh, P()),
                NamedSharding(mesh, P(dp_axis)),
            ),
        )
        def _extract(params, codes, resolution, threshold, max_verts, max_faces):
            weights = mlp_weights_from_params(params["decoder"]["layers"])
            spec = tsr.grid_spec(resolution)

            def one(code):
                dens = query_density_grid(code, weights, spec)
                return marching_cubes(dens - threshold, max_verts, max_faces)

            return jax.vmap(one)(codes)

        self._extract = _extract

    def generate_batch(
        self,
        images: jnp.ndarray,
        resolution: int = 256,
        threshold: float = 25.0,
        max_verts: int = 0,
        max_faces: int = 0,
    ):
        """images: (B, S, S, 3), B divisible by the dp axis size."""
        if max_verts <= 0:
            max_verts = 8 * resolution * resolution
        if max_faces <= 0:
            max_faces = 16 * resolution * resolution
        images = jax.device_put(images, NamedSharding(self.mesh, P(self.dp_axis)))
        codes = self._encode(self.params, images)
        return self._extract(
            self.params, codes, resolution, float(threshold), max_verts, max_faces
        )

    def generate_batch_rgba(
        self,
        rgba: jnp.ndarray,
        matting=None,
        ratio: float = 0.75,
        resolution: int = 256,
        threshold: float = 25.0,
        max_verts: int = 0,
        max_faces: int = 0,
    ):
        """Full streaming pipeline (BASELINE config 5): raw RGBA batch ->
        (optional) u2net matting -> fused device preprocess -> encode ->
        extract, all stages batch-sharded over the dp axis."""
        from sculptmate_tpu.frontend.preprocess import preprocess_batch_device
        from sculptmate_tpu.frontend.matting import U2NET_SIZE

        rgba = jax.device_put(rgba, NamedSharding(self.mesh, P(self.dp_axis)))
        if matting is not None:
            small = jax.image.resize(
                rgba[..., :3],
                (rgba.shape[0], U2NET_SIZE, U2NET_SIZE, 3),
                "linear",
            )
            mask = matting.predict_mask_batch(small)
            alpha = jax.image.resize(
                mask[..., None],
                (rgba.shape[0], rgba.shape[1], rgba.shape[2], 1),
                "linear",
            )
            rgba = jnp.concatenate([rgba[..., :3], alpha], axis=-1)
        size = self.tsr.config.cond_image_size
        cond = preprocess_batch_device(rgba, ratio=ratio, out_size=size)
        return self.generate_batch(
            cond, resolution, threshold, max_verts, max_faces
        )


def sharded_density_grid(
    mesh: Mesh,
    triplane: jnp.ndarray,
    weights,
    spec: DensityGridSpec,
    sp_axis: str = "sp",
) -> jnp.ndarray:
    """Grid-axis-sharded (SP) density evaluation for high resolutions.

    The output (R, R, R) lattice is sharded along x over ``sp_axis``; the
    triplane + MLP weights are replicated (they're tiny), so each device
    evaluates an x-slab locally — zero communication in steady state.
    """

    @functools.partial(
        jax.jit,
        out_shardings=NamedSharding(mesh, P(sp_axis)),
    )
    def run(tri):
        dens = query_density_grid(tri, weights, spec)
        return jax.lax.with_sharding_constraint(
            dens, NamedSharding(mesh, P(sp_axis))
        )

    return run(triplane)
