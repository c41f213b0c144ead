"""Camera/ray utilities + volume rendering support.

JAX counterparts of ``tsr/utils.py:255-397`` (get_ray_directions, get_rays,
get_spherical_cameras) and ``tsr/utils.py:115-149`` (rays_intersect_bbox),
used by the TSR spherical novel-view renderer
(``tsr/models/nerf_renderer.py:93-172``).
"""

from __future__ import annotations

import math
from typing import Tuple, Union

import jax.numpy as jnp


def _normalize(v, axis=-1, eps=1e-12):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True), eps)


def get_ray_directions(
    H: int,
    W: int,
    focal: Union[float, Tuple[float, float]],
    principal: Tuple[float, float] = None,
    use_pixel_centers: bool = True,
    normalize: bool = True,
) -> jnp.ndarray:
    """(H, W, 3) camera-space ray directions (x right, y up, looking -z)."""
    center = 0.5 if use_pixel_centers else 0.0
    if isinstance(focal, (int, float)):
        fx = fy = float(focal)
        cx, cy = W / 2, H / 2
    else:
        fx, fy = focal
        cx, cy = principal

    i, j = jnp.meshgrid(
        jnp.arange(W, dtype=jnp.float32) + center,
        jnp.arange(H, dtype=jnp.float32) + center,
        indexing="xy",
    )
    directions = jnp.stack([(i - cx) / fx, -(j - cy) / fy, -jnp.ones_like(i)], -1)
    if normalize:
        directions = _normalize(directions)
    return directions


def get_rays(directions: jnp.ndarray, c2w: jnp.ndarray, normalize: bool = False):
    """directions (..., 3) camera-space, c2w (4, 4) -> (rays_o, rays_d)."""
    rays_d = jnp.einsum("...j,ij->...i", directions, c2w[:3, :3])
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    if normalize:
        rays_d = _normalize(rays_d)
    return rays_o, rays_d


def get_spherical_cameras(
    n_views: int,
    elevation_deg: float,
    camera_distance: float,
    fovy_deg: float,
    height: int,
    width: int,
):
    """Ring of cameras around +z-up origin (``tsr/utils.py:339-397``).
    Returns (rays_o, rays_d) of shape (n_views, H, W, 3)."""
    azimuth = jnp.linspace(0, 2 * math.pi, n_views + 1)[:n_views]
    elevation = jnp.full_like(azimuth, elevation_deg * math.pi / 180)
    dist = jnp.full_like(azimuth, camera_distance)

    positions = jnp.stack(
        [
            dist * jnp.cos(elevation) * jnp.cos(azimuth),
            dist * jnp.cos(elevation) * jnp.sin(azimuth),
            dist * jnp.sin(elevation),
        ],
        -1,
    )
    up = jnp.asarray([0.0, 0.0, 1.0])
    lookat = _normalize(-positions)
    right = _normalize(jnp.cross(lookat, jnp.broadcast_to(up, lookat.shape)))
    cam_up = _normalize(jnp.cross(right, lookat))
    c2w = jnp.concatenate(
        [
            jnp.stack([right, cam_up, -lookat], axis=-1),
            positions[..., None],
        ],
        axis=-1,
    )  # (n, 3, 4)

    fovy = fovy_deg * math.pi / 180
    focal = 0.5 * height / math.tan(0.5 * fovy)
    directions = get_ray_directions(height, width, focal=1.0)
    directions = directions.at[..., :2].multiply(1.0 / focal)

    rays_o = []
    rays_d = []
    for v in range(n_views):
        c2w4 = jnp.concatenate([c2w[v], jnp.asarray([[0.0, 0.0, 0.0, 1.0]])], axis=0)
        o, d = get_rays(directions, c2w4, normalize=True)
        rays_o.append(o)
        rays_d.append(d)
    return jnp.stack(rays_o), jnp.stack(rays_d)


def rays_intersect_bbox(
    rays_o: jnp.ndarray, rays_d: jnp.ndarray, radius: float,
    near: float = 0.0, valid_thresh: float = 0.01,
):
    """Slab test against the [-radius, radius]^3 box
    (``tsr/utils.py:115-149``). Returns (t_near, t_far, valid)."""
    rd = jnp.where(jnp.abs(rays_d) < 1e-6, 1e-6, rays_d)
    r = (1.0 - 1e-3) * radius
    t0 = (r - rays_o) / rd
    t1 = (-r - rays_o) / rd
    t_near = jnp.maximum(jnp.minimum(t0, t1).max(-1), near)
    t_far = jnp.maximum(t0, t1).min(-1)
    valid = (t_far - t_near) > valid_thresh
    t_near = jnp.where(valid, t_near, 0.0)
    t_far = jnp.where(valid, t_far, 0.0)
    return t_near, t_far, valid
