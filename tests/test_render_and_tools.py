"""Novel-view rendering, ray utils, runtime metrics, CLI tools."""

import json
import numpy as np
import jax.numpy as jnp
import pytest


def test_rays_intersect_bbox():
    from sculptmate_tpu.ops.rays import rays_intersect_bbox

    o = jnp.asarray([[2.0, 0.0, 0.0], [2.0, 5.0, 0.0]])
    d = jnp.asarray([[-1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]])
    t_near, t_far, valid = rays_intersect_bbox(o, d, 0.87)
    assert bool(valid[0]) and not bool(valid[1])
    assert abs(float(t_near[0]) - (2 - 0.87 * 0.999)) < 1e-3


def test_spherical_cameras_shapes():
    from sculptmate_tpu.ops.rays import get_spherical_cameras

    o, d = get_spherical_cameras(4, 10.0, 1.9, 40.0, 16, 16)
    assert o.shape == (4, 16, 16, 3) and d.shape == (4, 16, 16, 3)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-5)
    # all rays point roughly toward the origin
    cosang = -(np.asarray(o) * np.asarray(d)).sum(-1) / np.linalg.norm(
        np.asarray(o), axis=-1
    )
    assert (cosang > 0.8).all()


def test_render_views_tiny():
    from sculptmate_tpu.systems.tsr import TSR, TSRConfig

    cfg = TSRConfig(
        cond_image_size=32,
        plane_size=8,
        num_channels=64,
        num_attention_heads=4,
        attention_head_dim=16,
        num_layers=1,
    )
    tsr = TSR(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    codes = tsr.scene_codes(jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32))
    views = tsr.render_views(codes, n_views=2, height=24, width=24, num_samples=16)
    assert len(views) == 1 and views[0].shape == (2, 24, 24, 3)
    assert np.isfinite(views[0]).all()
    # background compositing keeps values in a sane display range
    assert views[0].min() >= 0.0 and views[0].max() <= 1.5


def test_stage_metrics():
    from sculptmate_tpu.runtime.logging import StageMetrics

    m = StageMetrics()
    with m.stage("density_grid"):
        pass
    m.count("density_queries", 1000)
    rep = m.report()
    assert "density_grid_s" in rep and "total_s" in rep


def test_cli_decimate(tmp_path):
    import os
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from sculptmate_tpu.cli import main
    from sculptmate_tpu.io import write_obj, read_obj

    # make a subdivided octahedron-ish mesh via marching cubes
    from sculptmate_tpu.geometry.marching_cubes import marching_cubes_host

    R = 24
    g = np.linspace(-1, 1, R)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    level = 0.6 - np.sqrt(X**2 + Y**2 + Z**2)
    v, f = marching_cubes_host(jnp.asarray(level, jnp.float32))
    src = tmp_path / "in.obj"
    dst = tmp_path / "out.obj"
    write_obj(str(src), v, f)

    code = main(["decimate", str(src), str(dst), "--ratio", "0.3"])
    assert code == 0
    v2, f2 = read_obj(str(dst))
    assert 0 < len(f2) < 0.5 * len(f)
