"""Multi-chip shardings on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sculptmate_tpu.parallel.mesh import factor2, make_mesh
from sculptmate_tpu.parallel.farm import AssetFarm, sharded_density_grid


def test_factor2():
    assert factor2(8) == (2, 4)
    assert factor2(4) == (2, 2)
    assert factor2(7) == (1, 7)
    assert factor2(1) == (1, 1)


@pytest.fixture(scope="module")
def tiny_tsr():
    from sculptmate_tpu.systems.tsr import TSR, TSRConfig

    cfg = TSRConfig(
        cond_image_size=32,
        plane_size=8,
        num_channels=64,
        num_attention_heads=4,
        attention_head_dim=16,
        num_layers=1,
    )
    return TSR(cfg, dtype=jnp.float32)


def test_asset_farm_dp8(tiny_tsr, rng):
    assert len(jax.devices()) == 8
    mesh = make_mesh((8,), ("dp",))
    farm = AssetFarm(tiny_tsr, mesh)
    images = jnp.asarray(rng.random((8, 32, 32, 3)), jnp.float32)
    res = farm.generate_batch(images, resolution=16, threshold=0.36)
    assert res.num_verts.shape == (8,)
    # every asset produced a bounded mesh
    assert (res.num_verts >= 0).all()
    assert int(res.num_verts.max()) <= 8 * 16 * 16


def test_asset_farm_full_pipeline_rgba(tiny_tsr, rng):
    mesh = make_mesh((8,), ("dp",))
    farm = AssetFarm(tiny_tsr, mesh)
    rgba = np.zeros((8, 64, 64, 4), np.float32)
    rgba[:, 16:48, 20:44, :3] = rng.random((8, 32, 24, 3))
    rgba[:, 16:48, 20:44, 3] = 1.0
    res = farm.generate_batch_rgba(
        jnp.asarray(rgba), matting=None, resolution=16, threshold=0.36
    )
    assert res.num_verts.shape == (8,)


def test_sharded_density_grid_sp(tiny_tsr, rng):
    from sculptmate_tpu.ops.density_grid import (
        mlp_weights_from_params,
        query_density_grid,
    )

    mesh = make_mesh((8,), ("sp",))
    tri = jnp.asarray(rng.standard_normal((3, 40, 16, 16)), jnp.float32)
    weights = mlp_weights_from_params(tiny_tsr.params["decoder"]["layers"])
    spec = tiny_tsr.grid_spec(16, slab=4)
    sharded = sharded_density_grid(mesh, tri, weights, spec, sp_axis="sp")
    dense = query_density_grid(tri, weights, spec)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(dense), rtol=1e-5, atol=1e-6
    )


def test_graft_entry_single():
    import __graft_entry__ as ge

    fn, (params, images) = ge.entry()
    out_shape = jax.eval_shape(fn, params, images)
    assert out_shape.shape == (1, 3, 40, 64, 64)
