"""The fused separable density-grid query must agree with the reference
formulation (scattered grid_sample + plain MLP) to float tolerance."""

import numpy as np
import jax
import jax.numpy as jnp

from sculptmate_tpu.ops.density_grid import (
    DensityGridSpec,
    lattice_coords,
    mlp_weights_from_params,
    query_density_grid,
    query_triplane_points,
)
from sculptmate_tpu.ops.grid_sample import sample_triplane
from sculptmate_tpu.models.heads import NeRFMLP


def _setup(rng, C=8, P=6, n_hidden=3):
    tri = jnp.asarray(rng.standard_normal((3, C, P, P)), jnp.float32)
    mlp = NeRFMLP(in_channels=3 * C, n_neurons=16, n_hidden_layers=n_hidden)
    params = mlp.init(jax.random.PRNGKey(0), jnp.zeros((1, 3 * C)))["params"]
    weights = mlp_weights_from_params(params["layers"])
    return tri, mlp, params, weights


def _reference_density(tri, mlp, params, positions_norm, spec):
    """Scattered-gather + full-width MLP, the reference's math."""
    feats = sample_triplane(
        tri,
        positions_norm[:, 0],
        positions_norm[:, 1],
        positions_norm[:, 2],
        spec.align_corners,
    ).T
    out = mlp.apply({"params": params}, feats)
    return jnp.exp(out["density"][..., 0] + spec.density_bias)


def test_grid_query_matches_reference(rng):
    tri, mlp, params, weights = _setup(rng)
    R = 10
    spec = DensityGridSpec(resolution=R, slab=5, activation="silu")
    dens = np.asarray(query_density_grid(tri, weights, spec))
    assert dens.shape == (R, R, R)

    coords = np.asarray(lattice_coords(R))
    ii, jj, kk = np.meshgrid(range(R), range(R), range(R), indexing="ij")
    pos = np.stack(
        [coords[ii.ravel()], coords[jj.ravel()], coords[kk.ravel()]], -1
    ).astype(np.float32)
    ref = np.asarray(
        _reference_density(tri, mlp, params, jnp.asarray(pos), spec)
    ).reshape(R, R, R)
    np.testing.assert_allclose(dens, ref, rtol=1e-4, atol=1e-5)


def test_point_query_density_and_color(rng):
    tri, mlp, params, weights = _setup(rng)
    spec = DensityGridSpec(resolution=4, radius=0.87)
    pos_world = jnp.asarray(
        rng.uniform(-0.8, 0.8, size=(37, 3)).astype(np.float32)
    )
    px, py, pz = pos_world[:, 0], pos_world[:, 1], pos_world[:, 2]
    out = query_triplane_points(tri, weights, px, py, pz, spec)
    feats = sample_triplane(
        tri, px / spec.radius, py / spec.radius, pz / spec.radius, spec.align_corners
    ).T
    ref = mlp.apply({"params": params}, feats)
    np.testing.assert_allclose(
        np.asarray(out["color"].T),
        np.asarray(jax.nn.sigmoid(ref["features"])),
        rtol=1e-5,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out["density_act"]),
        np.asarray(jnp.exp(ref["density"][..., 0] - 1.0)),
        rtol=1e-5,
        atol=1e-6,
    )


def test_bf16_grid_query_close(rng):
    tri, mlp, params, weights = _setup(rng)
    R = 8
    f32 = np.asarray(
        query_density_grid(tri, weights, DensityGridSpec(resolution=R, slab=4))
    )
    bf16 = np.asarray(
        query_density_grid(
            tri,
            weights,
            DensityGridSpec(resolution=R, slab=4, compute_dtype=jnp.bfloat16),
        )
    )
    np.testing.assert_allclose(bf16, f32, rtol=0.05, atol=0.02)
