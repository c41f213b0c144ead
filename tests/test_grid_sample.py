"""Parity tests: our grid sampling vs torch F.grid_sample (the reference's
primitive at ``tsr/models/nerf_renderer.py:61-66`` / ``sf3d/system.py:170-198``)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from sculptmate_tpu.ops.grid_sample import (  # noqa: E402
    grid_sample_2d,
    resample_plane,
    sample_triplane,
    sample_triplane_regular_grid,
)


def _torch_grid_sample(plane, pts, align_corners):
    """plane (C,H,W), pts (N,2) xy in [-1,1] -> (C,N)."""
    inp = torch.from_numpy(plane)[None]
    grid = torch.from_numpy(pts)[None, None]  # (1,1,N,2)
    out = torch.nn.functional.grid_sample(
        inp, grid, mode="bilinear", align_corners=align_corners
    )
    return out[0, :, 0].numpy()


@pytest.mark.parametrize("align_corners", [False, True])
def test_grid_sample_2d_matches_torch(rng, align_corners):
    plane = rng.standard_normal((5, 16, 16), dtype=np.float32)
    pts = rng.uniform(-1.2, 1.2, size=(200, 2)).astype(np.float32)  # incl. OOB
    ours = np.asarray(
        grid_sample_2d(
            jnp.asarray(plane), jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]), align_corners
        )
    )
    ref = _torch_grid_sample(plane, pts, align_corners)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("align_corners", [False, True])
def test_separable_resample_matches_torch(rng, align_corners):
    """The matmul-based regular-grid path must equal scattered grid_sample."""
    plane = rng.standard_normal((4, 8, 8), dtype=np.float32)
    u = np.linspace(-1, 1, 13).astype(np.float32)
    v = np.linspace(-1, 1, 9).astype(np.float32)
    ours = np.asarray(
        resample_plane(jnp.asarray(plane), jnp.asarray(u), jnp.asarray(v), align_corners)
    )  # (C, Nv, Nu)
    uu, vv = np.meshgrid(u, v)  # (Nv, Nu)
    pts = np.stack([uu.ravel(), vv.ravel()], -1).astype(np.float32)
    ref = _torch_grid_sample(plane, pts, align_corners).reshape(4, len(v), len(u))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_triplane_concat_order_matches_reference(rng):
    """Feature order must be (xy, xz, yz) like the reference's indices2D stack."""
    tri = rng.standard_normal((3, 4, 8, 8), dtype=np.float32)
    pos = rng.uniform(-1, 1, size=(50, 3)).astype(np.float32)
    ours = np.asarray(
        sample_triplane(
            jnp.asarray(tri),
            jnp.asarray(pos[:, 0]),
            jnp.asarray(pos[:, 1]),
            jnp.asarray(pos[:, 2]),
            False,
        )
    ).T

    # reference formulation (nerf_renderer.py:56-68)
    x = torch.from_numpy(pos)
    idx2d = torch.stack((x[..., [0, 1]], x[..., [0, 2]], x[..., [1, 2]]), dim=-3)
    out = torch.nn.functional.grid_sample(
        torch.from_numpy(tri),
        idx2d.reshape(3, 1, -1, 2),
        align_corners=False,
        mode="bilinear",
    )
    ref = out[:, :, 0].permute(2, 0, 1).reshape(50, -1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_regular_grid_equals_scattered(rng):
    """sample_triplane_regular_grid indexing convention vs scattered path."""
    tri = rng.standard_normal((3, 4, 8, 8), dtype=np.float32)
    R = 6
    coords = (2 * np.arange(R) / (R - 1) - 1).astype(np.float32)
    Fxy, Fxz, Fyz = sample_triplane_regular_grid(
        jnp.asarray(tri), jnp.asarray(coords), jnp.asarray(coords), jnp.asarray(coords)
    )
    Fxy, Fxz, Fyz = map(np.asarray, (Fxy, Fxz, Fyz))

    for _ in range(20):
        i, j, k = np.random.randint(0, R, 3)
        ref = np.asarray(
            sample_triplane(
                jnp.asarray(tri),
                jnp.asarray(coords[i : i + 1]),
                jnp.asarray(coords[j : j + 1]),
                jnp.asarray(coords[k : k + 1]),
                False,
            )
        )[:, 0]
        got = np.concatenate([Fxy[:, j, i], Fxz[:, k, i], Fyz[:, k, j]])
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
