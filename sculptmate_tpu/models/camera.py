"""Camera conditioning: linear embedder + default camera construction.

Mirrors ``sf3d/models/camera.py`` (flattened c2w + normalized intrinsics ->
Linear -> 768) and ``sf3d/utils.py:24-48`` (default condition camera looking
down -x from ``distance``, intrinsics from vertical fov).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class LinearCameraEmbedder(nn.Module):
    in_channels: int = 25
    out_channels: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, *conds):
        """conds: tensors shaped (B, ...) concatenated flat (reference order:
        c2w_cond (16) then intrinsic_normed_cond (9))."""
        flat = [c.reshape(c.shape[0], -1) for c in conds]
        x = jnp.concatenate(flat, axis=-1)
        assert x.shape[-1] == self.in_channels, x.shape
        return nn.Dense(self.out_channels, dtype=self.dtype, name="linear")(x)


def default_cond_c2w(distance: float) -> np.ndarray:
    """Reference's fixed condition camera (``sf3d/utils.py:39-48``)."""
    return np.array(
        [
            [0, 0, 1, distance],
            [1, 0, 0, 0],
            [0, 1, 0, 0],
            [0, 0, 0, 1],
        ],
        dtype=np.float32,
    )


def intrinsic_from_fov_deg(
    fov_deg: float, height: int, width: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (intrinsic, intrinsic_normed) (``sf3d/utils.py:24-36``,
    ``tsr/utils.py:30-41``)."""
    fov = np.deg2rad(fov_deg)
    focal = 0.5 * height / np.tan(0.5 * fov)
    K = np.eye(3, dtype=np.float32)
    K[0, 0] = focal
    K[1, 1] = focal
    K[0, 2] = width / 2.0
    K[1, 2] = height / 2.0
    Kn = K.copy()
    Kn[0, 2] /= width
    Kn[1, 2] /= height
    Kn[0, 0] /= width
    Kn[1, 1] /= height
    return K, Kn
