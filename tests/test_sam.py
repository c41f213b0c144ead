"""SAM: prompt parsing, tiny-encoder shapes, end-to-end session predict."""

import json

import numpy as np
import pytest
from PIL import Image


def test_get_input_points():
    from sculptmate_tpu.frontend.sam import get_input_points

    prompt = [
        {"type": "point", "data": [10, 20], "label": 1},
        {"type": "rectangle", "data": [0, 0, 50, 60]},
    ]
    pts, lbl = get_input_points(json.dumps(prompt))
    assert pts.shape == (3, 2)
    np.testing.assert_array_equal(lbl, [1, 2, 3])
    with pytest.raises(ValueError):
        get_input_points("[]")


def test_sam_modules_tiny(rng):
    import jax
    import jax.numpy as jnp
    from sculptmate_tpu.frontend.sam import Sam

    # tiny encoder for test speed; decoder/prompt encoder are full-size
    sam = Sam(encoder_embed_dim=32, encoder_depth=2, encoder_heads=2)
    img = jnp.asarray(rng.random((1, 128, 128, 3)), jnp.float32)
    pts = jnp.asarray([[[30.0, 40.0], [0.0, 0.0]]])
    lbl = jnp.asarray([[1, -1]], jnp.int32)
    variables = sam.init(jax.random.PRNGKey(0), img, pts, lbl)
    masks, iou = sam.apply(variables, img, pts, lbl)
    G = 128 // 16
    assert masks.shape == (1, 4, 4 * G, 4 * G)
    assert iou.shape == (1, 4)
    assert np.isfinite(np.asarray(masks)).all()


def test_window_partition_roundtrip(rng):
    import jax.numpy as jnp
    from sculptmate_tpu.frontend.sam import _window_partition, _window_unpartition

    x = jnp.asarray(rng.random((2, 8, 8, 5)), jnp.float32)
    w = _window_partition(x, 4)
    assert w.shape == (8, 4, 4, 5)
    back = _window_unpartition(w, 4, 8, 8)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))
