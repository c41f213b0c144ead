"""Matting session registry: shapes and recipes per variant."""

import numpy as np
import pytest
from PIL import Image


def _img(size=96):
    arr = np.zeros((size, size, 3), np.uint8)
    arr[20:70, 30:80] = (220, 120, 40)
    return Image.fromarray(arr)


def test_u2netp_small_variant():
    from sculptmate_tpu.frontend.sessions import U2netpSession

    s = U2netpSession.__new__(U2netpSession)
    m = s.build_module()
    assert m.variant == "small"


@pytest.mark.parametrize("name", ["u2netp"])
def test_session_predict(name):
    # u2netp is the cheapest real net; the rest share the identical plumbing
    from sculptmate_tpu.frontend.sessions import new_session

    session = new_session(name)
    masks = session.predict(_img())
    assert len(masks) == 1
    assert masks[0].size == (96, 96)
    assert masks[0].mode == "L"


def test_sam_session_available():
    from sculptmate_tpu.frontend.sam import SamSession
    from sculptmate_tpu.frontend import sessions

    # constructing the full ViT-B SAM takes ~20s of init; just check routing
    assert "sam" not in sessions._REGISTRY  # routed specially
    import inspect

    src = inspect.getsource(sessions.new_session.__wrapped__)
    assert "SamSession" in src


def test_unknown_session_raises():
    from sculptmate_tpu.frontend.sessions import new_session

    with pytest.raises(ValueError):
        new_session("nope")


def test_cloth_masks_selected():
    from sculptmate_tpu.frontend.sessions import ClothSegSession, _CLOTH_CLASSES

    # exercise only the postprocessing (palette mask selection) on a stub
    s = ClothSegSession.__new__(ClothSegSession)
    s.input_size = (32, 32)

    class _FakePredict:
        def __call__(self, variables, img):
            out = np.zeros((1, 32, 32), np.int32)
            out[0, :16] = 1  # upper
            out[0, 16:24] = 2  # lower
            out[0, 24:] = 3  # full
            return out

    s._predict = _FakePredict()
    s.variables = None
    masks = s.predict(_img(32))
    assert len(masks) == 3
    masks_u = s.predict(_img(32), cloth_category="upper")
    assert len(masks_u) == 1
    m = np.asarray(masks_u[0])
    assert m[:14].max() == 255 and m[26:].max() == 0


def test_isnet_shapes(rng):
    import jax
    import jax.numpy as jnp
    from sculptmate_tpu.frontend.isnet import ISNet

    model = ISNet()
    x = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    d0, sides = model.apply(variables, x)
    assert d0.shape == (1, 64, 64, 1)
    assert len(sides) == 6
