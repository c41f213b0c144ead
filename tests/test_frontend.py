"""Frontend: preprocessing parity (host path vs reference math, device path
vs host path), u2net shapes, matting pipeline."""

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image


class _FakeSession:
    """Stub matting session: alpha = luminance threshold (deterministic)."""

    def predict_mask(self, image):
        arr = np.asarray(image.convert("L"))
        mask = np.where(arr > 40, 255, 0).astype(np.uint8)
        return Image.fromarray(mask, mode="L")


def _test_image(size=300):
    img = np.zeros((size, size, 3), np.uint8)
    img[80:220, 60:260] = (200, 80, 50)  # off-center rectangle
    return Image.fromarray(img)


def test_preprocess_host_path():
    from sculptmate_tpu.frontend.preprocess import preprocess_image

    out = preprocess_image(_test_image(), ratio=0.75, session=_FakeSession())
    assert out is not None
    assert out.size == (1024, 1024)
    arr = np.asarray(out).astype(np.float32) / 255.0
    # corners are the 0.5-gray background
    assert abs(arr[3, 3].mean() - 0.5) < 0.02
    # center contains the foreground color
    c = arr[512, 512]
    assert c[0] > 0.5 and c[1] < 0.5


def test_preprocess_rejects_small_foreground():
    from sculptmate_tpu.frontend.preprocess import preprocess_image

    img = np.zeros((300, 300, 3), np.uint8)
    img[100:140, 100:160] = 255  # small blob: padded square < 250
    out = preprocess_image(Image.fromarray(img), ratio=0.75, session=_FakeSession())
    assert out is None


def test_preprocess_use_alpha_returns_rgba():
    from sculptmate_tpu.frontend.preprocess import preprocess_image

    out = preprocess_image(
        _test_image(), ratio=0.85, use_alpha=True, session=_FakeSession()
    )
    assert out.mode == "RGBA"


def test_device_preprocess_close_to_host(rng):
    """The fused dynamic-window resample approximates the host crop/pad/
    LANCZOS chain (sub-pixel centering differences allowed)."""
    from sculptmate_tpu.frontend.preprocess import (
        preprocess_device_one,
        preprocess_image,
    )

    img = _test_image(256)
    host = preprocess_image(img, ratio=0.75, session=_FakeSession())
    host_arr = np.asarray(host).astype(np.float32) / 255.0

    mask = np.asarray(_FakeSession().predict_mask(img)).astype(np.float32) / 255.0
    rgba = np.concatenate(
        [np.asarray(img).astype(np.float32) / 255.0, mask[..., None]], axis=-1
    )
    dev = np.asarray(preprocess_device_one(jnp.asarray(rgba), ratio=0.75, out_size=1024))

    # compare downsampled to suppress resample-kernel differences
    h = host_arr.reshape(64, 16, 64, 16, 3).mean((1, 3))
    d = dev.reshape(64, 16, 64, 16, 3).mean((1, 3))
    assert np.abs(h - d).mean() < 0.02


def test_u2net_shapes(rng):
    from sculptmate_tpu.frontend.u2net import U2Net
    import jax

    model = U2Net()
    x = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    d0, sides = model.apply(variables, x)
    assert d0.shape == (1, 64, 64, 1)
    assert len(sides) == 6
    for s in sides:
        assert s.shape == (1, 64, 64, 1)


def test_matting_remove(rng):
    """End-to-end remove() with a real (random-weight) u2net."""
    from sculptmate_tpu.frontend.matting import U2NetMatting, remove

    session = U2NetMatting()
    img = _test_image(160)
    out = remove(img, session=session)
    assert out.mode == "RGBA"
    assert out.size == img.size
    alpha = np.asarray(out)[..., 3]
    assert alpha.min() >= 0 and alpha.max() <= 255


class _GraySession:
    """Stub session with a PARTIAL-alpha mask: exercises the
    RGB-under-alpha difference between naive_cutout and putalpha."""

    def predict_mask(self, image):
        w, h = image.size
        mask = np.zeros((h, w), np.uint8)
        mask[: h // 2] = 255   # opaque top
        mask[h // 2 :] = 100   # partial bottom
        return Image.fromarray(mask, mode="L")


def test_remove_cutout_modes_golden():
    """remove() must match the reference's live surface option-for-option
    (bg.py:149-238): naive_cutout default, putalpha/only_mask options,
    bgcolor composite — golden-checked against the PIL recipes the
    reference uses verbatim."""
    from sculptmate_tpu.frontend.matting import remove

    img = Image.fromarray(
        np.full((8, 8, 3), (200, 80, 50), np.uint8), mode="RGB"
    )
    session = _GraySession()
    mask = session.predict_mask(img)

    # default == naive_cutout (bg.py:33-46,217): composite onto empty RGBA
    out = remove(img, session=session)
    expected = Image.composite(img, Image.new("RGBA", img.size, 0), mask)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(expected))
    arr = np.asarray(out)
    # opaque rows keep RGB; partial rows blend toward black, alpha == mask
    assert tuple(arr[0, 0]) == (200, 80, 50, 255)
    assert arr[7, 0, 3] == 100
    assert (arr[7, 0, :3] < (200, 80, 50)).all()  # attenuated, NOT original

    # putalpha (bg.py:49-61,214-215): original RGB survives under alpha
    out_pa = remove(img, session=session, putalpha=True)
    assert tuple(np.asarray(out_pa)[7, 0]) == (200, 80, 50, 100)

    # only_mask (bg.py:210-211): the L mask itself; bgcolor ignored (bg.py:225)
    out_m = remove(img, session=session, only_mask=True, bgcolor=(0, 255, 0, 255))
    assert out_m.mode == "L"
    np.testing.assert_array_equal(np.asarray(out_m), np.asarray(mask))

    # bgcolor (bg.py:110-125): RGBA color behind the naive cutout
    out_bg = remove(img, session=session, bgcolor=(0, 255, 0, 255))
    cut = Image.composite(img, Image.new("RGBA", img.size, 0), mask)
    exp_bg = Image.new("RGBA", img.size, (0, 255, 0, 255))
    exp_bg.paste(cut, mask=cut)
    np.testing.assert_array_equal(np.asarray(out_bg), np.asarray(exp_bg))
