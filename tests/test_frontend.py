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


def test_remove_exif_orientation():
    """remove() must re-orient EXIF-rotated JPEGs before matting
    (fix_image_orientation, bg.py:128-138, applied at bg.py:198): a
    phone-rotated JPEG yields the SAME cutout as its upright twin."""
    import io

    from PIL import ImageOps

    from sculptmate_tpu.frontend.matting import remove

    # upright scene: bright block in the TOP-LEFT quadrant
    up = np.zeros((64, 48, 3), np.uint8)
    up[:32, :24] = (220, 120, 60)
    upright = Image.fromarray(up)

    # the same scene as a camera would store it with orientation tag 6
    # (=Rotate 90 CW to display): raw pixels rotated 90 CCW + EXIF tag
    rotated = upright.transpose(Image.Transpose.ROTATE_90)
    exif = Image.Exif()
    exif[0x0112] = 6  # Orientation
    buf = io.BytesIO()
    rotated.save(buf, format="JPEG", exif=exif, quality=95)
    buf.seek(0)
    tagged = Image.open(buf)
    # PIL does NOT auto-apply orientation at decode; the raw load is sideways
    assert tagged.size == (64, 48)[::-1][::-1] or tagged.size == (48, 64)
    assert tagged.size != upright.size

    session = _FakeSession()
    out_tagged = remove(tagged, session=session)
    out_upright = remove(upright, session=session)
    assert out_tagged.size == out_upright.size
    # JPEG is lossy: compare masks (thresholded luminance is quantization-
    # robust for this flat-color fixture) and the exact transpose recipe
    np.testing.assert_array_equal(
        np.asarray(out_tagged)[..., 3], np.asarray(out_upright)[..., 3]
    )
    exp = remove(ImageOps.exif_transpose(Image.open(buf)), session=session)
    np.testing.assert_array_equal(np.asarray(out_tagged), np.asarray(exp))


class _ThreeMaskSession:
    """Stub multi-mask session (cloth_seg-shaped: 3 palette masks)."""

    def predict(self, image, **kwargs):
        w, h = image.size
        masks = []
        for third in range(3):
            m = np.zeros((h, w), np.uint8)
            m[third * h // 3 : (third + 1) * h // 3] = 255
            masks.append(Image.fromarray(m, mode="L"))
        return masks


def test_remove_multimask_concat_golden():
    """Multi-mask sessions produce one cutout PER mask, vertically
    concatenated (get_concat_v_multi, bg.py:64-94,221-223)."""
    from sculptmate_tpu.frontend.matting import remove

    img = Image.fromarray(np.full((9, 6, 3), (10, 200, 90), np.uint8))
    session = _ThreeMaskSession()
    masks = session.predict(img)

    out = remove(img, session=session)
    assert out.size == (6, 27)  # width kept, 3 bands stacked vertically
    empty = Image.new("RGBA", img.size, 0)
    for i, mask in enumerate(masks):
        band = np.asarray(out)[i * 9 : (i + 1) * 9]
        exp = Image.composite(img, empty, mask)  # naive_cutout per mask
        np.testing.assert_array_equal(band, np.asarray(exp))

    # only_mask with multiple masks: the masks themselves are concatenated
    # onto RGBA canvases (bg.py:84-94 pastes into an RGBA dst)
    out_m = remove(img, session=session, only_mask=True)
    assert out_m.size == (6, 27) and out_m.mode == "RGBA"

    # bgcolor still applies after the concat (bg.py:225-226)
    out_bg = remove(img, session=session, bgcolor=(255, 0, 0, 255))
    arr = np.asarray(out_bg)
    assert arr.shape == (27, 6, 4)
    assert (arr[..., 3] == 255).all()  # fully opaque after composite


def test_remove_cloth_seg_category_kwarg():
    """cloth_seg through remove(): session kwargs (cc=) reach predict and
    select a single palette mask (u2net_cloth_seg.py recipe)."""
    from sculptmate_tpu.frontend.matting import remove
    from sculptmate_tpu.frontend.sessions import ClothSegSession

    s = ClothSegSession.__new__(ClothSegSession)
    s.input_size = (32, 32)

    def _fake_predict(variables, img):
        out = np.zeros((1, 32, 32), np.int32)
        out[0, :16] = 1  # upper
        out[0, 16:24] = 2  # lower
        out[0, 24:] = 3  # full
        return out

    s._predict = _fake_predict
    s.variables = None

    img = Image.fromarray(np.full((32, 32, 3), 128, np.uint8))
    out_all = remove(img, session=s)
    assert out_all.size == (32, 96)  # three stacked cutouts
    out_upper = remove(img, session=s, cc="upper")
    assert out_upper.size == (32, 32)  # one selected mask, no concat
    alpha = np.asarray(out_upper)[..., 3]
    assert alpha[:14].max() == 255 and alpha[26:].max() == 0
