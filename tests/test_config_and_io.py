"""Config system, native checkpoints, OBJ round trip, GLB with textures."""

import io
import json
import struct

import numpy as np
import pytest

from sculptmate_tpu.config import load_yaml_config, parse_structured


def test_yaml_interpolation(tmp_path):
    y = tmp_path / "c.yaml"
    y.write_text(
        """
tokenizer:
  num_channels: 1024
backbone:
  in_channels: ${tokenizer.num_channels}
  note: "dims=${tokenizer.num_channels}"
"""
    )
    cfg = load_yaml_config(str(y))
    assert cfg.backbone.in_channels == 1024
    assert cfg.backbone.note == "dims=1024"


def test_parse_structured_drops_unknown():
    import dataclasses

    @dataclasses.dataclass
    class C:
        a: int = 1
        b: float = 2.0

    c = parse_structured(C, {"a": 5, "zzz": "dropped"})
    assert c.a == 5 and c.b == 2.0
    with pytest.raises(ValueError):
        parse_structured(C, {"zzz": 1}, strict=True)


def test_tsr_config_from_reference_yaml(tmp_path):
    from sculptmate_tpu.systems.tsr import TSRConfig

    # the reference's own config layout (TripoSR/checkpoints/config.yaml)
    y = tmp_path / "config.yaml"
    y.write_text(
        """
cond_image_size: 512
tokenizer:
  plane_size: 32
  num_channels: 1024
backbone:
  in_channels: ${tokenizer.num_channels}
  num_attention_heads: 16
  attention_head_dim: 64
  num_layers: 16
  cross_attention_dim: 768
post_processor:
  in_channels: 1024
  out_channels: 40
decoder:
  in_channels: 120
  n_neurons: 64
  n_hidden_layers: 9
  activation: silu
renderer:
  radius: 0.87
  density_activation: exp
  density_bias: -1.0
"""
    )
    cfg = TSRConfig.from_yaml(str(y))
    assert cfg.plane_size == 32 and cfg.num_layers == 16 and cfg.radius == 0.87


def test_native_checkpoint_roundtrip(tmp_path, rng):
    import jax.numpy as jnp

    from sculptmate_tpu.runtime.checkpoint import load_native, save_native

    tree = {
        "a": {"kernel": jnp.asarray(rng.standard_normal((4, 5)), jnp.float32)},
        "b": jnp.arange(7),
    }
    path = tmp_path / "ckpt"
    save_native(str(path), tree)
    back = load_native(str(path))
    np.testing.assert_allclose(np.asarray(back["a"]["kernel"]), np.asarray(tree["a"]["kernel"]))
    np.testing.assert_array_equal(np.asarray(back["b"]), np.asarray(tree["b"]))


def test_obj_roundtrip(tmp_path, rng):
    from sculptmate_tpu.io import read_obj, write_obj

    v = rng.random((10, 3)).astype(np.float32)
    f = np.array([[0, 1, 2], [2, 3, 4], [4, 5, 6]])
    p = tmp_path / "m.obj"
    write_obj(str(p), v, f)
    v2, f2 = read_obj(str(p))
    np.testing.assert_allclose(v2, v, atol=1e-5)
    np.testing.assert_array_equal(f2, f)


def test_glb_with_textures(tmp_path, rng):
    from PIL import Image

    from sculptmate_tpu.io import write_glb

    v = rng.random((4, 3)).astype(np.float32)
    f = np.array([[0, 1, 2], [1, 2, 3]])
    uv = rng.random((4, 2)).astype(np.float32)

    buf = io.BytesIO()
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(buf, format="PNG")
    png = buf.getvalue()

    p = tmp_path / "m.glb"
    write_glb(
        str(p), v, f, uvs=uv,
        textures={"baseColor": png, "normal": png, "metallicRoughness": png},
    )
    blob = p.read_bytes()
    magic, ver, total = struct.unpack("<III", blob[:12])
    assert magic == 0x46546C67 and total == len(blob)
    jlen, _ = struct.unpack("<II", blob[12:20])
    doc = json.loads(blob[20 : 20 + jlen])
    assert len(doc["images"]) == 3
    assert "baseColorTexture" in doc["materials"][0]["pbrMetallicRoughness"]
    assert "normalTexture" in doc["materials"][0]
