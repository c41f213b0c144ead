"""Built-in ONNX reader (runtime/onnx_lite.py) against real-format files.

The writer below encodes ModelProto/GraphProto/TensorProto per the ONNX
protobuf spec (field numbers from onnx.proto3) — independently of the reader,
which scans the wire format. Together they rehearse the u2net/isnet weight
FILE path end-to-end without the onnx wheel (absent from this env and from
most Blender installs; reference loads the same blobs via onnxruntime,
``rembg/sessions/base.py:34-42``).
"""

import numpy as np
import pytest

from sculptmate_tpu.runtime.onnx_lite import read_initializers

# --- minimal spec-conformant protobuf writer (test fixture) ---------------


def _varint(v: int) -> bytes:
    if v < 0:
        v += 1 << 64  # two's complement, 10 bytes (protobuf int64)
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _ld(field: int, payload: bytes) -> bytes:  # length-delimited
    return _tag(field, 2) + _varint(len(payload)) + payload


_DT = {
    np.dtype(np.float32): 1, np.dtype(np.uint8): 2, np.dtype(np.int8): 3,
    np.dtype(np.int32): 6, np.dtype(np.int64): 7, np.dtype(np.float16): 10,
    np.dtype(np.float64): 11,
}


def _tensor_proto(name: str, arr: np.ndarray, encoding: str = "raw") -> bytes:
    msg = bytearray()
    for d in arr.shape:  # dims = 1 (unpacked repeated varints)
        msg += _tag(1, 0) + _varint(d)
    msg += _tag(2, 0) + _varint(_DT[arr.dtype])  # data_type = 2
    msg += _ld(8, name.encode())  # name = 8
    if encoding == "raw":
        msg += _ld(9, arr.astype(arr.dtype.newbyteorder("<")).tobytes())
    elif encoding == "float_data":  # packed floats, field 4
        msg += _ld(4, arr.astype("<f4").tobytes())
    elif encoding == "int64_data":  # packed varints, field 7
        payload = b"".join(_varint(int(v)) for v in arr.ravel())
        msg += _ld(7, payload)
    elif encoding == "int32_data":  # packed varints, field 5
        payload = b"".join(_varint(int(v)) for v in arr.ravel())
        msg += _ld(5, payload)
    else:
        raise AssertionError(encoding)
    return bytes(msg)


def write_onnx(path, tensors, encoding="raw"):
    graph = bytearray()
    graph += _ld(2, b"g")  # GraphProto.name = 2
    for name, arr in tensors.items():
        enc = encoding
        if encoding == "mixed":
            if arr.dtype == np.float32:
                enc = "float_data"
            elif arr.dtype == np.int64:
                enc = "int64_data"
            else:
                enc = "raw"
        graph += _ld(5, _tensor_proto(name, arr, enc))  # initializer = 5
    model = bytearray()
    model += _tag(1, 0) + _varint(9)  # ir_version = 1
    model += _ld(2, b"sculptmate-test")  # producer_name = 2
    # opset_import = 8 (OperatorSetIdProto: domain=1, version=2)
    model += _ld(8, _ld(1, b"") + _tag(2, 0) + _varint(17))
    model += _ld(7, bytes(graph))  # graph = 7
    with open(path, "wb") as fh:
        fh.write(bytes(model))


# --- tests -----------------------------------------------------------------


def test_reader_roundtrip_all_encodings(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        "w.f32": rng.standard_normal((3, 4, 2)).astype(np.float32),
        "w.f16": rng.standard_normal((5,)).astype(np.float16),
        "w.f64": rng.standard_normal((2, 2)).astype(np.float64),
        "w.i64": rng.integers(-(2**40), 2**40, (7,)).astype(np.int64),
        "w.i32": rng.integers(-(2**20), 2**20, (4, 1)).astype(np.int32),
        "w.u8": rng.integers(0, 255, (6,)).astype(np.uint8),
        "w.scalar": np.asarray(3.25, np.float32).reshape(()),
    }
    p = tmp_path / "t.onnx"
    write_onnx(p, tensors, encoding="raw")
    got = read_initializers(str(p))
    assert set(got) == set(tensors)
    for k in tensors:
        assert got[k].dtype == tensors[k].dtype, k
        np.testing.assert_array_equal(got[k], tensors[k], err_msg=k)

    # the non-raw_data encodings real exporters also emit
    write_onnx(p, {"a": tensors["w.f32"], "b": tensors["w.i64"]},
               encoding="mixed")
    got = read_initializers(str(p))
    np.testing.assert_array_equal(got["a"], tensors["w.f32"])
    np.testing.assert_array_equal(got["b"], tensors["w.i64"])


def test_reader_int32_data_negative_values(tmp_path):
    """int32/int8 in the int32_data field: protobuf encodes negatives as
    64-bit two's complement varints — the fold must happen at 2^63, not
    2^31 (a 2^32 fold decoded -1 to garbage)."""
    tensors = {
        "neg.i32": np.asarray([-1, -(2**31), 2**31 - 1, 0, 7], np.int32),
        "neg.i8": np.asarray([-1, -128, 127, 0], np.int8),
    }
    p = tmp_path / "neg.onnx"
    write_onnx(p, tensors, encoding="int32_data")
    got = read_initializers(str(p))
    for k in tensors:
        assert got[k].dtype == tensors[k].dtype, k
        np.testing.assert_array_equal(got[k], tensors[k], err_msg=k)


def test_reader_rejects_non_onnx(tmp_path):
    p = tmp_path / "junk.onnx"
    p.write_bytes(b"\x00\x01\x02junk")
    with pytest.raises(ValueError):
        read_initializers(str(p))


def test_u2net_onnx_file_conversion_roundtrip(tmp_path):
    """Real-format u2net.onnx FILE -> convert_u2net_onnx == the proven
    dict-level conversion (closes the file-loader rehearsal gap for the
    session zoo the same way test_real_checkpoint_files does for TSR/SF3D)."""
    import jax
    import jax.numpy as jnp

    from sculptmate_tpu.frontend.u2net import U2Net
    from sculptmate_tpu.runtime.checkpoint import (
        convert_u2net_onnx,
        convert_u2net_state_dict,
    )
    from test_checkpoint import _assert_tree_roundtrip, _u2net_family_to_torch_sd

    module = U2Net(variant="small", out_channels=1)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), x)
    sd = {k: np.asarray(v) for k, v in _u2net_family_to_torch_sd(variables).items()}

    p = tmp_path / "u2net.onnx"
    write_onnx(p, sd, encoding="raw")
    got = convert_u2net_onnx(str(p))
    assert got is not None
    _assert_tree_roundtrip(variables, got, module, x)
    # and the dict-level converter agrees with the file path bit-for-bit
    ref = convert_u2net_state_dict(sd)
    flat_a = jax.tree_util.tree_leaves(got)
    flat_b = jax.tree_util.tree_leaves(ref)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_isnet_onnx_file_conversion_roundtrip(tmp_path):
    """Same FILE rehearsal for the ISNet recipe (isnet-*.onnx blobs)."""
    import jax
    import jax.numpy as jnp

    from sculptmate_tpu.frontend.isnet import ISNet
    from sculptmate_tpu.runtime.checkpoint import convert_isnet_onnx
    from test_checkpoint import _assert_tree_roundtrip, _u2net_family_to_torch_sd

    module = ISNet()
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), x)
    sd = {
        k: np.asarray(v)
        for k, v in _u2net_family_to_torch_sd(
            variables, plain_bnconv=("conv_in",)
        ).items()
    }
    p = tmp_path / "isnet-general-use.onnx"
    write_onnx(p, sd, encoding="raw")
    got = convert_isnet_onnx(str(p))
    assert got is not None
    _assert_tree_roundtrip(variables, got, module, x)


def test_session_registry_loads_onnx_blob(tmp_path, monkeypatch):
    """try_load_session_params picks up a real .onnx blob in CHECKPOINT_DIR
    through the built-in reader (the production session-zoo path)."""
    import jax
    import jax.numpy as jnp

    from sculptmate_tpu.frontend.u2net import U2Net
    from sculptmate_tpu.runtime import checkpoint
    from test_checkpoint import _u2net_family_to_torch_sd

    module = U2Net(variant="small", out_channels=1)
    variables = module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32)
    )
    sd = {k: np.asarray(v) for k, v in _u2net_family_to_torch_sd(variables).items()}
    write_onnx(tmp_path / "u2netp.onnx", sd, encoding="raw")
    monkeypatch.setattr(checkpoint, "CHECKPOINT_DIR", str(tmp_path))
    got = checkpoint.try_load_session_params("u2netp")
    assert got is not None and "params" in got and "batch_stats" in got
