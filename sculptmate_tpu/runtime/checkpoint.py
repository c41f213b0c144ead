"""Checkpoint conversion and persistence.

The reference ships torch weights (TripoSR ``model.ckpt`` via torch.load at
``tsr/system.py:64-65``; SF3D ``model.safetensors`` at ``sf3d/system.py:93``;
u2net as ONNX). This module converts those formats into this framework's flax
param pytrees by pure key/layout mapping, and persists native checkpoints with
orbax. No torch is needed at inference time — torch/safetensors/onnx are only
imported inside the conversion entry points.

Layout rules (torch -> flax):
  Linear   weight (O, I)         -> kernel (I, O)
  Conv2d   weight (O, I, kh, kw) -> kernel (kh, kw, I, O)
  ConvT2d  weight (I, O, kh, kw) -> kernel (kh, kw, I, O)  (flax ConvTranspose
           with transpose_kernel=False matches torch for the k=s no-pad case;
           verified numerically in tests/test_checkpoint.py)
  Norms    weight/bias           -> scale/bias
  BatchNorm running stats        -> batch_stats collection (mean/var)
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

CHECKPOINT_DIR = os.environ.get(
    "SCULPTMATE_CHECKPOINTS",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "checkpoints"),
)


# ---------------------------------------------------------------------------
# pytree assembly helpers

def _set_path(tree: Dict, path: Tuple[str, ...], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _linear(sd, torch_prefix, tree, flax_path):
    w = np.asarray(sd[f"{torch_prefix}.weight"])
    _set_path(tree, flax_path + ("kernel",), w.T)
    if f"{torch_prefix}.bias" in sd:
        _set_path(tree, flax_path + ("bias",), np.asarray(sd[f"{torch_prefix}.bias"]))


def _norm(sd, torch_prefix, tree, flax_path):
    _set_path(tree, flax_path + ("scale",), np.asarray(sd[f"{torch_prefix}.weight"]))
    _set_path(tree, flax_path + ("bias",), np.asarray(sd[f"{torch_prefix}.bias"]))


def _conv(sd, torch_prefix, tree, flax_path):
    w = np.asarray(sd[f"{torch_prefix}.weight"])  # (O, I, kh, kw)
    _set_path(tree, flax_path + ("kernel",), w.transpose(2, 3, 1, 0))
    if f"{torch_prefix}.bias" in sd:
        _set_path(tree, flax_path + ("bias",), np.asarray(sd[f"{torch_prefix}.bias"]))


def _conv_transpose(sd, torch_prefix, tree, flax_path):
    w = np.asarray(sd[f"{torch_prefix}.weight"])  # (I, O, kh, kw)
    _set_path(tree, flax_path + ("kernel",), w.transpose(2, 3, 0, 1))
    if f"{torch_prefix}.bias" in sd:
        _set_path(tree, flax_path + ("bias",), np.asarray(sd[f"{torch_prefix}.bias"]))


# ---------------------------------------------------------------------------
# TripoSR

def convert_tsr_state_dict(sd: Dict[str, Any]) -> Dict:
    """Torch TSR state dict -> flax params tree for ``systems.tsr.TSRModule``."""
    p: Dict = {}

    # --- ViT image tokenizer ---------------------------------------------
    vit = ("image_tokenizer", "vit")
    emb = "image_tokenizer.model.embeddings"
    _set_path(p, vit + ("cls_token",), np.asarray(sd[f"{emb}.cls_token"]))
    _set_path(p, vit + ("pos_embed",), np.asarray(sd[f"{emb}.position_embeddings"]))
    _conv(sd, f"{emb}.patch_embeddings.projection", p, vit + ("patch_embed",))
    n_layers = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"image_tokenizer\.model\.encoder\.layer\.(\d+)\.", k))
    )
    for i in range(n_layers):
        tl = f"image_tokenizer.model.encoder.layer.{i}"
        fl = vit + (f"layer_{i}",)
        _norm(sd, f"{tl}.layernorm_before", p, fl + ("layernorm_before",))
        _norm(sd, f"{tl}.layernorm_after", p, fl + ("layernorm_after",))
        att = fl + ("attention",)
        _linear(sd, f"{tl}.attention.attention.query", p, att + ("query",))
        _linear(sd, f"{tl}.attention.attention.key", p, att + ("key",))
        _linear(sd, f"{tl}.attention.attention.value", p, att + ("value",))
        _linear(sd, f"{tl}.attention.output.dense", p, att + ("output",))
        _linear(sd, f"{tl}.intermediate.dense", p, fl + ("intermediate",))
        _linear(sd, f"{tl}.output.dense", p, fl + ("mlp_output",))
    _norm(sd, "image_tokenizer.model.layernorm", p, vit + ("layernorm",))

    # --- triplane tokenizer ----------------------------------------------
    _set_path(p, ("tokenizer", "embeddings"), np.asarray(sd["tokenizer.embeddings"]))

    # --- backbone ---------------------------------------------------------
    bb = ("backbone",)
    _norm(sd, "backbone.norm", p, bb + ("norm",))
    _linear(sd, "backbone.proj_in", p, bb + ("proj_in",))
    _linear(sd, "backbone.proj_out", p, bb + ("proj_out",))
    n_blocks = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"backbone\.transformer_blocks\.(\d+)\.", k))
    )
    for i in range(n_blocks):
        tb = f"backbone.transformer_blocks.{i}"
        fb = bb + (f"blocks_{i}",)
        for norm in ("norm1", "norm2", "norm3"):
            _norm(sd, f"{tb}.{norm}", p, fb + (norm,))
        for attn in ("attn1", "attn2"):
            for proj in ("to_q", "to_k", "to_v"):
                _linear(sd, f"{tb}.{attn}.{proj}", p, fb + (attn, proj))
            _linear(sd, f"{tb}.{attn}.to_out.0", p, fb + (attn, "to_out"))
        _linear(sd, f"{tb}.ff.net.0.proj", p, fb + ("ff", "net_0", "proj"))
        _linear(sd, f"{tb}.ff.net.2", p, fb + ("ff", "net_2"))

    # --- post processor & decoder ----------------------------------------
    _conv_transpose(sd, "post_processor.upsample", p, ("post_processor", "upsample"))

    dec_ids = sorted(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"decoder\.layers\.(\d+)\.weight", k))
    )
    for n, i in enumerate(dec_ids):
        name = "dense_out" if n == len(dec_ids) - 1 else f"dense_{n}"
        _linear(sd, f"decoder.layers.{i}", p, ("decoder", "layers", name))

    return p


def load_tsr_checkpoint(path: str) -> Dict:
    """Load the reference ``model.ckpt`` (torch) and convert."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.numpy() for k, v in sd.items()}
    return convert_tsr_state_dict(sd)


# ---------------------------------------------------------------------------
# u2net (ONNX)

def convert_u2net_onnx(path: str) -> Optional[Dict]:
    """Parse u2net.onnx initializers into U2Net params + batch_stats.

    ONNX initializer names follow the torch module names of the original
    U-2-Net repo (stage1.rebnconvin.conv_s1.weight, ...bn_s1.running_mean...).
    Returns None if the onnx package is unavailable.
    """
    try:
        import onnx
        from onnx import numpy_helper
    except ImportError:
        return None

    model = onnx.load(path)
    sd = {init.name: numpy_helper.to_array(init) for init in model.graph.initializer}
    return convert_u2net_state_dict(sd)


def convert_u2net_state_dict(sd: Dict[str, Any]) -> Dict:
    """torch-style u2net state dict -> {'params': ..., 'batch_stats': ...}."""
    params: Dict = {}
    stats: Dict = {}

    def handle_rebnconv(prefix: str, path: Tuple[str, ...]):
        _conv(sd, f"{prefix}.conv_s1", params, path + ("conv",))
        _set_path(params, path + ("bn", "scale"), np.asarray(sd[f"{prefix}.bn_s1.weight"]))
        _set_path(params, path + ("bn", "bias"), np.asarray(sd[f"{prefix}.bn_s1.bias"]))
        _set_path(stats, path + ("bn", "mean"), np.asarray(sd[f"{prefix}.bn_s1.running_mean"]))
        _set_path(stats, path + ("bn", "var"), np.asarray(sd[f"{prefix}.bn_s1.running_var"]))

    rebn_names = sorted(
        {
            m.group(1)
            for k in sd
            if (m := re.match(r"(.*rebnconv[^.]*)\.conv_s1\.weight", k))
        }
    )
    for name in rebn_names:
        handle_rebnconv(name, tuple(name.split(".")))

    for side in [f"side{i}" for i in range(1, 7)] + ["outconv"]:
        if f"{side}.weight" in sd:
            _conv(sd, side, params, (side,))

    return {"params": params, "batch_stats": stats}


def try_load_u2net_params() -> Optional[Dict]:
    """Load converted u2net weights if present under the checkpoint dir."""
    onnx_path = os.path.join(CHECKPOINT_DIR, "u2net.onnx")
    native = os.path.join(CHECKPOINT_DIR, "u2net_flax")
    if os.path.isdir(native):
        return load_native(native)
    if os.path.isfile(onnx_path):
        return convert_u2net_onnx(onnx_path)
    return None


# ---------------------------------------------------------------------------
# native orbax persistence

def save_native(path: str, tree) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()


def load_native(path: str):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))
