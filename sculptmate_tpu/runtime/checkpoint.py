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
    # torch (I, O, kh, kw) -> flax (kh, kw, I, O) with spatial flip: flax's
    # default ConvTranspose (transpose_kernel=False) is a fractional-stride
    # conv with mirrored taps relative to torch's gradient-of-conv semantics
    w = np.asarray(sd[f"{torch_prefix}.weight"])
    _set_path(tree, flax_path + ("kernel",), w.transpose(2, 3, 0, 1)[::-1, ::-1].copy())
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
# SF3D

def convert_sf3d_state_dict(sd: Dict[str, Any]) -> Dict:
    """Torch SF3D state dict (safetensors) -> flax params for
    ``systems.sf3d.SF3DModule``. Key layout follows ``sf3d/system.py:96-139``
    and submodule definitions cited in each model file."""
    p: Dict = {}

    # --- camera embedder --------------------------------------------------
    _linear(sd, "camera_embedder.linear", p, ("camera_embedder", "linear"))

    # --- DINOv2 tokenizer -------------------------------------------------
    dv = ("image_tokenizer", "dinov2")
    emb = "image_tokenizer.model.embeddings"
    _set_path(p, dv + ("cls_token",), np.asarray(sd[f"{emb}.cls_token"]))
    _set_path(p, dv + ("pos_embed",), np.asarray(sd[f"{emb}.position_embeddings"]))
    _conv(sd, f"{emb}.patch_embeddings.projection", p, dv + ("patch_embed",))
    n_layers = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"image_tokenizer\.model\.encoder\.layer\.(\d+)\.", k))
    )
    for i in range(n_layers):
        tl = f"image_tokenizer.model.encoder.layer.{i}"
        fl = dv + (f"layer_{i}",)
        _norm(sd, f"{tl}.norm1", p, fl + ("norm1",))
        _norm(sd, f"{tl}.norm2", p, fl + ("norm2",))
        _linear(sd, f"{tl}.attention.attention.query", p, fl + ("query",))
        _linear(sd, f"{tl}.attention.attention.key", p, fl + ("key",))
        _linear(sd, f"{tl}.attention.attention.value", p, fl + ("value",))
        _linear(sd, f"{tl}.attention.output.dense", p, fl + ("attn_output",))
        _linear(sd, f"{tl}.mlp.fc1", p, fl + ("mlp_fc1",))
        _linear(sd, f"{tl}.mlp.fc2", p, fl + ("mlp_fc2",))
        _set_path(
            p, fl + ("layer_scale1", "lambda1"),
            np.asarray(sd[f"{tl}.layer_scale1.lambda1"]),
        )
        _set_path(
            p, fl + ("layer_scale2", "lambda1"),
            np.asarray(sd[f"{tl}.layer_scale2.lambda1"]),
        )
        # AdaLN modulations (registered as norm1_modulation/norm2_modulation)
        for mod in ("norm1_modulation", "norm2_modulation"):
            key = f"{tl}.{mod}.linear2"
            if f"{key}.weight" in sd:
                _linear(sd, key, p, fl + (mod, "linear2"))
    _norm(sd, "image_tokenizer.model.layernorm", p, dv + ("layernorm",))

    # --- triplane tokenizer ----------------------------------------------
    _set_path(p, ("tokenizer", "embeddings"), np.asarray(sd["tokenizer.embeddings"]))

    # --- two-stream backbone ----------------------------------------------
    bb = ("backbone",)
    _norm(sd, "backbone.norm_triplane", p, bb + ("norm_triplane",))
    _linear(sd, "backbone.proj_triplane", p, bb + ("proj_triplane",))
    if "backbone.norm_image.weight" in sd:
        _norm(sd, "backbone.norm_image", p, bb + ("norm_image",))
        _linear(sd, "backbone.proj_image", p, bb + ("proj_image",))
    _norm(sd, "backbone.norm_latent", p, bb + ("norm_latent",))
    _linear(sd, "backbone.proj_latent", p, bb + ("proj_latent",))
    _set_path(p, bb + ("latent_init",), np.asarray(sd["backbone.latent_init"]))
    _linear(sd, "backbone.proj_out", p, bb + ("proj_out",))

    def convert_cross_attn(prefix, path):
        for w in ("wq", "wk", "wv", "proj"):
            _linear(sd, f"{prefix}.{w}", p, path + (w,))

    def convert_ff(prefix, path):
        _linear(sd, f"{prefix}.net.0.proj", p, path + ("net_0", "proj"))
        _linear(sd, f"{prefix}.net.2", p, path + ("net_2",))

    def convert_fuse(prefix, path):
        if f"{prefix}.norm_x.weight" in sd:
            _norm(sd, f"{prefix}.norm_x", p, path + ("norm_x",))
        _norm(sd, f"{prefix}.norm_z1", p, path + ("norm_z1",))
        _norm(sd, f"{prefix}.norm_z2", p, path + ("norm_z2",))
        convert_cross_attn(f"{prefix}.attn", path + ("attn",))
        convert_ff(f"{prefix}.ff", path + ("ff",))

    n_blocks = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"backbone\.main_blocks\.(\d+)\.", k))
    )
    for i in range(n_blocks):
        tb = f"backbone.main_blocks.{i}"
        fb = bb + (f"main_blocks_{i}",)
        convert_fuse(f"{tb}.fuse_block_in", fb + ("fuse_block_in",))
        convert_fuse(f"{tb}.fuse_block_out", fb + ("fuse_block_out",))
        n_basic = 1 + max(
            int(m.group(1))
            for k in sd
            if (m := re.match(rf"backbone\.main_blocks\.{i}\.transformer_block\.(\d+)\.", k))
        )
        for j in range(n_basic):
            tj = f"{tb}.transformer_block.{j}"
            fj = fb + (f"transformer_block_{j}",)
            for norm in ("norm1", "norm2", "norm3"):
                _norm(sd, f"{tj}.{norm}", p, fj + (norm,))
            convert_cross_attn(f"{tj}.attn1", fj + ("attn1",))
            convert_cross_attn(f"{tj}.attn2", fj + ("attn2",))
            convert_ff(f"{tj}.ff", fj + ("ff",))

    # --- pixel-shuffle upsampler -----------------------------------------
    conv_ids = sorted(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"post_processor\.upsample\.(\d+)\.weight", k))
    )
    for n, i in enumerate(conv_ids):
        _conv(sd, f"post_processor.upsample.{i}", p, ("post_processor", f"conv_{n}"))

    # --- material decoder heads ------------------------------------------
    head_names = sorted(
        {m.group(1) for k in sd if (m := re.match(r"decoder\.heads\.([^.]+)\.", k))}
    )
    for name in head_names:
        ids = sorted(
            int(m.group(1))
            for k in sd
            if (m := re.match(rf"decoder\.heads\.{name}\.(\d+)\.weight", k))
        )
        for n, i in enumerate(ids):
            fname = "dense_out" if n == len(ids) - 1 else f"dense_{n}"
            _linear(sd, f"decoder.heads.{name}.{i}", p, ("decoder", f"head_{name}", fname))

    # --- CLIP image estimator ---------------------------------------------
    cv = ("image_estimator", "clip")
    vis = "image_estimator.model.visual"
    if f"{vis}.conv1.weight" in sd:
        w = np.asarray(sd[f"{vis}.conv1.weight"])  # (O, 3, k, k), no bias
        _set_path(p, cv + ("patch_embed", "kernel"), w.transpose(2, 3, 1, 0))
        _set_path(p, cv + ("class_embedding",), np.asarray(sd[f"{vis}.class_embedding"]))
        _set_path(
            p, cv + ("positional_embedding",),
            np.asarray(sd[f"{vis}.positional_embedding"]),
        )
        _norm(sd, f"{vis}.ln_pre", p, cv + ("ln_pre",))
        _norm(sd, f"{vis}.ln_post", p, cv + ("ln_post",))
        _set_path(p, cv + ("proj",), np.asarray(sd[f"{vis}.proj"]))
        n_blk = 1 + max(
            int(m.group(1))
            for k in sd
            if (m := re.match(rf"{re.escape(vis)}\.transformer\.resblocks\.(\d+)\.", k))
        )
        for i in range(n_blk):
            rb = f"{vis}.transformer.resblocks.{i}"
            fb = cv + (f"block_{i}",)
            _norm(sd, f"{rb}.ln_1", p, fb + ("ln_1",))
            _norm(sd, f"{rb}.ln_2", p, fb + ("ln_2",))
            _set_path(
                p, fb + ("in_proj", "kernel"),
                np.asarray(sd[f"{rb}.attn.in_proj_weight"]).T,
            )
            _set_path(
                p, fb + ("in_proj", "bias"), np.asarray(sd[f"{rb}.attn.in_proj_bias"])
            )
            _linear(sd, f"{rb}.attn.out_proj", p, fb + ("out_proj",))
            _linear(sd, f"{rb}.mlp.c_fc", p, fb + ("mlp_fc",))
            _linear(sd, f"{rb}.mlp.c_proj", p, fb + ("mlp_proj",))

    # estimator heads: ModuleList [shared_seq, d1_seq, d2_seq]
    est_heads = sorted(
        {
            m.group(1)
            for k in sd
            if (m := re.match(r"image_estimator\.heads\.([^.]+)\.", k))
        }
    )
    for name in est_heads:
        shared_ids = sorted(
            int(m.group(1))
            for k in sd
            if (m := re.match(rf"image_estimator\.heads\.{name}\.0\.(\d+)\.weight", k))
        )
        for n, i in enumerate(shared_ids):
            _linear(
                sd, f"image_estimator.heads.{name}.0.{i}", p,
                ("image_estimator", f"{name}_shared", f"dense_{n}"),
            )
        for pi in (1, 2):
            _linear(
                sd, f"image_estimator.heads.{name}.{pi}.0", p,
                ("image_estimator", f"{name}_p{pi-1}", "dense_0"),
            )
            _linear(
                sd, f"image_estimator.heads.{name}.{pi}.2", p,
                ("image_estimator", f"{name}_p{pi-1}_out"),
            )

    # --- global estimator -------------------------------------------------
    ge_convs = sorted(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"global_estimator\.layers\.(\d+)\.weight", k))
    )
    for n, i in enumerate(ge_convs):
        _conv(sd, f"global_estimator.layers.{i}", p, ("global_estimator", f"conv{n+1}"))
    ge_heads = sorted(
        {
            m.group(1)
            for k in sd
            if (m := re.match(r"global_estimator\.heads\.([^.]+)\.", k))
        }
    )
    for name in ge_heads:
        ids = sorted(
            int(m.group(1))
            for k in sd
            if (m := re.match(rf"global_estimator\.heads\.{name}\.(\d+)\.weight", k))
        )
        for n, i in enumerate(ids):
            if n == len(ids) - 1:
                _linear(
                    sd, f"global_estimator.heads.{name}.{i}", p,
                    ("global_estimator", f"{name}_out"),
                )
            else:
                _linear(
                    sd, f"global_estimator.heads.{name}.{i}", p,
                    ("global_estimator", f"{name}_stack", f"dense_{n}"),
                )

    return p


def load_sf3d_checkpoint(path: str) -> Dict:
    """Load the reference ``model.safetensors`` and convert."""
    from safetensors.numpy import load_file

    sd = load_file(path)
    return convert_sf3d_state_dict(sd)


# ---------------------------------------------------------------------------
# SAM (Segment Anything)

def convert_sam_state_dict(sd: Dict[str, Any]) -> Dict:
    """Official ``segment_anything`` torch checkpoint (sam_vit_b/l/h.pth
    state dict — the weights the reference's ONNX encoder/decoder pair was
    exported from, ``rembg/sessions/sam.py:133-330``) -> flax params for
    ``frontend/sam.py:Sam``.

    The mask-prompt path (``prompt_encoder.mask_downscaling.*``) is not
    consumed: the rembg session surface only ever passes point/box prompts.
    """
    p: Dict = {}
    enc = ("image_encoder",)

    _conv(sd, "image_encoder.patch_embed.proj", p, enc + ("patch_embed",))
    _set_path(p, enc + ("pos_embed",), np.asarray(sd["image_encoder.pos_embed"]))
    n_blocks = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"image_encoder\.blocks\.(\d+)\.", k))
    )
    for i in range(n_blocks):
        tb = f"image_encoder.blocks.{i}"
        fb = enc + (f"block_{i}",)
        _norm(sd, f"{tb}.norm1", p, fb + ("norm1",))
        _norm(sd, f"{tb}.norm2", p, fb + ("norm2",))
        _linear(sd, f"{tb}.attn.qkv", p, fb + ("attn", "qkv"))
        _linear(sd, f"{tb}.attn.proj", p, fb + ("attn", "proj"))
        for rp in ("rel_pos_h", "rel_pos_w"):
            _set_path(p, fb + ("attn", rp), np.asarray(sd[f"{tb}.attn.{rp}"]))
        _linear(sd, f"{tb}.mlp.lin1", p, fb + ("mlp_lin1",))
        _linear(sd, f"{tb}.mlp.lin2", p, fb + ("mlp_lin2",))
    _conv(sd, "image_encoder.neck.0", p, enc + ("neck_conv1",))
    _norm(sd, "image_encoder.neck.1", p, enc + ("neck_ln1",))
    _conv(sd, "image_encoder.neck.2", p, enc + ("neck_conv2",))
    _norm(sd, "image_encoder.neck.3", p, enc + ("neck_ln2",))

    pe = ("prompt_encoder",)
    _set_path(
        p, pe + ("pe_gaussian",),
        np.asarray(sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"]),
    )
    _set_path(
        p, pe + ("point_embeddings",),
        np.concatenate(
            [np.asarray(sd[f"prompt_encoder.point_embeddings.{i}.weight"]) for i in range(4)]
        ),
    )
    _set_path(
        p, pe + ("not_a_point",),
        np.asarray(sd["prompt_encoder.not_a_point_embed.weight"]),
    )
    _set_path(
        p, pe + ("no_mask_embed",),
        np.asarray(sd["prompt_encoder.no_mask_embed.weight"]),
    )

    md = ("mask_decoder",)
    _set_path(p, md + ("iou_token",), np.asarray(sd["mask_decoder.iou_token.weight"]))
    _set_path(p, md + ("mask_tokens",), np.asarray(sd["mask_decoder.mask_tokens.weight"]))

    def attn(torch_prefix, path):
        for w in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _linear(sd, f"{torch_prefix}.{w}", p, path + (w,))

    for i in range(2):
        tl = f"mask_decoder.transformer.layers.{i}"
        fl = md + (f"block_{i}",)
        attn(f"{tl}.self_attn", fl + ("self_attn",))
        attn(f"{tl}.cross_attn_token_to_image", fl + ("cross_t2i",))
        attn(f"{tl}.cross_attn_image_to_token", fl + ("cross_i2t",))
        for n in ("norm1", "norm2", "norm3", "norm4"):
            _norm(sd, f"{tl}.{n}", p, fl + (n,))
        _linear(sd, f"{tl}.mlp.lin1", p, fl + ("mlp_lin1",))
        _linear(sd, f"{tl}.mlp.lin2", p, fl + ("mlp_lin2",))
    attn("mask_decoder.transformer.final_attn_token_to_image", md + ("final_attn",))
    _norm(sd, "mask_decoder.transformer.norm_final_attn", p, md + ("final_norm",))

    _conv_transpose(sd, "mask_decoder.output_upscaling.0", p, md + ("upscale1",))
    _norm(sd, "mask_decoder.output_upscaling.1", p, md + ("upscale_ln",))
    _conv_transpose(sd, "mask_decoder.output_upscaling.3", p, md + ("upscale2",))

    n_hyper = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"mask_decoder\.output_hypernetworks_mlps\.(\d+)\.", k))
    )
    for m_i in range(n_hyper):
        for li in range(3):
            _linear(
                sd, f"mask_decoder.output_hypernetworks_mlps.{m_i}.layers.{li}",
                p, md + (f"hyper_{m_i}_lin{li}",),
            )
    for li in range(3):
        _linear(
            sd, f"mask_decoder.iou_prediction_head.layers.{li}",
            p, md + (f"iou_lin{li}",),
        )
    return p


def load_sam_checkpoint(path: str) -> Dict:
    """Load an official sam_vit_*.pth checkpoint and convert."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items()}
    return {"params": convert_sam_state_dict(sd)}


# ---------------------------------------------------------------------------
# u2net (ONNX)

def convert_u2net_onnx(path: str) -> Optional[Dict]:
    """Parse u2net.onnx initializers into U2Net params + batch_stats.

    ONNX initializer names follow the torch module names of the original
    U-2-Net repo (stage1.rebnconvin.conv_s1.weight, ...bn_s1.running_mean...).
    Uses the onnx package when present, else the built-in wire-format reader
    (``runtime/onnx_lite.py``).
    """
    sd = _onnx_initializers(path)
    return None if sd is None else convert_u2net_state_dict(sd)


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


def convert_isnet_state_dict(sd: Dict[str, Any]) -> Dict:
    """ISNetDIS (DIS repo / rembg isnet-*.onnx) state dict -> flax ISNet
    (``frontend/isnet.py``) params + batch_stats.

    Layout (reference recipe ``rembg/sessions/dis_anime.py:30``): the stem is
    a ``myrebnconv`` named ``conv_in`` with plain ``.conv``/``.bn`` children;
    every other conv-bn pair is a u2net-style REBNCONV (``.conv_s1`` /
    ``.bn_s1``); side heads are ``side1..side6``.
    """
    params: Dict = {}
    stats: Dict = {}

    def bnconv(prefix: str, path: Tuple[str, ...], conv="conv_s1", bn="bn_s1"):
        _conv(sd, f"{prefix}.{conv}", params, path + ("conv",))
        _set_path(params, path + ("bn", "scale"), np.asarray(sd[f"{prefix}.{bn}.weight"]))
        _set_path(params, path + ("bn", "bias"), np.asarray(sd[f"{prefix}.{bn}.bias"]))
        _set_path(stats, path + ("bn", "mean"), np.asarray(sd[f"{prefix}.{bn}.running_mean"]))
        _set_path(stats, path + ("bn", "var"), np.asarray(sd[f"{prefix}.{bn}.running_var"]))

    bnconv("conv_in", ("conv_in",), conv="conv", bn="bn")
    rebn_names = sorted(
        {
            m.group(1)
            for k in sd
            if (m := re.match(r"(.*rebnconv[^.]*)\.conv_s1\.weight", k))
        }
    )
    for name in rebn_names:
        bnconv(name, tuple(name.split(".")))
    for i in range(1, 7):
        if f"side{i}.weight" in sd:
            _conv(sd, f"side{i}", params, (f"side{i}",))
    return {"params": params, "batch_stats": stats}


def convert_isnet_onnx(path: str) -> Optional[Dict]:
    """Parse an isnet-*.onnx blob's initializers into ISNet variables; None
    if the onnx package is unavailable."""
    sd = _onnx_initializers(path)
    return None if sd is None else convert_isnet_state_dict(sd)


def convert_cloth_seg_state_dict(sd: Dict[str, Any]) -> Dict:
    """u2net_cloth_seg (U2NET(3, 4), ``u2net_cloth_seg.py:58-145``) uses the
    exact u2net module layout with 4 output channels — same name map."""
    return convert_u2net_state_dict(sd)


def _onnx_initializers(path: str) -> Optional[Dict[str, Any]]:
    try:
        import onnx
        from onnx import numpy_helper
    except ImportError:
        # built-in wire-format reader: weight extraction must not require
        # the onnx wheel (Blender installs rarely have it)
        from sculptmate_tpu.runtime.onnx_lite import read_initializers

        return read_initializers(path)
    model = onnx.load(path)
    return {i.name: numpy_helper.to_array(i) for i in model.graph.initializer}


# session-zoo weight resolution: registry name -> (blob filename, converter).
# Every entry in frontend/sessions._REGISTRY must be coverable here.
_SESSION_WEIGHTS = {
    "u2net": ("u2net.onnx", convert_u2net_state_dict),
    "u2netp": ("u2netp.onnx", convert_u2net_state_dict),
    "u2net_human_seg": ("u2net_human_seg.onnx", convert_u2net_state_dict),
    "silueta": ("silueta.onnx", convert_u2net_state_dict),
    "isnet-anime": ("isnet-anime.onnx", convert_isnet_state_dict),
    "dis_anime": ("isnet-anime.onnx", convert_isnet_state_dict),
    "isnet-general-use": ("isnet-general-use.onnx", convert_isnet_state_dict),
    "dis_general_use": ("isnet-general-use.onnx", convert_isnet_state_dict),
    "u2net_cloth_seg": ("u2net_cloth_seg.onnx", convert_cloth_seg_state_dict),
    "u2net_custom": ("u2net.onnx", convert_u2net_state_dict),
}


def try_load_session_params(name: str) -> Optional[Dict]:
    """Load converted weights for a session-zoo entry if its blob (or a
    converted native orbax dir) is present under the checkpoint dir."""
    if name not in _SESSION_WEIGHTS:
        return None
    fname, converter = _SESSION_WEIGHTS[name]
    native = os.path.join(CHECKPOINT_DIR, fname.rsplit(".", 1)[0] + "_flax")
    if os.path.isdir(native):
        return load_native(native)
    blob = os.path.join(CHECKPOINT_DIR, fname)
    if os.path.isfile(blob):
        sd = _onnx_initializers(blob)
        return None if sd is None else converter(sd)
    return None


def try_load_sam_params(variant: str = "vit_b") -> Optional[Dict]:
    """Load converted SAM weights if a sam_<variant>.pth (official torch
    checkpoint) or native orbax dir is present under the checkpoint dir."""
    native = os.path.join(CHECKPOINT_DIR, f"sam_{variant}_flax")
    if os.path.isdir(native):
        return load_native(native)
    pth = os.path.join(CHECKPOINT_DIR, f"sam_{variant}.pth")
    if os.path.isfile(pth):
        return load_sam_checkpoint(pth)
    return None


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
