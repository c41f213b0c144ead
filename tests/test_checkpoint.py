"""Checkpoint layout rules: torch -> flax weight conversion parity.

These validate the risky part of conversion — kernel layout transposes for
Conv/ConvTranspose/Linear and norm naming — by running the same random
weights through torch and converted-flax modules and comparing outputs.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import flax.linen as nn  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def test_linear_layout(rng):
    t = torch.nn.Linear(6, 4)
    x = rng.standard_normal((5, 6)).astype(np.float32)
    ref = t(torch.from_numpy(x)).detach().numpy()
    params = {
        "kernel": jnp.asarray(t.weight.detach().numpy().T),
        "bias": jnp.asarray(t.bias.detach().numpy()),
    }
    out = nn.Dense(4).apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)


def test_conv2d_layout(rng):
    t = torch.nn.Conv2d(3, 5, 3, padding=1)
    x = rng.standard_normal((1, 3, 8, 8)).astype(np.float32)
    ref = t(torch.from_numpy(x)).detach().numpy()  # (1, 5, 8, 8)
    params = {
        "kernel": jnp.asarray(t.weight.detach().numpy().transpose(2, 3, 1, 0)),
        "bias": jnp.asarray(t.bias.detach().numpy()),
    }
    out = nn.Conv(5, (3, 3), padding=1).apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-5
    )


def test_conv_transpose2d_k2s2_layout(rng):
    """The TriplaneUpsampleNetwork case (k=2, s=2, no padding)."""
    t = torch.nn.ConvTranspose2d(6, 4, kernel_size=2, stride=2)
    x = rng.standard_normal((1, 6, 5, 5)).astype(np.float32)
    ref = t(torch.from_numpy(x)).detach().numpy()  # (1, 4, 10, 10)
    params = {
        "kernel": jnp.asarray(
            t.weight.detach().numpy().transpose(2, 3, 0, 1)[::-1, ::-1].copy()
        ),
        "bias": jnp.asarray(t.bias.detach().numpy()),
    }
    out = nn.ConvTranspose(4, (2, 2), strides=(2, 2), padding="VALID").apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-5
    )


def test_groupnorm_channels_first_equivalence(rng):
    """Torch GroupNorm on (B, C, N) == flax GroupNorm on (B, N, C)."""
    t = torch.nn.GroupNorm(4, 16, eps=1e-6)
    torch.nn.init.normal_(t.weight)
    torch.nn.init.normal_(t.bias)
    x = rng.standard_normal((2, 16, 10)).astype(np.float32)
    ref = t(torch.from_numpy(x)).detach().numpy()
    params = {
        "scale": jnp.asarray(t.weight.detach().numpy()),
        "bias": jnp.asarray(t.bias.detach().numpy()),
    }
    out = nn.GroupNorm(num_groups=4, epsilon=1e-6).apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 1))
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 2, 1), ref, rtol=1e-4, atol=1e-5
    )


def test_pixel_shuffle_matches_torch(rng):
    from sculptmate_tpu.models.upsamplers import pixel_shuffle

    x = rng.standard_normal((1, 20, 4, 4)).astype(np.float32)  # C*r^2=20, r=2
    ref = torch.nn.functional.pixel_shuffle(torch.from_numpy(x), 2).numpy()
    out = pixel_shuffle(jnp.asarray(x.transpose(0, 2, 3, 1)), 2)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, rtol=1e-6, atol=1e-6
    )


def test_tsr_state_dict_conversion_shapes():
    """A synthetic torch-shaped TSR state dict converts into the exact param
    tree TSRModule expects (validated by flax apply not raising)."""
    import jax
    from sculptmate_tpu.runtime.checkpoint import convert_tsr_state_dict
    from sculptmate_tpu.systems.tsr import TSRConfig, TSRModule

    cfg = TSRConfig(
        cond_image_size=32,
        plane_size=4,
        num_channels=64,
        num_attention_heads=4,
        attention_head_dim=16,
        num_layers=2,
        cross_attention_dim=768,
        upsample_out_channels=8,
        decoder_in_channels=24,
        decoder_n_neurons=16,
        decoder_n_hidden_layers=2,
    )
    module = TSRModule(cfg)
    ref_params = module.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 32, 3)),
        method=TSRModule.init_all,
    )["params"]

    rng = np.random.default_rng(0)

    def make_sd():
        sd = {}
        hid, inter, heads = 768, 3072, 12

        def lin(name, i, o):
            sd[f"{name}.weight"] = rng.standard_normal((o, i)).astype(np.float32)
            sd[f"{name}.bias"] = rng.standard_normal((o,)).astype(np.float32)

        def norm(name, c):
            sd[f"{name}.weight"] = rng.standard_normal((c,)).astype(np.float32)
            sd[f"{name}.bias"] = rng.standard_normal((c,)).astype(np.float32)

        emb = "image_tokenizer.model.embeddings"
        sd[f"{emb}.cls_token"] = rng.standard_normal((1, 1, hid)).astype(np.float32)
        sd[f"{emb}.position_embeddings"] = rng.standard_normal((1, 197, hid)).astype(np.float32)
        sd[f"{emb}.patch_embeddings.projection.weight"] = rng.standard_normal(
            (hid, 3, 16, 16)
        ).astype(np.float32)
        sd[f"{emb}.patch_embeddings.projection.bias"] = rng.standard_normal((hid,)).astype(np.float32)
        for i in range(12):
            tl = f"image_tokenizer.model.encoder.layer.{i}"
            norm(f"{tl}.layernorm_before", hid)
            norm(f"{tl}.layernorm_after", hid)
            for qkv in ("query", "key", "value"):
                lin(f"{tl}.attention.attention.{qkv}", hid, hid)
            lin(f"{tl}.attention.output.dense", hid, hid)
            lin(f"{tl}.intermediate.dense", hid, inter)
            lin(f"{tl}.output.dense", inter, hid)
        norm("image_tokenizer.model.layernorm", hid)

        sd["tokenizer.embeddings"] = rng.standard_normal((3, 64, 4, 4)).astype(np.float32)
        norm("backbone.norm", 64)
        lin("backbone.proj_in", 64, 64)
        lin("backbone.proj_out", 64, 64)
        for i in range(2):
            tb = f"backbone.transformer_blocks.{i}"
            for nm in ("norm1", "norm2", "norm3"):
                norm(f"{tb}.{nm}", 64)
            for attn, kv in (("attn1", 64), ("attn2", 768)):
                sd[f"{tb}.{attn}.to_q.weight"] = rng.standard_normal((64, 64)).astype(np.float32)
                sd[f"{tb}.{attn}.to_k.weight"] = rng.standard_normal((64, kv)).astype(np.float32)
                sd[f"{tb}.{attn}.to_v.weight"] = rng.standard_normal((64, kv)).astype(np.float32)
                lin(f"{tb}.{attn}.to_out.0", 64, 64)
            lin(f"{tb}.ff.net.0.proj", 64, 512)
            lin(f"{tb}.ff.net.2", 256, 64)
        sd["post_processor.upsample.weight"] = rng.standard_normal((64, 8, 2, 2)).astype(np.float32)
        sd["post_processor.upsample.bias"] = rng.standard_normal((8,)).astype(np.float32)
        for n, i in enumerate([0, 2, 4]):
            dims = [(24, 16), (16, 16), (16, 4)][n]
            lin(f"decoder.layers.{i}", dims[0], dims[1])
        return sd

    converted = convert_tsr_state_dict(make_sd())

    # structural equality with the initialized tree
    ref_flat = jax.tree_util.tree_leaves_with_path(ref_params)
    conv_flat = jax.tree_util.tree_leaves_with_path(converted)
    ref_paths = {jax.tree_util.keystr(p): v.shape for p, v in ref_flat}
    conv_paths = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in conv_flat}
    assert ref_paths == conv_paths, (
        set(ref_paths) ^ set(conv_paths),
        {k: (ref_paths.get(k), conv_paths.get(k)) for k in ref_paths if ref_paths.get(k) != conv_paths.get(k)},
    )

    # and it actually runs
    out = module.apply({"params": converted}, jnp.zeros((1, 32, 32, 3)))
    assert out.shape == (1, 3, 8, 8, 8)


def test_sam_checkpoint_conversion_roundtrip():
    """convert_sam_state_dict maps the official segment_anything checkpoint
    layout (sam_vit_*.pth) onto frontend/sam.py's param tree: synthesize a
    torch-style state dict by inverse-mapping a small Sam's params, convert,
    and require the exact tree back (catches key-map or transpose drift)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sculptmate_tpu.frontend.sam import Sam
    from sculptmate_tpu.runtime.checkpoint import convert_sam_state_dict

    module = Sam(encoder_embed_dim=32, encoder_depth=2, encoder_heads=2)
    variables = module.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3)),
        jnp.zeros((1, 2, 2)),
        jnp.zeros((1, 2), jnp.int32),
    )
    params = jax.tree.map(np.asarray, variables["params"])

    sd = {}

    def lin(flax_leaf, prefix):
        sd[f"{prefix}.weight"] = flax_leaf["kernel"].T.copy()
        if "bias" in flax_leaf:
            sd[f"{prefix}.bias"] = flax_leaf["bias"].copy()

    def norm(flax_leaf, prefix):
        sd[f"{prefix}.weight"] = flax_leaf["scale"].copy()
        sd[f"{prefix}.bias"] = flax_leaf["bias"].copy()

    def conv(flax_leaf, prefix):
        sd[f"{prefix}.weight"] = flax_leaf["kernel"].transpose(3, 2, 0, 1).copy()
        if "bias" in flax_leaf:
            sd[f"{prefix}.bias"] = flax_leaf["bias"].copy()

    def convt(flax_leaf, prefix):
        sd[f"{prefix}.weight"] = (
            flax_leaf["kernel"][::-1, ::-1].transpose(2, 3, 0, 1).copy()
        )
        if "bias" in flax_leaf:
            sd[f"{prefix}.bias"] = flax_leaf["bias"].copy()

    enc = params["image_encoder"]
    conv(enc["patch_embed"], "image_encoder.patch_embed.proj")
    sd["image_encoder.pos_embed"] = enc["pos_embed"].copy()
    for i in range(2):
        b = enc[f"block_{i}"]
        tb = f"image_encoder.blocks.{i}"
        norm(b["norm1"], f"{tb}.norm1")
        norm(b["norm2"], f"{tb}.norm2")
        lin(b["attn"]["qkv"], f"{tb}.attn.qkv")
        lin(b["attn"]["proj"], f"{tb}.attn.proj")
        sd[f"{tb}.attn.rel_pos_h"] = b["attn"]["rel_pos_h"].copy()
        sd[f"{tb}.attn.rel_pos_w"] = b["attn"]["rel_pos_w"].copy()
        lin(b["mlp_lin1"], f"{tb}.mlp.lin1")
        lin(b["mlp_lin2"], f"{tb}.mlp.lin2")
    conv(enc["neck_conv1"], "image_encoder.neck.0")
    norm(enc["neck_ln1"], "image_encoder.neck.1")
    conv(enc["neck_conv2"], "image_encoder.neck.2")
    norm(enc["neck_ln2"], "image_encoder.neck.3")

    pe = params["prompt_encoder"]
    sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"] = pe["pe_gaussian"].copy()
    for i in range(4):
        sd[f"prompt_encoder.point_embeddings.{i}.weight"] = pe["point_embeddings"][i : i + 1].copy()
    sd["prompt_encoder.not_a_point_embed.weight"] = pe["not_a_point"].copy()
    sd["prompt_encoder.no_mask_embed.weight"] = pe["no_mask_embed"].copy()

    md = params["mask_decoder"]
    sd["mask_decoder.iou_token.weight"] = md["iou_token"].copy()
    sd["mask_decoder.mask_tokens.weight"] = md["mask_tokens"].copy()
    for i in range(2):
        b = md[f"block_{i}"]
        tl = f"mask_decoder.transformer.layers.{i}"
        for mine, theirs in (
            ("self_attn", "self_attn"),
            ("cross_t2i", "cross_attn_token_to_image"),
            ("cross_i2t", "cross_attn_image_to_token"),
        ):
            for w in ("q_proj", "k_proj", "v_proj", "out_proj"):
                lin(b[mine][w], f"{tl}.{theirs}.{w}")
        for n in ("norm1", "norm2", "norm3", "norm4"):
            norm(b[n], f"{tl}.{n}")
        lin(b["mlp_lin1"], f"{tl}.mlp.lin1")
        lin(b["mlp_lin2"], f"{tl}.mlp.lin2")
    for w in ("q_proj", "k_proj", "v_proj", "out_proj"):
        lin(md["final_attn"][w], f"mask_decoder.transformer.final_attn_token_to_image.{w}")
    norm(md["final_norm"], "mask_decoder.transformer.norm_final_attn")
    convt(md["upscale1"], "mask_decoder.output_upscaling.0")
    norm(md["upscale_ln"], "mask_decoder.output_upscaling.1")
    convt(md["upscale2"], "mask_decoder.output_upscaling.3")
    for m_i in range(4):
        for li in range(3):
            lin(md[f"hyper_{m_i}_lin{li}"], f"mask_decoder.output_hypernetworks_mlps.{m_i}.layers.{li}")
    for li in range(3):
        lin(md[f"iou_lin{li}"], f"mask_decoder.iou_prediction_head.layers.{li}")

    converted = convert_sam_state_dict(sd)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(converted)
    keys_a = {jax.tree_util.keystr(k) for k, _ in flat_a}
    keys_b = {jax.tree_util.keystr(k) for k, _ in flat_b}
    assert keys_a == keys_b, keys_a ^ keys_b
    b_by_key = {jax.tree_util.keystr(k): v for k, v in flat_b}
    for k, v in flat_a:
        np.testing.assert_array_equal(np.asarray(v), b_by_key[jax.tree_util.keystr(k)], err_msg=jax.tree_util.keystr(k))

    # converted params drive the module (shape check via abstract eval)
    jax.eval_shape(
        lambda p: module.apply(
            {"params": p},
            jnp.zeros((1, 64, 64, 3)),
            jnp.zeros((1, 2, 2)),
            jnp.zeros((1, 2), jnp.int32),
        ),
        converted,
    )


# ---------------------------------------------------------------------------
# session-zoo converters: every registry entry has a weight path


def _u2net_family_to_torch_sd(variables, plain_bnconv=()):
    """Inverse-map a u2net/isnet flax tree to the torch/onnx naming so the
    converter can be required to reproduce the exact tree (catches key-map
    or transpose drift). ``plain_bnconv``: module names whose conv/bn pairs
    use plain ``.conv``/``.bn`` (ISNet's myrebnconv stem) instead of
    ``.conv_s1``/``.bn_s1``."""
    import numpy as np

    params = variables["params"]
    stats = variables["batch_stats"]
    sd = {}

    def conv_entry(prefix, leaf):
        sd[f"{prefix}.weight"] = np.asarray(leaf["kernel"]).transpose(3, 2, 0, 1).copy()
        if "bias" in leaf:
            sd[f"{prefix}.bias"] = np.asarray(leaf["bias"]).copy()

    def walk(ptree, stree, path):
        for k, node in ptree.items():
            name = ".".join(path + [k])
            if "conv" in node and "bn" in node:
                cs, bs = ("conv", "bn") if k in plain_bnconv else ("conv_s1", "bn_s1")
                conv_entry(f"{name}.{cs}", node["conv"])
                sd[f"{name}.{bs}.weight"] = np.asarray(node["bn"]["scale"]).copy()
                sd[f"{name}.{bs}.bias"] = np.asarray(node["bn"]["bias"]).copy()
                sd[f"{name}.{bs}.running_mean"] = np.asarray(stree[k]["bn"]["mean"]).copy()
                sd[f"{name}.{bs}.running_var"] = np.asarray(stree[k]["bn"]["var"]).copy()
            elif "kernel" in node:
                conv_entry(name, node)
            else:
                walk(node, stree.get(k, {}), path + [k])

    walk(params, stats, [])
    return sd


def _assert_tree_roundtrip(variables, converted, module, x):
    import jax

    for col in ("params", "batch_stats"):
        flat_a = jax.tree_util.tree_leaves_with_path(variables[col])
        flat_b = jax.tree_util.tree_leaves_with_path(converted[col])
        keys_a = {jax.tree_util.keystr(k) for k, _ in flat_a}
        keys_b = {jax.tree_util.keystr(k) for k, _ in flat_b}
        assert keys_a == keys_b, (col, keys_a ^ keys_b)
        b_by_key = {jax.tree_util.keystr(k): v for k, v in flat_b}
        for k, v in flat_a:
            np.testing.assert_array_equal(
                np.asarray(v),
                np.asarray(b_by_key[jax.tree_util.keystr(k)]),
                err_msg=f"{col}:{jax.tree_util.keystr(k)}",
            )
    import jax.numpy as jnp

    jax.eval_shape(lambda v: module.apply(v, jnp.asarray(x)), converted)


@pytest.mark.parametrize(
    "variant,out_channels",
    [("full", 1), ("small", 1), ("full", 4)],
    ids=["u2net", "u2netp", "cloth_seg"],
)
def test_u2net_family_conversion_roundtrip(variant, out_channels):
    """convert_u2net_state_dict / convert_cloth_seg_state_dict reproduce the
    exact flax tree from the torch/onnx naming (u2net, u2netp, and the
    4-class cloth-seg head share one layout)."""
    import jax
    import jax.numpy as jnp

    from sculptmate_tpu.frontend.u2net import U2Net
    from sculptmate_tpu.runtime.checkpoint import (
        convert_cloth_seg_state_dict,
        convert_u2net_state_dict,
    )

    module = U2Net(variant=variant, out_channels=out_channels)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), x)
    sd = _u2net_family_to_torch_sd(variables)
    conv = convert_cloth_seg_state_dict if out_channels > 1 else convert_u2net_state_dict
    _assert_tree_roundtrip(variables, conv(sd), module, x)


def test_isnet_conversion_roundtrip():
    """convert_isnet_state_dict reproduces the exact flax ISNet tree from the
    ISNetDIS torch/onnx naming (myrebnconv stem + REBNCONV stages + sides)."""
    import jax
    import jax.numpy as jnp

    from sculptmate_tpu.frontend.isnet import ISNet
    from sculptmate_tpu.runtime.checkpoint import convert_isnet_state_dict

    module = ISNet()
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), x)
    sd = _u2net_family_to_torch_sd(variables, plain_bnconv=("conv_in",))
    _assert_tree_roundtrip(variables, convert_isnet_state_dict(sd), module, x)


def test_every_session_registry_entry_has_weight_path():
    """Each frontend session registry entry must resolve to a (blob,
    converter) pair so shipped arches always have a weight path."""
    from sculptmate_tpu.frontend.sessions import _REGISTRY
    from sculptmate_tpu.runtime.checkpoint import _SESSION_WEIGHTS

    missing = set(_REGISTRY) - set(_SESSION_WEIGHTS)
    assert not missing, missing
