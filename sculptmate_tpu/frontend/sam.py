"""Segment Anything (SAM) in flax — the prompt-driven matting session.

Replaces the reference's ONNX encoder/decoder pair
(``rembg/sessions/sam.py:133-330``): ViT image encoder with windowed
attention + relative position bias, point/box prompt encoder with random
Fourier positional encoding, and the two-way-transformer mask decoder with
hypernetwork output heads (Kirillov et al., Segment Anything).

The session surface matches rembg's: ``predict(img, sam_prompt=[...])`` with
a JSON prompt of ``{"type": "point"|"rectangle", "data": [...], "label": 0|1}``
entries, returning one mask resized to the input.

Defaults are the ViT-B variant; the encoder is size-configurable.
"""

from __future__ import annotations

import json
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image
from PIL.Image import Image as PILImage

IMG_SIZE = 1024
EMBED_GRID = 64  # IMG_SIZE / 16
PROMPT_DIM = 256


# ---------------------------------------------------------------------------
# image encoder (ViT-det style)

def _window_partition(x, ws):
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(-1, ws, ws, C)


def _window_unpartition(w, ws, H, W):
    B = w.shape[0] // (H // ws * W // ws)
    x = w.reshape(B, H // ws, W // ws, ws, ws, -1)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(B, H, W, -1)


def _rel_pos_bias(rel_h, rel_w, q, H, W):
    """Decomposed relative position bias (ViT-det): returns (B*, H*W, H*W)."""
    Bn, N, C = q.shape
    q2 = q.reshape(Bn, H, W, C)
    rh = jnp.einsum("bhwc,hkc->bhwk", q2, rel_h)  # (B, H, W, H)
    rw = jnp.einsum("bhwc,wkc->bhwk", q2, rel_w)  # (B, H, W, W)
    bias = rh[:, :, :, :, None] + rw[:, :, :, None, :]  # (B, H, W, H, W)
    return bias.reshape(Bn, H * W, H * W)


def _get_rel_pos(size, rel_pos):
    """Slice/interp the (2*maxsize-1, head_dim) table to (size, size, C)."""
    needed = 2 * size - 1
    if rel_pos.shape[0] != needed:
        rel_pos = jax.image.resize(
            rel_pos, (needed, rel_pos.shape[1]), method="linear"
        )
    coords = jnp.arange(size)[:, None] - jnp.arange(size)[None, :] + size - 1
    return rel_pos[coords]  # (size, size, C)


class SAMAttention(nn.Module):
    dim: int
    num_heads: int
    input_size: int  # tokens per side this block sees
    use_rel_pos: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C) -> same."""
        B, H, W, C = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, H * W, 3, self.num_heads, head_dim)
        q, k, v = (
            jnp.transpose(qkv[:, :, i], (0, 2, 1, 3)).reshape(
                B * self.num_heads, H * W, head_dim
            )
            for i in range(3)
        )
        scale = head_dim**-0.5
        attn = (q * scale) @ jnp.swapaxes(k, 1, 2)  # (B*h, N, N)
        if self.use_rel_pos:
            rel_h = self.param(
                "rel_pos_h",
                nn.initializers.zeros,
                (2 * self.input_size - 1, head_dim),
                jnp.float32,
            )
            rel_w = self.param(
                "rel_pos_w",
                nn.initializers.zeros,
                (2 * self.input_size - 1, head_dim),
                jnp.float32,
            )
            Rh = _get_rel_pos(H, rel_h).astype(q.dtype)
            Rw = _get_rel_pos(W, rel_w).astype(q.dtype)
            attn = attn + _rel_pos_bias(Rh, Rw, q, H, W)
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).reshape(B, self.num_heads, H * W, head_dim)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, H, W, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class SAMBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int  # 0 = global
    grid: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        if self.window_size > 0:
            H = W = self.grid
            hw = _window_partition(h, self.window_size)
            hw = SAMAttention(
                self.dim, self.num_heads, self.window_size, dtype=self.dtype, name="attn"
            )(hw)
            h = _window_unpartition(hw, self.window_size, H, W)
        else:
            h = SAMAttention(
                self.dim, self.num_heads, self.grid, dtype=self.dtype, name="attn"
            )(h)
        x = x + h
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(self.dim * 4, dtype=self.dtype, name="mlp_lin1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, name="mlp_lin2")(h)
        return x + h


class SAMImageEncoder(nn.Module):
    """ViT-det encoder -> (B, 64, 64, 256) image embedding."""

    embed_dim: int = 768  # ViT-B
    depth: int = 12
    num_heads: int = 12
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, 1024, 1024, 3) normalized."""
        B = x.shape[0]
        grid = x.shape[1] // 16
        x = nn.Conv(
            self.embed_dim, (16, 16), strides=(16, 16), padding="VALID",
            dtype=self.dtype, name="patch_embed",
        )(x)  # (B, 64, 64, C)
        pos = self.param(
            "pos_embed", nn.initializers.zeros, (1, grid, grid, self.embed_dim),
            jnp.float32,
        )
        x = x + pos.astype(x.dtype)
        # pad windowed blocks to a multiple of window size
        pad = (-grid) % self.window_size
        for i in range(self.depth):
            ws = 0 if i in self.global_attn_indexes else self.window_size
            if ws and pad:
                xp = jnp.pad(x, ((0, 0), (0, pad), (0, pad), (0, 0)))
                xp = SAMBlock(
                    self.embed_dim, self.num_heads, ws, grid + pad,
                    dtype=self.dtype, name=f"block_{i}",
                )(xp)
                x = xp[:, :grid, :grid]
            else:
                x = SAMBlock(
                    self.embed_dim, self.num_heads, ws, grid,
                    dtype=self.dtype, name=f"block_{i}",
                )(x)
        # neck: 1x1 conv -> LN -> 3x3 conv -> LN, 256 channels
        x = nn.Conv(PROMPT_DIM, (1, 1), use_bias=False, dtype=self.dtype, name="neck_conv1")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="neck_ln1")(x)
        x = nn.Conv(PROMPT_DIM, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="neck_conv2")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="neck_ln2")(x)
        return x


# ---------------------------------------------------------------------------
# prompt encoder

class PromptEncoder(nn.Module):
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        # random Fourier positional encoding matrix
        self.pe_gaussian = self.param(
            "pe_gaussian", nn.initializers.normal(1.0), (2, PROMPT_DIM // 2), jnp.float32
        )
        # 0: negative point, 1: positive point, 2: box corner 1, 3: box corner 2
        self.point_embeddings = self.param(
            "point_embeddings", nn.initializers.normal(1.0), (4, PROMPT_DIM), jnp.float32
        )
        self.not_a_point = self.param(
            "not_a_point", nn.initializers.normal(1.0), (1, PROMPT_DIM), jnp.float32
        )
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (1, PROMPT_DIM), jnp.float32
        )

    def pe_encode(self, coords01):
        """coords01 (..., 2) in [0,1] -> (..., 256)."""
        c = (2.0 * coords01 - 1.0) @ self.pe_gaussian  # (..., 128)
        c = 2.0 * jnp.pi * c
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)

    def dense_pe(self, grid: int):
        g = (jnp.arange(grid, dtype=jnp.float32) + 0.5) / grid
        yy, xx = jnp.meshgrid(g, g, indexing="ij")
        return self.pe_encode(jnp.stack([xx, yy], -1))  # (grid, grid, 256)

    def __call__(self, point_coords, point_labels):
        """point_coords (B, N, 2) in pixels of the 1024 frame; labels (B, N):
        1 pos, 0 neg, 2/3 box corners, -1 pad. Returns sparse (B, N, 256)."""
        coords01 = point_coords / IMG_SIZE
        pe = self.pe_encode(coords01)
        emb = pe
        lbl = point_labels[..., None]
        emb = jnp.where(lbl == -1, self.not_a_point[0], emb)
        for code, idx in ((0, 0), (1, 1), (2, 2), (3, 3)):
            emb = jnp.where(lbl == code, emb + self.point_embeddings[idx], emb)
        return emb


# ---------------------------------------------------------------------------
# mask decoder (two-way transformer)

class TwoWayAttention(nn.Module):
    dim: int = PROMPT_DIM
    num_heads: int = 8
    downsample: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q_in, k_in, v_in):
        inner = self.dim // self.downsample
        hd = inner // self.num_heads
        q = nn.Dense(inner, dtype=self.dtype, name="q_proj")(q_in)
        k = nn.Dense(inner, dtype=self.dtype, name="k_proj")(k_in)
        v = nn.Dense(inner, dtype=self.dtype, name="v_proj")(v_in)
        B, Nq, _ = q.shape
        Nk = k.shape[1]
        q = q.reshape(B, Nq, self.num_heads, hd)
        k = k.reshape(B, Nk, self.num_heads, hd)
        v = v.reshape(B, Nk, self.num_heads, hd)
        out = jax.nn.dot_product_attention(q, k, v).reshape(B, Nq, inner)
        return nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(out)


class TwoWayBlock(nn.Module):
    skip_first_pe: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, q_pe, k_pe):
        if self.skip_first_pe:
            q = TwoWayAttention(dtype=self.dtype, name="self_attn")(queries, queries, queries)
        else:
            qq = queries + q_pe
            q = TwoWayAttention(dtype=self.dtype, name="self_attn")(qq, qq, queries)
        queries = nn.LayerNorm(dtype=self.dtype, name="norm1")(queries + q)

        a = TwoWayAttention(downsample=2, dtype=self.dtype, name="cross_t2i")(
            queries + q_pe, keys + k_pe, keys
        )
        queries = nn.LayerNorm(dtype=self.dtype, name="norm2")(queries + a)

        h = nn.Dense(2048, dtype=self.dtype, name="mlp_lin1")(queries)
        h = jax.nn.relu(h)
        h = nn.Dense(PROMPT_DIM, dtype=self.dtype, name="mlp_lin2")(h)
        queries = nn.LayerNorm(dtype=self.dtype, name="norm3")(queries + h)

        a = TwoWayAttention(downsample=2, dtype=self.dtype, name="cross_i2t")(
            keys + k_pe, queries + q_pe, queries
        )
        keys = nn.LayerNorm(dtype=self.dtype, name="norm4")(keys + a)
        return queries, keys


class MaskDecoder(nn.Module):
    num_mask_tokens: int = 4  # iou token handled separately
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embedding, image_pe, sparse_prompt):
        """image_embedding (B, G, G, 256); image_pe (G, G, 256);
        sparse_prompt (B, Np, 256). Returns (masks (B, M, 4G, 4G),
        iou_pred (B, M))."""
        B, G, _, C = image_embedding.shape
        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, C), jnp.float32)
        mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(1.0), (self.num_mask_tokens, C), jnp.float32
        )
        tokens = jnp.concatenate(
            [
                jnp.broadcast_to(iou_token[None], (B, 1, C)),
                jnp.broadcast_to(mask_tokens[None], (B, self.num_mask_tokens, C)),
                sparse_prompt,
            ],
            axis=1,
        ).astype(image_embedding.dtype)

        keys = image_embedding.reshape(B, G * G, C)
        k_pe = image_pe.reshape(1, G * G, C).astype(keys.dtype)
        queries = tokens
        q_pe = tokens

        for i in range(2):
            queries, keys = TwoWayBlock(
                skip_first_pe=(i == 0), dtype=self.dtype, name=f"block_{i}"
            )(queries, keys, q_pe, k_pe)
        a = TwoWayAttention(downsample=2, dtype=self.dtype, name="final_attn")(
            queries + q_pe, keys + k_pe, keys
        )
        queries = nn.LayerNorm(dtype=self.dtype, name="final_norm")(queries + a)

        iou_out = queries[:, 0]
        mask_out = queries[:, 1 : 1 + self.num_mask_tokens]

        # upscale image features 4x
        src = keys.reshape(B, G, G, C)
        up = nn.ConvTranspose(C // 4, (2, 2), strides=(2, 2), dtype=self.dtype, name="upscale1")(src)
        up = nn.LayerNorm(dtype=self.dtype, name="upscale_ln")(up)
        up = jax.nn.gelu(up, approximate=False)
        up = nn.ConvTranspose(C // 8, (2, 2), strides=(2, 2), dtype=self.dtype, name="upscale2")(up)
        up = jax.nn.gelu(up, approximate=False)  # (B, 4G, 4G, C/8)

        # hypernetwork MLPs per mask token
        hyper = []
        for m in range(self.num_mask_tokens):
            h = mask_out[:, m]
            for li, width in enumerate((C, C, C // 8)):
                h = nn.Dense(width, dtype=self.dtype, name=f"hyper_{m}_lin{li}")(h)
                if li < 2:
                    h = jax.nn.relu(h)
            hyper.append(h)
        hyper = jnp.stack(hyper, axis=1)  # (B, M, C/8)
        masks = jnp.einsum("bmc,bhwc->bmhw", hyper, up)

        iou = iou_out
        for li, width in enumerate((C, C, self.num_mask_tokens)):
            iou = nn.Dense(width, dtype=self.dtype, name=f"iou_lin{li}")(iou)
            if li < 2:
                iou = jax.nn.relu(iou)
        return masks, iou


class Sam(nn.Module):
    encoder_embed_dim: int = 768
    encoder_depth: int = 12
    encoder_heads: int = 12
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.image_encoder = SAMImageEncoder(
            embed_dim=self.encoder_embed_dim,
            depth=self.encoder_depth,
            num_heads=self.encoder_heads,
            dtype=self.dtype,
        )
        self.prompt_encoder = PromptEncoder(dtype=self.dtype)
        self.mask_decoder = MaskDecoder(dtype=self.dtype)

    def encode(self, image):
        return self.image_encoder(image)

    def decode(self, image_embedding, point_coords, point_labels):
        G = image_embedding.shape[1]
        sparse = self.prompt_encoder(point_coords, point_labels)
        pe = self.prompt_encoder.dense_pe(G)
        return self.mask_decoder(image_embedding, pe, sparse)

    def __call__(self, image, point_coords, point_labels):
        emb = self.encode(image)
        return self.decode(emb, point_coords, point_labels)


# ---------------------------------------------------------------------------
# session

_SAM_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
_SAM_STD = np.array([58.395, 57.12, 57.375], np.float32)


def get_input_points(prompt) -> Tuple[np.ndarray, np.ndarray]:
    """Parse rembg's JSON prompt schema (``sessions/sam.py``): points and
    rectangles (boxes become two corner points labeled 2/3)."""
    if isinstance(prompt, str):
        prompt = json.loads(prompt)
    points: List[Sequence[float]] = []
    labels: List[int] = []
    for mark in prompt:
        if mark["type"] == "point":
            points.append(mark["data"])
            labels.append(int(mark.get("label", 1)))
        elif mark["type"] == "rectangle":
            x1, y1, x2, y2 = mark["data"]
            points.append([x1, y1])
            points.append([x2, y2])
            labels.extend([2, 3])
    if not points:
        raise ValueError("sam_prompt must contain at least one point or rectangle")
    return np.asarray(points, np.float32), np.asarray(labels, np.int32)


class SamSession:
    """Prompt-driven segmentation session (rembg `sam` equivalent)."""

    def __init__(self, params=None, seed: int = 0, variant: str = "vit_b"):
        sizes = {"vit_b": (768, 12, 12), "vit_l": (1024, 24, 16), "vit_h": (1280, 32, 16)}
        dim, depth, heads = sizes[variant]
        self.module = Sam(encoder_embed_dim=dim, encoder_depth=depth, encoder_heads=heads)
        if params is None:
            from sculptmate_tpu.runtime.checkpoint import try_load_sam_params

            params = try_load_sam_params(variant)
        if params is None:
            dummy_img = jnp.zeros((1, IMG_SIZE, IMG_SIZE, 3), jnp.float32)
            dummy_pts = jnp.zeros((1, 2, 2), jnp.float32)
            dummy_lbl = jnp.zeros((1, 2), jnp.int32)
            from sculptmate_tpu.runtime.init import jitted_init

            params = jitted_init(
                self.module, seed, dummy_img, dummy_pts, dummy_lbl
            )
        self.variables = params
        self._encode = jax.jit(
            lambda vars_, img: self.module.apply(vars_, img, method=Sam.encode)
        )
        self._decode = jax.jit(
            lambda vars_, emb, pts, lbl: self.module.apply(
                vars_, emb, pts, lbl, method=Sam.decode
            )
        )

    def predict(self, img: PILImage, *args, **kwargs) -> List[PILImage]:
        prompt = kwargs.get("sam_prompt", "[]")
        points, labels = get_input_points(prompt)

        rgb = img.convert("RGB")
        w0, h0 = rgb.size
        scale = IMG_SIZE / max(w0, h0)
        nw, nh = int(round(w0 * scale)), int(round(h0 * scale))
        resized = rgb.resize((nw, nh), Image.Resampling.BILINEAR)
        canvas = np.zeros((IMG_SIZE, IMG_SIZE, 3), np.float32)
        canvas[:nh, :nw] = np.asarray(resized, np.float32)
        canvas = (canvas - _SAM_MEAN) / _SAM_STD

        emb = self._encode(self.variables, jnp.asarray(canvas[None]))

        pts = np.concatenate([points * scale, [[0.0, 0.0]]], axis=0)[None]
        lbl = np.concatenate([labels, [-1]])[None]
        masks, iou = self._decode(
            self.variables, emb, jnp.asarray(pts, jnp.float32), jnp.asarray(lbl, jnp.int32)
        )
        best = int(np.argmax(np.asarray(iou)[0]))
        m = np.asarray(masks)[0, best]  # (256, 256) logits
        mask_img = Image.fromarray(((m > 0) * 255).astype(np.uint8), mode="L")
        mask_full = mask_img.resize((IMG_SIZE, IMG_SIZE), Image.Resampling.BILINEAR)
        mask_crop = mask_full.crop((0, 0, nw, nh)).resize(
            (w0, h0), Image.Resampling.LANCZOS
        )
        return [mask_crop]

    def predict_mask(self, image: PILImage) -> PILImage:
        # center-box prompt when used as a generic matting session
        w, h = image.size
        prompt = [
            {"type": "rectangle", "data": [0.05 * w, 0.05 * h, 0.95 * w, 0.95 * h]}
        ]
        return self.predict(image, sam_prompt=json.dumps(prompt))[0]
