"""Attention with bounded memory for long token streams.

SF3D's two-stream backbone attends over 27 648 triplane tokens
(``backbone.py:476-515``); materializing the full (heads, Nq, Nk) score
tensor at that length is ~3 GB per block and OOMs a 16 GB chip alongside the
model. ``dot_product_attention`` here picks, by score-tensor size and
backend:

1. small: the stock fused path (XLA's flash-like fusion handles it);
2. large, on TPU: the Pallas TPU flash-attention kernel
   (``jax.experimental.pallas.ops.tpu.flash_attention``) — O(Nq) memory,
   never materializes scores. Sequence lengths are padded to the kernel's
   512 blocks; padded rows/keys carry segment id 1 vs 0 for real tokens, so
   padding attends only padding (finite softmax, zero cross-talk);
3. large, elsewhere: a query-chunked computation (``lax.map`` over query
   blocks, scores bounded to ~128 MB).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# chunk queries so heads * q_chunk * Nk * 4B stays near this budget
_SCORE_BYTES_BUDGET = 128 * 1024 * 1024
_FUSED_LIMIT = 32 * 1024 * 1024  # elements in the score tensor
_FLASH_BLOCK = 512


def _flash_attention(q, k, v):
    """Pallas TPU flash attention on (B, Nq, H, D) layout inputs, or None
    if unavailable for this backend/shape."""
    import os

    if jax.default_backend() == "cpu" or os.environ.get(
        "SCULPTMATE_DISABLE_FLASH"
    ):
        return None
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes,
            SegmentIds,
            flash_attention,
        )
    except Exception:  # noqa: BLE001
        return None

    B, Nq, H, D = q.shape
    Nk = k.shape[1]
    Nqp = -(-Nq // _FLASH_BLOCK) * _FLASH_BLOCK
    Nkp = -(-Nk // _FLASH_BLOCK) * _FLASH_BLOCK

    qt = jnp.swapaxes(q, 1, 2)  # (B, H, Nq, D)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    if Nqp != Nq:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, Nqp - Nq), (0, 0)))
    if Nkp != Nk:
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, Nkp - Nk), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, Nkp - Nk), (0, 0)))

    seg = None
    if Nqp != Nq or Nkp != Nk:
        q_seg = (jnp.arange(Nqp) >= Nq).astype(jnp.int32)[None, :]
        kv_seg = (jnp.arange(Nkp) >= Nk).astype(jnp.int32)[None, :]
        seg = SegmentIds(
            q=jnp.broadcast_to(q_seg, (B, Nqp)),
            kv=jnp.broadcast_to(kv_seg, (B, Nkp)),
        )

    blk = BlockSizes(
        block_q=min(_FLASH_BLOCK, Nqp),
        block_k_major=min(_FLASH_BLOCK, Nkp),
        block_k=min(_FLASH_BLOCK, Nkp),
        block_b=1,
    )
    scale = 1.0 / float(D) ** 0.5
    try:
        out = flash_attention(
            qt, kt, vt, segment_ids=seg, sm_scale=scale, block_sizes=blk
        )
    except Exception:  # noqa: BLE001 — unsupported shape/dtype: fall back
        return None
    return jnp.swapaxes(out[:, :, :Nq], 1, 2)


def dot_product_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, allow_flash: bool = True
) -> jnp.ndarray:
    """q (B, Nq, H, D), k/v (B, Nk, H, D) -> (B, Nq, H, D).

    ``allow_flash=False`` disables the Pallas kernel — callers under
    tensor-parallel sharding constraints must pass it (GSPMD cannot
    partition the custom call; the chunked path shards fine)."""
    B, Nq, H, D = q.shape
    Nk = k.shape[1]
    if B * H * Nq * Nk <= _FUSED_LIMIT:
        return jax.nn.dot_product_attention(q, k, v)

    if allow_flash:
        flash = _flash_attention(q, k, v)
        if flash is not None:
            return flash

    q_chunk = max(128, _SCORE_BYTES_BUDGET // max(B * H * Nk * 4, 1))
    q_chunk = min(q_chunk, Nq)
    # pad the query length to a chunk multiple (never shrink the chunk: a
    # prime Nq like SF3D's 3089 latents would otherwise degrade to chunk=1)
    Nq_pad = -(-Nq // q_chunk) * q_chunk

    scale = 1.0 / jnp.sqrt(jnp.asarray(D, jnp.float32)).astype(q.dtype)
    kt = jnp.swapaxes(k, 1, 2)  # (B, H, Nk, D)
    vt = jnp.swapaxes(v, 1, 2)
    qt = jnp.swapaxes(q, 1, 2)  # (B, H, Nq, D)
    if Nq_pad != Nq:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, Nq_pad - Nq), (0, 0)))
    qt = qt.reshape(B, H, Nq_pad // q_chunk, q_chunk, D)
    qt = jnp.moveaxis(qt, 2, 0)  # (n_chunks, B, H, q_chunk, D)

    def one(q_blk):
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", q_blk * scale, kt, preferred_element_type=jnp.float32
        )
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", p, vt)

    out = jax.lax.map(one, qt)  # (n_chunks, B, H, q_chunk, D)
    out = jnp.moveaxis(out, 0, 2).reshape(B, H, Nq_pad, D)[:, :, :Nq]
    return jnp.swapaxes(out, 1, 2)
