"""Attention with bounded memory for long token streams.

SF3D's two-stream backbone attends over 27 648 triplane tokens
(``backbone.py:476-515``); materializing the full (heads, Nq, Nk) score
tensor at that length is ~3 GB per block and OOMs a 16 GB chip alongside the
model. ``dot_product_attention`` here switches to a query-chunked
computation (``lax.map`` over query blocks, scores bounded to ~128 MB) when
the score tensor would be large; small sequences use the stock fused path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# chunk queries so heads * q_chunk * Nk * 4B stays near this budget
_SCORE_BYTES_BUDGET = 128 * 1024 * 1024
_FUSED_LIMIT = 32 * 1024 * 1024  # elements in the score tensor


def dot_product_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """q (B, Nq, H, D), k/v (B, Nk, H, D) -> (B, Nq, H, D)."""
    B, Nq, H, D = q.shape
    Nk = k.shape[1]
    if B * H * Nq * Nk <= _FUSED_LIMIT:
        return jax.nn.dot_product_attention(q, k, v)

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
