"""Chunked long-sequence attention must match the fused path."""

import numpy as np
import jax.numpy as jnp

import sculptmate_tpu.ops.attention as attn_mod
from sculptmate_tpu.ops.attention import dot_product_attention


def test_chunked_matches_fused(rng, monkeypatch):
    import jax

    B, H, D = 1, 4, 16
    Nq, Nk = 512, 96
    q = jnp.asarray(rng.standard_normal((B, Nq, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Nk, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Nk, H, D)), jnp.float32)

    ref = np.asarray(jax.nn.dot_product_attention(q, k, v))
    # force the chunked path
    monkeypatch.setattr(attn_mod, "_FUSED_LIMIT", 1)
    monkeypatch.setattr(attn_mod, "_SCORE_BYTES_BUDGET", H * Nk * 4 * 128)
    got = np.asarray(dot_product_attention(q, k, v))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_non_divisible_chunk(rng, monkeypatch):
    import jax

    B, H, D = 1, 2, 8
    Nq, Nk = 300, 50  # 300 not a power of two; chunk divisor search must work
    q = jnp.asarray(rng.standard_normal((B, Nq, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Nk, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Nk, H, D)), jnp.float32)
    ref = np.asarray(jax.nn.dot_product_attention(q, k, v))
    monkeypatch.setattr(attn_mod, "_FUSED_LIMIT", 1)
    monkeypatch.setattr(attn_mod, "_SCORE_BYTES_BUDGET", H * Nk * 4 * 140)
    got = np.asarray(dot_product_attention(q, k, v))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
