"""Pallas flash attention vs XLA reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from pope_tpu.ops.flash_attention import flash_attention, flash_attention_relpos


def _ref_attn(q, k, v, bias=None):
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqd,bkd->bqk", q * scale, k).astype(jnp.float32)
    if bias is not None:
        logits = logits + bias
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p.astype(v.dtype), v)


def test_flash_attention_matches_xla(rng):
    BH, N, D = 2, 256, 80
    q = jnp.asarray(rng.normal(0, 1, (BH, N, D)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (BH, N, D)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (BH, N, D)), jnp.float32)
    out = flash_attention(q, k, v, q_tile=128, interpret=True)
    ref = _ref_attn(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_attention_relpos_matches_xla(rng):
    BH, hk, wk, D = 2, 8, 16, 64
    N = hk * wk
    q = jnp.asarray(rng.normal(0, 1, (BH, N, D)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (BH, N, D)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (BH, N, D)), jnp.float32)
    rel_h = jnp.asarray(rng.normal(0, 0.5, (BH, N, hk)), jnp.float32)
    rel_w = jnp.asarray(rng.normal(0, 0.5, (BH, N, wk)), jnp.float32)
    out = flash_attention_relpos(q, k, v, rel_h, rel_w, hk, wk, q_tile=64, interpret=True)
    bias = (rel_h[:, :, :, None] + rel_w[:, :, None, :]).reshape(BH, N, N)
    ref = _ref_attn(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_attention_relpos_window_shape(rng):
    """SAM windowed-layer shape: 14x14 windows, one 196-key tile, d=80
    (the q_tile=k_tile=N path the encoder takes for window attention)."""
    BH, hk, wk, D = 3, 14, 14, 80
    N = hk * wk
    q = jnp.asarray(rng.normal(0, 1, (BH, N, D)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (BH, N, D)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (BH, N, D)), jnp.float32)
    rel_h = jnp.asarray(rng.normal(0, 0.5, (BH, N, hk)), jnp.float32)
    rel_w = jnp.asarray(rng.normal(0, 0.5, (BH, N, wk)), jnp.float32)
    out = flash_attention_relpos(
        q, k, v, rel_h, rel_w, hk, wk, q_tile=N, k_tile=N, interpret=True
    )
    bias = (rel_h[:, :, :, None] + rel_w[:, :, None, :]).reshape(BH, N, N)
    ref = _ref_attn(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)
