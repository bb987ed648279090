"""Attention ops for the matcher / ViT stacks.

- ``linear_attention``: the "Transformers are RNNs" elu+1 feature-map linear
  attention used by LoFTR (reference: src/matcher/loftr_module/
  linear_attention.py:14-47). O((L+S) d^2) — two einsums that map straight
  onto the MXU; XLA fuses the feature map and normalization around them.
- ``full_attention``: softmax attention (linear_attention.py:50-81), used by
  the fine stage when configured and as the ViT fallback path.

Both take (B, N, H, D) tensors ("BNHD") and optional (B, N) validity masks
('1' = keep), mirroring the reference's q_mask/kv_mask semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _elu_p1(x):
    return jax.nn.elu(x) + 1.0


def linear_attention(q, k, v, q_mask=None, kv_mask=None, eps: float = 1e-6):
    """kv-first linear attention.

    Args:
      q: (B, L, H, D) queries.
      k, v: (B, S, H, D) keys/values.
      q_mask: optional (B, L) bool/float, 0 = padded.
      kv_mask: optional (B, S).
    Returns:
      (B, L, H, D).
    """
    Q = _elu_p1(q)
    K = _elu_p1(k)
    if q_mask is not None:
        Q = Q * q_mask[:, :, None, None].astype(Q.dtype)
    if kv_mask is not None:
        K = K * kv_mask[:, :, None, None].astype(K.dtype)
        v = v * kv_mask[:, :, None, None].astype(v.dtype)

    v_length = v.shape[1]
    v_scaled = v / v_length  # overflow guard kept for bf16 parity w/ reference
    KV = jnp.einsum("bshd,bshv->bhdv", K, v_scaled)
    K_sum = jnp.sum(K, axis=1)  # (B, H, D)
    Z = 1.0 / (jnp.einsum("blhd,bhd->blh", Q, K_sum) + eps)
    out = jnp.einsum("blhd,bhdv,blh->blhv", Q, KV, Z) * v_length
    return out


def full_attention(q, k, v, q_mask=None, kv_mask=None):
    """Softmax attention with 1/sqrt(D) scaling over (B, N, H, D) layout."""
    scale = 1.0 / (q.shape[-1] ** 0.5)
    logits = jnp.einsum("blhd,bshd->blsh", q, k) * scale
    if kv_mask is not None:
        qm = q_mask if q_mask is not None else jnp.ones(q.shape[:2], bool)
        joint = qm[:, :, None, None] & kv_mask[:, None, :, None].astype(bool)
        logits = jnp.where(joint, logits, -1e9)
    attn = jax.nn.softmax(logits, axis=2)
    return jnp.einsum("blsh,bshd->blhd", attn, v)
