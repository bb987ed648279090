"""Sinusoidal 2-D position encoding and the LoFTR transformer stages (flax).

Behavioral spec: src/matcher/utils/position_encoding.py:6-42 (including the
`temp_bug_fix=False` frequency formula the released indoor weights were
trained with), src/matcher/loftr_module/transformer.py:7-106 (pre-projection
multi-head attention with concat-MLP FFN and two LayerNorms, interleaved
self/cross layers).
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from pope_tpu.ops.attention import full_attention, linear_attention


def sine_position_encoding(h: int, w: int, d_model: int, temp_bug_fix: bool = False):
    """(h, w, d_model) 2-D sinusoidal encoding.

    Channel layout: [0::4]=sin(x f), [1::4]=cos(x f), [2::4]=sin(y f),
    [3::4]=cos(y f) with 1-indexed positions. When temp_bug_fix is False the
    frequency is exp(arange(0, d/2, 2) * ((-log(1e4) / d) // 2)) — the
    reference's operator-precedence bug, reproduced exactly because the
    released weights bake it in (position_encoding.py:27-30).
    """
    n_freq = d_model // 4
    k = jnp.arange(0, d_model // 2, 2, dtype=jnp.float32)  # (n_freq,)
    if temp_bug_fix:
        div_term = jnp.exp(k * (-math.log(10000.0) / (d_model // 2)))
    else:
        div_term = jnp.exp(k * (-math.log(10000.0) / d_model // 2))
    y = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None, None]  # 1-indexed
    x = jnp.arange(1, w + 1, dtype=jnp.float32)[None, :, None]
    f = div_term[None, None, :]
    pe = jnp.zeros((h, w, d_model), jnp.float32)
    pe = pe.at[:, :, 0::4].set(jnp.broadcast_to(jnp.sin(x * f), (h, w, n_freq)))
    pe = pe.at[:, :, 1::4].set(jnp.broadcast_to(jnp.cos(x * f), (h, w, n_freq)))
    pe = pe.at[:, :, 2::4].set(jnp.broadcast_to(jnp.sin(y * f), (h, w, n_freq)))
    pe = pe.at[:, :, 3::4].set(jnp.broadcast_to(jnp.cos(y * f), (h, w, n_freq)))
    return pe


class LoFTREncoderLayer(nn.Module):
    """One attention + concat-MLP block (transformer.py:7-58).

    out = x + LN2(MLP(cat[x, LN1(merge(attn(q, k, v)))]))
    """

    d_model: int
    nhead: int
    attention: str = "linear"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, source, x_mask=None, source_mask=None):
        B, L, C = x.shape
        S = source.shape[1]
        head_dim = self.d_model // self.nhead
        dense = lambda name: nn.Dense(self.d_model, use_bias=False, dtype=self.dtype, name=name)
        q = dense("q_proj")(x).reshape(B, L, self.nhead, head_dim)
        k = dense("k_proj")(source).reshape(B, S, self.nhead, head_dim)
        v = dense("v_proj")(source).reshape(B, S, self.nhead, head_dim)
        attn = linear_attention if self.attention == "linear" else full_attention
        msg = attn(q, k, v, q_mask=x_mask, kv_mask=source_mask)
        msg = dense("merge")(msg.reshape(B, L, self.d_model))
        msg = nn.LayerNorm(dtype=jnp.float32, name="norm1")(msg)
        msg = jnp.concatenate([x, msg], axis=-1)
        msg = nn.Dense(2 * self.d_model, use_bias=False, dtype=self.dtype, name="mlp1")(msg)
        msg = nn.relu(msg)
        msg = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype, name="mlp2")(msg)
        msg = nn.LayerNorm(dtype=jnp.float32, name="norm2")(msg)
        return x + msg


class LocalFeatureTransformer(nn.Module):
    """Interleaved self/cross attention over two token sets
    (transformer.py:61-106)."""

    d_model: int
    nhead: int
    layer_names: Sequence[str] = ("self", "cross")
    attention: str = "linear"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat0, feat1, mask0=None, mask1=None):
        for i, name in enumerate(self.layer_names):
            layer = LoFTREncoderLayer(
                self.d_model, self.nhead, self.attention, self.dtype, name=f"layer_{i}"
            )
            if name == "self":
                feat0 = layer(feat0, feat0, mask0, mask0)
                feat1 = layer(feat1, feat1, mask1, mask1)
            elif name == "cross":
                feat0 = layer(feat0, feat1, mask0, mask1)
                feat1 = layer(feat1, feat0, mask1, mask0)
            else:
                raise KeyError(name)
        return feat0, feat1
