"""Pallas TPU attention kernel with optional decomposed rel-pos bias.

Motivation: SAM's 4 global encoder layers attend over 4096 tokens with a
relative-position bias (image_encoder.py:326-360). The XLA path materializes
the (heads, 4096, 4096) logits in HBM twice (bias add + softmax); this
kernel keeps each q-tile's logits in VMEM, fusing qk-matmul, bias, softmax
and pv-matmul into one pass. At N = 4096 the full K/V (2 x 4096 x 128 bf16
= 2 MB) fits VMEM, so no streaming inner loop is needed — one grid step per
(batch*head, q-tile).

The decomposed bias is supplied as precomputed rel_h (BH, N, W_k) and
rel_w (BH, N, W_k) tables (the q-projected Rh/Rw einsums); inside the kernel
the (TQ, N) logits reshape to (TQ, Hk, Wk) and the bias adds as
rel_h[:, :, None] + rel_w[:, None, :] — no gathers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[0].astype(jnp.float32)  # (TQ, D)
    k = k_ref[0].astype(jnp.float32)  # (N, D)
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q * scale, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (TQ, N)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        (p / denom).astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _attn_bias_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, eh_ref, ew_ref, o_ref, *, scale):
    """Bias add without reshapes (Mosaic rejects (TQ, N)->(TQ, hk, wk) shape
    casts): bias = rel_h @ E_h + rel_w @ E_w with constant 0/1 expansion
    matrices E_h (hk, N), E_w (wk, N) — two tiny MXU matmuls per tile."""
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q * scale, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (TQ, N)
    rh = rh_ref[0].astype(jnp.float32)  # (TQ, hk)
    rw = rw_ref[0].astype(jnp.float32)  # (TQ, wk)
    bias = jax.lax.dot_general(
        rh, eh_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(
        rw, ew_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    logits = logits + bias
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        (p / denom).astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _pad_last(x, to):
    d = x.shape[-1]
    if d == to:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, to - d)])


@functools.partial(jax.jit, static_argnames=("q_tile", "interpret"))
def flash_attention(q, k, v, q_tile: int = 256, interpret: bool = False):
    """Fused attention, (BH, N, D) layout, softmax scale D^-0.5 on true D."""
    BH, N, D = q.shape
    scale = D**-0.5
    Dp = max(128, ((D + 127) // 128) * 128)
    q = _pad_last(q, Dp)
    k = _pad_last(k, Dp)
    v = _pad_last(v, Dp)
    grid = (BH, pl.cdiv(N, q_tile))
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((BH, N, Dp), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_tile, Dp), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, N, Dp), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, N, Dp), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, q_tile, Dp), lambda b, i: (b, i, 0)),
        interpret=interpret,
    )(q, k, v)
    return out[..., :D]


@functools.partial(jax.jit, static_argnames=("hk", "wk", "q_tile", "interpret"))
def flash_attention_relpos(q, k, v, rel_h, rel_w, hk: int, wk: int, q_tile: int = 256, interpret: bool = False):
    """Fused attention + decomposed rel-pos bias.

    q, k, v: (BH, N, D) with N = hk * wk (k in row-major (kh, kw) order).
    rel_h: (BH, N, hk) bias vs key row; rel_w: (BH, N, wk) bias vs key col.
    """
    BH, N, D = q.shape
    assert N == hk * wk
    scale = D**-0.5
    Dp = max(128, ((D + 127) // 128) * 128)
    q = _pad_last(q, Dp)
    k = _pad_last(k, Dp)
    v = _pad_last(v, Dp)
    # constant 0/1 expansion matrices: E_h[i, j] = [j // wk == i],
    # E_w[i, j] = [j % wk == i]
    jn = jnp.arange(N)
    eh = (jn[None, :] // wk == jnp.arange(hk)[:, None]).astype(jnp.float32)
    ew = (jn[None, :] % wk == jnp.arange(wk)[:, None]).astype(jnp.float32)
    grid = (BH, pl.cdiv(N, q_tile))
    out = pl.pallas_call(
        functools.partial(_attn_bias_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((BH, N, Dp), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_tile, Dp), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, N, Dp), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, N, Dp), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, q_tile, hk), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, q_tile, wk), lambda b, i: (b, i, 0)),
            pl.BlockSpec((hk, N), lambda b, i: (0, 0)),
            pl.BlockSpec((wk, N), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, q_tile, Dp), lambda b, i: (b, i, 0)),
        interpret=interpret,
    )(q, k, v, rel_h, rel_w, eh, ew)
    return out[..., :D]
