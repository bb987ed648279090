"""Pallas TPU attention kernel with optional decomposed rel-pos bias.

Motivation: SAM's 4 global encoder layers attend over 4096 tokens with a
relative-position bias (image_encoder.py:326-360). The XLA path materializes
the (heads, 4096, 4096) logits in HBM twice (bias add + softmax); this
kernel streams k/v tiles through an online-softmax accumulator so the live
logits never exceed (q_tile, k_tile) in VMEM — fusing qk-matmul, bias,
softmax and pv-matmul into one pass.

v2 (round 2): the original kernel computed the full (q_tile, N) logits row
per grid step; at N=4096 that single huge dot made the Mosaic compile blow
past the remote-compile budget (ROADMAP #3). The streaming inner loop keeps
every op (q_tile, k_tile), which compiles in seconds and runs at the same
FLOPs with better VMEM locality.

The decomposed bias is supplied as precomputed rel_h (BH, N, Hk) and
rel_w (BH, N, Wk) tables (the q-projected Rh/Rw einsums); a k-tile of
`k_tile = rows_per_tile * Wk` keys covers whole key rows, so its bias is
rel_h[:, row-slice] @ E_h + rel_w @ E_w with small constant 0/1 expansion
matrices — no gathers, no lane-dim reshapes (Mosaic rejects those).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _stream_body(q, k_ref, v_ref, k_tile: int, n_k: int, bias_of=None):
    """Online-softmax accumulation over k tiles. q: (TQ, Dp) f32 pre-scaled.
    bias_of(j): optional (TQ, k_tile) f32 logit bias for tile j."""
    TQ, Dp = q.shape

    def body(j, carry):
        m, l, acc = carry
        off = j * k_tile
        kt = k_ref[0, pl.ds(off, k_tile), :].astype(jnp.float32)
        vt = v_ref[0, pl.ds(off, k_tile), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, kt, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (TQ, k_tile)
        if bias_of is not None:
            s = s + bias_of(j)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * corr + jax.lax.dot_general(
            p, vt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc_new

    init = (
        jnp.full((TQ, 1), -1e30, jnp.float32),
        jnp.zeros((TQ, 1), jnp.float32),
        jnp.zeros((TQ, Dp), jnp.float32),
    )
    m, l, acc = jax.lax.fori_loop(0, n_k, body, init)
    return acc / l


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, k_tile, n_k):
    q = q_ref[0].astype(jnp.float32) * scale  # (TQ, Dp)
    o = _stream_body(q, k_ref, v_ref, k_tile, n_k)
    o_ref[0] = o.astype(o_ref.dtype)


def _attn_bias_kernel(
    q_ref, k_ref, v_ref, rh_ref, rw_ref, eh_ref, ew_ref, o_ref,
    *, scale, k_tile, n_k,
):
    """Bias per k-tile without reshapes or lane-dim dynamic slices (Mosaic
    rejects both): bias_j = rel_h @ E_h[j] + rel_w @ E_w, where E_h[j]
    (Hk, k_tile) selects-and-expands the key rows tile j covers and E_w
    (Wk, k_tile) expands key columns — tiny constant 0/1 MXU matmuls."""
    q = q_ref[0].astype(jnp.float32) * scale
    rh = rh_ref[0].astype(jnp.float32)  # (TQ, Hk)
    rw = rw_ref[0].astype(jnp.float32)  # (TQ, Wk)
    bias_w = jax.lax.dot_general(
        rw, ew_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (TQ, k_tile) — same for every tile

    def bias_of(j):
        ehj = eh_ref[j]  # (Hk, k_tile); leading-dim dynamic index is legal
        return bias_w + jax.lax.dot_general(
            rh, ehj, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    o = _stream_body(q, k_ref, v_ref, k_tile, n_k, bias_of)
    o_ref[0] = o.astype(o_ref.dtype)


def _pad_last(x, to):
    d = x.shape[-1]
    if d == to:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, to - d)])


def _pick_k_tile(N: int, target: int = 512, multiple: int = 1) -> int:
    """Largest tile <= target that divides N and is a multiple of `multiple`."""
    kt = (target // multiple) * multiple
    while kt >= multiple:
        if N % kt == 0:
            return kt
        kt -= multiple
    return N  # no valid tiling: single full tile


@functools.partial(jax.jit, static_argnames=("q_tile", "k_tile", "interpret"))
def flash_attention(q, k, v, q_tile: int = 256, k_tile: int = 512, interpret: bool = False):
    """Fused attention, (BH, N, D) layout, softmax scale D^-0.5 on true D."""
    BH, N, D = q.shape
    scale = D**-0.5
    Dp = max(128, ((D + 127) // 128) * 128)
    q = _pad_last(q, Dp)
    k = _pad_last(k, Dp)
    v = _pad_last(v, Dp)
    kt = _pick_k_tile(N, k_tile)
    grid = (BH, pl.cdiv(N, q_tile))
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, k_tile=kt, n_k=N // kt),
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


@functools.partial(jax.jit, static_argnames=("hk", "wk", "q_tile", "k_tile", "interpret"))
def flash_attention_relpos(
    q, k, v, rel_h, rel_w, hk: int, wk: int,
    q_tile: int = 256, k_tile: int = 512, interpret: bool = False,
):
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
    # k tiles cover whole key rows so the row bias expands cleanly
    kt = _pick_k_tile(N, k_tile, multiple=wk)
    rpt = kt // wk
    n_k = N // kt
    # constant 0/1 expansions: E_h[j, r, c] = [r == j*rpt + c // wk]
    # (tile j's column c has global key row j*rpt + c//wk);
    # E_w[w, c] = [c % wk == w]
    jc = jnp.arange(kt)
    eh = (
        jnp.arange(hk)[None, :, None]
        == jnp.arange(n_k)[:, None, None] * rpt + jc[None, None, :] // wk
    ).astype(jnp.float32)  # (n_k, hk, kt)
    ew = (jc[None, :] % wk == jnp.arange(wk)[:, None]).astype(jnp.float32)
    grid = (BH, pl.cdiv(N, q_tile))
    out = pl.pallas_call(
        functools.partial(_attn_bias_kernel, scale=scale, k_tile=kt, n_k=n_k),
        out_shape=jax.ShapeDtypeStruct((BH, N, Dp), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_tile, Dp), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, N, Dp), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, N, Dp), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, q_tile, hk), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, q_tile, wk), lambda b, i: (b, i, 0)),
            pl.BlockSpec((n_k, hk, kt), lambda b, i: (0, 0, 0)),
            pl.BlockSpec((wk, kt), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, q_tile, Dp), lambda b, i: (b, i, 0)),
        interpret=interpret,
    )(q, k, v, rel_h, rel_w, eh, ew)
    return out[..., :D]
