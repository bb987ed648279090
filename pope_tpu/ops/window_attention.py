"""Fused Pallas kernel for SAM's windowed attention (round-5 traffic work).

Behavioral spec: segment_anything/modeling/image_encoder.py:187-239
(`Attention.forward`) + :326-360 (`add_decomposed_rel_pos`) for the
window_size=14 layers — the same math `_attention_with_rel_pos`'s einsum
path computes (models/sam/encoder.py:97-109).

Motivation (per-buffer HBM audit, scripts/buffer_audit.py): the windowed
blocks dominate the shipped AMG program's traffic, and most of it is pure
data movement around a tiny (196x196)-per-head attention: a {1,2,0} layout
copy of the qkv Dense output (7.1 GB/dispatch), the (BW, N, 3, nh, d)
reshape copy (6.7 GB) + q/k/v slices (3.4 GB), the materialized logits
einsum (8.9 GB) and its layout copies (5.5 + 2.75 GB), and the attn-out
einsum intermediates (6.1 GB). A previous attention-only Pallas attempt
LOST (encoder.py:99-101): feeding a (BH, N, D) kernel forced exactly the
q/k/v layout copies the einsum path avoids.

This kernel dodges that by consuming the qkv tensor in the layout the
Dense already produces — (BW, N, 3C) — and slicing per-head columns
in VMEM, where the "copy" is a register relayout instead of an HBM
round-trip. Per grid step (one 196-token window) everything lives in
VMEM: qkv tile 1.5 MB bf16, per-head f32 logits 154 KB, output 0.5 MB.
HBM traffic per windowed block drops from ~1.4 GB to ~0.2 GB (qkv read +
small rel tables + output write).

The decomposed rel-pos bias enters as precomputed rel_h/rel_w tables
(BW, nh, N, 14) — tiny MXU einsums OUTSIDE the kernel (XLA fuses the
q-slice into them; the (N, N)-shaped bias itself never materializes) —
expanded in-kernel to (N, N) with constant 0/1 expansion matmuls, the
same gather-free construction flash_attention_relpos uses.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _window_attn_kernel(qkv_ref, rh_ref, rw_ref, eh_ref, ew_ref, o_ref,
                        *, nh: int, d: int, scale: float):
    qkv = qkv_ref[0]  # (N, 3C)
    C = nh * d
    eh = eh_ref[:]  # (hk, N) f32
    ew = ew_ref[:]  # (wk, N) f32
    outs = []
    for h in range(nh):
        q = qkv[:, h * d:(h + 1) * d].astype(jnp.float32)
        k = qkv[:, C + h * d:C + (h + 1) * d].astype(jnp.float32)
        v = qkv[:, 2 * C + h * d:2 * C + (h + 1) * d]
        s = jax.lax.dot_general(
            q * scale, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (N, N)
        # bias[q, k] = rel_h[q, k // wk] + rel_w[q, k % wk]
        s = s + jax.lax.dot_general(
            rh_ref[0, h].astype(jnp.float32), eh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s + jax.lax.dot_general(
            rw_ref[0, h].astype(jnp.float32), ew, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (N, d)
        outs.append(o.astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=-1)


@functools.partial(
    jax.jit, static_argnames=("nh", "d", "hk", "wk", "interpret")
)
def windowed_attention_relpos(qkv, rel_h, rel_w, nh: int, d: int,
                              hk: int, wk: int, interpret: bool = False):
    """Fused windowed attention + decomposed rel-pos bias.

    qkv:   (BW, N, 3*nh*d) — the qkv Dense output, untouched ([q | k | v]
           blocks of nh*d columns each, head h at columns h*d:(h+1)*d).
    rel_h: (BW, nh, N, hk) — q-projected row-bias table (q . Rh).
    rel_w: (BW, nh, N, wk) — q-projected col-bias table (q . Rw).
    Keys are row-major over the (hk, wk) window grid, N = hk * wk.
    Returns (BW, N, nh*d) in qkv.dtype — the `proj` Dense input layout.
    """
    BW, N, C3 = qkv.shape
    C = nh * d
    assert C3 == 3 * C and N == hk * wk, (qkv.shape, nh, d, hk, wk)
    scale = d ** -0.5
    karr = jnp.arange(N)
    eh = (karr[None, :] // wk == jnp.arange(hk)[:, None]).astype(jnp.float32)
    ew = (karr[None, :] % wk == jnp.arange(wk)[:, None]).astype(jnp.float32)
    return pl.pallas_call(
        functools.partial(_window_attn_kernel, nh=nh, d=d, scale=scale),
        out_shape=jax.ShapeDtypeStruct((BW, N, C), qkv.dtype),
        grid=(BW,),
        in_specs=[
            pl.BlockSpec((1, N, C3), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, nh, N, hk), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, nh, N, wk), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((hk, N), lambda b: (0, 0)),
            pl.BlockSpec((wk, N), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, N, C), lambda b: (b, 0, 0)),
        interpret=interpret,
    )(qkv, rel_h, rel_w, eh, ew)
