"""On-chip A/B: einsum windowed attention (shipped) vs the fused Pallas
kernel (ops/window_attention.py) at production vit_h rect-eval shapes
(B=4 x 20 windows, N=196, 16 heads x 80).

Both arms include the qkv projection matmul (identical work) so the delta
isolates what the kernel changes: the qkv reshape/slice dance, the
materialized (N, N) logits + bias and their layout copies, and the
attn-out einsum intermediates — ~40 GB/dispatch by the per-buffer audit.

Measured via chained-apply slopes with scalar readback (the round-2
tunnel-measurement discipline). Run: python scripts/ab_window_attn.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from pope_tpu.ops.window_attention import windowed_attention_relpos

BW, N, NH, D = 80, 196, 16, 80
C = NH * D
HW = 14


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((BW, N, C)).astype(np.float32), jnp.bfloat16)
    wqkv = jnp.asarray(rng.standard_normal((C, 3 * C)).astype(np.float32) * 0.02, jnp.bfloat16)
    bqkv = jnp.zeros((3 * C,), jnp.bfloat16)
    rel = jnp.asarray(rng.standard_normal((2 * HW - 1, D)).astype(np.float32) * 0.02)
    center = HW - 1
    idx = jnp.arange(HW)[:, None] - jnp.arange(HW)[None, :] + center
    R = rel[idx]  # (HW, HW, D)
    return x, wqkv, bqkv, R


def einsum_arm(x, weights, R):
    wqkv, bqkv = weights
    qkv = (x @ wqkv + bqkv).reshape(BW, N, 3, NH, D)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    r_q = q.reshape(BW, HW, HW, NH, D)
    rel_h = jnp.einsum("bhwnc,hkc->bnhwk", r_q, R.astype(q.dtype))
    rel_w = jnp.einsum("bhwnc,wkc->bnhwk", r_q, R.astype(q.dtype))
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * (D**-0.5), k)
    bias = (rel_h[..., :, None] + rel_w[..., None, :]).reshape(BW, NH, N, N)
    attn = jax.nn.softmax(
        (logits + bias.astype(logits.dtype)).astype(jnp.float32), axis=-1
    ).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
    return out.reshape(BW, N, C)


def kernel_arm(x, weights, R):
    wqkv, bqkv = weights
    qkv = x @ wqkv + bqkv  # (BW, N, 3C), untouched
    Rb = R.astype(x.dtype)
    q4 = qkv[..., :C].reshape(BW, HW, HW, NH, D)
    rel_h = jnp.einsum("bhwnc,hkc->bnhwk", q4, Rb).reshape(BW, NH, N, HW)
    rel_w = jnp.einsum("bhwnc,wkc->bnhwk", q4, Rb).reshape(BW, NH, N, HW)
    return windowed_attention_relpos(qkv, rel_h, rel_w, NH, D, HW, HW)


def slope(fn, x, weights, R, reps=5, trials=6):
    def chain(n):
        def f(xx):
            y = xx
            for _ in range(n):
                y = fn(y, weights, R)
            return jnp.sum(y.astype(jnp.float32))
        return jax.jit(f)

    f1, f5 = chain(1), chain(reps)
    float(f1(x))
    float(f5(x))
    best = []
    for _ in range(trials):
        t0 = time.time(); float(f1(x)); t1 = time.time() - t0
        t0 = time.time(); float(f5(x)); t5 = time.time() - t0
        best.append((t5 - t1) / (reps - 1))
    return min(best) * 1e3


def main():
    x, wqkv, bqkv, R = make_inputs()
    w = (wqkv, bqkv)
    ref = np.asarray(jax.jit(einsum_arm)(x, w, R), np.float32)
    got = np.asarray(jax.jit(kernel_arm)(x, w, R), np.float32)
    print(f"kernel vs einsum max abs dev: {np.abs(got - ref).max():.6f} "
          f"(scale {np.abs(ref).max():.3f})")
    ms_e = slope(einsum_arm, x, w, R)
    ms_k = slope(kernel_arm, x, w, R)
    print(f"einsum: {ms_e:.3f} ms/apply | fused kernel: {ms_k:.3f} "
          f"({(ms_k / ms_e - 1) * 100:+.1f}%)")


if __name__ == "__main__":
    main()
