"""On-chip A/B: fused-qkv Dense + reshape/slice vs three separate q/k/v
projections in the SAM windowed block (round-5 per-buffer audit follow-up).

The buffer audit of the shipped AMG program charges the qkv tensor dance
~17 GB/dispatch: a {1,2,0}-layout copy of the qkv Dense output (7.1 GB), a
{1,4,3,0,2} reshape copy to (BW, N, 3, nh, d) (6.7 GB), and the three
slices (3.4 GB). Splitting the projection into three (C, C) matmuls (the
converter would pre-split the checkpoint's fused weight — bit-identical
values) removes the 3-way middle-dim reshape/slice, at the cost of reading
the activations three times instead of once.

Measured via chained-apply slopes with scalar readback (the round-2
tunnel-measurement discipline). Run: python scripts/ab_qkv_split.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

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


def attn_tail(q, k, v, Rh, Rw):
    r_q = q.reshape(BW, HW, HW, NH, D)
    rel_h = jnp.einsum("bhwnc,hkc->bnhwk", r_q, Rh.astype(q.dtype))
    rel_w = jnp.einsum("bhwnc,wkc->bnhwk", r_q, Rw.astype(q.dtype))
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * (D**-0.5), k)
    bias = (rel_h[..., :, None] + rel_w[..., None, :]).reshape(BW, NH, N, N)
    attn = jax.nn.softmax(
        (logits + bias.astype(logits.dtype)).astype(jnp.float32), axis=-1
    ).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
    return out.reshape(BW, N, C)


def fused(x, weights, R):
    wqkv, bqkv = weights
    qkv = (x @ wqkv + bqkv).reshape(BW, N, 3, NH, D)
    return attn_tail(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], R, R)


def split(x, weights, R):
    (wq, bq), (wk, bk), (wv, bv) = weights
    q = (x @ wq + bq).reshape(BW, N, NH, D)
    k = (x @ wk + bk).reshape(BW, N, NH, D)
    v = (x @ wv + bv).reshape(BW, N, NH, D)
    return attn_tail(q, k, v, R, R)


def attn_tail_qmajor(q, k, v, Rh, Rw):
    """Token-major attention: logits einsum emits (BW, N, nh, N) directly
    (no head-major intermediate), bias built in the same token-major order —
    probes whether XLA then drops the {2,3,1,0} logits layout copy + the
    6D bias copy the audit charges ~8 GB/dispatch."""
    r_q = q.reshape(BW, HW, HW, NH, D)
    rel_h = jnp.einsum("bhwnc,hkc->bhwnk", r_q, Rh.astype(q.dtype))  # (B,H,W,nh,Hk)
    rel_w = jnp.einsum("bhwnc,wkc->bhwnk", r_q, Rw.astype(q.dtype))
    # (B,H,W,nh,Hk,1) + (B,H,W,nh,1,Wk) -> (B,H,W,nh,Hk,Wk) -> (B,N,nh,N)
    bias = (rel_h[..., :, None] + rel_w[..., None, :]).reshape(BW, N, NH, N)
    logits = jnp.einsum("bqhd,bkhd->bqhk", q * (D**-0.5), k)
    attn = jax.nn.softmax(
        (logits + bias.astype(logits.dtype)).astype(jnp.float32), axis=-1
    ).astype(q.dtype)
    out = jnp.einsum("bqhk,bkhd->bqhd", attn, v)
    return out.reshape(BW, N, C)


def fused_qmajor(x, weights, R):
    wqkv, bqkv = weights
    qkv = (x @ wqkv + bqkv).reshape(BW, N, 3, NH, D)
    return attn_tail_qmajor(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], R, R)


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
    wsplit = tuple(
        (wqkv[:, i * C:(i + 1) * C], bqkv[i * C:(i + 1) * C]) for i in range(3)
    )
    # numeric checks must be jitted: eager ops each pay a remote
    # compile+dispatch through the axon tunnel (minutes for a chain)
    ref = np.asarray(jax.jit(fused)(x, (wqkv, bqkv), R), np.float32)
    for name, fn, w in (("split-qkv", split, wsplit),
                        ("q-major", fused_qmajor, (wqkv, bqkv))):
        got = np.asarray(jax.jit(fn)(x, w, R), np.float32)
        print(f"{name} vs fused max abs dev: {np.abs(got - ref).max():.6f}")
    ms_f = slope(fused, x, (wqkv, bqkv), R)
    ms_s = slope(split, x, wsplit, R)
    ms_q = slope(fused_qmajor, x, (wqkv, bqkv), R)
    print(f"fused-qkv: {ms_f:.3f} ms/apply | split-qkv: {ms_s:.3f} "
          f"({(ms_s / ms_f - 1) * 100:+.1f}%) | q-major: {ms_q:.3f} "
          f"({(ms_q / ms_f - 1) * 100:+.1f}%)")


if __name__ == "__main__":
    main()
