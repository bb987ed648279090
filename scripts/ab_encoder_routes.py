"""On-chip A/B of SAM windowed-attention implementation routes (VERDICT r4
item: implement the ROADMAP-listed remaining routes or record that each
loses). Measures chained-apply slopes ((t5 - t1)/4 inside one jit with a
scalar readback) at the shipped rect shapes: BW=80 windows (B=4 x 20),
N=196 tokens, nh=16, d=80, C=1280.

Routes:
  shipped     natural-layout einsum qkv reshape + bhqk logits + f32 softmax
  headmajor   qkv via one einsum producing head-major (B, nh, N, d) directly
              from (C, 3, nh, d)-reshaped weights (the 'restructured
              converter' route) + transpose-free attention einsums
  bf16sm      shipped layout, but softmax exp/normalize stored in bf16 with
              only the row max/sum reductions in f32 (halves the softmax HBM
              traffic; accuracy evaluated separately before any shipping)

Run on the real chip: python scripts/ab_encoder_routes.py
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
    rel_h = jnp.asarray(rng.standard_normal((2 * HW - 1, D)).astype(np.float32) * 0.02)
    rel_w = jnp.asarray(rng.standard_normal((2 * HW - 1, D)).astype(np.float32) * 0.02)
    return x, wqkv, bqkv, rel_h, rel_w


def rel_tables(rel_pos):
    center = (rel_pos.shape[0] - 1) // 2
    rel = jnp.arange(HW)[:, None] - jnp.arange(HW)[None, :] + center
    return rel_pos[rel]  # (HW, HW, D)


def shipped(x, wqkv, bqkv, Rh, Rw):
    qkv = (x @ wqkv + bqkv).reshape(BW, N, 3, NH, D)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    r_q = q.reshape(BW, HW, HW, NH, D)
    rel_h = jnp.einsum("bhwnc,hkc->bnhwk", r_q, Rh.astype(q.dtype))
    rel_w = jnp.einsum("bhwnc,wkc->bnhwk", r_q, Rw.astype(q.dtype))
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * (D**-0.5), k)
    bias = (rel_h[..., :, None] + rel_w[..., None, :]).reshape(BW, NH, N, N)
    attn = jax.nn.softmax((logits + bias.astype(logits.dtype)).astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
    return out.reshape(BW, N, C)


def headmajor(x, wqkv, bqkv, Rh, Rw):
    w = wqkv.reshape(C, 3, NH, D)
    b = bqkv.reshape(3, NH, D)
    qkv = jnp.einsum("bnc,cthd->tbhnd", x, w) + b[:, None, :, None, :]
    q, k, v = qkv[0], qkv[1], qkv[2]  # (BW, NH, N, D) head-major
    r_q = q.reshape(BW, NH, HW, HW, D)
    rel_h = jnp.einsum("bnhwc,hkc->bnhwk", r_q, Rh.astype(q.dtype))
    rel_w = jnp.einsum("bnhwc,wkc->bnhwk", r_q, Rw.astype(q.dtype))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * (D**-0.5), k)
    bias = (rel_h[..., :, None] + rel_w[..., None, :]).reshape(BW, NH, N, N)
    attn = jax.nn.softmax((logits + bias.astype(logits.dtype)).astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bqhd", attn, v)
    return out.reshape(BW, N, C)


def bf16sm(x, wqkv, bqkv, Rh, Rw):
    qkv = (x @ wqkv + bqkv).reshape(BW, N, 3, NH, D)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    r_q = q.reshape(BW, HW, HW, NH, D)
    rel_h = jnp.einsum("bhwnc,hkc->bnhwk", r_q, Rh.astype(q.dtype))
    rel_w = jnp.einsum("bhwnc,wkc->bnhwk", r_q, Rw.astype(q.dtype))
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * (D**-0.5), k)
    bias = (rel_h[..., :, None] + rel_w[..., None, :]).reshape(BW, NH, N, N)
    s = logits + bias.astype(logits.dtype)
    m = jnp.max(s.astype(jnp.float32), axis=-1, keepdims=True)
    e = jnp.exp((s.astype(jnp.float32) - m)).astype(jnp.bfloat16)
    denom = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
    attn = (e / denom.astype(jnp.bfloat16))
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
    return out.reshape(BW, N, C)


def slope(fn, args, reps=5, trials=6):
    Rh, Rw = rel_tables(args[3]), rel_tables(args[4])
    a = (args[0], args[1], args[2], Rh, Rw)

    def chain(n):
        def f(x):
            y = x
            for _ in range(n):
                y = fn(y, a[1], a[2], a[3], a[4])
            return jnp.sum(y.astype(jnp.float32))
        return jax.jit(f)

    f1, f5 = chain(1), chain(reps)
    float(f1(a[0]))  # compile
    float(f5(a[0]))
    best = []
    for _ in range(trials):
        t0 = time.time(); float(f1(a[0])); t1 = time.time() - t0
        t0 = time.time(); float(f5(a[0])); t5 = time.time() - t0
        best.append((t5 - t1) / (reps - 1))
    return min(best) * 1e3  # ms per apply


def main():
    args = make_inputs()
    # numeric sanity: routes agree with the shipped path
    Rh, Rw = rel_tables(args[3]), rel_tables(args[4])
    ref = np.asarray(shipped(args[0], args[1], args[2], Rh, Rw), np.float32)
    for name, fn in (("headmajor", headmajor), ("bf16sm", bf16sm)):
        got = np.asarray(fn(args[0], args[1], args[2], Rh, Rw), np.float32)
        err = np.abs(got - ref).max()
        print(f"{name}: max abs dev vs shipped = {err:.5f}")
    for name, fn in (("shipped", shipped), ("headmajor", headmajor), ("bf16sm", bf16sm)):
        ms = slope(fn, args)
        print(f"{name}: {ms:.3f} ms/apply (BW={BW}, N={N}, nh={NH}, d={D})")


if __name__ == "__main__":
    main()
