"""On-chip A/B: DINOv2 retrieval-tower LN+qkv fusion (ROADMAP backlog #4).

Routes at the retrieval shapes (260 crops, 197 tokens, C=384, nh=6, bf16):
  shipped   f32 LayerNorm -> cast bf16 -> qkv Dense
  folded    f32 normalize (no scale/bias) -> cast -> Dense with the LN
            scale folded into the qkv weights and the LN bias folded into
            the qkv bias (W' = g*W rows, b' = beta @ W + b) — algebraically
            identical, one fewer elementwise pass if XLA wasn't fusing it
Measured as chained-apply slopes with scalar readback.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

B, N, C, NH = 260, 197, 384, 6
D = C // NH


def make():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))
    g = jnp.asarray(rng.uniform(0.5, 1.5, (C,)).astype(np.float32))
    beta = jnp.asarray(rng.standard_normal((C,)).astype(np.float32) * 0.1)
    W = jnp.asarray(rng.standard_normal((C, 3 * C)).astype(np.float32) * 0.02)
    b = jnp.asarray(rng.standard_normal((3 * C,)).astype(np.float32) * 0.02)
    return x, g, beta, W, b


def shipped(x, g, beta, W, b):
    u = jnp.mean(x, axis=-1, keepdims=True)
    s = jnp.mean((x - u) ** 2, axis=-1, keepdims=True)
    h = ((x - u) / jnp.sqrt(s + 1e-6)) * g + beta
    h = h.astype(jnp.bfloat16)
    return h @ W.astype(jnp.bfloat16) + b.astype(jnp.bfloat16)


def folded(x, g, beta, W, b):
    Wf = (g[:, None] * W).astype(jnp.bfloat16)
    bf = (beta @ W + b).astype(jnp.bfloat16)
    u = jnp.mean(x, axis=-1, keepdims=True)
    s = jnp.mean((x - u) ** 2, axis=-1, keepdims=True)
    h = ((x - u) / jnp.sqrt(s + 1e-6)).astype(jnp.bfloat16)
    return h @ Wf + bf


def slope(fn, args, reps=24, trials=8):
    def chain(n):
        def f(x):
            y = x
            for _ in range(n):
                out = fn(y, *args[1:])
                # feed back through a cheap projection to keep shapes
                y = out[..., :C].astype(jnp.float32)
            return jnp.sum(out.astype(jnp.float32))
        return jax.jit(f)

    f1, fN = chain(1), chain(reps)
    float(f1(args[0])); float(fN(args[0]))
    t1s, tNs = [], []
    for _ in range(trials):
        t0 = time.time(); float(f1(args[0])); t1s.append(time.time() - t0)
        t0 = time.time(); float(fN(args[0])); tNs.append(time.time() - t0)
    return (min(tNs) - min(t1s)) / (reps - 1) * 1e3


def main():
    args = make()
    ref = np.asarray(shipped(*args), np.float32)
    got = np.asarray(folded(*args), np.float32)
    print("folded max abs dev:", float(np.abs(got - ref).max()))
    for name, fn in (("shipped", shipped), ("folded", folded)):
        print(f"{name}: {slope(fn, args):.3f} ms/apply (B={B}, N={N}, C={C})")


if __name__ == "__main__":
    main()
