"""On-chip A/B: erf vs tanh gelu inside the SAM encoder MLP half.

The encoder MLP at rect vit_h shapes is Dense(5120) -> gelu -> Dense(1280)
over (80*196, 1280) bf16 tokens. erf has no TPU hardware unit; XLA expands
it to a rational-polynomial approximation, while tanh lowers to a cheaper
pattern. Measured as chained-apply slopes (f1/fN mins independently) with
a scalar readback, the round-2 measurement discipline.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

BW, N, C = 80, 196, 1280
HID = 4 * C


def make():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BW * N, C)).astype(np.float32)).astype(jnp.bfloat16)
    w1 = jnp.asarray((rng.standard_normal((C, HID)) * 0.02).astype(np.float32)).astype(jnp.bfloat16)
    w2 = jnp.asarray((rng.standard_normal((HID, C)) * 0.02).astype(np.float32)).astype(jnp.bfloat16)
    return x, w1, w2


def mlp(approximate):
    def f(x, w1, w2):
        h = x @ w1
        h = nn.gelu(h, approximate=approximate)
        return h @ w2

    return f


def slope(fn, args, reps=16, trials=8):
    x, w1, w2 = args

    def chain(n):
        def f(x):
            y = x
            for _ in range(n):
                y = fn(y, w1, w2)
            return jnp.sum(y.astype(jnp.float32))

        return jax.jit(f)

    f1, fN = chain(1), chain(reps)
    float(f1(x)); float(fN(x))
    t1s, tNs = [], []
    for _ in range(trials):
        t0 = time.time(); float(f1(x)); t1s.append(time.time() - t0)
        t0 = time.time(); float(fN(x)); tNs.append(time.time() - t0)
    return (min(tNs) - min(t1s)) / (reps - 1) * 1e3


def main():
    args = make()
    erf = mlp(False)
    tanh = mlp(True)
    dev = np.abs(
        np.asarray(erf(*args), np.float32) - np.asarray(tanh(*args), np.float32)
    ).max()
    print(f"tanh-vs-erf max abs dev: {dev:.5f} (bf16 activations)")
    for name, fn in (("erf  ", erf), ("tanh ", tanh)):
        print(f"{name}: {slope(fn, args):.3f} ms/mlp (BWxN={BW*N}, C={C}, hid={HID})")


if __name__ == "__main__":
    main()
