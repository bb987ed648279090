"""Ring attention (ops/ring_attention.py): exact sequence-parallel attention
over the 8-device CPU mesh vs a plain full-softmax reference — values and
gradients, with and without leading batch/head axes. (SURVEY.md §5: a
TPU-native design item with no reference counterpart.)"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pope_tpu.ops.ring_attention import ring_attention


def _full_attention(q, k, v):
    s = jnp.einsum("...nd,...md->...nm", q, k) / (q.shape[-1] ** 0.5)
    return jnp.einsum("...nm,...md->...nd", jax.nn.softmax(s, axis=-1), v)


@pytest.mark.parametrize("lead", [(), (2, 3)])  # none / (batch, heads)
def test_ring_attention_matches_full(rng, lead):
    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("sp",))
    N, d = 64, 16
    shape = lead + (N, d)
    q = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)
    sharding = NamedSharding(mesh, P(*([None] * len(lead)), "sp", None))
    qs, ks, vs = (jax.device_put(t, sharding) for t in (q, k, v))

    attn = jax.jit(ring_attention(mesh, "sp"))
    out = attn(qs, ks, vs)
    ref = _full_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # output keeps the sequence sharding
    assert out.sharding.spec[-2] == "sp"


def test_ring_attention_grads_match_full(rng):
    devs = np.array(jax.devices()[:4])
    mesh = Mesh(devs, ("sp",))
    N, d = 32, 8
    q = jnp.asarray(rng.normal(0, 1, (N, d)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (N, d)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (N, d)), jnp.float32)
    sharding = NamedSharding(mesh, P("sp", None))
    qs, ks, vs = (jax.device_put(t, sharding) for t in (q, k, v))

    attn = ring_attention(mesh, "sp")
    g_ring = jax.jit(
        jax.grad(lambda a, b, c: jnp.sum(attn(a, b, c) ** 2), argnums=(0, 1, 2))
    )(qs, ks, vs)
    g_full = jax.grad(
        lambda a, b, c: jnp.sum(_full_attention(a, b, c) ** 2), argnums=(0, 1, 2)
    )(q, k, v)
    for a, b in zip(g_ring, g_full):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_ring_attention_bf16_accumulates_f32(rng):
    """bf16 inputs must accumulate in f32 (like ops/flash_attention.py): the
    bf16 ring output matches the f32 full-attention reference to bf16
    resolution, far tighter than a bf16-accumulated sum over many blocks."""
    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("sp",))
    N, d = 128, 16
    q = jnp.asarray(rng.normal(0, 1, (N, d)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (N, d)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (N, d)), jnp.float32)
    sharding = NamedSharding(mesh, P("sp", None))
    attn = jax.jit(ring_attention(mesh, "sp"))
    out16 = attn(*(jax.device_put(t.astype(jnp.bfloat16), sharding) for t in (q, k, v)))
    assert out16.dtype == jnp.bfloat16
    ref = _full_attention(
        *(t.astype(jnp.bfloat16).astype(jnp.float32) for t in (q, k, v))
    )
    err = float(jnp.abs(out16.astype(jnp.float32) - ref).max())
    assert err < 1.5e-2, err  # one bf16 rounding of O(1) values, not S of them
