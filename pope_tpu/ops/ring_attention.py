"""Ring attention: exact attention over a sequence sharded on an `sp` mesh
axis (sequence parallelism).

SURVEY.md §5 flags this as a TPU-native design item with no reference
counterpart: the reference sidesteps long sequences with linear attention
(LoFTR) and windowing (SAM); scaling past one chip's HBM instead shards the
token axis and rotates K/V blocks around the ICI ring while each rank keeps
a running online-softmax over its local queries — numerically exact
attention (accumulators in f32 regardless of input dtype, like
ops/flash_attention.py), peak memory O(N/S * N/S) per rank, S-1 ring
rotations total, bandwidth overlappable by XLA's latency-hiding scheduler.
One scanned program; differentiable end to end (`lax.ppermute` is linear).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from pope_tpu.parallel.compat import shard_map_compat


def _fold_block(q, k_cur, v_cur, m, l, acc, scale):
    """Online-softmax update of (m, l, acc) with one K/V block (the same
    recurrence as flash attention's k-loop); f32 throughout."""
    s = (q @ k_cur.T) * scale  # (Nq, Nk_local)
    m_new = jnp.maximum(m, s.max(axis=-1))
    alpha = jnp.exp(m - m_new)
    p = jnp.exp(s - m_new[:, None])
    l = l * alpha + p.sum(axis=-1)
    acc = acc * alpha[:, None] + p @ v_cur
    return m_new, l, acc


def _ring_attn_local(q, k, v, axis: str, n_ranks: int, scale: float):
    """Per-rank body: q/k/v are this rank's (Nq_local, d) / (Nk_local, d)
    blocks. Fold the local K/V block first, then rotate the ring n_ranks-1
    times, permuting BEFORE each fold so no dead trailing send exists."""
    in_dtype = q.dtype
    q, k, v = (t.astype(jnp.float32) for t in (q, k, v))
    perm = [(i, (i + 1) % n_ranks) for i in range(n_ranks)]

    m0 = jnp.full((q.shape[0],), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((q.shape[0],), jnp.float32)
    acc0 = jnp.zeros_like(q)
    m, l, acc = _fold_block(q, k, v, m0, l0, acc0, scale)

    def body(carry, _):
        k_cur, v_cur, m, l, acc = carry
        k_cur = jax.lax.ppermute(k_cur, axis, perm)
        v_cur = jax.lax.ppermute(v_cur, axis, perm)
        m, l, acc = _fold_block(q, k_cur, v_cur, m, l, acc, scale)
        return (k_cur, v_cur, m, l, acc), None

    if n_ranks > 1:
        (_, _, m, l, acc), _ = jax.lax.scan(
            body, (k, v, m, l, acc), None, length=n_ranks - 1
        )
    return (acc / l[:, None]).astype(in_dtype)


def ring_attention(mesh: Mesh, axis: str = "sp"):
    """Build an exact sequence-parallel attention: (q, k, v) with shapes
    (..., N, d), token axis sharded over `axis` -> (..., N, d) output with
    the same sharding. Leading axes (batch, heads) ride along unsharded;
    softmax scale is 1/sqrt(d)."""
    S = int(mesh.shape[axis])

    def call(q, k, v):
        d = q.shape[-1]
        scale = 1.0 / (d**0.5)
        nd = q.ndim
        spec = P(*([None] * (nd - 2)), axis, None)

        def per_rank(ql, kl, vl):
            fn = lambda a, b, c: _ring_attn_local(a, b, c, axis, S, scale)
            for _ in range(nd - 2):  # vmap leading batch/head axes
                fn = jax.vmap(fn)
            return fn(ql, kl, vl)

        sm = shard_map_compat(
            per_rank, mesh, in_specs=(spec, spec, spec), out_specs=spec
        )
        return sm(q, k, v)

    return call
