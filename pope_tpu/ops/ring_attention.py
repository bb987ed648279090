"""Ring attention: exact attention over a sequence sharded on an `sp` mesh
axis (sequence parallelism).

SURVEY.md §5 flags this as a TPU-native design item with no reference
counterpart: the reference sidesteps long sequences with linear attention
(LoFTR) and windowing (SAM); scaling past one chip's HBM instead shards the
token axis and rotates K/V blocks around the ICI ring while each rank keeps
a running online-softmax over its local queries — numerically exact
attention, peak memory O(N/S * N/S) per rank, bandwidth fully overlappable
by XLA's latency-hiding scheduler. One scanned program; differentiable end
to end (`lax.ppermute` is linear).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _ring_attn_local(q, k, v, axis: str, scale: float):
    """Per-rank body: q/k/v are this rank's (Nq_local, d) / (Nk_local, d)
    blocks; K/V blocks rotate `S` times while (m, l, acc) fold each block in
    online-softmax form (same recurrence as flash attention's k-loop)."""
    S = jax.lax.psum(1, axis)
    perm = [(i, (i + 1) % S) for i in range(S)]

    def body(carry, _):
        k_cur, v_cur, m, l, acc = carry
        s = (q @ k_cur.T) * scale  # (Nq, Nk_local)
        m_new = jnp.maximum(m, s.max(axis=-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[:, None])
        l = l * alpha + p.sum(axis=-1)
        acc = acc * alpha[:, None] + p @ v_cur
        k_nxt = jax.lax.ppermute(k_cur, axis, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis, perm)
        return (k_nxt, v_nxt, m_new, l, acc), None

    m0 = jnp.full((q.shape[0],), -jnp.inf, q.dtype)
    l0 = jnp.zeros((q.shape[0],), q.dtype)
    acc0 = jnp.zeros_like(q)
    (_, _, _, l, acc), _ = jax.lax.scan(
        body, (k, v, m0, l0, acc0), None, length=S
    )
    return acc / l[:, None]


def ring_attention(mesh: Mesh, axis: str = "sp"):
    """Build an exact sequence-parallel attention: (q, k, v) with shapes
    (..., N, d), token axis sharded over `axis` -> (..., N, d) output with
    the same sharding. Leading axes (batch, heads) ride along unsharded;
    softmax scale is 1/sqrt(d)."""
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    def call(q, k, v):
        d = q.shape[-1]
        scale = 1.0 / (d**0.5)
        nd = q.ndim
        spec = P(*([None] * (nd - 2)), axis, None)

        def per_rank(ql, kl, vl):
            fn = lambda a, b, c: _ring_attn_local(a, b, c, axis, scale)
            for _ in range(nd - 2):  # vmap leading batch/head axes
                fn = jax.vmap(fn)
            return fn(ql, kl, vl)

        kwargs = dict(mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
        try:
            sm = shard_map(per_rank, check_vma=False, **kwargs)
        except TypeError:
            sm = shard_map(per_rank, check_rep=False, **kwargs)
        return sm(q, k, v)

    return call
