"""GPipe-style pipeline parallelism over a `pp` mesh axis.

Beyond the reference (which has no model parallelism of any kind —
SURVEY.md §2.5): a TPU-native microbatched pipeline for homogeneous stage
stacks (ViT blocks, MLP towers). Each pp rank holds ONE stage's parameters
(the stacked parameter tree is sharded along its leading stage axis);
microbatch activations flow rank-to-rank over ICI via `lax.ppermute` inside
a `lax.scan`, so the whole schedule is a single jitted XLA program and
`jax.grad` differentiates straight through the ring (collectives are
linear). The classic n_micro + n_stages - 1 step schedule with the usual
fill/drain bubble; composes with a `dp` axis by sharding the microbatch
axis in `in_specs`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_stage_params(params_list):
    """List of S identical-structure stage parameter trees -> one tree with
    a leading (S, ...) stage axis (shard this axis over the pp mesh axis)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)


def shard_stage_params(stacked, mesh: Mesh, axis: str = "pp"):
    """Place the stacked stage tree with its leading axis over `axis`."""
    return jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))
        ),
        stacked,
    )


def pipeline_apply(stage_fn, mesh: Mesh, axis: str = "pp", batch_axis: str | None = None):
    """Build a pipelined apply: (stacked_params, x (n_micro, mb, ...)) -> y.

    stage_fn(params, x) must be shape-preserving (every stage sees and emits
    the same activation shape — the homogeneous-block case). The returned
    callable runs all S = mesh.shape[axis] stages over the n_micro
    microbatches in n_micro + S - 1 ring steps and returns the full
    (n_micro, mb, ...) output, replicated over `axis` (and sharded over
    `batch_axis` on the microbatch dimension when given).
    """
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    S = int(mesh.shape[axis])
    x_spec = P(None, batch_axis) if batch_axis else P(None)

    def per_rank(stacked, x):
        rank = jax.lax.axis_index(axis)
        params = jax.tree.map(lambda a: a[0], stacked)  # this rank's stage
        n_micro = x.shape[0]
        steps = n_micro + S - 1
        perm = [(i, (i + 1) % S) for i in range(S)]

        def body(carry, t):
            recv, acc = carry
            # rank 0 injects microbatch t (clipped past the end: the late
            # injections produce a garbage wave that reaches the last rank
            # only after the schedule finishes and is never collected)
            inj = x[jnp.clip(t, 0, n_micro - 1)]
            inp = jnp.where(rank == 0, inj, recv)
            out = stage_fn(params, inp)
            nxt = jax.lax.ppermute(out, axis, perm)
            # the last rank emits microbatch t-(S-1) at step t
            slot = jnp.clip(t - (S - 1), 0, n_micro - 1)
            take = (rank == S - 1) & (t >= S - 1)
            acc = acc.at[slot].set(jnp.where(take, out, acc[slot]))
            return (nxt, acc), None

        zero = jnp.zeros_like(x[0])
        acc0 = jnp.zeros_like(x)
        (_, acc), _ = jax.lax.scan(body, (zero, acc0), jnp.arange(steps))
        # replicate the collected outputs from the last rank to every rank
        return jax.lax.psum(
            jnp.where(rank == S - 1, acc, jnp.zeros_like(acc)), axis
        )

    # a single PartitionSpec acts as a pytree prefix over the whole stacked
    # parameter tree (every leaf: leading stage axis over `axis`). The
    # replication checker must be off: the output is produced by a psum of a
    # rank-gated value, which the static checker cannot prove replicated
    # (jax >= 0.8 spells the flag check_vma).
    kwargs = dict(mesh=mesh, in_specs=(P(axis), x_spec), out_specs=x_spec)
    try:
        fn = shard_map(per_rank, check_vma=False, **kwargs)
    except TypeError:
        fn = shard_map(per_rank, check_rep=False, **kwargs)
    return fn


def pipeline_loss_and_grad(stage_fn, loss_fn, mesh: Mesh, axis: str = "pp", batch_axis: str | None = None):
    """(stacked_params, x, y_target) -> (loss, grads): differentiates the
    full microbatched schedule in one program; grads land with the same
    stage-axis sharding as the parameters."""
    apply = pipeline_apply(stage_fn, mesh, axis, batch_axis)

    def loss(stacked, x, y):
        out = apply(stacked, x)
        return loss_fn(out, y)

    return jax.jit(jax.value_and_grad(loss))
