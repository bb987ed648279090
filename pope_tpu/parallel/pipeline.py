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

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pope_tpu.parallel.compat import shard_map_compat


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
    the same activation shape — the homogeneous-block case) and should be
    total on any finite input: during the fill/drain bubble, ranks process
    placeholder activations (the first microbatch's values, so normalization
    layers etc. see realistic finite data) whose outputs are discarded. The
    returned callable runs all S = mesh.shape[axis] stages over the n_micro
    microbatches in n_micro + S - 1 ring steps and returns the full
    (n_micro, mb, ...) output, replicated over `axis` (and sharded over
    `batch_axis` on the microbatch dimension when given). The stacked
    parameter tree's leading stage axis must equal S exactly — one stage
    per rank.
    """
    S = int(mesh.shape[axis])
    x_spec = P(None, batch_axis) if batch_axis else P(None)

    def per_rank(stacked, x):
        rank = jax.lax.axis_index(axis)
        params = jax.tree.map(lambda a: a[0], stacked)  # this rank's stage
        n_micro = x.shape[0]
        perm = [(i, (i + 1) % S) for i in range(S)]

        def step(recv, acc, t, permute):
            # rank 0 injects microbatch t (clipped past the end: the late
            # injections produce a placeholder wave that reaches the last
            # rank only after the schedule finishes and is never collected)
            inj = x[jnp.clip(t, 0, n_micro - 1)]
            inp = jnp.where(rank == 0, inj, recv)
            out = stage_fn(params, inp)
            nxt = jax.lax.ppermute(out, axis, perm) if permute else out
            # the last rank emits microbatch t-(S-1) at step t
            slot = jnp.clip(t - (S - 1), 0, n_micro - 1)
            take = (rank == S - 1) & (t >= S - 1)
            acc = acc.at[slot].set(jnp.where(take, out, acc[slot]))
            return nxt, acc

        # bubble placeholder: the first microbatch (finite, realistic data)
        # rather than zeros, so stage vjps never see pathological inputs
        fill = x[0]
        acc0 = jnp.zeros_like(x)
        steps = n_micro + S - 1

        def body(carry, t):
            recv, acc = carry
            return step(recv, acc, t, permute=True), None

        (recv, acc), _ = jax.lax.scan(body, (fill, acc0), jnp.arange(steps - 1))
        # final step: no trailing ppermute (its result would be discarded —
        # one full activation send per schedule saved)
        _, acc = step(recv, acc, jnp.asarray(steps - 1), permute=False)
        # replicate the collected outputs from the last rank to every rank
        return jax.lax.psum(
            jnp.where(rank == S - 1, acc, jnp.zeros_like(acc)), axis
        )

    # a single PartitionSpec acts as a pytree prefix over the whole stacked
    # parameter tree (every leaf: leading stage axis over `axis`)
    fn = shard_map_compat(per_rank, mesh, in_specs=(P(axis), x_spec), out_specs=x_spec)

    def call(stacked, x):
        n_stages = jax.tree.leaves(stacked)[0].shape[0]
        if n_stages != S:
            raise ValueError(
                f"stacked parameter tree has {n_stages} stages but the "
                f"'{axis}' mesh axis has {S} ranks — the pipeline maps "
                "exactly one stage per rank (fold multiple blocks into one "
                "stage_fn to run deeper models)"
            )
        return fn(stacked, x)

    return call


def pipeline_loss_and_grad(stage_fn, loss_fn, mesh: Mesh, axis: str = "pp", batch_axis: str | None = None):
    """(stacked_params, x, y_target) -> (loss, grads): differentiates the
    full microbatched schedule in one program; grads land with the same
    stage-axis sharding as the parameters."""
    apply = pipeline_apply(stage_fn, mesh, axis, batch_axis)

    def loss(stacked, x, y):
        out = apply(stacked, x)
        return loss_fn(out, y)

    return jax.jit(jax.value_and_grad(loss))
