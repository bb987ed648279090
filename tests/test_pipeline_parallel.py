"""Pipeline parallelism (parallel/pipeline.py): the GPipe microbatch ring
over a `pp` mesh axis must reproduce the serial stage composition exactly —
values AND gradients — on the 8-device CPU mesh, alone and composed with a
`dp` batch axis. (Beyond the reference, which has no model parallelism;
SURVEY.md §2.5.)"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from pope_tpu.parallel.pipeline import (
    pipeline_apply,
    pipeline_loss_and_grad,
    shard_stage_params,
    stack_stage_params,
)

D = 16


def _stage(params, x):
    return jnp.tanh(x @ params["w"] + params["b"])


def _serial(stacked, x):
    S = jax.tree.leaves(stacked)[0].shape[0]
    for s in range(S):
        x = _stage(jax.tree.map(lambda a: a[s], stacked), x)
    return x


def _stages(rng, S):
    return [
        {
            "w": jnp.asarray(rng.normal(0, 0.5, (D, D)), jnp.float32),
            "b": jnp.asarray(rng.normal(0, 0.1, (D,)), jnp.float32),
        }
        for _ in range(S)
    ]


@pytest.mark.parametrize("mesh_axes", [("pp",), ("pp", "dp")])
def test_pipeline_matches_serial(rng, mesh_axes):
    devs = np.array(jax.devices()[:8])
    if mesh_axes == ("pp",):
        mesh = Mesh(devs[:4], ("pp",))
        batch_axis = None
    else:
        mesh = Mesh(devs.reshape(4, 2), ("pp", "dp"))
        batch_axis = "dp"
    S, n_micro, mb = 4, 6, 8
    stacked = stack_stage_params(_stages(rng, S))
    stacked = shard_stage_params(stacked, mesh, "pp")
    x = jnp.asarray(rng.normal(0, 1, (n_micro, mb, D)), jnp.float32)

    apply = jax.jit(pipeline_apply(_stage, mesh, "pp", batch_axis))
    y = apply(stacked, x)
    y_ref = jax.vmap(lambda xm: _serial(stacked, xm))(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-6)


def test_pipeline_grads_match_serial(rng):
    devs = np.array(jax.devices()[:4])
    mesh = Mesh(devs, ("pp",))
    S, n_micro, mb = 4, 5, 4
    stacked = stack_stage_params(_stages(rng, S))
    sharded = shard_stage_params(stacked, mesh, "pp")
    x = jnp.asarray(rng.normal(0, 1, (n_micro, mb, D)), jnp.float32)
    y_t = jnp.asarray(rng.normal(0, 1, (n_micro, mb, D)), jnp.float32)

    loss_fn = lambda out, tgt: jnp.mean((out - tgt) ** 2)
    lg = pipeline_loss_and_grad(_stage, loss_fn, mesh, "pp")
    loss_pp, grads_pp = lg(sharded, x, y_t)

    def serial_loss(st):
        out = jax.vmap(lambda xm: _serial(st, xm))(x)
        return loss_fn(out, y_t)

    loss_ref, grads_ref = jax.value_and_grad(serial_loss)(stacked)
    np.testing.assert_allclose(float(loss_pp), float(loss_ref), atol=1e-6)
    for a, b in zip(jax.tree.leaves(grads_pp), jax.tree.leaves(grads_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # grads keep the stage-axis sharding of the parameters
    for g in jax.tree.leaves(grads_pp):
        assert g.sharding.spec[0] == "pp"


def test_pipeline_rejects_stage_count_mismatch(rng):
    """8 stages on a 4-rank pp axis shards cleanly (divisible) but would
    silently run a 4-stage model; the apply must refuse instead."""
    devs = np.array(jax.devices()[:4])
    mesh = Mesh(devs, ("pp",))
    stacked = stack_stage_params(_stages(rng, 8))
    sharded = shard_stage_params(stacked, mesh, "pp")
    x = jnp.asarray(rng.normal(0, 1, (4, 2, D)), jnp.float32)
    apply = pipeline_apply(_stage, mesh, "pp")
    with pytest.raises(ValueError, match="one stage per rank"):
        apply(sharded, x)


def test_pipeline_bubble_safe_for_nonzero_total_stage(rng):
    """A stage that divides by the activation norm (undefined at exactly 0)
    must still produce finite grads: the fill/drain bubble feeds realistic
    placeholder data, not zeros, so the masked-out vjps stay finite."""
    devs = np.array(jax.devices()[:4])
    mesh = Mesh(devs, ("pp",))

    def norm_stage(p, x):
        x = x @ p["w"] + p["b"]
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    stacked = stack_stage_params(_stages(rng, 4))
    sharded = shard_stage_params(stacked, mesh, "pp")
    x = jnp.asarray(rng.normal(0, 1, (5, 3, D)), jnp.float32)
    lg = pipeline_loss_and_grad(
        norm_stage, lambda o, t: jnp.mean((o - t) ** 2), mesh, "pp"
    )
    loss, grads = lg(sharded, x, jnp.zeros_like(x))
    assert np.isfinite(float(loss))
    for g in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(g)).all()
    # and the values still match the serial composition
    def serial_loss(st):
        r = x
        for s in range(4):
            r = norm_stage(jax.tree.map(lambda a: a[s], st), r)
        return jnp.mean(r ** 2)
    np.testing.assert_allclose(float(loss), float(serial_loss(stacked)), atol=1e-6)
