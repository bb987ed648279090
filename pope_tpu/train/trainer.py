"""Matcher training step, single- and multi-chip.

Reference behavior: src/lightning/lightning_loftr.py:82-113 —
_trainval_inference: compute_supervision_coarse -> matcher forward ->
compute_supervision_fine -> loss; DDP data parallelism via PL. TPU-native:
one jitted step; multi-chip = the same step jitted over a (dp, tp) mesh with
batch-sharded inputs and tensor-parallel param layouts (collectives inserted
by the SPMD partitioner, replacing DDP allreduce).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax

from pope_tpu.config import MatcherConfig
from pope_tpu.train.loss import LossConfig, matcher_loss
from pope_tpu.train.supervision import spvs_coarse, spvs_fine


class MatcherTrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def init_matcher_train_state(matcher, tx, rng, sample_batch) -> MatcherTrainState:
    variables = matcher.init(rng, sample_batch["image0"][:1], sample_batch["image1"][:1], train=True)
    return MatcherTrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )


def matcher_train_step(
    matcher,
    tx,
    state: MatcherTrainState,
    batch: Dict[str, jnp.ndarray],
    loss_cfg: LossConfig = LossConfig(),
):
    """One supervised step. batch: image0/image1 (B, H, W, 1), depth0/depth1,
    T_0to1/T_1to0 (B, 4, 4), K0/K1."""
    cfg: MatcherConfig = matcher.config
    spv = spvs_coarse(batch, cfg.coarse_stride)

    def loss_fn(params):
        # GT coarse matches pad the fine-stage sample set inside the forward
        # (coarse_matching.py:200-236): early in training the predictions are
        # noise, so without this the fine loss has almost no signal
        result, mutated = matcher.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch["image0"],
            batch["image1"],
            train=True,
            return_aux=True,
            gt_valid=spv["spv_valid"],
            gt_j_of_i=spv["spv_j_of_i"],
            gt_pad_key=batch.get("gt_pad_key"),
            mutable=["batch_stats"],
        )
        # fine supervision at the ids the fine stage actually used
        expec_f_gt = spvs_fine(
            spv, result.i_ids, result.j_ids, cfg.fine_stride, cfg.fine_window_size
        )
        total, metrics = matcher_loss(result, spv, expec_f_gt, loss_cfg)
        return total, (metrics, mutated["batch_stats"])

    grads, (metrics, new_stats) = jax.grad(loss_fn, has_aux=True)(state.params)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return (
        MatcherTrainState(state.step + 1, new_params, new_stats, new_opt),
        metrics,
    )


def make_sharded_train_step(matcher, tx, mesh, loss_cfg: LossConfig = LossConfig()):
    """jit the step over a (dp, tp) mesh: callers shard batch leading axes on
    dp (parallel.shard_batch) and params with parallel.shard_params_tp."""

    def step(state, batch):
        return matcher_train_step(matcher, tx, state, batch, loss_cfg)

    with mesh:
        return jax.jit(step)
