"""Training/eval steps for the pose regressors (optax).

Behavioral spec: train0429_mkpts.py — Adam lr 1e-5 / weight decay 1e-5 (:94),
loss = MSE(translation) + geodesic(rotation) (:182-185), target mode
'relative_r-gt_t' (supervise relative rotation; translation supervised with
GT, :158-167); eval via batched relative_pose_error (pose/utils.py:131-157).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from pope_tpu.config import RegressorConfig
from pope_tpu.geometry.pose import geodesic_distance, relative_pose_error


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Any = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )


def create_train_state(model, rng, sample_batch, cfg: RegressorConfig) -> TrainState:
    params = model.init(rng, *sample_batch)["params"]
    tx = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )


def pose_loss(pred_t, pred_R, gt_t, gt_R):
    """MSE(t) + mean geodesic(R) (train0429_mkpts.py:182-185)."""
    t_loss = jnp.mean((pred_t - gt_t) ** 2)
    r_loss = geodesic_distance(pred_R, gt_R, mode="mean")
    return t_loss + r_loss, (t_loss, r_loss)


def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], dropout_rng):
    """One SGD step. batch: mkpts0, mkpts1, [img0, img1,] gt_t, gt_R."""

    def loss_fn(params):
        pred_t, pred_R = state.apply_fn(
            {"params": params},
            batch["mkpts0"],
            batch["mkpts1"],
            batch.get("img0"),
            batch.get("img1"),
            deterministic=False,
            rngs={"dropout": dropout_rng},
        )
        loss, (tl, rl) = pose_loss(pred_t, pred_R, batch["gt_t"], batch["gt_R"])
        return loss, {"loss": loss, "t_loss": tl, "r_loss": rl}

    grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
    return state.apply_gradients(grads), metrics


def eval_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
    """Predict and return per-sample angular errors (test0608.py semantics)."""
    pred_t, pred_R = state.apply_fn(
        {"params": state.params},
        batch["mkpts0"],
        batch["mkpts1"],
        batch.get("img0"),
        batch.get("img1"),
        deterministic=True,
    )
    T = jnp.concatenate(
        [
            jnp.concatenate([batch["gt_R"], batch["gt_t"][..., None]], axis=-1),
            jnp.broadcast_to(
                jnp.asarray([0.0, 0.0, 0.0, 1.0]), batch["gt_R"].shape[:-2] + (1, 4)
            ),
        ],
        axis=-2,
    )
    t_err, r_err = relative_pose_error(T, pred_R, pred_t)
    return {"pred_t": pred_t, "pred_R": pred_R, "t_err": t_err, "R_err": r_err}
