"""Regressor training/eval drivers (CLI bodies).

Reference behavior: train0429_mkpts.py (seed 20231223, batch 8, Adam 1e-5 /
wd 1e-5, num_sample 500, loss = MSE(t) + geodesic(R), checkpoints per run)
and test0608.py (same split/seed; per-category Acc table). Checkpoints are
orbax (replacing torch.save of whole modules, train0429_mkpts.py:205).
"""

from __future__ import annotations

import dataclasses
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from pope_tpu.config import RegressorConfig
from pope_tpu.models.regressor.data import load_pose_dataset, make_batches, train_val_split
from pope_tpu.models.regressor.model import MkptsRegModel
from pope_tpu.models.regressor.train import create_train_state, eval_step, train_step
from pope_tpu.utils.metrics import aggregate_metrics_mean


def _save_ckpt(ckpt_dir: str, step: int, params):
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()
    return path


def load_ckpt(path: str, like):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), like)


def train_main(args):
    cfg = RegressorConfig(
        num_sample=args.num_sample, net_mode=args.net_mode, rotation_mode=args.rotation_mode,
        fusion=getattr(args, "fusion", "cross_attn"),
        vim_size=getattr(args, "vim_size", "small"),
    )
    # 'imgs' (ConvNeXtV2) and 'vim' (frozen VisionMamba, model0606.py) both
    # consume the dumped crops
    with_images = ("imgs" in cfg.net_mode) or ("vim" in cfg.net_mode)
    data = load_pose_dataset(
        args.dataset, args.data_root, getattr(args, "pairs_dir", "data/pairs"),
        args.points_dir, load_images=with_images,
    )
    if not data:
        raise SystemExit("no extraction dumps found; run `pope_tpu extract` first")
    train, val = train_val_split(data, seed=cfg.seed)
    print(f"dataset: {len(train)} train / {len(val)} val pairs")

    model = MkptsRegModel(cfg)
    first = next(make_batches(train, cfg.num_sample, 1, seed=cfg.seed, with_images=with_images))
    sample = (
        jnp.asarray(first["mkpts0"]), jnp.asarray(first["mkpts1"]),
        jnp.asarray(first["img0"]) if with_images else None,
        jnp.asarray(first["img1"]) if with_images else None,
    )
    state = create_train_state(model, jax.random.PRNGKey(cfg.seed), sample, cfg)
    jit_train = jax.jit(train_step)

    for epoch in range(args.epochs):
        t0 = time.time()
        losses = []
        for i, batch in enumerate(
            make_batches(train, cfg.num_sample, cfg.batch_size, seed=cfg.seed + epoch, with_images=with_images)
        ):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            state, metrics = jit_train(state, batch, jax.random.fold_in(jax.random.PRNGKey(1), epoch * 10000 + i))
            losses.append(float(metrics["loss"]))
        print(f"epoch {epoch}: loss {np.mean(losses):.4f} ({time.time()-t0:.1f}s)")
        if (epoch + 1) % max(args.epochs // 5, 1) == 0 or epoch == args.epochs - 1:
            path = _save_ckpt(args.ckpt_dir, epoch + 1, state.params)
            print(f"saved {path}")
    return state


def test_main(args):
    cfg = RegressorConfig(num_sample=args.num_sample)
    data = load_pose_dataset(
        args.dataset, args.data_root, getattr(args, "pairs_dir", "data/pairs"),
        args.points_dir, load_images=False,
    )
    _, val = train_val_split(data, seed=cfg.seed)
    model = MkptsRegModel(cfg)
    first = next(make_batches(val, cfg.num_sample, 1, seed=cfg.seed))
    sample = (jnp.asarray(first["mkpts0"]), jnp.asarray(first["mkpts1"]), None, None)
    state = create_train_state(model, jax.random.PRNGKey(0), sample, cfg)
    params = load_ckpt(args.ckpt, state.params)
    state = state.replace(params=params)

    jit_eval = jax.jit(eval_step)
    R_errs, t_errs, ids = [], [], []
    for batch in make_batches(val, cfg.num_sample, cfg.batch_size, seed=cfg.seed, shuffle=False):
        out = jit_eval(state, {k: jnp.asarray(v) for k, v in batch.items()})
        R_errs.extend(np.asarray(out["R_err"]).tolist())
        t_errs.extend(np.asarray(out["t_err"]).tolist())
    metrics = aggregate_metrics_mean({"R_errs": R_errs, "t_errs": t_errs, "identifiers": ids})
    for k in ("R:ACC15", "R:ACC30", "R:auc@30", "R:medianErr", "R:meanErr"):
        print(f"{k}: {metrics[k]:.4f}")
    return metrics
