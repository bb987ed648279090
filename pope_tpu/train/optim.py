"""Optimizers + LR schedules (optax).

Behavioral spec: src/optimizers/__init__.py (adam/adamw with weight decay;
MultiStepLR / CosineAnnealing / ExponentialLR schedulers) and the linear
warmup the lightning module applies per-step
(lightning_loftr.py:60-80: ratio ramp from warmup_ratio to 1 over
warmup_steps, 'linear' or 'constant').
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import optax


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    optimizer: str = "adamw"  # 'adam' | 'adamw'
    lr: float = 8e-3  # the reference's canonical true_lr before batch scaling
    weight_decay: float = 0.1
    scheduler: str = "MultiStepLR"  # | 'CosineAnnealing' | 'ExponentialLR'
    mslr_milestones: Sequence[int] = (3, 6, 9, 12)  # in epochs
    mslr_gamma: float = 0.5
    cosa_tmax: int = 30
    elr_gamma: float = 0.999992
    warmup_steps: int = 4800
    warmup_ratio: float = 0.0
    warmup_type: str = "linear"  # | 'constant'
    steps_per_epoch: int = 1000  # converts epoch milestones to steps


def build_schedule(cfg: OptimConfig):
    spe = cfg.steps_per_epoch
    if cfg.scheduler == "MultiStepLR":
        base = optax.piecewise_constant_schedule(
            cfg.lr, {m * spe: cfg.mslr_gamma for m in cfg.mslr_milestones}
        )
    elif cfg.scheduler == "CosineAnnealing":
        base = optax.cosine_decay_schedule(cfg.lr, cfg.cosa_tmax * spe)
    elif cfg.scheduler == "ExponentialLR":
        base = lambda step: cfg.lr * cfg.elr_gamma**step  # per-step gamma
    else:
        raise NotImplementedError(cfg.scheduler)

    if cfg.warmup_steps <= 0:
        return base

    def schedule(step):
        import jax.numpy as jnp

        warm = jnp.minimum(step / cfg.warmup_steps, 1.0)
        if cfg.warmup_type == "linear":
            ratio = cfg.warmup_ratio + (1.0 - cfg.warmup_ratio) * warm
        else:
            ratio = jnp.where(step < cfg.warmup_steps, cfg.warmup_ratio, 1.0)
        return base(step) * ratio

    return schedule


def build_optimizer(cfg: OptimConfig = OptimConfig()) -> optax.GradientTransformation:
    schedule = build_schedule(cfg)
    if cfg.optimizer == "adam":
        return optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.adam(schedule),
        )
    if cfg.optimizer == "adamw":
        return optax.adamw(schedule, weight_decay=cfg.weight_decay)
    raise ValueError(cfg.optimizer)
