"""Matcher losses (jnp, static shapes).

Behavioral spec: src/losses/loftr_loss.py — compute_coarse_loss :22-100
(focal default alpha=0.25 gamma=2, pos/neg weights, dense or sparse
supervision, padded-region weights), _compute_fine_loss_l2_std :118-145
(inverse-std-weighted l2 on window-normalized offsets, correctness mask at
|gt|_inf < 1), total = loss_c * coarse_weight + loss_f * fine_weight.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LossConfig:
    coarse_type: str = "focal"  # 'focal' | 'cross_entropy'
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    pos_weight: float = 1.0
    neg_weight: float = 1.0
    fine_type: str = "l2_with_std"  # 'l2_with_std' | 'l2'
    fine_correct_thr: float = 1.0
    coarse_weight: float = 1.0
    fine_weight: float = 1.0


def coarse_loss(conf, conf_gt, cfg: LossConfig = LossConfig(), weight=None):
    """Dense focal / CE loss on the (B, L, S) confidence matrix."""
    conf = jnp.clip(conf, 1e-6, 1 - 1e-6)
    pos = conf_gt > 0.5
    neg = ~pos
    w = jnp.ones_like(conf) if weight is None else weight
    posf = pos.astype(jnp.float32) * w
    negf = neg.astype(jnp.float32) * w
    n_pos = jnp.maximum(jnp.sum(posf), 1.0)
    n_neg = jnp.maximum(jnp.sum(negf), 1.0)
    if cfg.coarse_type == "cross_entropy":
        lp = -jnp.log(conf) * posf
        ln = -jnp.log(1 - conf) * negf
    else:
        a, g = cfg.focal_alpha, cfg.focal_gamma
        lp = -a * (1 - conf) ** g * jnp.log(conf) * posf
        ln = -a * conf**g * jnp.log(1 - conf) * negf
    return cfg.pos_weight * jnp.sum(lp) / n_pos + cfg.neg_weight * jnp.sum(ln) / n_neg


def fine_loss(expec_f, expec_f_gt, match_valid, cfg: LossConfig = LossConfig()):
    """l2(+std) loss on (B, M, 3) predicted offsets+std vs (B, M, 2) GT.

    Matches with |gt|_inf >= fine_correct_thr (outside the window) or
    invalid slots carry zero weight (loftr_loss.py:118-145).
    """
    gt_ok = jnp.max(jnp.abs(expec_f_gt), axis=-1) < cfg.fine_correct_thr
    w = (gt_ok & match_valid).astype(jnp.float32)
    offset_l2 = jnp.sum((expec_f[..., :2] - expec_f_gt) ** 2, axis=-1)
    if cfg.fine_type == "l2_with_std":
        std = expec_f[..., 2]
        inverse_std = 1.0 / jnp.clip(std, 1e-10, None)
        # the weight MUST be detached exactly like the reference
        # (loftr_loss.py: `weight = (inverse_std / torch.mean(inverse_std))
        # .detach()`): with gradients flowing into it, the model can shrink
        # the loss by RAISING std on hard matches (down-weighting them away)
        # instead of improving their offsets — measured as a ~2.4px fine
        # plateau on the synthetic accuracy harness that no amount of
        # training moved
        ws = jax.lax.stop_gradient(
            inverse_std / jnp.maximum(jnp.mean(inverse_std * w), 1e-10)
        )
        offset_l2 = offset_l2 * jnp.where(w > 0, ws, 0.0)
    n = jnp.maximum(jnp.sum(w), 1.0)
    return jnp.sum(offset_l2 * w) / n


def matcher_loss(result, spv, expec_f_gt, cfg: LossConfig = LossConfig(), weight=None):
    """Total loss from a MatchResult with aux conf matrix + supervision."""
    lc = coarse_loss(result.conf_matrix, spv["conf_matrix_gt"], cfg, weight)
    lf = fine_loss(result.expec_f, expec_f_gt, result.valid, cfg)
    total = cfg.coarse_weight * lc + cfg.fine_weight * lf
    return total, {"loss": total, "loss_coarse": lc, "loss_fine": lf}
