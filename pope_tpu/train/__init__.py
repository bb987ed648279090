"""Matcher (LoFTR-style) training infrastructure.

Reference behavior: the vestigial training stack — src/losses/loftr_loss.py
(focal/CE coarse + l2(+std) fine), src/matcher/utils/supervision.py
(depth-warped coarse/fine GT), src/optimizers (adam/adamw + schedulers),
src/lightning/lightning_loftr.py (train/val loop with warmup). The reference
stack cannot run (broken imports, SURVEY.md §2.4); this is a working
TPU-native equivalent: jitted supervision + loss, optax optimizers, dp-mesh
sharded train step.
"""

from pope_tpu.train.supervision import warp_kpts, spvs_coarse, spvs_fine
from pope_tpu.train.loss import coarse_loss, fine_loss, matcher_loss
from pope_tpu.train.optim import build_optimizer
from pope_tpu.train.trainer import matcher_train_step, make_sharded_train_step
from pope_tpu.train.matcher_driver import (
    TopKCheckpointer,
    TrainMatcherConfig,
    train_matcher,
    validate,
)
