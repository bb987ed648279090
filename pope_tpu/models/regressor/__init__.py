"""Pose-regression extension ("MoCoPE"): direct relative-pose regressors
trained on matcher keypoint dumps.

Reference behavior: pose/model0429_{mkpts,imgs,mkpts_imgs}.py (NeRF-style
positional embedding + transformer fusion + MLP + rotation/translation heads,
rotation in matrix/quat/6d), pose/model0604.py (MoCoPE), pose/convnextv2/
(image branch), train0429*.py / train0604.py (Adam 1e-5, L2(t) +
geodesic(R) loss), test0608.py (eval).
"""

from pope_tpu.models.regressor.embedding import nerf_embedding
from pope_tpu.models.regressor.model import MkptsRegModel
from pope_tpu.models.regressor.convnextv2 import ConvNeXtV2
from pope_tpu.models.regressor.train import (
    TrainState,
    create_train_state,
    pose_loss,
    train_step,
    eval_step,
)
