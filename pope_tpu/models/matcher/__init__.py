"""LoFTR-style coarse-to-fine feature matcher, TPU-native.

Reference behavior: src/matcher/ (matcher.py, backbone/resnet_fpn.py,
loftr_module/, utils/coarse_matching.py, utils/fine_matching.py) with config
src/matcher/utils/cvpr_ds_config.py. All dynamic-shape joints (match counts)
are fixed-capacity masked tensors so the full pipeline jits with static shapes.
"""

from pope_tpu.models.matcher.model import Matcher, MatchResult
from pope_tpu.models.matcher.backbone import ResNetFPN
from pope_tpu.models.matcher.convert import convert_torch_matcher_state
