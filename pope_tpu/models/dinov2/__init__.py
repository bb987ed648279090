"""DINOv2 ViT retrieval encoder.

Reference behavior: dinov2/dinov2/models/vision_transformer.py (ViT with
layer scale + bicubic pos-embed interpolation), dinov2/dinov2/layers/
(pre-norm blocks, MemEffAttention), segment_anything/segment_anything/
dinov2_utils.py (preprocessing + cls-token extraction + PCA heatmap).
"""

from pope_tpu.models.dinov2.model import (
    DinoVisionTransformer,
    vit_small,
    vit_base,
    vit_large,
    vit_giant2,
)
from pope_tpu.models.dinov2.convert import convert_torch_dinov2_state
from pope_tpu.models.dinov2.preprocess import preprocess_image, cls_token_cosine
