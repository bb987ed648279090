"""SAM: promptable segmentation (image encoder ViT-B/L/H, prompt encoder,
two-way mask decoder) + automatic mask generation.

Reference behavior: segment_anything/segment_anything/modeling/ (image_encoder
.py, prompt_encoder.py, mask_decoder.py, transformer.py, sam.py),
predictor.py, automatic_mask_generator.py, utils/amg.py, utils/transforms.py;
per-size params build_sam.py:13-50.
"""

from pope_tpu.models.sam.encoder import ImageEncoderViT
from pope_tpu.models.sam.prompt import PromptEncoder, random_position_embedding
from pope_tpu.models.sam.decoder import MaskDecoder, TwoWayTransformer
from pope_tpu.models.sam.sam import Sam
from pope_tpu.models.sam.convert import convert_torch_sam_state
from pope_tpu.models.sam.amg import AutomaticMaskGenerator, AMGResult
