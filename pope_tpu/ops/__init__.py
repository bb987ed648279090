"""TPU compute ops: attention variants, correlation/matching kernels, image
resampling, NMS. jnp reference implementations with Pallas fast paths for the
hot shapes."""

from pope_tpu.ops.attention import linear_attention, full_attention
from pope_tpu.ops.quant import QuantDense, dense_w8a8, quantize_rows, quantize_weight_cols
from pope_tpu.ops.resize import upsample2x_align_corners, resize_bilinear_torch
from pope_tpu.ops.ring_attention import ring_attention
