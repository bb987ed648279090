"""Composite SAM model: preprocess -> encode -> prompt -> decode ->
postprocess (flax, functional).

Behavioral spec: segment_anything/modeling/sam.py —
preprocess (mean/std normalize + pad to square, :164-174), forward
(:53-131), postprocess_masks (two-stage bilinear upsample with padding
removal, :133-162); `ResizeLongestSide` coordinate/image transforms
utils/transforms.py:16-92.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pope_tpu.config import SamConfig
from pope_tpu.models.sam.decoder import MaskDecoder
from pope_tpu.models.sam.encoder import ImageEncoderViT
from pope_tpu.models.sam.prompt import PromptEncoder, dense_grid_pe
from pope_tpu.ops.resize import resize_bilinear_torch

MASK_THRESHOLD = 0.0


def resize_longest_side(h: int, w: int, long_side: int) -> Tuple[int, int]:
    """Output (h', w') with the longer side scaled to `long_side`
    (transforms.py:60-68)."""
    scale = long_side / max(h, w)
    return int(h * scale + 0.5), int(w * scale + 0.5)


def rect_frame(input_hw: Tuple[int, int], patch_size: int = 16) -> Tuple[int, int]:
    """Smallest patch-aligned frame containing the resized content — the
    rect-encode eval mode's frame (vs the reference's square pad): a 640x480
    image resized to 1024x768 gets a (768, 1024) frame / 48x64 token grid."""
    h, w = input_hw
    up = lambda v: -(-v // patch_size) * patch_size
    return up(h), up(w)


def apply_coords(coords, orig_hw: Tuple[int, int], long_side: int = 1024):
    """Rescale (..., 2) xy pixel coords from the original frame to the
    resized-longest-side frame (transforms.py:38-49)."""
    old_h, old_w = orig_hw
    new_h, new_w = resize_longest_side(old_h, old_w, long_side)
    return coords * jnp.asarray([new_w / old_w, new_h / old_h], jnp.float32)


def apply_boxes(boxes, orig_hw: Tuple[int, int], long_side: int = 1024):
    """Rescale (..., 4) XYXY boxes to the resized-longest-side frame
    (transforms.py:51-57: boxes are corner-point pairs under apply_coords)."""
    boxes = jnp.asarray(boxes)
    pts = apply_coords(boxes.reshape(boxes.shape[:-1] + (2, 2)), orig_hw, long_side)
    return pts.reshape(boxes.shape)


class Sam(nn.Module):
    config: SamConfig = SamConfig()

    def setup(self):
        cfg = self.config
        self.image_encoder = ImageEncoderViT(cfg.encoder, name="image_encoder")
        self.prompt_encoder = PromptEncoder(
            embed_dim=cfg.prompt_embed_dim,
            image_embedding_size=(cfg.image_embedding_size, cfg.image_embedding_size),
            input_image_size=(cfg.encoder.img_size, cfg.encoder.img_size),
            mask_in_chans=cfg.mask_in_chans,
            name="prompt_encoder",
        )
        self.mask_decoder = MaskDecoder(
            transformer_dim=cfg.prompt_embed_dim,
            num_multimask_outputs=cfg.num_multimask_outputs,
            depth=cfg.decoder_depth,
            num_heads=cfg.decoder_num_heads,
            mlp_dim=cfg.decoder_mlp_dim,
            iou_head_hidden_dim=cfg.iou_head_hidden_dim,
            dtype=jnp.dtype(cfg.decoder_dtype),
            name="mask_decoder",
        )

    def preprocess(self, image_resized, input_hw: Tuple[int, int], frame_hw: Optional[Tuple[int, int]] = None):
        """(H', W', 3) RGB [0,255] already longest-side-resized ->
        (1, fh, fw, 3) normalized + zero-padded (sam.py:164-174).

        frame_hw defaults to the reference's square (img_size, img_size)
        frame; the rect-encode eval mode passes the content extent rounded up
        to patch multiples instead (rect_frame), skipping pure-padding
        encoder tokens."""
        cfg = self.config
        mean = jnp.asarray(cfg.pixel_mean)
        std = jnp.asarray(cfg.pixel_std)
        x = (jnp.asarray(image_resized, jnp.float32) - mean) / std
        S = cfg.encoder.img_size
        fh, fw = (S, S) if frame_hw is None else frame_hw
        h, w = input_hw
        x = jnp.pad(x, ((0, fh - h), (0, fw - w), (0, 0)))
        return x[None]

    def encode_image(self, preprocessed):
        return self.image_encoder(preprocessed)  # (1, 64, 64, 256)

    def dense_pe(self):
        return self.prompt_encoder.get_dense_pe()

    def decode(
        self,
        image_embeddings,
        points,
        labels,
        masks_input=None,
        multimask_output: bool = True,
        subsample: int = 1,
    ):
        """points: (B, N, 2) coords in the 1024-frame; labels: (B, N).
        Returns (low_res_masks (B, K, 256, 256), iou_pred (B, K)).
        subsample=4: exact stride-4-subsampled logits (B, K, 64, 64) at 1/16
        the upscale cost (decoder.UpConvT).

        RECT embeddings (B, gh, gw, C) are handled transparently: dense PE
        and the no-mask embedding follow the embedding grid (masks then come
        back at (B, K, 4*gh, 4*gw) covering the rect frame)."""
        embed_hw = tuple(image_embeddings.shape[1:3])
        sparse, dense = self.prompt_encoder(
            points, labels, masks_input, embed_hw=embed_hw
        )
        masks, iou = self.mask_decoder(
            image_embeddings,
            self.prompt_encoder.get_dense_pe(embed_hw),
            sparse,
            dense,
            multimask_output=multimask_output,
            subsample=subsample,
        )
        return masks, iou

    def __call__(self, image_resized, input_hw, points, labels, multimask_output=True):
        x = self.preprocess(image_resized, input_hw)
        emb = self.encode_image(x)
        return self.decode(emb, points, labels, multimask_output=multimask_output)


def postprocess_masks(low_res_masks, input_hw, original_hw,
                      frame_hw: Optional[Tuple[int, int]] = None):
    """(B, K, 256, 256) logits -> (B, K, H0, W0) at the original image size
    (sam.py:133-162: upsample to 1024, strip padding, upsample to original).

    frame_hw: pixel extent the low-res masks cover. Default: 4x the mask
    grid, which is exact for every full-res decode output (patch 16 halves
    twice in UpConvT: a 64x64 token grid -> 256 mask cells -> 1024-px square
    frame; a rect-encode 48x64 grid -> (192, 256) cells -> (768, 1024)
    frame). Pass explicitly only for subsampled eval masks (which nothing
    upsamples today).
    """
    B, K = low_res_masks.shape[:2]
    if frame_hw is None:
        frame_hw = (4 * low_res_masks.shape[-2], 4 * low_res_masks.shape[-1])
    fh, fw = frame_hw
    m = low_res_masks.reshape(B * K, *low_res_masks.shape[2:])[..., None]
    m = resize_bilinear_torch(m, (fh, fw), align_corners=False)
    m = m[:, : input_hw[0], : input_hw[1]]
    m = resize_bilinear_torch(m, tuple(original_hw), align_corners=False)
    return m[..., 0].reshape(B, K, *original_hw)
