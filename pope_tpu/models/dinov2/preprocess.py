"""DINOv2 preprocessing + retrieval scoring (jit-safe).

Behavioral spec: segment_anything/segment_anything/dinov2_utils.py:55-78
(set_torch_image: Resize(256,256) -> CenterCrop(196,196) when center_crop,
else Resize(224,224); ImageNet mean/std normalization) and the cosine
similarity retrieval vote (eval_linemod_json.py:94: F.cosine_similarity of
cls tokens).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def preprocess_image(image, center_crop: bool = False):
    """(H, W, 3) RGB uint8/float [0,255] -> (1, h, w, 3) normalized floats.

    center_crop=True: resize to 256x256 then crop the central 196x196
    (the prompt/crop path); False: resize to 224x224.
    """
    img = jnp.asarray(image, jnp.float32) / 255.0
    if center_crop:
        img = jax.image.resize(img, (256, 256, 3), method="bilinear", antialias=True)
        img = img[30:226, 30:226]  # CenterCrop(196): offset (256-196)//2
    else:
        img = jax.image.resize(img, (224, 224, 3), method="bilinear", antialias=True)
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    return ((img - mean) / std)[None]


def cls_token_cosine(ref_cls, crop_cls, eps: float = 1e-8):
    """Cosine similarity between (C,)/(B, C) cls tokens
    (eval_linemod_json.py:94)."""
    ref = ref_cls / jnp.maximum(jnp.linalg.norm(ref_cls, axis=-1, keepdims=True), eps)
    crop = crop_cls / jnp.maximum(jnp.linalg.norm(crop_cls, axis=-1, keepdims=True), eps)
    return jnp.sum(ref * crop, axis=-1)
