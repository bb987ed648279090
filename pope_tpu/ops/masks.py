"""Mask post-processing ops (jnp, static shapes).

Behavioral spec: segment_anything/utils/amg.py — stability score :156-176,
point grids :179-197, batched mask->box :303-339; RLE encode/decode
:107-152 are host-edge utilities (numpy) used only for reference-format
interchange and parity tests, never on the hot path (the TPU pipeline keeps
masks as dense fixed-capacity tensors).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def calculate_stability_score(mask_logits, mask_threshold: float, offset: float):
    """IoU between high- and low-threshold binarizations (amg.py:156-176).
    mask_logits: (..., H, W)."""
    hi = jnp.sum(mask_logits > (mask_threshold + offset), axis=(-2, -1))
    lo = jnp.sum(mask_logits > (mask_threshold - offset), axis=(-2, -1))
    return hi.astype(jnp.float32) / jnp.maximum(lo, 1).astype(jnp.float32)


def batched_mask_to_box(masks):
    """XYXY boxes around boolean masks; [0,0,0,0] for empty (amg.py:303-339).
    masks: (..., H, W) bool -> (..., 4) float."""
    h, w = masks.shape[-2:]
    in_height = jnp.any(masks, axis=-1)  # (..., H)
    ys = jnp.arange(h)
    hc = in_height * ys
    bottom = jnp.max(hc, axis=-1)
    top = jnp.min(hc + h * (~in_height), axis=-1)
    in_width = jnp.any(masks, axis=-2)
    xs = jnp.arange(w)
    wc = in_width * xs
    right = jnp.max(wc, axis=-1)
    left = jnp.min(wc + w * (~in_width), axis=-1)
    empty = (right < left) | (bottom < top)
    box = jnp.stack([left, top, right, bottom], axis=-1).astype(jnp.float32)
    return box * (~empty[..., None])


def build_point_grid(n_per_side: int) -> np.ndarray:
    """(n^2, 2) grid of [0,1]-normalized (x, y) points (amg.py:179-186)."""
    offset = 1.0 / (2 * n_per_side)
    side = np.linspace(offset, 1 - offset, n_per_side)
    x = np.tile(side[None, :], (n_per_side, 1))
    y = np.tile(side[:, None], (1, n_per_side))
    return np.stack([x, y], axis=-1).reshape(-1, 2)


def box_iou(boxes_a, boxes_b):
    """Pairwise IoU of XYXY boxes: (N, 4) x (M, 4) -> (N, M)."""
    area_a = jnp.maximum(boxes_a[:, 2] - boxes_a[:, 0], 0) * jnp.maximum(
        boxes_a[:, 3] - boxes_a[:, 1], 0
    )
    area_b = jnp.maximum(boxes_b[:, 2] - boxes_b[:, 0], 0) * jnp.maximum(
        boxes_b[:, 3] - boxes_b[:, 1], 0
    )
    lt = jnp.maximum(boxes_a[:, None, :2], boxes_b[None, :, :2])
    rb = jnp.minimum(boxes_a[:, None, 2:], boxes_b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


# ---- host-edge RLE (reference interchange format, amg.py:107-152) ----

def mask_to_rle(mask: np.ndarray) -> dict:
    """Binary (H, W) -> uncompressed column-major RLE dict {'size', 'counts'}
    (amg.py:107-131: runs alternate starting with the count of 0s)."""
    h, w = mask.shape
    flat = np.asarray(mask, bool).transpose().reshape(-1)  # column-major (F order)
    change = np.nonzero(flat[1:] != flat[:-1])[0] + 1
    idx = np.concatenate([[0], change, [len(flat)]])
    runs = np.diff(idx).tolist()
    if flat[0]:
        runs = [0] + runs
    return {"size": [h, w], "counts": runs}


def rle_to_mask(rle: dict) -> np.ndarray:
    """Inverse of mask_to_rle (amg.py:134-145)."""
    h, w = rle["size"]
    flat = np.empty(h * w, bool)
    idx = 0
    parity = False
    for count in rle["counts"]:
        flat[idx : idx + count] = parity
        idx += count
        parity = not parity
    return flat.reshape(w, h).transpose()
