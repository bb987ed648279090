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


def build_all_layer_point_grids(n_per_side: int, n_layers: int, scale_per_layer: int):
    """Per-crop-layer point grids: layer i uses n_per_side/scale^i points to
    a side (amg.py:190-198)."""
    # clamp to >=1 point per side: the reference's int(n/scale^i) can reach 0
    # for aggressive downscale factors, which would crash its own
    # build_point_grid with a division by zero — a config error, not a grid
    return [
        build_point_grid(max(int(n_per_side / (scale_per_layer**i)), 1))
        for i in range(n_layers + 1)
    ]


def generate_crop_boxes(im_size, n_layers: int, overlap_ratio: float):
    """XYXY crop boxes per layer: layer 0 is the full image, layer i has
    (2^i)^2 overlapping crops (amg.py:200-232). Returns (boxes, layer_idxs)."""
    import math

    im_h, im_w = im_size
    short_side = min(im_h, im_w)
    crop_boxes, layer_idxs = [[0, 0, im_w, im_h]], [0]

    def crop_len(orig_len, n_crops, overlap):
        return int(math.ceil((overlap * (n_crops - 1) + orig_len) / n_crops))

    for i_layer in range(n_layers):
        n_per_side = 2 ** (i_layer + 1)
        overlap = int(overlap_ratio * short_side * (2 / n_per_side))
        cw = crop_len(im_w, n_per_side, overlap)
        ch = crop_len(im_h, n_per_side, overlap)
        for x0 in (int((cw - overlap) * i) for i in range(n_per_side)):
            for y0 in (int((ch - overlap) * i) for i in range(n_per_side)):
                crop_boxes.append([x0, y0, min(x0 + cw, im_w), min(y0 + ch, im_h)])
                layer_idxs.append(i_layer + 1)
    return crop_boxes, layer_idxs


def is_box_near_crop_edge_np(boxes: np.ndarray, crop_box, orig_box, atol: float = 20.0):
    """(N,) bool: box touches the crop boundary but not the image boundary
    (amg.py:78-88). `boxes` are in CROP coordinates."""
    boxes = boxes + np.asarray([crop_box[0], crop_box[1], crop_box[0], crop_box[1]], np.float32)
    near_crop = np.isclose(boxes, np.asarray(crop_box, np.float32)[None], atol=atol, rtol=0)
    near_img = np.isclose(boxes, np.asarray(orig_box, np.float32)[None], atol=atol, rtol=0)
    return (near_crop & ~near_img).any(axis=1)


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
