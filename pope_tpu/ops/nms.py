"""Batched box NMS on-chip (static shapes).

Replaces torchvision.ops.batched_nms (automatic_mask_generator.py:251 —
a C++/CUDA op in the reference). Greedy NMS as a lax.fori_loop over the
score-sorted candidate list with an (N, N) precomputed IoU matrix: each
step suppresses everything above the IoU threshold relative to the current
highest-scoring survivor. O(N^2) IoU is one small matmul-shaped op for the
N<=3072 proposal counts this pipeline sees.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pope_tpu.ops.masks import box_iou


def nms(boxes, scores, iou_threshold: float, valid=None):
    """Greedy NMS. Returns a keep mask (N,) bool.

    boxes: (N, 4) XYXY; scores: (N,); valid: optional (N,) bool.
    Matches torchvision.ops.nms semantics (descending score order, strictly
    greater-than threshold suppression).
    """
    N = boxes.shape[0]
    if valid is None:
        valid = jnp.ones(N, bool)
    iou = box_iou(boxes, boxes)
    order = jnp.argsort(jnp.where(valid, -scores, jnp.inf))  # valid best-first

    def body(i, state):
        keep, alive = state
        idx = order[i]
        take = alive[idx] & valid[idx]
        keep = keep.at[idx].set(take)
        # suppress neighbours of idx if taken
        suppress = take & (iou[idx] > iou_threshold)
        alive = alive & ~suppress
        # never suppress idx itself retroactively
        alive = alive.at[idx].set(alive[idx] | take)
        return keep, alive

    keep = jnp.zeros(N, bool)
    alive = jnp.ones(N, bool)
    keep, _ = jax.lax.fori_loop(0, N, body, (keep, alive))
    return keep & valid


def batched_nms(boxes, scores, idxs, iou_threshold: float, valid=None):
    """Category-aware NMS (torchvision batched_nms): offsets boxes per
    category so cross-category pairs never overlap."""
    max_coord = jnp.max(jnp.abs(boxes)) + 1.0
    offsets = idxs.astype(boxes.dtype)[:, None] * (2.0 * max_coord)
    return nms(boxes + offsets, scores, iou_threshold, valid)
