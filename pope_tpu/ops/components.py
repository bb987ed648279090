"""On-device connected components + small-region cleanup (jnp, static shapes).

Behavioral spec: segment_anything/utils/amg.py:342-372 `remove_small_regions`
(cv2.connectedComponentsWithStats with 8-connectivity; in islands mode keep
the largest island when all fall below the threshold; changed=True whenever
any small region existed). Device twin of `native.remove_small_regions`
(native/pope_native.cpp) — parity-tested against it in tests/test_ops.py.

TPU-native design notes (measured on a real v5e through the axon tunnel):
per-element scatter/gather lower to ~8M elem/s on TPU — a histogram of
component areas or a pointer-jump (label <- label[label]) is 30-100x slower
than the arithmetic around it. So this module uses NO gathers or scatters:

- Labelling: min-neighbour propagation where each round also runs segmented
  min-SCANS along rows and columns (jax.lax.associative_scan), so a label
  crosses an entire straight run in one round instead of one pixel per
  round. Blob-shaped masks converge in a handful of rounds (vs O(diameter)
  for pure neighbour-min); a `lax.while_loop` exits on the first round with
  no change.
- Areas: instead of a scatter-add histogram, the K lowest root indices are
  extracted with `top_k` and each root's area is a broadcast compare+reduce
  (`sum(labels == root)`), which XLA fuses into K accumulators over one
  read of the label map — MXU/VPU-shaped, no random access. K bounds how
  many components get processed (smallest-root-first = raster order, like
  cv2 label order); real SAM masks have far fewer components than the
  default K=256, and components beyond K are conservatively kept untouched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _shift_along(x, d: int, axis: int, fill):
    """x shifted by +d along `axis` (element i takes value from i-d; d may be
    negative), vacated slots filled — static pad+slice only (TPU-cheap; both
    jnp.roll and lax.associative_scan lower ~50x slower here)."""
    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (d, 0) if d > 0 else (0, -d)
    start = [0] * x.ndim
    if d < 0:
        start[axis] = -d
    return jax.lax.dynamic_slice(
        jnp.pad(x, pad, constant_values=fill), start, x.shape
    )


def _segmented_min_scan(lab, working, big, axis: int, reverse: bool):
    """Min-scan of `lab` along `axis`, restarting at every background pixel
    (so minima propagate along maximal foreground runs only).

    Hillis-Steele doubling with static shifts: log2(n) steps of
    v <- flag ? v : min(v, v[i-d]); flag <- flag | flag[i-d]."""
    step = -1 if reverse else 1
    # a segment starts at the array edge, at any background pixel, or right
    # after one (scanning direction decides which neighbour is "before")
    flags = ~working | _shift_along(~working, step, axis, True)
    v = jnp.where(working, lab, big)
    d = step
    n = lab.shape[axis]
    while abs(d) < n:
        v = jnp.where(flags, v, jnp.minimum(v, _shift_along(v, d, axis, big)))
        flags = flags | _shift_along(flags, d, axis, True)
        d *= 2
    return jnp.where(working, v, big)


def label_components(mask, max_iters: int = 64):
    """8-connected component labels of a (H, W) bool mask.

    Returns (H, W) int32: each foreground pixel holds the smallest linear
    index (row-major) of its component; background pixels hold H*W.
    """
    h, w = mask.shape
    big = jnp.int32(h * w)
    idx = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    lab0 = jnp.where(mask, idx, big)

    def neighbour_min(lab):
        p = jnp.pad(lab, 1, constant_values=big)
        m = lab
        for dy in (0, 1, 2):
            for dx in (0, 1, 2):
                if dy == 1 and dx == 1:
                    continue
                m = jnp.minimum(m, p[dy : dy + h, dx : dx + w])
        return jnp.where(mask, m, big)

    def sweep(lab):
        lab = neighbour_min(lab)  # all 8 directions incl. diagonals
        lab = _segmented_min_scan(lab, mask, big, axis=1, reverse=False)
        lab = _segmented_min_scan(lab, mask, big, axis=1, reverse=True)
        lab = _segmented_min_scan(lab, mask, big, axis=0, reverse=False)
        lab = _segmented_min_scan(lab, mask, big, axis=0, reverse=True)
        return lab

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        lab, _, it = state
        new = sweep(lab)
        return new, jnp.any(new != lab), it + 1

    lab, _, _ = jax.lax.while_loop(cond, body, (lab0, jnp.bool_(True), jnp.int32(0)))
    return lab


def component_roots(labels, mask, k: int = 64):
    """The k raster-first component root indices of a labelled mask.

    labels: (H, W) int32 from label_components; mask: the (H, W) bool it was
    computed from. Returns (k,) int32 linear root indices ascending (== cv2
    raster label order), padded with H*W. One top_k over the root-indicator
    map — no scatter/gather."""
    h, w = labels.shape
    big = jnp.int32(h * w)
    idx = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    is_root = mask & (labels == idx)
    neg, _ = jax.lax.top_k(jnp.where(is_root, -idx, -big).reshape(-1), k)
    return -neg


def component_roots_and_areas(labels, mask, k: int = 64):
    """k raster-first roots and their exact areas ((k,) int32 each; padding
    roots hold H*W with area 0). The membership matrix (pixels x k) is
    materialized once in bf16 and reduced as a matmul — MXU-shaped, no
    random access."""
    roots = component_roots(labels, mask, k)
    matches = _membership(labels, roots)
    areas = jnp.matmul(
        jnp.ones((labels.size,), jnp.bfloat16), matches,
        preferred_element_type=jnp.float32,
    )
    return roots, areas.astype(jnp.int32)


def _membership(labels, roots):
    """(H*W, k) bf16 membership matrix [lab_p == root_k]. Padding roots
    (value H*W) would match every background pixel, so their columns are
    zeroed."""
    big = jnp.int32(labels.size)
    flat = labels.reshape(-1)
    m = (flat[:, None] == roots[None, :]) & (roots[None, :] < big)
    return m.astype(jnp.bfloat16)


def remove_small_regions(mask, area_thresh, mode: str, max_iters: int = 64, k: int = 64):
    """Device twin of native.remove_small_regions (amg.py:342-372 semantics).

    mask: (H, W) bool. mode: 'holes' fills small background components;
    'islands' drops small foreground components, keeping the largest island
    when ALL are small. Returns (mask', changed) with changed=True whenever
    any small region existed.

    k caps how many components are processed (raster-first); components
    beyond it are kept untouched. area_thresh may be a traced scalar.
    """
    if mode not in ("holes", "islands"):
        raise ValueError(f"unknown mode {mode!r}")
    holes = mode == "holes"
    h, w = mask.shape
    big = jnp.int32(h * w)
    working = ~mask if holes else mask
    lab = label_components(working, max_iters=max_iters)
    roots = component_roots(lab, working, k=k)
    matches = _membership(lab, roots)  # (H*W, k) bf16, built once
    areas = jnp.matmul(
        jnp.ones((h * w,), jnp.bfloat16), matches,
        preferred_element_type=jnp.float32,
    )
    real = roots < big
    small_root = real & (areas < area_thresh)
    # paint per-pixel smallness: one (H*W, k) @ (k,) matmul
    small = (
        jnp.matmul(
            matches, small_root.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).reshape(h, w)
        > 0.5
    )
    changed = jnp.any(small_root)
    if holes:
        out = mask | small
    else:
        out = mask & ~small
        # all islands small -> keep the largest (amg.py:361-363); argmax over
        # ascending-root areas picks the raster-first of tied components,
        # matching cv2 + np.argmax label order
        any_kept = jnp.any(out)
        best = roots[jnp.argmax(jnp.where(real, areas, -1.0))]
        out = jnp.where(any_kept, out, working & (lab == best))
    return jnp.where(changed, out, mask), changed


def clean_mask(mask, area_thresh, max_iters: int = 64, k: int = 64):
    """holes-then-islands cleanup of one (H, W) bool mask — the per-mask body
    of the AMG postprocess (automatic_mask_generator.py:350-356). Returns
    (mask', changed)."""
    m1, ch1 = remove_small_regions(mask, area_thresh, "holes", max_iters, k)
    m2, ch2 = remove_small_regions(m1, area_thresh, "islands", max_iters, k)
    return m2, ch1 | ch2
