"""On-device connected components + small-region cleanup (jnp, static shapes).

Behavioral spec: segment_anything/utils/amg.py:342-372 `remove_small_regions`
(cv2.connectedComponentsWithStats with 8-connectivity; in islands mode keep
the largest island when all fall below the threshold; changed=True whenever
any small region existed). Device twin of `native.remove_small_regions`
(native/pope_native.cpp) — parity-tested against it in tests/test_ops.py.

TPU-native design: labelling runs as iterative min-neighbour propagation
accelerated by pointer jumping (label <- label[label]) inside a
`lax.while_loop`, so convergence is ~O(log diameter) data-parallel sweeps
instead of a sequential union-find. Per-component areas come from one
scatter-add histogram over the label ids. Everything is fixed-shape and jit/
vmap-safe, which lets the whole AMG small-region postprocess live inside the
fused per-batch program — masks never leave the device on the eval path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def label_components(mask, max_iters: int = 512):
    """8-connected component labels of a (H, W) bool mask.

    Returns (H, W) int32: each foreground pixel holds the smallest linear
    index (row-major) of its component; background pixels hold H*W.

    Min-neighbour propagation + double pointer jumping per sweep. Labels are
    always linear indices of same-component pixels (propagation moves values
    only across in-component adjacencies, and the jump gathers the label AT
    such an index), so the fixpoint is exactly the component minimum.
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

    def jump(lab):
        # label <- label[label]; the pad slot keeps `big` a fixpoint
        flat = jnp.concatenate([lab.reshape(-1), jnp.array([big], jnp.int32)])
        return flat[lab.reshape(-1)].reshape(h, w)

    def cond(state):
        lab, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        lab, _, it = state
        new = jump(jump(neighbour_min(lab)))
        return new, jnp.any(new != lab), it + 1

    lab, _, _ = jax.lax.while_loop(cond, body, (lab0, jnp.bool_(True), jnp.int32(0)))
    return lab


def component_areas(labels, n_bins: int):
    """(H, W) int32 labels -> (n_bins + 1,) int32 pixel count per label id
    (one scatter-add histogram; the background/big id lands in bin n_bins)."""
    flat = jnp.minimum(labels.reshape(-1), n_bins)
    return jnp.zeros(n_bins + 1, jnp.int32).at[flat].add(1)


def remove_small_regions(mask, area_thresh, mode: str, max_iters: int = 512):
    """Device twin of native.remove_small_regions (amg.py:342-372 semantics).

    mask: (H, W) bool. mode: 'holes' fills small background components;
    'islands' drops small foreground components, keeping the largest island
    when ALL are small. Returns (mask', changed) with changed=True whenever
    any small region existed.

    area_thresh may be a traced scalar (it is data-independent of shapes).
    """
    if mode not in ("holes", "islands"):
        raise ValueError(f"unknown mode {mode!r}")
    holes = mode == "holes"
    h, w = mask.shape
    n = h * w
    working = ~mask if holes else mask
    lab = label_components(working, max_iters=max_iters)
    areas = component_areas(lab, n)  # (n+1,), bin n = non-working pixels
    pix_area = areas[jnp.minimum(lab.reshape(-1), n)].reshape(h, w)
    small = working & (pix_area < area_thresh)
    changed = jnp.any(small)
    if holes:
        out = mask | small
    else:
        out = mask & ~small
        # all islands small -> keep the largest (amg.py:361-363). The largest
        # island's root id: argmax area over real labels (bin n excluded).
        any_kept = jnp.any(out)
        best = jnp.argmax(areas[:n])
        out = jnp.where(any_kept, out, working & (lab == best))
    return jnp.where(changed, out, mask), changed


def clean_mask(mask, area_thresh, max_iters: int = 512):
    """holes-then-islands cleanup of one (H, W) bool mask — the per-mask body
    of the AMG postprocess (automatic_mask_generator.py:350-356). Returns
    (mask', changed)."""
    m1, ch1 = remove_small_regions(mask, area_thresh, "holes", max_iters)
    m2, ch2 = remove_small_regions(m1, area_thresh, "islands", max_iters)
    return m2, ch1 | ch2
