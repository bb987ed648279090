"""Unit tests for mask/NMS/resize ops vs reference semantics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from pope_tpu.ops.masks import (
    batched_mask_to_box,
    box_iou,
    build_point_grid,
    calculate_stability_score,
    mask_to_rle,
    rle_to_mask,
)
from pope_tpu.ops.nms import nms, batched_nms
from pope_tpu.ops.resize import resize_bilinear_torch, upsample2x_align_corners


def test_stability_score_reference(rng):
    logits = rng.normal(0, 2, (5, 32, 32)).astype(np.float32)
    ours = np.asarray(calculate_stability_score(jnp.asarray(logits), 0.0, 1.0))
    # reference formula (amg.py:156-176)
    hi = (logits > 1.0).sum((-2, -1))
    lo = (logits > -1.0).sum((-2, -1))
    np.testing.assert_allclose(ours, hi / lo, atol=1e-6)


def test_mask_to_box_reference(rng):
    masks = rng.uniform(0, 1, (8, 24, 30)) > 0.8
    masks[0] = False  # empty mask -> [0,0,0,0]
    ours = np.asarray(batched_mask_to_box(jnp.asarray(masks)))
    for i, m in enumerate(masks):
        if not m.any():
            np.testing.assert_array_equal(ours[i], 0)
            continue
        ys, xs = np.nonzero(m)
        np.testing.assert_array_equal(ours[i], [xs.min(), ys.min(), xs.max(), ys.max()])


def test_point_grid_reference():
    grid = build_point_grid(4)
    assert grid.shape == (16, 2)
    assert abs(grid[0, 0] - 1 / 8) < 1e-9
    assert abs(grid[-1, 1] - 7 / 8) < 1e-9


def test_rle_roundtrip(rng):
    mask = rng.uniform(0, 1, (17, 23)) > 0.5
    rle = mask_to_rle(mask)
    back = rle_to_mask(rle)
    np.testing.assert_array_equal(back, mask)
    assert rle["size"] == [17, 23]


def test_nms_matches_greedy(rng):
    n = 40
    boxes = np.zeros((n, 4), np.float32)
    xy = rng.uniform(0, 100, (n, 2))
    wh = rng.uniform(5, 30, (n, 2))
    boxes[:, :2] = xy
    boxes[:, 2:] = xy + wh
    scores = rng.uniform(0, 1, n).astype(np.float32)

    keep = np.asarray(nms(jnp.asarray(boxes), jnp.asarray(scores), 0.35))

    # host greedy reference
    def iou(a, b):
        xa, ya = max(a[0], b[0]), max(a[1], b[1])
        xb, yb = min(a[2], b[2]), min(a[3], b[3])
        inter = max(0, xb - xa) * max(0, yb - ya)
        ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
        return inter / ua

    order = np.argsort(-scores)
    ref_keep = np.zeros(n, bool)
    suppressed = np.zeros(n, bool)
    for i in order:
        if suppressed[i]:
            continue
        ref_keep[i] = True
        for j in order:
            if j != i and not suppressed[j] and iou(boxes[i], boxes[j]) > 0.35:
                suppressed[j] = True
    np.testing.assert_array_equal(keep, ref_keep)


def test_batched_nms_categories(rng):
    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8])
    # same category: second suppressed
    keep = np.asarray(batched_nms(boxes, scores, jnp.asarray([0, 0]), 0.3))
    assert keep.tolist() == [True, False]
    # different categories: both kept
    keep2 = np.asarray(batched_nms(boxes, scores, jnp.asarray([0, 1]), 0.3))
    assert keep2.tolist() == [True, True]


def test_resize_bilinear_matches_torch(rng):
    x = rng.uniform(0, 1, (2, 13, 17, 3)).astype(np.float32)
    for align in (False, True):
        ours = np.asarray(
            resize_bilinear_torch(jnp.asarray(x), (26, 40), align_corners=align)
        )
        ref = (
            F.interpolate(
                torch.from_numpy(x.transpose(0, 3, 1, 2)), (26, 40),
                mode="bilinear", align_corners=align,
            )
            .numpy()
            .transpose(0, 2, 3, 1)
        )
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_upsample2x_align_corners_matches_torch(rng):
    x = rng.uniform(0, 1, (1, 8, 10, 4)).astype(np.float32)
    ours = np.asarray(upsample2x_align_corners(jnp.asarray(x)))
    ref = (
        F.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), scale_factor=2.0,
            mode="bilinear", align_corners=True,
        )
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_box_iou():
    a = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
    b = jnp.asarray([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], jnp.float32)
    iou = np.asarray(box_iou(a, b))[0]
    assert abs(iou[0] - 1.0) < 1e-6
    assert abs(iou[1] - 25 / 175) < 1e-6
    assert iou[2] == 0.0


# ---- on-device connected components (ops/components.py) ----

class TestDeviceComponents:
    def test_label_components_simple(self):
        import jax.numpy as jnp
        from pope_tpu.ops.components import label_components

        m = np.zeros((8, 8), bool)
        m[1:3, 1:3] = True      # component A, min idx 9
        m[5:7, 5:8] = True      # component B, min idx 45
        m[0, 7] = True          # diagonal-adjacent to nothing: own component
        lab = np.asarray(label_components(jnp.asarray(m)))
        assert lab[0, 7] == 7
        assert (lab[1:3, 1:3] == 9).all()
        assert (lab[5:7, 5:8] == 45).all()
        assert (lab[~m] == 64).all()

    def test_label_components_8_connectivity(self):
        import jax.numpy as jnp
        from pope_tpu.ops.components import label_components

        # two pixels touching only diagonally must share a label
        m = np.zeros((4, 4), bool)
        m[0, 0] = m[1, 1] = True
        lab = np.asarray(label_components(jnp.asarray(m)))
        assert lab[0, 0] == lab[1, 1] == 0

    @pytest.mark.slow
    def test_remove_small_regions_parity_with_native(self, rng):
        """Device twin must match native.remove_small_regions (itself
        cv2-parity-tested in test_native.py) on speckly random masks."""
        import jax
        import jax.numpy as jnp
        from pope_tpu import native
        from pope_tpu.ops.components import remove_small_regions

        dev = jax.jit(remove_small_regions, static_argnames=("mode",))
        for _ in range(4):
            mask = rng.uniform(0, 1, (24, 24)) > 0.62
            for thr in (2, 5, 30):
                for mode in ("holes", "islands"):
                    host_m, host_ch = native.remove_small_regions(mask, thr, mode)
                    dev_m, dev_ch = dev(jnp.asarray(mask), thr, mode)
                    np.testing.assert_array_equal(np.asarray(dev_m), host_m, err_msg=f"{mode} thr={thr}")
                    assert bool(dev_ch) == host_ch

    def test_islands_keeps_largest_when_all_small(self):
        import jax.numpy as jnp
        from pope_tpu.ops.components import remove_small_regions

        m = np.zeros((16, 16), bool)
        m[1:3, 1:3] = True   # area 4
        m[10:12, 10:13] = True  # area 6 (largest)
        out, changed = remove_small_regions(jnp.asarray(m), 100, "islands")
        out = np.asarray(out)
        assert bool(changed)
        assert out[10:12, 10:13].all() and out.sum() == 6

    @pytest.mark.slow
    def test_clean_mask_vmap_jit(self, rng):
        import jax
        import jax.numpy as jnp
        from pope_tpu import native
        from pope_tpu.ops.components import clean_mask

        masks = rng.uniform(0, 1, (6, 20, 20)) > 0.6
        out, changed = jax.jit(jax.vmap(lambda m: clean_mask(m, 4)))(jnp.asarray(masks))
        for i in range(len(masks)):
            h, _ = native.remove_small_regions(masks[i], 4, "holes")
            ref, _ = native.remove_small_regions(h, 4, "islands")
            np.testing.assert_array_equal(np.asarray(out[i]), ref)
