"""Native C++ runtime tests: builds the lib and checks parity with the pure
implementations."""

import numpy as np
import pytest

from pope_tpu import native
from pope_tpu.ops.masks import mask_to_rle, rle_to_mask


@pytest.fixture(scope="module", autouse=True)
def built():
    assert native.available(), "native lib failed to build (g++ expected in image)"


def test_rle_matches_reference_format(rng):
    mask = rng.uniform(0, 1, (19, 27)) > 0.5
    rle_native = native.rle_encode(mask)
    rle_py = mask_to_rle(mask)
    assert rle_native["size"] == rle_py["size"]
    assert rle_native["counts"] == list(rle_py["counts"])
    back = native.rle_decode(rle_native)
    np.testing.assert_array_equal(back, mask)
    np.testing.assert_array_equal(rle_to_mask(rle_native), mask)


def test_remove_small_regions_holes_and_islands():
    mask = np.zeros((20, 20), bool)
    mask[2:18, 2:18] = True
    mask[8, 8] = False  # 1-px hole
    mask[0, 0] = True  # 1-px island
    filled, changed = native.remove_small_regions(mask, area_thresh=4, mode="holes")
    assert changed
    assert filled[8, 8]  # hole filled
    assert filled[0, 0]  # islands untouched by 'holes' mode
    dropped, changed2 = native.remove_small_regions(mask, area_thresh=4, mode="islands")
    assert changed2
    assert not dropped[0, 0]  # island removed
    assert dropped[5, 5]  # big region kept
    # numpy fallback agrees
    f2, _ = native._remove_small_regions_np(mask.astype(np.uint8).copy(), 4, 0)
    np.testing.assert_array_equal(f2, filled)


def _ref_remove_small_regions(mask, area_thresh, mode):
    """cv2 re-derivation of the reference routine (segment_anything
    utils/amg.py:342-372) used as the oracle."""
    import cv2

    correct_holes = mode == "holes"
    working_mask = (correct_holes ^ mask).astype(np.uint8)
    n_labels, regions, stats, _ = cv2.connectedComponentsWithStats(working_mask, 8)
    sizes = stats[:, -1][1:]
    small_regions = [i + 1 for i, s in enumerate(sizes) if s < area_thresh]
    if len(small_regions) == 0:
        return mask, False
    fill_labels = [0] + small_regions
    if not correct_holes:
        fill_labels = [i for i in range(n_labels) if i not in fill_labels]
        if len(fill_labels) == 0:
            fill_labels = [int(np.argmax(sizes)) + 1]
    return np.isin(regions, fill_labels), True


def test_remove_small_regions_matches_cv2_reference(rng):
    for _ in range(8):
        mask = rng.uniform(0, 1, (24, 24)) > 0.62  # speckly: many components
        for mode in ("holes", "islands"):
            for thr in (3, 10, 10_000):  # 10_000: everything small
                ref, ref_changed = _ref_remove_small_regions(mask.copy(), thr, mode)
                ours, changed = native.remove_small_regions(mask, thr, mode)
                np.testing.assert_array_equal(ours, ref, err_msg=f"{mode} thr={thr}")
                assert changed == ref_changed
                ours_np, changed_np = native._remove_small_regions_np(
                    mask.astype(np.uint8).copy(), thr, 0 if mode == "holes" else 1
                )
                np.testing.assert_array_equal(ours_np, ref)
                assert changed_np == ref_changed


def test_remove_small_regions_keeps_largest_island():
    """When every island is below threshold, the largest survives
    (amg.py:360-362) instead of the mask going empty."""
    mask = np.zeros((16, 16), bool)
    mask[2:4, 2:4] = True  # area 4
    mask[10:12, 10:13] = True  # area 6 (largest)
    out, changed = native.remove_small_regions(mask, area_thresh=100, mode="islands")
    assert changed
    assert out[10, 11] and not out[2, 2]
    out_np, _ = native._remove_small_regions_np(mask.astype(np.uint8).copy(), 100, 1)
    np.testing.assert_array_equal(out_np, out)


def test_connected_components_8_connectivity():
    """Diagonal pixels join one component (cv2 default connectivity)."""
    mask = np.zeros((8, 8), bool)
    mask[1, 1] = mask[2, 2] = mask[3, 3] = True  # diagonal chain, area 3
    out, changed = native.remove_small_regions(mask, area_thresh=3, mode="islands")
    assert not changed  # one 3-px component >= thresh under 8-connectivity
    np.testing.assert_array_equal(out, mask)


def test_nms_cpu_matches_onchip(rng):
    import jax.numpy as jnp

    from pope_tpu.ops.nms import nms as nms_jax

    n = 50
    xy = rng.uniform(0, 100, (n, 2)).astype(np.float32)
    wh = rng.uniform(5, 25, (n, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], 1)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    keep_c = native.nms_cpu(boxes, scores, 0.4)
    keep_j = np.asarray(nms_jax(jnp.asarray(boxes), jnp.asarray(scores), 0.4))
    np.testing.assert_array_equal(keep_c, keep_j)
