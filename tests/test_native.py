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
