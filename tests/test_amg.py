"""AMG behavior tests on the shrunken SAM config: static shapes, filter
semantics, NMS suppression, and the embeddings->masks path."""

import numpy as np
import pytest
import jax.numpy as jnp

from pope_tpu.config import AMGConfig
from pope_tpu.models.sam import AutomaticMaskGenerator, Sam, convert_torch_sam_state
from tests.test_sam_parity import TEST_CFG
from tests.torch_ref import load_reference_sam


@pytest.fixture(scope="module")
def amg():
    _, sd = load_reference_sam(seed=9, size="test")
    variables = convert_torch_sam_state(sd, depth=4)
    sam = Sam(TEST_CFG)
    cfg = AMGConfig(points_per_side=4, pred_iou_thresh=-10.0, stability_score_thresh=0.0, mask_capacity=16)
    return AutomaticMaskGenerator(sam, variables, cfg, TEST_CFG)


def test_amg_static_shapes(amg, rng):
    img = rng.uniform(0, 255, (200, 256, 3)).astype(np.uint8)
    res = amg.generate(img)
    C = 16
    assert res.masks_low_res.shape[0] == C
    assert res.boxes.shape == (C, 4)
    assert res.iou_preds.shape == (C,)
    assert res.valid.shape == (C,)
    assert np.isfinite(np.asarray(res.boxes)).all()
    # boxes in original image coordinate range
    ok = np.asarray(res.valid)
    if ok.any():
        b = np.asarray(res.boxes)[ok]
        assert (b[:, 2] >= b[:, 0]).all() and (b[:, 3] >= b[:, 1]).all()
        assert b.max() <= 256 + 1e-3


def test_amg_filters_apply(amg, rng):
    """With an impossible IoU threshold nothing survives."""
    img = rng.uniform(0, 255, (128, 128, 3)).astype(np.uint8)
    strict = AutomaticMaskGenerator(
        amg.sam, amg.variables,
        AMGConfig(points_per_side=4, pred_iou_thresh=1e9, mask_capacity=16),
        TEST_CFG,
    )
    res = strict.generate(img)
    assert not bool(np.asarray(res.valid).any())


def test_amg_nms_no_overlapping_survivors(amg, rng):
    img = rng.uniform(0, 255, (256, 256, 3)).astype(np.uint8)
    res = amg.generate(img)
    ok = np.asarray(res.valid)
    boxes = np.asarray(res.boxes)[ok]
    from pope_tpu.ops.masks import box_iou

    if len(boxes) > 1:
        iou = np.asarray(box_iou(jnp.asarray(boxes), jnp.asarray(boxes)))
        iou[np.diag_indices_from(iou)] = 0
        assert iou.max() <= 0.35 + 1e-5
