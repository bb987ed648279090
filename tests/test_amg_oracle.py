"""End-to-end AMG parity vs the reference SamAutomaticMaskGenerator
(round-2 verdict item #1b): the composed device pipeline — grid prompts ->
batched decode -> stability/IoU scoring -> box-from-mask -> NMS ->
small-region postprocess — compared against
`segment_anything/automatic_mask_generator.py:137-372` running on the SAME
shrunken SAM weights.

Notes on comparability with an untrained SAM:
- predicted-IoU / stability filters are neutralized on both sides (random
  weights make their thresholds arbitrary; the *scores themselves* are
  compared instead);
- our boxes come from the 64px low-res masks and carry a documented
  quantization of orig/low = 4px at this config (amg.py); the reference
  computes boxes at original resolution.
"""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from pope_tpu.config import AMGConfig
from pope_tpu.models.sam import AutomaticMaskGenerator, Sam, convert_torch_sam_state
from tests.test_sam_parity import TEST_CFG
from tests.torch_ref import load_reference_sam

pytestmark = pytest.mark.slow

BOX_TOL = 256 / 64 + 1.0  # documented low-res box quantization + rounding


@pytest.fixture(scope="module")
def oracle_pair():
    ref_sam, sd = load_reference_sam(seed=9, size="test")
    # Untrained-SAM mask logits are cancellation residue within ~1e-2 of
    # zero: binarization is sign-noise, so per-pixel mask comparison is
    # meaningless (and amplification scales the noise with the signal).
    # Surgery (applied to the SHARED torch state dict, so both frameworks
    # see identical weights): make the decoder's output_upscaling an
    # identity nearest-upsample and the hypernetworks one-hot channel
    # selectors — mask logit k = GELU(channel c_k of the transformer-updated
    # embedding) - 0.5, which has O(0.3) spatial structure straight from the
    # neck LayerNorm. Cross-framework noise (~1e-3) then only flips pixels
    # on the binarization contour, the regime a TRAINED SAM operates in.
    with torch.no_grad():
        md = ref_sam.mask_decoder
        up = md.output_upscaling
        for conv in (up[0], up[3]):
            conv.weight.zero_()
            for j in range(min(conv.weight.shape[0], conv.weight.shape[1])):
                conv.weight[j, j] = 1.0
            conv.bias.zero_()
        up[3].bias.fill_(-0.5)  # push coverage off the trivial 100%
        up[1].weight.fill_(1.0)
        up[1].bias.zero_()
        for k, mlp in enumerate(md.output_hypernetworks_mlps):
            mlp.layers[2].weight.zero_()
            mlp.layers[2].bias.zero_()
            mlp.layers[2].bias[(7 * k) % mlp.layers[2].bias.shape[0]] = 1.0
    sd = {k: v.detach().numpy() for k, v in ref_sam.state_dict().items()}
    variables = convert_torch_sam_state(sd, depth=4)
    sam = Sam(TEST_CFG)
    return ref_sam, variables, sam


@pytest.fixture(scope="module")
def scene():
    """Structured 256x256 scene (the model img size, so the reference's PIL
    resize in apply_image is the identity and resampler differences vanish)."""
    img = np.zeros((256, 256, 3), np.uint8)
    img[:, :, 0] = np.linspace(40, 200, 256)[None, :].astype(np.uint8)
    img[:, :, 1] = np.linspace(200, 40, 256)[:, None].astype(np.uint8)
    img[40:100, 50:120] = (250, 30, 30)
    img[150:220, 140:230] = (30, 250, 60)
    img[30:80, 170:240] = (30, 60, 250)
    return img


def _mask_iou_matrix(a, b):
    inter = (a[:, None] & b[None]).sum((-2, -1))
    union = (a[:, None] | b[None]).sum((-2, -1))
    return inter / np.maximum(union, 1)


def _upsample_our_masks(res, keep=None):
    from pope_tpu.models.sam.sam import postprocess_masks, resize_longest_side

    in_hw = resize_longest_side(256, 256, 256)
    up = postprocess_masks(
        jnp.asarray(res.masks_low_res)[None], in_hw, (256, 256)
    )[0]
    m = np.asarray(up > 0)
    return m if keep is None else m[keep]


def test_amg_precandidate_parity(oracle_pair, scene):
    """All 192 candidates (8x8 grid x 3 mask slots) BEFORE NMS: per-candidate
    mask agreement, predicted IoU, stability score, and box-from-mask vs the
    reference `_process_batch` (automatic_mask_generator.py:266-321)."""
    ref_sam, variables, sam = oracle_pair
    from segment_anything.segment_anything.automatic_mask_generator import (
        SamAutomaticMaskGenerator,
    )
    from segment_anything.segment_anything.utils.amg import rle_to_mask

    PPS = 8
    ref_gen = SamAutomaticMaskGenerator(
        ref_sam, points_per_side=PPS, points_per_batch=256,
        pred_iou_thresh=0.0, stability_score_thresh=0.0,
        min_mask_region_area=0,
    )
    ref_gen.predictor.set_image(scene)
    pts = ref_gen.point_grids[0] * np.array([256, 256])[None]
    with torch.no_grad():
        data = ref_gen._process_batch(pts, (256, 256), [0, 0, 256, 256], (256, 256))
    ref_gen.predictor.reset_image()
    ref_masks = np.stack([rle_to_mask(r) for r in data["rles"]])
    ref_iou = data["iou_preds"].numpy()
    ref_stab = data["stability_score"].numpy()
    ref_boxes = data["boxes"].numpy().astype(np.float32)  # xyxy, orig res
    n_ref = len(ref_masks)

    # our side: same grid, filters + NMS + capacity effectively disabled
    cfg = AMGConfig(
        points_per_side=PPS, pred_iou_thresh=-1e9, stability_score_thresh=0.0,
        box_nms_thresh=1.5, min_mask_region_area=0,
        mask_capacity=PPS * PPS * 3,
    )
    ours = AutomaticMaskGenerator(sam, variables, cfg, TEST_CFG)
    res = ours.generate(scene)
    keep = np.asarray(res.valid)
    our_masks = _upsample_our_masks(res, keep)
    our_iou = np.asarray(res.iou_preds)[keep]
    our_stab = np.asarray(res.stability)[keep]
    our_boxes = np.asarray(res.boxes)[keep]

    # the reference's pre-NMS set drops only empty masks (box [0,0,0,0] is
    # "near crop edge" is False for single crop, but empty RLE masks remain);
    # ours drops empty masks via area>0 — compare the non-empty sets
    ref_nonempty = ref_masks.sum((-2, -1)) > 0
    ref_masks, ref_iou, ref_stab, ref_boxes = (
        ref_masks[ref_nonempty], ref_iou[ref_nonempty],
        ref_stab[ref_nonempty], ref_boxes[ref_nonempty],
    )
    assert len(our_masks) == len(ref_masks), (len(our_masks), n_ref)

    iou_m = _mask_iou_matrix(our_masks, ref_masks)
    best = iou_m.max(1)
    arg = iou_m.argmax(1)
    # every candidate mask reproduces its reference counterpart
    assert (best >= 0.95).mean() >= 0.99, np.sort(best)[:10]
    matched = best >= 0.95
    np.testing.assert_allclose(our_iou[matched], ref_iou[arg[matched]], atol=2e-3)
    np.testing.assert_allclose(our_stab[matched], ref_stab[arg[matched]], atol=2e-2)
    assert np.abs(our_boxes[matched] - ref_boxes[arg[matched]]).max() <= BOX_TOL


def test_amg_end_to_end_parity(oracle_pair, scene):
    """Full generate() vs SamAutomaticMaskGenerator.generate() with the POPE
    NMS (0.35) + min_mask_region_area (250) active: the final kept-mask sets
    must correspond 1:1 (mask IoU >= 0.95) with boxes inside the documented
    quantization tolerance (automatic_mask_generator.py:137-263)."""
    ref_sam, variables, sam = oracle_pair
    from segment_anything.segment_anything.automatic_mask_generator import (
        SamAutomaticMaskGenerator,
    )

    PPS = 8
    ref_gen = SamAutomaticMaskGenerator(
        ref_sam, points_per_side=PPS, points_per_batch=256,
        pred_iou_thresh=0.0, stability_score_thresh=0.0,
        box_nms_thresh=0.35, min_mask_region_area=250,
    )
    with torch.no_grad():
        recs = ref_gen.generate(scene)
    recs = [r for r in recs if r["segmentation"].sum() > 0]
    ref_masks = np.stack([r["segmentation"] for r in recs])
    ref_boxes = np.array([r["bbox"] for r in recs], np.float32)  # xywh

    cfg = AMGConfig(
        points_per_side=PPS, pred_iou_thresh=-1e9, stability_score_thresh=0.0,
        box_nms_thresh=0.35, min_mask_region_area=250, mask_capacity=64,
    )
    ours = AutomaticMaskGenerator(sam, variables, cfg, TEST_CFG)
    res = ours.generate(scene)
    keep = np.asarray(res.valid)
    our_masks = _upsample_our_masks(res, keep)
    our_boxes_xyxy = np.asarray(res.boxes)[keep]
    our_boxes = np.stack(
        [our_boxes_xyxy[:, 0], our_boxes_xyxy[:, 1],
         our_boxes_xyxy[:, 2] - our_boxes_xyxy[:, 0],
         our_boxes_xyxy[:, 3] - our_boxes_xyxy[:, 1]], -1,
    )

    # same number of NMS survivors
    assert len(our_masks) == len(ref_masks), (len(our_masks), len(ref_masks))
    # 1:1 correspondence at IoU >= 0.95 in BOTH directions
    iou_m = _mask_iou_matrix(our_masks, ref_masks)
    assert (iou_m.max(1) >= 0.95).all(), np.sort(iou_m.max(1))
    assert (iou_m.max(0) >= 0.95).all(), np.sort(iou_m.max(0))
    arg = iou_m.argmax(1)
    assert len(set(arg.tolist())) == len(arg), "correspondence is not 1:1"
    assert np.abs(our_boxes - ref_boxes[arg]).max() <= BOX_TOL


def test_predict_batched_oracle_parity(oracle_pair, scene):
    """`SamPredictor.predict_batched` vs the reference `predict_torch`
    (predictor.py:170-245): a batch of 3 boxes against one cached embedding
    must reproduce the reference's per-box masks, IoU predictions, and
    low-res logits on the shared surgical weights; apply_boxes must match
    ResizeLongestSide.apply_boxes_torch."""
    ref_sam, variables, sam = oracle_pair
    from segment_anything.segment_anything.predictor import SamPredictor as RefPredictor
    from pope_tpu.models.sam.predictor import SamPredictor
    from pope_tpu.models.sam.sam import apply_boxes

    boxes = np.array(
        [[50, 40, 120, 100], [140, 150, 230, 220], [170, 30, 240, 80]], np.float32
    )

    rp = RefPredictor(ref_sam)
    rp.set_image(scene)
    tb = rp.transform.apply_boxes_torch(torch.from_numpy(boxes), scene.shape[:2])
    with torch.no_grad():
        r_masks, r_iou, r_low = rp.predict_torch(
            None, None, boxes=tb, multimask_output=True
        )
    r_masks, r_iou, r_low = (t.numpy() for t in (r_masks, r_iou, r_low))

    # transform parity
    np.testing.assert_allclose(
        np.asarray(apply_boxes(boxes, scene.shape[:2], 256)), tb.numpy(), atol=1e-5
    )

    p = SamPredictor(sam, variables)
    p.set_image(scene)
    masks, iou, low = p.predict_batched(boxes=boxes, multimask_output=True)
    assert masks.shape == r_masks.shape == (3, 3, 256, 256)
    np.testing.assert_allclose(iou, r_iou, atol=5e-3)
    np.testing.assert_allclose(low, r_low, atol=5e-2)
    agree = (masks == r_masks).mean(axis=(-2, -1))
    assert (agree > 0.995).all(), agree

    # points+boxes batch shape contract (one point set per box)
    pts = boxes.reshape(3, 2, 2).mean(axis=1, keepdims=True)
    m2, i2, l2 = p.predict_batched(
        point_coords=pts, point_labels=np.ones((3, 1), np.int32),
        boxes=boxes, multimask_output=False,
    )
    assert m2.shape == (3, 1, 256, 256) and i2.shape == (3, 1)

    # points without labels is a contract violation, reported clearly
    with pytest.raises(ValueError, match="point_labels"):
        p.predict_batched(point_coords=pts)


def test_multicrop_oracle_parity(oracle_pair, scene):
    """crop_n_layers=1 (5 crops: full image + 2x2 overlapping) end to end vs
    `SamAutomaticMaskGenerator.generate()`: same final record set after the
    crop-edge filter, per-crop NMS, cross-crop NMS preferring smaller crops,
    and full-res small-region cleanup (_generate_masks/_process_crop)."""
    ref_sam, variables, sam = oracle_pair
    from segment_anything.segment_anything.automatic_mask_generator import (
        SamAutomaticMaskGenerator,
    )

    PPS = 8
    ref_gen = SamAutomaticMaskGenerator(
        ref_sam, points_per_side=PPS, points_per_batch=256,
        pred_iou_thresh=0.0, stability_score_thresh=0.0,
        box_nms_thresh=0.7, crop_n_layers=1, crop_nms_thresh=0.9,
        min_mask_region_area=50,
    )
    with torch.no_grad():
        recs = ref_gen.generate(scene)
    recs = [r for r in recs if r["segmentation"].sum() > 0]
    ref_masks = np.stack([r["segmentation"] for r in recs])
    ref_iou = np.array([r["predicted_iou"] for r in recs])
    ref_cbox = np.array([r["crop_box"] for r in recs])

    cfg = AMGConfig(
        points_per_side=PPS, pred_iou_thresh=-1e9, stability_score_thresh=0.0,
        box_nms_thresh=0.7, crop_n_layers=1, crop_nms_thresh=0.9,
        min_mask_region_area=50, mask_capacity=PPS * PPS * 3,
    )
    ours = AutomaticMaskGenerator(sam, variables, cfg, TEST_CFG)
    our_recs = [r for r in ours.generate_records(scene) if r["segmentation"].sum() > 0]
    our_masks = np.stack([r["segmentation"] for r in our_recs])
    our_iou = np.array([r["predicted_iou"] for r in our_recs])
    our_cbox = np.array([r["crop_box"] for r in our_recs])

    # NOTE: with the surgical oracle weights every mask is a frame-filling
    # blob, so the crop-edge filter (atol=20, hardcoded in the reference)
    # removes ALL small-crop candidates in BOTH pipelines and the merge
    # funnels to the full-image crop's survivors — the parity claim here is
    # that the composed sweep agrees end to end at identical settings; the
    # crop/grid/edge-filter building blocks are pinned exactly in
    # test_multicrop_utils_match_reference below.
    assert len(ref_masks) >= 1

    # 1:1 correspondence of the survivor sets
    assert abs(len(our_masks) - len(ref_masks)) <= 1, (len(our_masks), len(ref_masks))
    iou_m = _mask_iou_matrix(our_masks, ref_masks)
    best, arg = iou_m.max(1), iou_m.argmax(1)
    matched = best >= 0.95
    assert matched.mean() >= 0.9, np.sort(best)[:10]
    np.testing.assert_allclose(our_iou[matched], ref_iou[arg[matched]], atol=2e-3)
    np.testing.assert_array_equal(our_cbox[matched], ref_cbox[arg[matched]])
    # provenance columns are present and in-frame
    for r in our_recs:
        (px, py), = r["point_coords"]
        assert 0 <= px <= 256 and 0 <= py <= 256
        assert len(r["crop_box"]) == 4

    # per-layer sub-generators (and their jit caches) persist across calls —
    # rebuilding them per image would recompile the fused program every frame
    gens_before = dict(ours._layer_gens)
    recs2 = ours.generate_records(scene)
    assert ours._layer_gens == gens_before
    assert len(recs2) == len(our_recs)


def test_multicrop_utils_match_reference():
    """The multicrop building blocks vs the reference's own functions,
    exactly: generate_crop_boxes (amg.py:200-232),
    build_all_layer_point_grids (:190-198), is_box_near_crop_edge (:78-88)."""
    from segment_anything.segment_anything.utils import amg as ref_amg
    from pope_tpu.ops.masks import (
        build_all_layer_point_grids,
        generate_crop_boxes,
        is_box_near_crop_edge_np,
    )

    for im_size, n_layers, overlap in [
        ((480, 640), 1, 512 / 1500), ((480, 640), 2, 512 / 1500),
        ((256, 256), 1, 0.2), ((333, 217), 2, 0.4),
    ]:
        rb, rl = ref_amg.generate_crop_boxes(im_size, n_layers, overlap)
        ob, ol = generate_crop_boxes(im_size, n_layers, overlap)
        assert ob == rb and ol == rl, (im_size, n_layers)

    for pps, nl, scale in [(16, 2, 2), (8, 1, 1), (32, 2, 4)]:
        ref_grids = ref_amg.build_all_layer_point_grids(pps, nl, scale)
        our_grids = build_all_layer_point_grids(pps, nl, scale)
        assert len(ref_grids) == len(our_grids)
        for rg, og in zip(ref_grids, our_grids):
            np.testing.assert_allclose(og, rg)

    rng = np.random.default_rng(0)
    crop_box, orig_box = [100, 50, 400, 350], [0, 0, 640, 480]
    boxes = rng.uniform(0, 300, (200, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + np.abs(boxes[:, 2:] - boxes[:, :2])
    # seed exact edge/image-boundary cases the random draw would miss
    boxes[0] = [0, 10, 250, 200]          # touches crop x0 (=image x0 after uncrop? no: 100!=0)
    boxes[1] = [-100, -50, 540, 430]      # after uncrop == image frame -> NOT filtered
    boxes[2] = [5, 40, 295, 295]          # near crop x0/x1 edges
    ref = ref_amg.is_box_near_crop_edge(
        torch.from_numpy(boxes), crop_box, orig_box
    ).numpy()
    ours = is_box_near_crop_edge_np(boxes, crop_box, orig_box)
    np.testing.assert_array_equal(ours, ref)
