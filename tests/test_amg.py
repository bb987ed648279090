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


def test_postprocess_small_regions():
    import jax.numpy as jnp

    from pope_tpu.models.sam.amg import AMGResult, postprocess_small_regions_host

    C, L = 4, 64
    logits = np.full((C, L, L), -5.0, np.float32)
    # mask 0: big blob with a small hole + a distant speck
    logits[0, 10:40, 10:40] = 5.0
    logits[0, 20, 20] = -5.0  # 1-px hole
    logits[0, 55, 55] = 5.0  # 1-px island
    res = AMGResult(
        masks_low_res=jnp.asarray(logits),
        boxes=jnp.zeros((C, 4)),
        iou_preds=jnp.ones(C),
        stability=jnp.ones(C),
        areas=jnp.zeros(C),
        valid=jnp.asarray([True, False, False, False]),
    )
    out = postprocess_small_regions_host(res, min_area=16, orig_hw=(64, 64))
    m0 = np.asarray(out.masks_low_res[0]) > 0
    assert m0[20, 20]  # hole filled
    assert not m0[55, 55]  # island removed
    assert bool(out.valid[0])
    b = np.asarray(out.boxes[0])
    assert abs(b[0] - 10) < 1.5 and abs(b[2] - 39) < 1.5


def test_postprocess_boxes_nonsquare():
    """Regression: recomputed boxes on NON-SQUARE images must map low-res
    coords through the padded input frame, not directly by orig/low (the
    naive factor compresses y by input_h/S for a 640x480 LINEMOD frame).
    Host and device twins must agree with the exact mapping."""
    import jax.numpy as jnp

    from pope_tpu.models.sam.amg import (
        AMGResult,
        postprocess_small_regions_device,
        postprocess_small_regions_host,
    )

    # geometry of the shipped vit_h eval: orig 480x640 (h, w), input 768x1024
    # in the padded 1024x1024 frame, low-res masks at 64 (subsampled decode)
    orig_hw, input_hw, S, L = (480, 640), (768, 1024), 1024, 64
    C = 2
    logits = np.full((C, L, L), -5.0, np.float32)
    # content occupies low-res rows [0, 48): a blob near the content bottom,
    # with a 1-px hole so the cleanup marks it 'changed' (recomputed box)
    logits[0, 24:46, 8:32] = 5.0
    logits[0, 30, 16] = -5.0
    res = AMGResult(
        masks_low_res=jnp.asarray(logits),
        boxes=jnp.zeros((C, 4)),
        iou_preds=jnp.ones(C),
        stability=jnp.ones(C),
        areas=jnp.zeros(C),
        valid=jnp.asarray([True, False]),
    )
    # exact mapping: low px -> input px (x16) -> orig (x 480/768 = 640/1024);
    # max edges are INCLUSIVE pixel indices (batched_mask_to_box semantics)
    exp = np.array([8 * 16, 24 * 16, 31 * 16, 45 * 16], np.float32) * (480 / 768)
    out = postprocess_small_regions_host(
        res, min_area=300, orig_hw=orig_hw, input_hw=input_hw, frame_px_hw=(S, S)
    )
    got_h = np.asarray(out.boxes[0])
    assert np.allclose(got_h, exp, atol=1.0), (got_h, exp)
    boxes_d, valid_d = postprocess_small_regions_device(
        jnp.asarray(logits) > 0.0, res.valid, 300, orig_hw,
        input_hw=input_hw, frame_px_hw=(S, S),
        orig_boxes=jnp.zeros((C, 4)),
    )
    got_d = np.asarray(boxes_d[0])
    assert bool(valid_d[0])
    assert np.allclose(got_d, exp, atol=1.0), (got_d, exp)
    # the old orig/low factor would put the bottom edge at 45*480/64 = 337
    assert abs(exp[3] - 45 * 16 * 480 / 768) < 1e-3 and exp[3] > 400


def test_amg_records_format(amg, rng):
    from pope_tpu.models.sam.amg import amg_records
    from pope_tpu.models.sam.sam import resize_longest_side

    img = rng.uniform(0, 255, (200, 256, 3)).astype(np.uint8)
    res = amg.generate(img)
    in_hw = resize_longest_side(200, 256, amg.sam_cfg.encoder.img_size)
    recs = amg_records(res, (200, 256), in_hw)
    assert len(recs) == int(np.asarray(res.valid).sum())
    for r in recs:
        assert r["segmentation"].shape == (200, 256)
        assert r["segmentation"].dtype == bool
        assert len(r["bbox"]) == 4 and r["bbox"][2] >= 0
        assert r["area"] == int(r["segmentation"].sum())
        assert r["rle"]["size"] == [200, 256]
        # rle roundtrip matches the segmentation
        from pope_tpu import native

        np.testing.assert_array_equal(native.rle_decode(r["rle"]), r["segmentation"])


@pytest.mark.slow
def test_generate_boxes_batch_matches_host_postproc(amg, rng):
    """The all-device eval path (generate_boxes_batch: on-device connected
    components + NMS) must agree with the host-postprocessed generate_batch
    path on valid set and boxes."""
    imgs = rng.uniform(0, 255, (2, 96, 128, 3)).astype(np.uint8)
    # untrained-SAM masks on noise are pure speckle (hundreds of components);
    # raise the device component cap so the k-truncation documented in
    # ops/components.py cannot kick in and the twin paths stay comparable
    cfg = AMGConfig(
        points_per_side=4, pred_iou_thresh=-10.0, stability_score_thresh=0.0,
        mask_capacity=16, min_mask_region_area=40, cc_max_components=2048,
        # the host twin always decodes at full res; pin the device path to
        # full res too (the subsampled eval mode is covered by
        # test_eval_path_subsample_selects_same_candidates)
        eval_decode_subsample=1,
    )
    gen = AutomaticMaskGenerator(amg.sam, amg.variables, cfg, TEST_CFG)

    host_results = gen.generate_batch(imgs)
    dev_xywh, dev_valid, dev_dropped = gen.generate_boxes_batch(imgs)
    dev_xywh, dev_valid = np.asarray(dev_xywh), np.asarray(dev_valid)
    assert np.asarray(dev_dropped).shape == (2,)
    assert (np.asarray(dev_dropped) >= 0).all()

    for i, r in enumerate(host_results):
        host_valid = np.asarray(r.valid)
        np.testing.assert_array_equal(dev_valid[i], host_valid, err_msg=f"img {i}")
        if host_valid.any():
            host_xywh = np.asarray(r.boxes_xywh)[host_valid]
            np.testing.assert_allclose(
                dev_xywh[i][host_valid], host_xywh, atol=1e-3, err_msg=f"img {i}"
            )


def test_decode_subsample_exact(amg, rng):
    """decoder.UpConvT subsample mode: subsample=4 mask logits must equal the
    EXACT stride-4 subsample of the full-res logits (the 2x2-stride-2
    transposed convs never overlap, so subpixel (0,0) is a plain matmul) and
    iou_pred must be untouched."""
    import jax

    img = rng.uniform(0, 255, (128, 128, 3)).astype(np.uint8)
    emb = amg._encode_jit(np.asarray(img)[None], 128, 128)
    pts = jnp.asarray(rng.uniform(20, 100, (5, 1, 2)), jnp.float32)
    labels = jnp.ones((5, 1), jnp.int32)
    full, iou_full = jax.jit(
        lambda e, p, l: amg.sam.apply(
            amg.variables, e, p, l, multimask_output=True, method=amg.sam.decode
        )
    )(emb, pts, labels)
    sub, iou_sub = jax.jit(
        lambda e, p, l: amg.sam.apply(
            amg.variables, e, p, l, multimask_output=True, subsample=4,
            method=amg.sam.decode,
        )
    )(emb, pts, labels)
    assert sub.shape == full[..., ::4, ::4].shape
    np.testing.assert_allclose(
        np.asarray(sub), np.asarray(full)[..., ::4, ::4], atol=2e-4, rtol=1e-4
    )
    np.testing.assert_allclose(np.asarray(iou_sub), np.asarray(iou_full), atol=1e-6)


@pytest.mark.slow
def test_eval_path_subsample_selects_same_candidates(amg, rng):
    """With the score filters permissive and NMS off, the subsampled eval
    path must select the same candidate set as the full-res one: predicted
    IoU is resolution-independent, so the top-capacity IoU ranking agrees."""
    imgs = rng.uniform(0, 255, (1, 96, 128, 3)).astype(np.uint8)
    kw = dict(
        points_per_side=4, pred_iou_thresh=-10.0, stability_score_thresh=0.0,
        mask_capacity=8, min_mask_region_area=0, box_nms_thresh=1.5,
    )
    gen_full = AutomaticMaskGenerator(
        amg.sam, amg.variables, AMGConfig(**kw), TEST_CFG
    )
    gen_sub = AutomaticMaskGenerator(
        amg.sam, amg.variables, AMGConfig(eval_decode_subsample=4, **kw), TEST_CFG
    )
    xf, vf, _ = (np.asarray(a) for a in gen_full.generate_boxes_batch(imgs))
    xs, vs, _ = (np.asarray(a) for a in gen_sub.generate_boxes_batch(imgs))
    np.testing.assert_array_equal(vf, vs)
    # boxes agree to the subsample quantization. For a solid mask the low-res
    # box moves inward at most 3 full-res pixels per edge; untrained-SAM
    # speckle is the worst case for this bound, so allow a few grid steps
    # (deterministic under the seeded rng fixture).
    if vf.any():
        assert np.abs(xs[vf] - xf[vf]).max() <= 25.0


@pytest.mark.slow
def test_crowded_scene_reports_dropped_candidates(amg, rng):
    """'No silent caps': when NMS survivors exceed mask_capacity, the drop
    counter must be nonzero (the reference AMG has no cap at all, so
    saturation has to be observable rather than silent)."""
    imgs = rng.uniform(0, 255, (1, 96, 128, 3)).astype(np.uint8)
    # noise + permissive thresholds + NMS disabled (thresh > 1: untrained-SAM
    # speckle masks all span the frame, so any real threshold collapses them)
    # -> far more surviving candidates than a capacity of 4
    cfg = AMGConfig(
        points_per_side=4, pred_iou_thresh=-10.0, stability_score_thresh=0.0,
        mask_capacity=4, min_mask_region_area=0, box_nms_thresh=1.5,
    )
    gen = AutomaticMaskGenerator(amg.sam, amg.variables, cfg, TEST_CFG)
    _, valid, dropped = gen.generate_boxes_batch(imgs)
    assert bool(np.asarray(valid).any())
    assert int(np.asarray(dropped)[0]) > 0


def test_coco_encode_rle_varint():
    """coco_encode_rle implements pycocotools rleToString: delta coding from
    the second-previous count, 5-bit signed varint chunks offset by 48.
    Pinned by an independent decoder (rleFrString inverse)."""
    from pope_tpu.pipeline.amg_cli import coco_encode_rle

    def decode(s):
        counts, i = [], 0
        while i < len(s):
            x, k, more = 0, 0, True
            while more:
                c = ord(s[i]) - 48
                x |= (c & 0x1F) << (5 * k)
                more = bool(c & 0x20)
                if not more and (c & 0x10):
                    x |= -1 << (5 * (k + 1))  # sign-extend
                i += 1
                k += 1
            if len(counts) > 2:
                x += counts[-2]
            counts.append(x)
        return counts

    for counts in ([9, 2, 2, 2, 5], [0, 12], [3, 1, 4, 1, 5, 9, 2, 6], [100000, 7, 99999]):
        enc = coco_encode_rle({"size": [4, 5], "counts": counts})
        assert enc["size"] == [4, 5]
        assert decode(enc["counts"]) == counts


def test_amg_cli_tool(amg, rng, tmp_path):
    """The batch AMG tool (scripts/amg.py): PNG folder + metadata.csv per
    image, and --convert-to-rle json; point/crop provenance columns ride the
    records."""
    import cv2
    import types

    from pope_tpu.pipeline.amg_cli import run_amg, _METADATA_HEADER

    ind = tmp_path / "in"
    ind.mkdir()
    for name in ("a.png", "b.png"):
        cv2.imwrite(str(ind / name), rng.uniform(0, 255, (96, 128, 3)).astype(np.uint8))
    (ind / "notes.txt").write_text("not an image")
    models = types.SimpleNamespace(amg=amg)

    out1 = tmp_path / "png"
    done = run_amg(models, str(ind), str(out1))
    assert len(done) == 2
    for base in ("a", "b"):
        d = out1 / base
        meta = (d / "metadata.csv").read_text().splitlines()
        assert meta[0] == _METADATA_HEADER
        n = len(meta) - 1
        assert n == len(list(d.glob("*.png")))
        for row in meta[1:]:
            vals = row.split(",")
            assert len(vals) == 14
            # point provenance inside the image, crop box == full image
            px, py = float(vals[6]), float(vals[7])
            assert 0 <= px <= 128 and 0 <= py <= 96
            assert [float(v) for v in vals[10:14]] == [0.0, 0.0, 128.0, 96.0]
        m0 = cv2.imread(str(d / "0.png"), cv2.IMREAD_GRAYSCALE)
        assert m0.shape == (96, 128) and set(np.unique(m0)) <= {0, 255}

    out2 = tmp_path / "rle"
    run_amg(models, str(ind / "a.png"), str(out2), convert_to_rle=True)
    import json as _json

    anns = _json.loads((out2 / "a.json").read_text())
    assert anns and all(
        isinstance(a["segmentation"]["counts"], str) and "point_coords" in a
        for a in anns
    )
    # compressed counts decode back to the mask's pixel count
    from pope_tpu import native

    rec0 = anns[0]
    total = sum(native.rle_encode(np.zeros((96, 128), bool))["counts"])
    assert sum(rec0["bbox"]) > 0 and rec0["area"] <= total
