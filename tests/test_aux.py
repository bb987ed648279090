"""Aux subsystem tests: profiler, loader/prefetcher, mask utils, checkpoint
roundtrip, export roundtrip, collectives single-process paths, plotting,
augment."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pope_tpu.data.augment import DarkAug, MobileAug, build_augmentor
from pope_tpu.data.loader import DevicePrefetcher, ThreadedLoader
from pope_tpu.parallel.collectives import all_gather_arrays, get_rank, get_world_size, reduce_dict
from pope_tpu.utils.checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
from pope_tpu.utils.mask_utils import common_resize, convert_contour2mask, convert_mask_to_polygon, letterbox_image
from pope_tpu.utils.plotting import dynamic_alpha, error_colormap, make_matching_figure
from pope_tpu.utils.profiling import InferenceProfiler, build_profiler


def test_profiler_accumulates():
    prof = InferenceProfiler()
    x = jnp.ones((16, 16))
    with prof.profile("matmul", sync_on=None):
        y = x @ x
    with prof.profile("matmul", sync_on=y):
        y = x @ x
    assert prof.counts["matmul"] == 2
    assert "matmul" in prof.summary()
    assert build_profiler(None).summary() == "(passthrough profiler)"


def test_threaded_loader_and_prefetcher():
    items = list(range(20))
    loader = ThreadedLoader(lambda: iter(items), prefetch=4)
    assert list(loader) == items
    batches = [{"x": np.full((2, 2), i)} for i in range(5)]
    out = list(DevicePrefetcher(batches))
    assert len(out) == 5
    np.testing.assert_array_equal(np.asarray(out[3]["x"]), batches[3]["x"])


def test_threaded_loader_worker_pool():
    """fn + num_workers>1: items map CONCURRENTLY but yield in source order;
    worker exceptions surface at the consumer in order; the in-flight budget
    bounds memory (ROADMAP #5 B=8 host-pipeline fix)."""
    import threading
    import time

    items = list(range(30))
    seen_parallel = []
    active = [0]
    lock = threading.Lock()

    def slow_double(x):
        with lock:
            active[0] += 1
            seen_parallel.append(active[0])
        time.sleep(0.01)
        with lock:
            active[0] -= 1
        return x * 2

    out = list(ThreadedLoader(lambda: iter(items), num_workers=3, fn=slow_double))
    assert out == [x * 2 for x in items]  # order preserved
    assert max(seen_parallel) >= 2, "no concurrent fn execution observed"

    # error propagation: a raising fn must not deadlock the consumer
    def boom(x):
        if x == 5:
            raise ValueError("boom")
        return x

    it = iter(ThreadedLoader(lambda: iter(range(10)), num_workers=3, fn=boom))
    got = [next(it) for _ in range(5)]
    assert got == [0, 1, 2, 3, 4]
    try:
        next(it)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass

    # the single-producer path (num_workers=1, the shipped eval default)
    # must ALSO surface fn/source exceptions instead of silently truncating
    # the stream — a swallowed decode/upload error would make evaluate_dataset
    # report fewer pairs than the manifest with no diagnostic.
    it1 = iter(ThreadedLoader(lambda: iter(range(10)), num_workers=1, fn=boom))
    got1 = [next(it1) for _ in range(5)]
    assert got1 == [0, 1, 2, 3, 4]
    try:
        next(it1)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_mask_polygon_roundtrip():
    mask = np.zeros((40, 50), np.uint8)
    mask[10:30, 15:35] = 1
    poly = convert_mask_to_polygon(mask)
    back = convert_contour2mask(poly, 40, 50)
    # contour-filled mask covers the original rectangle closely
    inter = (back & mask.astype(bool)).sum()
    assert inter / mask.sum() > 0.95


def test_common_resize_and_letterbox(rng):
    img = rng.uniform(0, 255, (60, 120, 3)).astype(np.uint8)
    out, scale = common_resize(img, 240)
    assert max(out.shape[:2]) == 240 and abs(scale - 2.0) < 1e-6
    boxed = letterbox_image(img, (100, 100))
    assert boxed.shape == (100, 100, 3)
    assert boxed[0, 0, 0] == 128  # gray padding


def test_checkpoint_roundtrip(tmp_path):
    tree = {"a": np.arange(6, dtype=np.float32).reshape(2, 3), "b": {"c": np.ones(4)}}
    p = str(tmp_path / "step_10")
    save_checkpoint(p, tree)
    back = load_checkpoint(p, tree)
    np.testing.assert_array_equal(np.asarray(back["a"]), tree["a"])
    save_checkpoint(str(tmp_path / "step_3"), tree)
    assert latest_checkpoint(str(tmp_path)).endswith("step_10")


def test_collectives_single_process():
    assert get_world_size() == 1 and get_rank() == 0
    t = {"x": np.ones(3)}
    assert all_gather_arrays(t) is t
    assert reduce_dict({"m": 2.0}) == {"m": 2.0}


def test_plotting(tmp_path, rng):
    img0 = rng.uniform(0, 1, (32, 32)).astype(np.float32)
    img1 = rng.uniform(0, 1, (32, 32)).astype(np.float32)
    mk0 = rng.uniform(0, 32, (10, 2)).astype(np.float32)
    mk1 = rng.uniform(0, 32, (10, 2)).astype(np.float32)
    color = error_colormap(rng.uniform(0, 1, 10), 0.5)
    assert color.shape == (10, 4)
    assert 0.9 < dynamic_alpha(10) <= 1.0
    assert dynamic_alpha(1500) < dynamic_alpha(100)
    out = tmp_path / "match.png"
    make_matching_figure(img0, img1, mk0, mk1, color=color, path=str(out))
    assert out.exists()


def test_epipolar_line_drawing(rng):
    """draw_epipolar_line paints the line l = F @ [pt; 1] in img1 and the
    point in img0 (draw_utils.py:105-130)."""
    from pope_tpu.utils.draw import draw_epipolar_line, draw_epipolar_lines

    # pure x-translation: E = [t]_x, epipolar lines are horizontal rows
    # through the matching y (identity K -> F == E)
    F = np.array([[0, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32)
    img0 = np.zeros((64, 80, 3), np.uint8)
    img1 = np.zeros((64, 80, 3), np.uint8)
    pt0 = np.array([30, 20], np.float32)
    o0, o1 = draw_epipolar_line(F, img0.copy(), img1.copy(), pt0, (0, 255, 0))
    assert o0[:, :, 1].sum() > 0  # circle drawn around pt0
    ys, xs = np.nonzero(o1[:, :, 1])
    assert len(ys) > 0
    # line for pt0=(x,20): l = (0, -1, 20) -> y = 20 everywhere
    assert np.all(np.abs(ys - 20) <= 1), ys

    # the sampled multi-line variant runs and is seed-deterministic
    a0, a1 = draw_epipolar_lines(F, img0.copy(), img1.copy(), num=5, seed=3)
    b0, b1 = draw_epipolar_lines(F, img0.copy(), img1.copy(), num=5, seed=3)
    np.testing.assert_array_equal(a0, b0)
    np.testing.assert_array_equal(a1, b1)
    assert a1.sum() > 0


def test_augment(rng):
    img = rng.uniform(0, 255, (48, 48, 3)).astype(np.uint8)
    assert DarkAug(0)(img).shape == img.shape
    assert MobileAug(0)(img).shape == img.shape
    assert build_augmentor("none") is None
    assert build_augmentor("dark") is not None


def test_export_roundtrip(rng):
    from pope_tpu.export import export_sam_decoder, load_exported
    from tests.test_sam_parity import TEST_CFG
    from pope_tpu.models.sam import Sam, convert_torch_sam_state
    from tests.torch_ref import load_reference_sam

    _, sd = load_reference_sam(seed=4, size="test")
    variables = convert_torch_sam_state(sd, depth=4)
    sam = Sam(TEST_CFG)
    blob = export_sam_decoder(sam, variables, num_points=4)
    fn = load_exported(blob)
    emb = jnp.asarray(rng.normal(0, 1, (1, 16, 16, 64)), jnp.float32)
    pts = jnp.asarray(rng.uniform(0, 256, (1, 4, 2)), jnp.float32)
    lbl = jnp.asarray([[1, -1, -1, -1]], jnp.int32)
    masks, iou = fn.call(emb, pts, lbl)
    assert masks.shape[0] == 1 and masks.shape[1] == 3
    # matches the live decode
    ref_masks, ref_iou = sam.apply(variables, emb, pts, lbl, multimask_output=True, method=sam.decode)
    np.testing.assert_allclose(np.asarray(masks), np.asarray(ref_masks), atol=1e-5)


@pytest.mark.slow  # heaviest export variant (~16s); test_export_roundtrip
# keeps the export surface in the fast suite
def test_export_sam_prompt_head_full_surface(rng):
    """The SamOnnxModel-equivalent export (prompt encode + has_mask blending
    + decode + postprocess-to-original-size, utils/onnx.py:17-144):
    roundtrip, shape contract, no-mask path == live decode+postprocess, and
    the mask-input path responds to has_mask_input."""
    import jax

    from pope_tpu.export import export_sam_prompt_head, load_exported
    from pope_tpu.models.sam import Sam, convert_torch_sam_state
    from pope_tpu.models.sam.sam import postprocess_masks, resize_longest_side
    from tests.test_sam_parity import TEST_CFG
    from tests.torch_ref import load_reference_sam

    _, sd = load_reference_sam(seed=4, size="test")
    variables = convert_torch_sam_state(sd, depth=4)
    sam = Sam(TEST_CFG)
    orig_hw = (200, 256)
    blob = export_sam_prompt_head(sam, variables, orig_hw, num_points=2)
    fn = load_exported(blob)

    emb = jnp.asarray(rng.normal(0, 1, (1, 16, 16, 64)), jnp.float32)
    pts = jnp.asarray(rng.uniform(0, 256, (1, 2, 2)), jnp.float32)
    lbl = jnp.asarray([[1, -1]], jnp.int32)
    mask_in = jnp.zeros((1, 64, 64, 1), jnp.float32)
    up, scores, low = fn.call(emb, pts, lbl, mask_in, jnp.zeros((1,)))
    # ALL FOUR mask tokens, like the reference head (onnx.py:120-125 calls
    # predict_masks and never takes the multimask slice)
    assert up.shape == (1, 4, 200, 256)
    assert scores.shape == (1, 4) and low.shape[1] == 4

    # no-mask path == live decode + postprocess: token 0 is the single-mask
    # decode, tokens 1..3 the multimask slice
    ref_low_m, ref_iou_m = sam.apply(
        variables, emb, pts, lbl, multimask_output=True, method=sam.decode
    )
    ref_low_0, ref_iou_0 = sam.apply(
        variables, emb, pts, lbl, multimask_output=False, method=sam.decode
    )
    ref_low = jnp.concatenate([ref_low_0, ref_low_m], axis=1)
    ref_iou = jnp.concatenate([ref_iou_0, ref_iou_m], axis=1)
    np.testing.assert_allclose(np.asarray(low), np.asarray(ref_low), atol=1e-5)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(ref_iou), atol=1e-5)
    in_hw = resize_longest_side(*orig_hw, 256)
    ref_up = postprocess_masks(ref_low, in_hw, orig_hw)
    np.testing.assert_allclose(np.asarray(up), np.asarray(ref_up), atol=1e-4)

    # a mask prompt with has_mask_input=1 changes the decode (untrained
    # logits are cancellation-tiny, so assert a nonzero delta rather than a
    # large one)
    m = jnp.asarray(rng.normal(0, 4, (1, 64, 64, 1)), jnp.float32)
    _, scores_m, low_m = fn.call(emb, pts, lbl, m, jnp.ones((1,)))
    assert float(np.abs(np.asarray(low_m) - np.asarray(low)).max()) > 1e-7
    # ... and has_mask_input=0 with a mask tensor present is the no-mask path
    _, _, low_0 = fn.call(emb, pts, lbl, m, jnp.zeros((1,)))
    np.testing.assert_allclose(np.asarray(low_0), np.asarray(low), atol=1e-6)

    # single-mask variant returns K=1 and implements the runtime
    # (click_count - 2.5) reweight of onnx.py:92-107: a 2-point prompt
    # (1 click + pad) takes the best multimask slot, a 3-point prompt takes
    # the single-mask token (token 0)
    blob1 = export_sam_prompt_head(sam, variables, orig_hw, num_points=2,
                                   return_single_mask=True)
    head1 = load_exported(blob1).call
    up1, s1, low1 = head1(emb, pts, lbl, mask_in, jnp.zeros((1,)), jnp.asarray([2.0]))
    assert up1.shape == (1, 1, 200, 256) and s1.shape == (1, 1)
    # click_count=2 -> token 0 reweighted by (2 - 2.5)*1000, so the best of
    # the three multimask tokens wins
    best = 1 + int(np.argmax(np.asarray(scores)[0, 1:]))
    np.testing.assert_allclose(np.asarray(low1)[0, 0], np.asarray(low)[0, best], atol=1e-5)
    # click_count=3 -> token 0 (the reference's "multiclick mask")
    ref_low0, _ = sam.apply(
        variables, emb, pts, lbl, multimask_output=False, method=sam.decode
    )
    _, _, low3 = head1(emb, pts, lbl, mask_in, jnp.zeros((1,)), jnp.asarray([3.0]))
    np.testing.assert_allclose(np.asarray(low3)[0, 0], np.asarray(ref_low0)[0, 0], atol=1e-5)


@pytest.mark.slow
def test_export_matcher_and_dinov2(rng):
    import jax

    from pope_tpu.config import (
        BackboneConfig, CoarseMatchConfig, DinoV2Config, LoFTRStageConfig,
        MatcherConfig,
    )
    from pope_tpu.export import export_dinov2, export_matcher, load_exported
    from pope_tpu.models.dinov2 import DinoVisionTransformer
    from pope_tpu.models.matcher import Matcher

    mcfg = MatcherConfig(
        backbone=BackboneConfig(initial_dim=16, block_dims=(16, 24, 32)),
        coarse=LoFTRStageConfig(d_model=32, d_ffn=32, nhead=2, layer_names=("self", "cross")),
        fine=LoFTRStageConfig(d_model=16, d_ffn=16, nhead=2, layer_names=("self", "cross")),
        match_coarse=CoarseMatchConfig(match_capacity=32),
    )
    matcher = Matcher(mcfg)
    m_vars = matcher.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 1), np.float32),
                          np.zeros((1, 64, 64, 1), np.float32))
    blob = export_matcher(matcher, m_vars, (64, 64), (64, 64))
    fn = load_exported(blob)
    i0 = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 1)), jnp.float32)
    i1 = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 1)), jnp.float32)
    mk0, mk1, conf, valid = fn.call(i0, i1)
    live = matcher.apply(m_vars, i0, i1)
    np.testing.assert_allclose(np.asarray(mk0), np.asarray(live.mkpts0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(conf), np.asarray(live.mconf), atol=1e-5)

    dcfg = DinoV2Config(img_size=56, embed_dim=32, depth=2, num_heads=2)
    dinov2 = DinoVisionTransformer(dcfg)
    d_vars = dinov2.init(jax.random.PRNGKey(1), np.zeros((1, 56, 56, 3), np.float32))
    dblob = export_dinov2(dinov2, d_vars, img_size=56)
    dfn = load_exported(dblob)
    x = jnp.asarray(rng.normal(0, 1, (1, 56, 56, 3)), jnp.float32)
    cls = dfn.call(x)
    ref = dinov2.apply(d_vars, x)["x_norm_clstoken"]
    np.testing.assert_allclose(np.asarray(cls), np.asarray(ref), atol=1e-5)


@pytest.mark.slow  # four jax.export artifacts, ~35s on a 1-cpu box
def test_export_cli(rng, tmp_path, monkeypatch):
    """`pope export` drives the export functions end to end: the written
    artifacts must deserialize and run (scripts/export_onnx_model.py
    equivalent)."""
    import jax

    from pope_tpu.cli import main as cli_main
    from pope_tpu.config import (
        BackboneConfig, CoarseMatchConfig, DinoV2Config, LoFTRStageConfig,
        MatcherConfig, PipelineConfig,
    )
    from pope_tpu.export import load_exported
    from pope_tpu.models.dinov2 import DinoVisionTransformer
    from pope_tpu.models.matcher import Matcher
    from pope_tpu.models.sam import Sam, convert_torch_sam_state
    from pope_tpu.pipeline.api import PopeModels
    from tests.test_sam_parity import TEST_CFG
    from tests.torch_ref import load_reference_sam

    _, sd = load_reference_sam(seed=11, size="test")
    sam_vars = convert_torch_sam_state(sd, depth=4)
    sam = Sam(TEST_CFG)
    dcfg = DinoV2Config(img_size=56, embed_dim=32, depth=2, num_heads=2)
    dinov2 = DinoVisionTransformer(dcfg)
    d_vars = dinov2.init(jax.random.PRNGKey(0), np.zeros((1, 56, 56, 3), np.float32))
    mcfg = MatcherConfig(
        backbone=BackboneConfig(initial_dim=16, block_dims=(16, 24, 32)),
        coarse=LoFTRStageConfig(d_model=32, d_ffn=32, nhead=2, layer_names=("self", "cross")),
        fine=LoFTRStageConfig(d_model=16, d_ffn=16, nhead=2, layer_names=("self", "cross")),
        match_coarse=CoarseMatchConfig(match_capacity=32),
    )
    matcher = Matcher(mcfg)
    m_vars = matcher.init(jax.random.PRNGKey(1), np.zeros((1, 64, 64, 1), np.float32),
                          np.zeros((1, 64, 64, 1), np.float32))
    tiny = PopeModels(
        sam=sam, sam_variables=sam_vars, dinov2=dinov2, dinov2_variables=d_vars,
        matcher=matcher, matcher_variables=m_vars, amg=None,
        config=PipelineConfig(dinov2=dcfg, matcher=mcfg),
    )
    import pope_tpu.pipeline

    monkeypatch.setattr(pope_tpu.pipeline, "load_models", lambda **kw: tiny)

    out = tmp_path / "head.bin"
    cli_main([
        "export", "--target", "sam-prompt-head", "--output", str(out),
        "--orig-h", "200", "--orig-w", "256", "--num-points", "2",
        "--return-single-mask",
    ])
    head = load_exported(out.read_bytes())
    emb = jnp.asarray(rng.normal(0, 1, (1, 16, 16, 64)), jnp.float32)
    pts = jnp.asarray(rng.uniform(0, 256, (1, 2, 2)), jnp.float32)
    lbl = jnp.asarray([[1, -1]], jnp.int32)
    up, s, low = head.call(
        emb, pts, lbl, jnp.zeros((1, 64, 64, 1)), jnp.zeros((1,)), jnp.asarray([2.0])
    )
    assert up.shape == (1, 1, 200, 256)

    out2 = tmp_path / "dino.bin"
    cli_main(["export", "--target", "dinov2", "--output", str(out2), "--img-size", "56"])
    dfn = load_exported(out2.read_bytes())
    cls = dfn.call(jnp.asarray(rng.normal(0, 1, (1, 56, 56, 3)), jnp.float32))
    assert cls.shape == (1, 32)

    out3 = tmp_path / "matcher.bin"
    cli_main([
        "export", "--target", "matcher", "--output", str(out3),
        "--orig-h", "64", "--orig-w", "64", "--crop-size", "64",
    ])
    mfn = load_exported(out3.read_bytes())
    mk0, mk1, conf, valid = mfn.call(
        jnp.zeros((1, 64, 64, 1)), jnp.zeros((1, 64, 64, 1))
    )
    assert mk0.shape[0] == 1
