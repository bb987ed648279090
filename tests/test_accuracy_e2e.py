"""End-to-end ACCURACY gate (round-2 verdict item #2): train a tiny matcher
on synthetic rendered pairs with exact geometry, run the SHIPPED eval driver
(`evaluate_dataset` -> the batched runner path) over a LINEMOD-layout
dataset of held-out renders, and assert the assembled pipeline produces
small pose errors — the first test that fails if any stage silently
degrades geometry (crop/K update, matcher coordinates, selection, RANSAC,
record building, metric aggregation), mirroring what res_linemod.xlsx does
for the reference.

Scope note: the container ships no released SAM/DINOv2 checkpoints, so a
random-weight AMG cannot propose semantically meaningful candidates (its
correctness is oracle-tested in test_amg_oracle.py). The runner here
injects candidate boxes (GT-projected bbox + distractors) in place of the
AMG stage, and exercises EVERYTHING downstream of segmentation through the
production code path: compact-expand, crop + K' = T.K, batched DINOv2
retrieval scoring, batch-3 matching, argmax-by-strong-matches selection,
on-chip RANSAC, records, and Acc/AUC/AP50 aggregation.
"""

import dataclasses
import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow

# Resolution choices are accuracy-critical:
# - the crop resolution sets how many coarse cells land on the object (the
#   supervision density): at crop 64 only ~19 cells carried depth and the
#   GT capped at ~15 matches; crop 128 yields ~100 object cells;
# - mkpts0 quantization does NOT add correspondence noise: the fine stage
#   regresses the crop point matching the exact mkpts0 grid corner, so each
#   pair is geometrically exact up to the fine regression error (~0.7px
#   trained). Higher ref resolution therefore buys nothing (measured: a
#   192x256/f400 ref REGRESSED medians — more coarse cells, harder fit).
REF_HW = (96, 128)
CROP = 128
K_REF = np.array([[200.0, 0, 64.0], [0, 200.0, 48.0], [0, 0, 1]], np.float32)
K_TGT = np.array([[210.0, 0, 64.0], [0, 210.0, 48.0], [0, 0, 1]], np.float32)
COMPACT = 0.3  # pipeline's compact_percent (eval_linemod_json.py:76-84)


# ---------------------------------------------------------------------------
# exact-geometry renderer: textured non-planar object, z-buffer point splat
# ---------------------------------------------------------------------------


def _object_cloud(rng, n=620):
    """Textured bumpy 10cm plate: non-planar (so the essential matrix is
    well-posed) with multi-scale texture (so the matcher has local detail)."""
    import cv2

    u = np.linspace(-0.05, 0.05, n)
    uu, vv = np.meshgrid(u, u)
    # ~25% relief: a flatter plate is quasi-planar and the E-matrix admits
    # near-degenerate decompositions that flip R by tens of degrees on a
    # few pairs (measured: 0.012 relief -> 10.6deg median, this -> ~5deg)
    hh = 0.024 * np.sin(uu * 150) * np.cos(vv * 130) + 0.012 * np.sin(vv * 310)
    pts = np.stack([uu, vv, hh], -1).reshape(-1, 3).astype(np.float32)
    tex = rng.uniform(0, 255, (n, n, 3)).astype(np.float32)
    tex = 0.6 * cv2.GaussianBlur(tex, (0, 0), 3.0) + 0.4 * cv2.GaussianBlur(tex, (0, 0), 1.0)
    cols = np.clip(tex, 10, 245).reshape(-1, 3).astype(np.float32)
    return pts, cols


def _render(points, colors, pose, K, hw, rng, ss: int = 2):
    """(H, W, 3) uint8 + (H, W) float depth: `ss`x supersampled point splat
    with per-pixel averaging. Nearest-wins splatting made each pixel a
    coin-flip between competing points, shimmering ~1px between views and
    capping the matcher's sub-pixel accuracy at ~2px; averaging gives
    view-consistent appearance (matcher noise ~1px -> pose medians halve)."""
    H, W = hw
    cam = points @ pose[:3, :3].T + pose[:3, 3]
    z = cam[:, 2]
    Ks = np.asarray(K, np.float64).copy()
    Ks[:2] *= ss
    pix = cam @ Ks.T
    xi = np.round(pix[:, 0] / z).astype(np.int64)
    yi = np.round(pix[:, 1] / z).astype(np.int64)
    Hs, Ws = H * ss, W * ss
    ok = (z > 1e-4) & (xi >= 0) & (xi < Ws) & (yi >= 0) & (yi < Hs)
    flat = yi[ok] * Ws + xi[ok]
    csum = np.zeros((Hs * Ws, 3), np.float64)
    zsum = np.zeros(Hs * Ws, np.float64)
    cnt = np.zeros(Hs * Ws, np.float64)
    np.add.at(csum, flat, colors[ok].astype(np.float64))
    np.add.at(zsum, flat, z[ok])
    np.add.at(cnt, flat, 1.0)
    hit = cnt > 0
    img_hi = np.full((Hs * Ws, 3), 90.0)
    img_hi[hit] = csum[hit] / cnt[hit, None]
    depth_hi = np.zeros(Hs * Ws)
    depth_hi[hit] = zsum[hit] / cnt[hit]
    # box-downsample; a depth cell counts only if every subsample hit
    img = img_hi.reshape(Hs, Ws, 3).reshape(H, ss, W, ss, 3).mean((1, 3))
    d = depth_hi.reshape(H, ss, W, ss)
    full = hit.reshape(H, ss, W, ss).all((1, 3))
    depth = np.where(full, d.mean((1, 3)), 0.0).astype(np.float32)
    img = img + rng.normal(0, 1.0, img.shape)  # faint sensor noise
    return np.clip(img, 0, 255).astype(np.uint8), depth


def _pose(rotvec, t):
    import cv2

    R, _ = cv2.Rodrigues(np.asarray(rotvec, np.float64))
    return np.hstack([R, np.asarray(t, np.float64).reshape(3, 1)]).astype(np.float32)


def _ref_pose():
    return _pose([0.0, 0.0, 0.0], [0, 0, 0.25])


def _tgt_pose(rng):
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    ang = np.deg2rad(rng.uniform(8, 22))
    t = [rng.uniform(-0.015, 0.015), rng.uniform(-0.012, 0.012), rng.uniform(0.30, 0.36)]
    return _pose(axis * ang, t)


def _project_bbox(points, pose, K):
    """Tight xyxy box of the projected cloud."""
    cam = points @ pose[:3, :3].T + pose[:3, 3]
    pix = cam @ np.asarray(K).T
    xy = pix[:, :2] / pix[:, 2:3]
    return np.array([xy[:, 0].min(), xy[:, 1].min(), xy[:, 0].max(), xy[:, 1].max()], np.float32)


def _expand_xyxy(b, pct=COMPACT):
    w, h = b[2] - b[0], b[3] - b[1]
    dx, dy = np.floor(w * pct), np.floor(h * pct)
    return np.array([b[0] - dx, b[1] - dy, b[2] + dx, b[3] + dy], np.float32)


# ---------------------------------------------------------------------------
# training pairs: (full ref view, crop view rendered AT the crop intrinsics)
# ---------------------------------------------------------------------------


TGT_HW = (96, 128)  # the target "color_full" frame the eval path crops from


def _train_pair(points, colors, rng):
    """Render the reference view and the compact-expanded target crop. The
    crop view renders DIRECTLY at K' = T.K (the exact pinhole geometry of
    the pipeline's affine crop): sharper than the production crop warp, but
    the matcher transfers across that resampling shift (measured), while
    training on warp-resampled crops degraded fine precision enough to
    double pose medians."""
    from pope_tpu.geometry.affine import get_K_crop_resize

    pose0, pose1 = _ref_pose(), _tgt_pose(rng)
    img0, depth0 = _render(points, colors, pose0, K_REF, REF_HW, rng)
    # NOTE on box augmentation (measured, round 5): training with jittered
    # boxes — symmetric +/-3px + pct jitter, or even inward-only 0-3px
    # shrink matching the AMG mask-tight distribution — DEGRADES this
    # harness (inject-GT medians 9.3 -> 15.7/16.5): the 12-pair/420-step
    # budget relies on crop-exact overfit. Keep the exact GT box; the
    # real-AMG joint gate below budgets the resulting crop-distribution
    # brittleness in its slack instead.
    box = _expand_xyxy(_project_bbox(points, pose1, K_TGT))
    K_crop = np.asarray(get_K_crop_resize(jnp.asarray(box), jnp.asarray(K_TGT), (CROP, CROP))[0])
    img1, depth1 = _render(points, colors, pose1, K_crop, (CROP, CROP), rng)
    T = np.eye(4, dtype=np.float32)
    T[:3] = pose1
    T0 = np.eye(4, dtype=np.float32)
    T0[:3] = pose0
    T_0to1 = T @ np.linalg.inv(T0)
    return {
        # ITU-R 601 luma — the EXACT gray conversion the production match
        # stage applies (pose_pipeline._rgb01_to_gray); channel-mean gray
        # is ~0.87-correlated with luma on random textures, a needless
        # train/eval domain shift
        "image0": (img0.astype(np.float32) @ np.array([0.299, 0.587, 0.114]))[..., None] / 255.0,
        "image1": (img1.astype(np.float32) @ np.array([0.299, 0.587, 0.114]))[..., None] / 255.0,
        "depth0": depth0,
        "depth1": depth1,
        "T_0to1": T_0to1.astype(np.float32),
        "T_1to0": np.linalg.inv(T_0to1).astype(np.float32),
        "K0": K_REF,
        "K1": K_crop.astype(np.float32),
    }


def _train_matcher(points, colors, rng, steps=420, batch=4, n_pairs=12):
    from pope_tpu.config import (
        BackboneConfig, CoarseMatchConfig, LoFTRStageConfig, MatcherConfig,
    )
    from pope_tpu.models.matcher import Matcher
    from pope_tpu.train import build_optimizer, matcher_train_step
    from pope_tpu.train.optim import OptimConfig
    from pope_tpu.train.trainer import init_matcher_train_state

    mcfg = MatcherConfig(
        backbone=BackboneConfig(initial_dim=24, block_dims=(24, 40, 64)),
        coarse=LoFTRStageConfig(d_model=64, d_ffn=64, nhead=2,
                                layer_names=("self", "cross", "self", "cross")),
        fine=LoFTRStageConfig(d_model=24, d_ffn=24, nhead=2,
                              layer_names=("self", "cross")),
        match_coarse=CoarseMatchConfig(match_capacity=192),
    )
    matcher = Matcher(mcfg)
    pairs = [_train_pair(points, colors, rng) for _ in range(n_pairs)]

    def make_batch(idx):
        sel = [pairs[i % n_pairs] for i in idx]
        return {k: jnp.asarray(np.stack([p[k] for p in sel])) for k in sel[0]}

    tx = build_optimizer(OptimConfig(lr=2e-3, warmup_steps=20,
                                     scheduler="ExponentialLR", elr_gamma=0.999))
    state = init_matcher_train_state(matcher, tx, jax.random.PRNGKey(0), make_batch([0, 1]))
    step = jax.jit(lambda s, b: matcher_train_step(matcher, tx, s, b))
    losses = []
    for i in range(steps):
        b = make_batch([(i * batch + j) % n_pairs for j in range(batch)])
        state, metrics = step(state, b)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-20:]) < np.mean(losses[:20]), losses[::40]
    return matcher, {"params": state.params, "batch_stats": state.batch_stats}, mcfg


# ---------------------------------------------------------------------------
# eval dataset on disk (LINEMOD layout) + candidate-injecting runner
# ---------------------------------------------------------------------------


def _write_eval_dataset(root, points, colors, rng, n_pairs=10):
    import cv2

    label, seq = "0801-lm1-others", "lm1-3"
    base = os.path.join(root, "LM_dataset", label, seq)
    for sub in ("color", "color_full", "intrin", "intrin_ba", "poses_ba"):
        os.makedirs(os.path.join(base, sub), exist_ok=True)
    pairs = []
    for i in range(n_pairs):
        pose0, pose1 = _ref_pose(), _tgt_pose(rng)
        img0, _ = _render(points, colors, pose0, K_REF, REF_HW, rng)
        img1, _ = _render(points, colors, pose1, K_TGT, TGT_HW, rng)
        cv2.imwrite(os.path.join(base, "color", f"{i}.png"), img0[..., ::-1])
        cv2.imwrite(os.path.join(base, "color_full", f"{1000+i}.png"), img1[..., ::-1])
        np.savetxt(os.path.join(base, "intrin_ba", f"{i}.txt"), K_REF)
        np.savetxt(os.path.join(base, "intrin", f"{1000+i}.txt"), K_TGT)
        np.savetxt(os.path.join(base, "poses_ba", f"{i}.txt"), pose0)
        np.savetxt(os.path.join(base, "poses_ba", f"{1000+i}.txt"), pose1)
        pairs.append(f"{label}/{seq}/color/{i}.png-{1000+i}.png")
    # corner extents 1.28x the plate: the AP50 gate compares the projected
    # corner rect against the COMPACT-EXPANDED (1.6x linear) candidate box
    # (recall_object, eval_linemod_json.py:152-159) — on LINEMOD the 3-D
    # bbox rect similarly exceeds the visible-mask box, which is what makes
    # the reference's 0.84 AP50 geometrically possible
    corners = np.array(
        [[x, y, z] for x in (-0.064, 0.064) for y in (-0.064, 0.064) for z in (-0.02, 0.02)]
    )
    np.savetxt(os.path.join(root, "LM_dataset", label, "box3d_corners.txt"), corners)
    pairs_dir = os.path.join(root, "pairs")
    os.makedirs(pairs_dir, exist_ok=True)
    with open(os.path.join(pairs_dir, "LINEMOD-test.json"), "w") as f:
        json.dump([{"0": pairs}], f)
    return root, pairs_dir


def _make_candidate_runner(points, box_shrink_px: float = 0.0):
    """runner.run_pairs twin that injects candidate boxes (GT bbox + two
    distractors) in place of the AMG stage; everything downstream is the
    production fused program (see module docstring for why).

    box_shrink_px: shrink each GT box edge inward by this many pixels —
    models the shipped eval_decode_subsample=4 box quantization (provably
    <=3 full-res px inward at VGA; scaled to this harness's frame width by
    the joint-stack gate below)."""
    from pope_tpu.pipeline.runner import _load_pair_host, _record, _unpack_record, pair_keys_np

    def run_pairs(models, paths_list, spec, hosts=None, dev=None, keys=None):
        from pope_tpu.pipeline.runner import get_executor

        if hosts is None:
            hosts = [_load_pair_host(p) for p in paths_list]
        executor = get_executor(models, spec.crop_size)
        B = len(paths_list)
        cand, valid = [], []
        for h in hosts:
            _, _, _, K1, _, pose1 = h
            gt = _project_bbox(points, pose1[:3], K1)
            s = box_shrink_px
            gt = np.array([gt[0] + s, gt[1] + s, gt[2] - s, gt[3] - s], np.float32)
            gt_xywh = [gt[0], gt[1], gt[2] - gt[0], gt[3] - gt[1]]
            cand.append([gt_xywh, [2.0, 2.0, 40.0, 40.0], [100.0, 60.0, 50.0, 50.0]])
            valid.append([True, True, True])
        img0 = jnp.asarray(np.stack([h[0] for h in hosts]).astype(np.uint8))
        img1 = jnp.asarray(np.stack([h[1] for h in hosts]).astype(np.uint8))
        K0_b = jnp.asarray(np.stack([h[2] for h in hosts]))
        K1_b = jnp.asarray(np.stack([h[3] for h in hosts]))
        keys = jnp.asarray(pair_keys_np(paths_list))
        # the shipped runner's shape: prompt cls folds into the fused program
        run = executor.batched()
        small, matches = run(
            img0, img1, K0_b, K1_b,
            jnp.asarray(np.asarray(cand, np.float32)),
            jnp.asarray(np.asarray(valid)), None, keys, packed=True,
        )
        small_b, matches_b = jax.device_get((small, matches))
        return [
            _record(paths_list[i], hosts[i], _unpack_record(small_b[i], matches_b[i]))
            for i in range(B)
        ]

    return run_pairs


@pytest.fixture(scope="module")
def trained_setup(tmp_path_factory):
    """One matcher training run + one held-out eval dataset shared by every
    accuracy gate in this module (training dominates the wall time)."""
    rng = np.random.default_rng(20231223)
    points, colors = _object_cloud(rng)
    matcher, m_vars, mcfg = _train_matcher(points, colors, rng)
    root = str(tmp_path_factory.mktemp("acc_eval"))
    data_root, pairs_dir = _write_eval_dataset(root, points, colors, rng)
    return {
        "points": points, "colors": colors,
        "matcher": matcher, "m_vars": m_vars, "mcfg": mcfg,
        "data_root": data_root, "pairs_dir": pairs_dir,
    }


def test_trained_pipeline_accuracy(trained_setup):
    import pope_tpu.eval.manifest as mf
    from pope_tpu.config import AMGConfig, DinoV2Config, PipelineConfig
    from pope_tpu.eval import DATASETS, evaluate_dataset
    from pope_tpu.models.dinov2 import DinoVisionTransformer
    from pope_tpu.pipeline.api import PopeModels

    points = trained_setup["points"]
    matcher, m_vars, mcfg = (
        trained_setup["matcher"], trained_setup["m_vars"], trained_setup["mcfg"]
    )

    dcfg = DinoV2Config(img_size=196, embed_dim=64, depth=2, num_heads=2)
    dinov2 = DinoVisionTransformer(dcfg)
    d_vars = dinov2.init(jax.random.PRNGKey(0), np.zeros((1, 196, 196, 3), np.float32))
    # ransac_thresh_px is the reference's own exposed solver knob
    # (estimate_pose(..., thresh), metrics.py:69): 0.5px assumes LoFTR-grade
    # sub-pixel matches; the tiny overfit matcher here lands ~1px, so the
    # threshold follows (otherwise <8 matches clear 0.5px and ok=False)
    cfg = PipelineConfig(matcher=mcfg, dinov2=dcfg, amg=AMGConfig(),
                         ransac_thresh_px=1.0)
    models = PopeModels(
        sam=None, sam_variables=None, dinov2=dinov2, dinov2_variables=d_vars,
        matcher=matcher, matcher_variables=m_vars, amg=None, config=cfg,
    )

    data_root, pairs_dir = trained_setup["data_root"], trained_setup["pairs_dir"]
    spec = dataclasses.replace(DATASETS["linemod"], crop_size=CROP)
    orig = mf.DATASETS["linemod"]
    mf.DATASETS["linemod"] = spec
    try:
        per_obj = evaluate_dataset(
            models, "linemod", data_root, pairs_dir, progress=False,
            batch_size=2, run_pairs=_make_candidate_runner(points),
        )
    finally:
        mf.DATASETS["linemod"] = orig

    agg = per_obj[list(per_obj)[0]]
    # the accuracy gate: a trained matcher + the assembled pipeline recovers
    # pose well under the 90-degree failure penalty and the reference's own
    # LINEMOD medians (15.5 deg R, BASELINE.md)
    assert agg["R:medianErr"] < 10.0, agg
    assert agg["AP50"] > 0.8, agg
    assert agg["R:ACC15"] > 0.5, agg

    # bf16-matcher gate: bench.py ships the matcher in bf16 compute; its
    # pose accuracy on the SAME trained weights must hold up (the bf16
    # softmax/expectation noise stays well under the ~1px match noise this
    # harness budgets). Keeps the published throughput claim honest: the
    # speed measured with a bf16 matcher corresponds to an accuracy this
    # gate enforces.
    from pope_tpu.models.matcher import Matcher

    mcfg16 = dataclasses.replace(mcfg, dtype="bfloat16")
    models16 = PopeModels(
        sam=None, sam_variables=None, dinov2=dinov2, dinov2_variables=d_vars,
        matcher=Matcher(mcfg16), matcher_variables=m_vars, amg=None,
        config=dataclasses.replace(cfg, matcher=mcfg16),
    )
    mf.DATASETS["linemod"] = spec
    try:
        per_obj16 = evaluate_dataset(
            models16, "linemod", data_root, pairs_dir, progress=False,
            batch_size=2, run_pairs=_make_candidate_runner(points),
        )
    finally:
        mf.DATASETS["linemod"] = orig
    agg16 = per_obj16[list(per_obj16)[0]]
    # the STRICT claim is the relative one (bf16 degrades the f32 result by
    # <2 deg median); the absolute bound is the f32 gate plus that allowance
    # (10 + 2), not 10 itself — bf16 medians run ~1-2 deg above f32 here and
    # sit right at 10 depending on the host's oneDNN dispatch, so an
    # absolute 10 flaps without measuring anything the relative gate misses
    assert agg16["R:medianErr"] < 12.0, (agg, agg16)
    assert agg16["AP50"] > 0.8, agg16
    assert agg16["R:medianErr"] < agg["R:medianErr"] + 2.0, (agg, agg16)


def _luma_sam(dtype: str, gelu: str):
    """Tiny SAM whose AMG output is a REAL function of image content: the
    encoder is surgically reduced to per-patch mean brightness (equal-weight
    channel average + a bias that thresholds between the harness's bright
    textured object and its gray-90 background), and the decoder to the
    oracle-style structure of test_amg_oracle.py (identity upscaling +
    one-hot hypernetworks): mask-slot logits are +/-(brightness channel), so
    slot 1 segments the object, slot 2 its complement, slot 3 is empty.

    Every shipped AMG approximation therefore runs for real — rect_encode's
    sliced pos/rel-pos tables, eval_decode_subsample's reduced-res
    box-from-mask, the bf16 encoder, tanh gelu, bf16 weight storage — and
    what the joint gate measures is their true effect on candidate boxes
    and everything downstream, not an analytic model of it.

    Why sign-structure survives: blocks contribute through zeroed proj /
    mlp_lin2 (identity residual stream); neck LN2d + the decoder's norm4
    LayerNorms only rescale the single nonzero channel (sign-preserving);
    dense_prompt (no_mask) is zeroed so the threshold stays at brightness
    == bias. The bias must also reject the square-mode pad band, which the
    preprocess fills with ZEROS after normalization (= exactly the ImageNet
    mean): with -0.085 the object's textured patches measure ~+0.085 in
    normalized units, pad -0.085, gray-90 background -0.56 — the two arms
    binarize identically except on true boundary patches (the regime a
    trained SAM operates in)."""
    import flax
    from pope_tpu.config import SamConfig, SamEncoderConfig
    from pope_tpu.models.sam import Sam

    # patch 8 (not SAM's 16): the mask is patch-blocky, so box edges
    # quantize at patch granularity — 8px at the 256 model scale = 4px in
    # the 96x128 harness frame, comparable (relative to the ~60px object)
    # to the trained matcher's crop distribution; at patch 16 the exact
    # arm's own boxes sat ~8px inside GT and pose medians doubled
    enc = SamEncoderConfig(
        img_size=256, patch_size=8, embed_dim=64, depth=2, num_heads=2,
        window_size=4, global_attn_indexes=(1,), out_chans=32,
        dtype=dtype, gelu=gelu, use_flash_attention=False,
    )
    cfg = SamConfig(
        encoder=enc, prompt_embed_dim=32, image_embedding_size=32,
        decoder_num_heads=2, decoder_mlp_dim=64, iou_head_hidden_dim=32,
        decoder_dtype=dtype,
    )
    sam = Sam(cfg)
    v = sam.init(
        jax.random.PRNGKey(3), jnp.zeros((256, 256, 3)), (256, 256),
        jnp.zeros((1, 2, 2)), jnp.zeros((1, 2), jnp.int32),
    )
    p = flax.core.unfreeze(v)["params"]
    p = jax.tree_util.tree_map(lambda a: np.array(a, np.float32), p)

    def zeros_like(*path):
        node = p
        for k in path[:-1]:
            node = node[k]
        node[path[-1]] = np.zeros_like(node[path[-1]])
        return node[path[-1]]

    # patch embed -> channel 0 = mean normalized brightness + 0.10
    k = zeros_like("image_encoder", "patch_embed", "kernel")
    k[:, :, :, 0] = 1.0 / (3 * 8 * 8)
    b = zeros_like("image_encoder", "patch_embed", "bias")
    b[0] = -0.085
    for i in range(enc.depth):  # identity residual stream
        zeros_like("image_encoder", f"block_{i}", "proj", "kernel")
        zeros_like("image_encoder", f"block_{i}", "proj", "bias")
        zeros_like("image_encoder", f"block_{i}", "mlp_lin2", "kernel")
        zeros_like("image_encoder", f"block_{i}", "mlp_lin2", "bias")
    k = zeros_like("image_encoder", "neck_conv1", "kernel")
    k[0, 0, 0, 0] = 1.0
    k = zeros_like("image_encoder", "neck_conv2", "kernel")
    k[1, 1, 0, 0] = 1.0

    zeros_like("prompt_encoder", "no_mask")  # keep src = embedding exactly

    for i in range(2):  # keys update only through cross_attn_i2t
        zeros_like("mask_decoder", "transformer", f"layer_{i}", "cross_attn_i2t", "out_proj", "kernel")
        zeros_like("mask_decoder", "transformer", f"layer_{i}", "cross_attn_i2t", "out_proj", "bias")
    k = zeros_like("mask_decoder", "up_conv1", "kernel")
    k[:, :, 0, 0] = 1.0  # nearest upsample of channel 0
    zeros_like("mask_decoder", "up_conv1", "bias")
    k = zeros_like("mask_decoder", "up_conv2", "kernel")
    k[:, :, 0, 0] = 1.0
    b = zeros_like("mask_decoder", "up_conv2", "bias")
    b[0] = -0.5  # push coverage off the trivial threshold
    # one-hot hypernetworks: slot1 = +ch0 (object), slot2 = -ch0
    # (complement distractor), slot3 = empty
    for i, w0 in ((0, 1.0), (1, 1.0), (2, -1.0), (3, 0.0)):
        zeros_like("mask_decoder", f"hyper_{i}", "lin2", "kernel")
        b = zeros_like("mask_decoder", f"hyper_{i}", "lin2", "bias")
        b[0] = w0
    zeros_like("mask_decoder", "iou_head", "lin2", "kernel")
    p["mask_decoder"]["iou_head"]["lin2"]["bias"] = np.ones_like(
        p["mask_decoder"]["iou_head"]["lin2"]["bias"]
    )
    return sam, {"params": p}, cfg


def test_joint_shipped_vs_exact_stack(trained_setup):
    """JOINT approximation gate, two layers (VERDICT r3 #5 + r4 #4):

    A. PAIRED-CANDIDATES TOWER GATE (tight slack): the shipped tower/solver
       stack — bf16 retrieval + tanh gelu + bf16 matcher + 3-round RANSAC —
       vs the exact stack (f32 towers, erf, 6 rounds) with IDENTICAL
       injected candidate boxes, so both arms see the same crops and the
       delta isolates the numeric approximations. Slack ~1.5x the measured
       deltas (bf16 matcher ~2 deg): +2.5 deg median, -0.1 ACC15.

    B. REAL-AMG FAMILY GATE: both arms run the PRODUCTION driver end to end
       (evaluate_dataset -> runner.run_pairs -> AMG generate_boxes_batch ->
       fused program) with the _luma_sam fixture actually segmenting the
       object — the shipped arm adds rect_encode + eval_decode_subsample=4
       + bf16 SAM encoder/decoder with bf16 weight storage + tanh gelu, so
       every shipped AMG approximation contributes its TRUE effect on
       candidate boxes (no analytic box-shrink model). Slack is wider here
       by necessity: the arms' boxes are different realizations (mask-tight,
       patch-quantized), and this harness's 12-pair-overfit matcher
       amplifies crop-distribution shifts (~+4 deg vs injected-GT boxes,
       measured) that a production-scale matcher would not — the gate
       bounds family membership, catching any approximation that breaks
       segmentation-driven candidates outright.

    No t-direction gate, as elsewhere in this module: at ~1.5cm lateral
    baselines the translation DIRECTION flips tens of degrees from mm-scale
    noise (the reference's own LINEMOD t:medianErr is 38.9 deg,
    BASELINE.md)."""
    import pope_tpu.eval.manifest as mf
    from pope_tpu.config import AMGConfig, DinoV2Config, PipelineConfig
    from pope_tpu.eval import DATASETS, evaluate_dataset
    from pope_tpu.models.dinov2 import DinoVisionTransformer
    from pope_tpu.models.matcher import Matcher
    from pope_tpu.models.sam import AutomaticMaskGenerator
    from pope_tpu.pipeline.api import PopeModels
    from pope_tpu.utils.bf16_storage import cast_sam_storage

    points = trained_setup["points"]
    matcher, m_vars, mcfg = (
        trained_setup["matcher"], trained_setup["m_vars"], trained_setup["mcfg"]
    )
    data_root, pairs_dir = trained_setup["data_root"], trained_setup["pairs_dir"]

    def towers(shipped: bool, with_amg: bool):
        dtype = "bfloat16" if shipped else "float32"
        gelu = "tanh" if shipped else "erf"
        dcfg = DinoV2Config(img_size=196, embed_dim=64, depth=2, num_heads=2,
                            dtype=dtype, gelu=gelu)
        dinov2 = DinoVisionTransformer(dcfg)
        d_vars = dinov2.init(
            jax.random.PRNGKey(0), np.zeros((1, 196, 196, 3), np.float32)
        )
        m = dataclasses.replace(mcfg, dtype=dtype)
        sam = sam_vars = amg = None
        amg_cfg = AMGConfig()
        if with_amg:
            sam, sam_vars, sam_cfg = _luma_sam(dtype, gelu)
            if shipped:  # production storage path (bit-identical, gated anyway)
                sam_vars = cast_sam_storage(sam_vars, sam_cfg.encoder)
            amg_cfg = AMGConfig(
                points_per_side=4, pred_iou_thresh=0.5,
                stability_score_thresh=0.0, min_mask_region_area=4,
                mask_capacity=8, points_per_chunk=0, rect_encode=shipped,
                eval_decode_subsample=4 if shipped else 1,
            )
            amg = AutomaticMaskGenerator(sam, sam_vars, amg_cfg, sam_cfg)
        cfg = PipelineConfig(matcher=m, dinov2=dcfg, amg=amg_cfg,
                             ransac_thresh_px=1.0,
                             ransac_rounds=3 if shipped else 6)
        return PopeModels(
            sam=sam, sam_variables=sam_vars, dinov2=dinov2,
            dinov2_variables=d_vars, matcher=Matcher(m), matcher_variables=m_vars,
            amg=amg, config=cfg,
        )

    spec = dataclasses.replace(DATASETS["linemod"], crop_size=CROP)
    orig = mf.DATASETS["linemod"]

    def run(models, run_pairs=None):
        mf.DATASETS["linemod"] = spec
        try:
            kw = {"run_pairs": run_pairs} if run_pairs is not None else {}
            per_obj = evaluate_dataset(
                models, "linemod", data_root, pairs_dir, progress=False,
                batch_size=2, **kw,
            )
        finally:
            mf.DATASETS["linemod"] = orig
        return per_obj[list(per_obj)[0]]

    # --- A: paired candidates, tight slack -------------------------------
    inject = _make_candidate_runner(points)
    exact_p = run(towers(shipped=False, with_amg=False), inject)
    shipped_p = run(towers(shipped=True, with_amg=False), inject)
    assert exact_p["AP50"] > 0.8 and exact_p["R:medianErr"] < 10.0, exact_p
    assert shipped_p["R:medianErr"] < exact_p["R:medianErr"] + 2.5, (exact_p, shipped_p)
    assert shipped_p["R:ACC15"] >= exact_p["R:ACC15"] - 0.1 - 1e-6, (exact_p, shipped_p)  # 10-pair ACC granularity IS 0.1; epsilon guards the binary-float 0.8-0.1 boundary
    assert shipped_p["AP50"] >= exact_p["AP50"] - 0.05 - 1e-6, (exact_p, shipped_p)
    assert shipped_p["R:medianErr"] < 12.5, (exact_p, shipped_p)

    # --- B: real AMG in both arms, family membership ----------------------
    exact_a = run(towers(shipped=False, with_amg=True))
    shipped_a = run(towers(shipped=True, with_amg=True))
    # the exact arm must itself work end to end through the real AMG
    # (measured 13.5 deg / ACC15 0.6 / AP50 1.0; hard failures -- complement
    # selected, empty candidates, 90-deg penalties -- land at 25+ deg)
    assert exact_a["AP50"] > 0.8, (exact_a, shipped_a)
    assert exact_a["R:medianErr"] < 17.0, (exact_a, shipped_a)
    assert shipped_a["R:medianErr"] < exact_a["R:medianErr"] + 4.0, (exact_a, shipped_a)
    assert shipped_a["R:ACC15"] >= exact_a["R:ACC15"] - 0.2 - 1e-6, (exact_a, shipped_a)
    assert shipped_a["AP50"] >= exact_a["AP50"] - 0.1 - 1e-6, (exact_a, shipped_a)
    assert shipped_a["R:medianErr"] < 19.0, (exact_a, shipped_a)
