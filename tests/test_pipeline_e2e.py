"""End-to-end pipeline test: a synthetic LINEMOD-layout mini dataset driven
through segment -> retrieve -> match -> solve -> metrics with small random
models. Checks the plumbing (paths, shapes, aggregation), not accuracy."""

import dataclasses
import json
import os

import numpy as np
import pytest
import cv2
import jax

from pope_tpu.config import AMGConfig, CoarseMatchConfig, DinoV2Config, MatcherConfig, PipelineConfig
from pope_tpu.eval import DATASETS, evaluate_dataset, results_to_xlsx
from pope_tpu.eval.evaluate import results_table
from pope_tpu.models.dinov2 import DinoVisionTransformer
from pope_tpu.models.matcher import Matcher
from pope_tpu.models.sam import AutomaticMaskGenerator, Sam, convert_torch_sam_state
from pope_tpu.pipeline.api import PopeModels
from pope_tpu.pipeline.runner import run_pair
from tests.test_sam_parity import TEST_CFG as SAM_TEST_CFG
from tests.torch_ref import load_reference_sam

pytestmark = pytest.mark.slow  # heavy oracle/e2e surface; core suite skips


def _build_tiny_models(coarse_cfg=None):
    _, sd = load_reference_sam(seed=2, size="test")
    sam_vars = convert_torch_sam_state(sd, depth=4)
    sam = Sam(SAM_TEST_CFG)

    dcfg = DinoV2Config(img_size=196, embed_dim=64, depth=2, num_heads=2)
    dinov2 = DinoVisionTransformer(dcfg)
    d_vars = dinov2.init(jax.random.PRNGKey(0), np.zeros((1, 196, 196, 3), np.float32))

    mcfg = MatcherConfig(
        match_coarse=coarse_cfg or CoarseMatchConfig(match_capacity=128)
    )
    matcher = Matcher(mcfg)
    m_vars = matcher.init(
        jax.random.PRNGKey(1), np.zeros((1, 64, 64, 1), np.float32), np.zeros((1, 64, 64, 1), np.float32)
    )

    cfg = PipelineConfig(
        matcher=mcfg, dinov2=dcfg, amg=AMGConfig(points_per_side=4, pred_iou_thresh=-1e9, stability_score_thresh=0.0, mask_capacity=8)
    )
    amg = AutomaticMaskGenerator(sam, sam_vars, cfg.amg, SAM_TEST_CFG)
    return PopeModels(
        sam=sam, sam_variables=sam_vars,
        dinov2=dinov2, dinov2_variables=d_vars,
        matcher=matcher, matcher_variables=m_vars,
        amg=amg, config=cfg,
    )


@pytest.fixture(scope="module")
def tiny_models():
    return _build_tiny_models()


@pytest.fixture(scope="module")
def mini_dataset(tmp_path_factory):
    """LINEMOD-layout: root/LM_dataset/<label>/<seq>/color{,_full}/..."""
    rng = np.random.default_rng(0)
    root = tmp_path_factory.mktemp("data")
    label = "0801-lm1-others"
    seq = "lm1-3"
    base = root / "LM_dataset" / label / seq
    for sub in ("color", "color_full", "intrin", "intrin_ba", "poses_ba"):
        os.makedirs(base / sub, exist_ok=True)
    K = np.array([[200.0, 0, 80], [0, 200, 64], [0, 0, 1]])
    pairs = []
    for i in range(2):
        ref = rng.uniform(0, 255, (128, 160, 3)).astype(np.uint8)
        tgt = rng.uniform(0, 255, (128, 160, 3)).astype(np.uint8)
        cv2.rectangle(tgt, (40, 30), (110, 100), (250, 240, 20), -1)
        cv2.imwrite(str(base / "color" / f"{i}.png"), ref)
        cv2.imwrite(str(base / "color_full" / f"{100+i}.png"), tgt)
        np.savetxt(base / "intrin_ba" / f"{i}.txt", K)
        np.savetxt(base / "intrin" / f"{100+i}.txt", K)
        pose0 = np.hstack([np.eye(3), [[0], [0], [0.6]]])
        pose1 = np.hstack([cv2.Rodrigues(np.array([0.05, 0.2, -0.1]))[0], [[0.02], [0.0], [0.62]]])
        np.savetxt(base / "poses_ba" / f"{i}.txt", pose0)
        np.savetxt(base / "poses_ba" / f"{100+i}.txt", pose1)
        pairs.append(f"{label}/{seq}/color/{i}.png-{100+i}.png")
    np.savetxt(root / "LM_dataset" / label / "box3d_corners.txt",
               np.array([[x, y, z] for x in (-0.05, 0.05) for y in (-0.05, 0.05) for z in (-0.05, 0.05)]))

    pairs_dir = root / "pairs"
    os.makedirs(pairs_dir, exist_ok=True)
    manifest = [{"0": pairs}]
    with open(pairs_dir / "LINEMOD-test.json", "w") as f:
        json.dump(manifest, f)
    return str(root), str(pairs_dir)


def test_full_pipeline_e2e(tiny_models, mini_dataset, tmp_path):
    data_root, pairs_dir = mini_dataset
    spec = dataclasses.replace(DATASETS["linemod"], crop_size=64)
    import pope_tpu.eval.manifest as mf

    orig = mf.DATASETS["linemod"]
    mf.DATASETS["linemod"] = spec
    try:
        per_obj = evaluate_dataset(
            tiny_models, "linemod", data_root, pairs_dir, run_pair, progress=False
        )
    finally:
        mf.DATASETS["linemod"] = orig

    assert len(per_obj) == 1
    obj = list(per_obj)[0]
    agg = per_obj[obj]
    assert "R:ACC15" in agg and "AP50" in agg and "R:auc@30" in agg
    assert 0.0 <= agg["AP50"] <= 1.0
    # table + xlsx exports render
    table = results_table(per_obj)
    assert "Avg" in table
    xlsx = tmp_path / "res.xlsx"
    results_to_xlsx(per_obj, str(xlsx))
    assert xlsx.exists()


def test_evaluate_dataset_batched_matches_serial(tiny_models, mini_dataset):
    """The batched production driver (evaluate_dataset(batch_size=B) ->
    runner.run_pairs) must produce the same per-object metrics as the serial
    per-pair loop."""
    data_root, pairs_dir = mini_dataset
    spec = dataclasses.replace(DATASETS["linemod"], crop_size=64)
    import pope_tpu.eval.manifest as mf

    orig = mf.DATASETS["linemod"]
    mf.DATASETS["linemod"] = spec
    try:
        serial = evaluate_dataset(
            tiny_models, "linemod", data_root, pairs_dir, run_pair, progress=False
        )
        batched = evaluate_dataset(
            tiny_models, "linemod", data_root, pairs_dir, progress=False, batch_size=2
        )
    finally:
        mf.DATASETS["linemod"] = orig

    assert set(serial) == set(batched)
    for obj in serial:
        for k, v in serial[obj].items():
            np.testing.assert_allclose(batched[obj][k], v, atol=1e-3, err_msg=f"{obj}/{k}")


def test_cli_eval_batched_default_matches_serial(tiny_models, mini_dataset, tmp_path, monkeypatch):
    """`pope eval` (VERDICT r3 #1: the batched dp-shardable driver IS the
    product default) must produce metrics identical to `pope eval --serial`,
    and the --dp CPU-mesh path must match both — including the ragged-tail
    padding (2 pairs through dp=2)."""
    import pope_tpu.eval.manifest as mf
    import pope_tpu.pipeline as pl
    from pope_tpu.cli import main as cli_main

    data_root, pairs_dir = mini_dataset
    spec = dataclasses.replace(DATASETS["linemod"], crop_size=64)
    orig = mf.DATASETS["linemod"]
    mf.DATASETS["linemod"] = spec
    monkeypatch.setattr(pl, "load_models", lambda **kw: tiny_models)

    def run_cli(extra, name):
        out = tmp_path / f"{name}.json"
        cli_main([
            "eval", "--dataset", "linemod", "--data-root", data_root,
            "--pairs-dir", pairs_dir, "--json-out", str(out), *extra,
        ])
        with open(out) as f:
            return json.load(f)

    try:
        serial = run_cli(["--serial"], "serial")
        batched = run_cli(["--batch-size", "2"], "batched")
        # dp=2 over the CPU mesh; batch 2 -> one dp-sharded batch
        dp = run_cli(["--batch-size", "2", "--dp", "2"], "dp")
        # ragged tail: batch 4 > the 2 available pairs, dp=2 pads to 2
        dp_ragged = run_cli(["--batch-size", "4", "--dp", "2"], "dp_ragged")
    finally:
        mf.DATASETS["linemod"] = orig

    for name, got in [("batched", batched), ("dp", dp), ("dp_ragged", dp_ragged)]:
        assert set(got) == set(serial), name
        for obj in serial:
            for k, v in serial[obj].items():
                np.testing.assert_allclose(
                    got[obj][k], v, atol=1e-3, err_msg=f"{name}/{obj}/{k}"
                )


def test_batched_pairs(tiny_models, rng):
    """vmapped multi-pair path produces the same results as per-pair calls."""
    import jax
    import jax.numpy as jnp

    from pope_tpu.pipeline.pose_pipeline import PipelineExecutor

    ex = PipelineExecutor(tiny_models, crop_size=64)
    B, C = 2, tiny_models.config.amg.mask_capacity
    img0 = jnp.asarray(rng.uniform(0, 1, (B, 96, 96, 3)), jnp.float32)
    img1 = jnp.asarray(rng.uniform(0, 1, (B, 96, 96, 3)), jnp.float32)
    K = jnp.broadcast_to(jnp.asarray([[100.0, 0, 48], [0, 100, 48], [0, 0, 1]]), (B, 3, 3))
    boxes = jnp.asarray(rng.uniform(5, 40, (B, C, 4)), jnp.float32)
    valid = jnp.ones((B, C), bool)
    ref_cls = jnp.asarray(rng.normal(0, 1, (B, 64)), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    run = ex.build_batched(B)
    res = run(img0, img1, K, K, boxes, valid, ref_cls, keys)
    assert res.R.shape == (B, 3, 3)
    assert res.mkpts0.shape[0] == B
    assert np.isfinite(np.asarray(res.R)).all()

    # parity vs the single-pair stages for pair 0
    import types

    fake_amg = types.SimpleNamespace(boxes_xywh=boxes[0], valid=valid[0])
    single = ex.estimate_pair(img0[0], img1[0], K[0], K[0], fake_amg, ref_cls[0], keys[0])
    np.testing.assert_allclose(np.asarray(single.R), np.asarray(res.R[0]), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(single.mkpts1), np.asarray(res.mkpts1[0]), atol=1e-3
    )


def test_batched_pairs_fold_prompt(tiny_models, rng):
    """fold_prompt=True (the shipped runner: prompt cls computed inside the
    fused program as a C+1'th retrieval crop) must reproduce the unfolded
    path fed the separately-computed prompt_cls_raw tokens."""
    import jax
    import jax.numpy as jnp

    from pope_tpu.pipeline.pose_pipeline import PipelineExecutor

    ex = PipelineExecutor(tiny_models, crop_size=64)
    B, C = 2, tiny_models.config.amg.mask_capacity
    img0 = jnp.asarray(rng.uniform(0, 255, (B, 96, 96, 3)), jnp.uint8)
    img1 = jnp.asarray(rng.uniform(0, 255, (B, 96, 96, 3)), jnp.uint8)
    K = jnp.broadcast_to(jnp.asarray([[100.0, 0, 48], [0, 100, 48], [0, 0, 1]]), (B, 3, 3))
    boxes = jnp.asarray(rng.uniform(5, 40, (B, C, 4)), jnp.float32)
    valid = jnp.ones((B, C), bool)
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    ref_cls = ex.prompt_cls_raw(img0)
    base = ex.build_batched(B)(img0, img1, K, K, boxes, valid, ref_cls, keys)
    res = ex.build_batched(B, fold_prompt=True)(
        img0, img1, K, K, boxes, valid, None, keys
    )

    np.testing.assert_allclose(
        np.asarray(res.sim_scores), np.asarray(base.sim_scores), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(res.R), np.asarray(base.R), atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.mkpts1), np.asarray(base.mkpts1), atol=1e-3)


def test_batched_pairs_dp_sharded(tiny_models, rng):
    """The dp-mesh-sharded batched runner must reproduce the unsharded
    results exactly (BASELINE.json config #5: scale the pair loop over
    chips; here an 8-virtual-device CPU mesh)."""
    import jax
    import jax.numpy as jnp

    from pope_tpu.parallel import make_mesh
    from pope_tpu.pipeline.pose_pipeline import PipelineExecutor

    ex = PipelineExecutor(tiny_models, crop_size=64)
    B, C = 8, tiny_models.config.amg.mask_capacity
    img0 = jnp.asarray(rng.uniform(0, 1, (B, 96, 96, 3)), jnp.float32)
    img1 = jnp.asarray(rng.uniform(0, 1, (B, 96, 96, 3)), jnp.float32)
    K = jnp.broadcast_to(jnp.asarray([[100.0, 0, 48], [0, 100, 48], [0, 0, 1]]), (B, 3, 3))
    boxes = jnp.asarray(rng.uniform(5, 40, (B, C, 4)), jnp.float32)
    valid = jnp.ones((B, C), bool)
    ref_cls = jnp.asarray(rng.normal(0, 1, (B, 64)), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    run = ex.build_batched(B)
    base = run(img0, img1, K, K, boxes, valid, ref_cls, keys)

    mesh = make_mesh(8, tp=1)  # dp=8
    run_dp = ex.build_batched(B, mesh=mesh)
    res = run_dp(img0, img1, K, K, boxes, valid, ref_cls, keys)

    np.testing.assert_allclose(np.asarray(res.R), np.asarray(base.R), atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.mkpts1), np.asarray(base.mkpts1), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(res.ok), np.asarray(base.ok))


def test_extract_to_regressor_integration(tiny_models, mini_dataset, tmp_path, capsys):
    """The full dump chain: eval-pipeline extraction (linemod.py dump layout)
    -> load_pose_dataset -> regressor training driver. Catches format drift
    between the extractor and the trainer that unit tests can't see."""
    import argparse

    from pope_tpu.eval.extract import extract_pair
    from pope_tpu.eval.manifest import DATASETS, iter_pairs, load_manifest
    from pope_tpu.models.regressor.data import load_pose_dataset
    from pope_tpu.models.regressor.driver import train_main

    data_root, pairs_dir = mini_dataset
    spec = DATASETS["linemod"]
    manifest = load_manifest(pairs_dir, spec)
    out_dir = tmp_path / "dumps"
    # an UNTRAINED tiny matcher rarely clears the production dual-softmax
    # threshold; drop it so the dump chain is exercised (the reference's
    # extractors run a trained matcher)
    models = _build_tiny_models(
        CoarseMatchConfig(match_capacity=128, thr=0.0, border_rm=0)
    )
    written = 0
    for paths in iter_pairs(data_root, spec, manifest):
        written += int(extract_pair(models, paths, spec, str(out_dir)))
    assert written > 0, "no pair produced >=5 matches"

    data = load_pose_dataset("linemod", data_root, pairs_dir, str(out_dir))
    assert len(data) == written
    for item in data:
        assert item["mkpts0"].shape == item["mkpts1"].shape
        assert item["img1"].shape == (224, 224, 3)

    args = argparse.Namespace(
        dataset="linemod", data_root=data_root, pairs_dir=pairs_dir,
        points_dir=str(out_dir), net_mode="mkpts", rotation_mode="6d",
        num_sample=32, epochs=2, ckpt_dir=str(tmp_path / "ckpt"),
    )
    state = train_main(args)
    assert int(state.step) > 0
    out = capsys.readouterr().out
    assert "epoch 1" in out
