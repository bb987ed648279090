"""Benchmark: the SHIPPED eval driver over an on-disk LINEMOD-layout dataset —
pope_tpu.eval.evaluate_dataset -> pipeline.runner.run_pairs (batched pair
axis) -> SAM ViT-H encode + 256-prompt AMG (+ host small-region postproc) +
batched DINOv2 retrieval + batch-3 matching + on-chip RANSAC + record
aggregation. This is the exact production code path of `pope-tpu eval`
(the reference loop it mirrors: eval_linemod_json.py:51-168), including
image decode, manifest iteration and metric records.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: no reference throughput exists (BASELINE.md — the repo publishes
none). The reference pipeline measured on this machine's CPU runs at about
0.004 pairs/s (SAM ViT-H alone >3 min/image on CPU); the practical baseline
used here is the reference's *structural* budget on an A100 estimated from
its serial per-mask DINOv2 loop + 3 matcher calls + cv2 RANSAC at ~1.0
pair/s — vs_baseline reports against that 1.0 pairs/s A100 estimate and
should be re-based when a real A100 measurement of the reference lands.
"""

import json
import os
import tempfile
import time

import numpy as np

A100_EST_BASELINE_PAIRS_PER_S = 1.0

H, W = 480, 640  # LINEMOD frame


def make_dataset(root: str, n_pairs: int):
    """LINEMOD-layout on-disk dataset (random frames at the real resolution),
    exercising the same file IO the production driver does."""
    import cv2

    rng = np.random.default_rng(0)
    label, seq = "0801-lm1-others", "lm1-3"
    base = os.path.join(root, "LM_dataset", label, seq)
    for sub in ("color", "color_full", "intrin", "intrin_ba", "poses_ba"):
        os.makedirs(os.path.join(base, sub), exist_ok=True)
    K = np.array([[572.4, 0, 320], [0, 573.6, 240], [0, 0, 1]])
    pairs = []
    for i in range(n_pairs):
        ref = rng.uniform(0, 255, (H, W, 3)).astype(np.uint8)
        tgt = rng.uniform(0, 255, (H, W, 3)).astype(np.uint8)
        cv2.rectangle(tgt, (200, 140), (440, 340), (250, 240, 20), -1)
        cv2.imwrite(os.path.join(base, "color", f"{i}.png"), ref)
        cv2.imwrite(os.path.join(base, "color_full", f"{1000+i}.png"), tgt)
        np.savetxt(os.path.join(base, "intrin_ba", f"{i}.txt"), K)
        np.savetxt(os.path.join(base, "intrin", f"{1000+i}.txt"), K)
        pose0 = np.hstack([np.eye(3), [[0], [0], [0.6]]])
        R1, _ = cv2.Rodrigues(np.array([0.05, 0.2, -0.1]))
        pose1 = np.hstack([R1, [[0.02], [0.0], [0.62]]])
        np.savetxt(os.path.join(base, "poses_ba", f"{i}.txt"), pose0)
        np.savetxt(os.path.join(base, "poses_ba", f"{1000+i}.txt"), pose1)
        pairs.append(f"{label}/{seq}/color/{i}.png-{1000+i}.png")
    np.savetxt(
        os.path.join(root, "LM_dataset", label, "box3d_corners.txt"),
        np.array([[x, y, z] for x in (-0.05, 0.05) for y in (-0.05, 0.05) for z in (-0.05, 0.05)]),
    )
    pairs_dir = os.path.join(root, "pairs")
    os.makedirs(pairs_dir, exist_ok=True)
    with open(os.path.join(pairs_dir, "LINEMOD-test.json"), "w") as f:
        json.dump([{"0": pairs}], f)
    return os.path.join(root), pairs_dir


def build_models():
    """Full-scale models, random weights (released checkpoints are not in
    this container); the compute path is identical to the released weights."""
    import jax
    import jax.numpy as jnp

    from pope_tpu.config import (
        AMGConfig, CoarseMatchConfig, DinoV2Config, MatcherConfig,
        PipelineConfig, SamConfig, SamEncoderConfig,
    )
    from pope_tpu.models.dinov2 import DinoVisionTransformer
    from pope_tpu.models.matcher import Matcher
    from pope_tpu.models.sam import AutomaticMaskGenerator, Sam
    from pope_tpu.pipeline.api import PopeModels

    rng = np.random.default_rng(0)
    sam_cfg = SamConfig(encoder=SamEncoderConfig.vit_h())
    sam = Sam(sam_cfg)
    sam_vars = jax.jit(
        lambda r, im: sam.init(r, im, (768, 1024), jnp.zeros((1, 2, 2)), jnp.zeros((1, 2), jnp.int32))
    )(jax.random.PRNGKey(0), jnp.asarray(rng.uniform(0, 255, (768, 1024, 3)), jnp.float32))

    dcfg = DinoV2Config(dtype="bfloat16")  # retrieval tower in bf16 (MXU-native)
    dinov2 = DinoVisionTransformer(dcfg)
    d_vars = jax.jit(dinov2.init)(jax.random.PRNGKey(1), jnp.zeros((1, 196, 196, 3)))

    mcfg = MatcherConfig(match_coarse=CoarseMatchConfig(match_capacity=512), dtype="bfloat16")
    matcher = Matcher(mcfg)
    m_vars = jax.jit(matcher.init)(
        jax.random.PRNGKey(2), jnp.zeros((1, 64, 64, 1)), jnp.zeros((1, 64, 64, 1))
    )

    cfg = PipelineConfig(matcher=mcfg, dinov2=dcfg, sam=sam_cfg, amg=AMGConfig())
    amg = AutomaticMaskGenerator(sam, sam_vars, cfg.amg, sam_cfg)
    return PopeModels(
        sam=sam, sam_variables=sam_vars, dinov2=dinov2, dinov2_variables=d_vars,
        matcher=matcher, matcher_variables=m_vars, amg=amg, config=cfg,
    )


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pope_tpu.eval.evaluate import evaluate_dataset

    BATCH = int(os.environ.get("POPE_BENCH_BATCH", "4"))
    N_TIMED = 6 * BATCH  # 6 steady batches: the tunnel's upload bandwidth
    # varies run to run; a longer window tightens the estimate

    models = build_models()
    with tempfile.TemporaryDirectory() as tmp:
        data_root, pairs_dir = make_dataset(tmp, n_pairs=N_TIMED)

        def run(max_pairs, batch):
            return evaluate_dataset(
                models, "linemod", data_root, pairs_dir,
                max_pairs=max_pairs, batch_size=batch, progress=False,
            )

        batch = BATCH
        try:
            # compile + warm every stage at this batch shape; three warm
            # batches reach steady state (thread pools, native lib, device
            # caches all need a couple of calls)
            run(3 * batch, batch)
        except RuntimeError as e:  # HBM pressure: fall back to a smaller batch
            if "RESOURCE_EXHAUSTED" not in str(e):
                raise
            batch = 2
            run(3 * batch, batch)

        t0 = time.time()
        per_obj = run(N_TIMED, batch)
        dt = time.time() - t0
        assert per_obj, "driver produced no records"
        pairs_per_s = N_TIMED / dt

    print(
        json.dumps(
            {
                "metric": (
                    "shipped eval-driver pairs/sec/chip (evaluate_dataset->run_pairs: "
                    f"SAM-H AMG + DINOv2 retrieval + match + RANSAC + records, 640x480, B={batch})"
                ),
                "value": round(pairs_per_s, 3),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_s / A100_EST_BASELINE_PAIRS_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
