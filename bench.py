"""Benchmark: FULL POPE pipeline per pair on the available accelerator —
SAM ViT-H encode + 256-prompt AMG + batched DINOv2 retrieval over all mask
candidates + batch-3 matching + on-chip RANSAC (the eval_linemod_json.py
loop, minus disk IO).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: no reference throughput exists (BASELINE.md — the repo publishes
none). The reference pipeline measured on this machine's CPU runs at about
0.004 pairs/s (SAM ViT-H alone >3 min/image on CPU); the practical baseline
used here is the reference's *structural* budget on an A100 estimated from
its serial per-mask DINOv2 loop + 3 matcher calls + cv2 RANSAC at ~1.0
pair/s — vs_baseline reports against that 1.0 pairs/s A100 estimate and
should be re-based when a real A100 measurement of the reference lands.

Timing forces a host readback every iteration: on the axon TPU tunnel,
block_until_ready alone under-reports (async completion).
"""

import json
import time

import numpy as np

A100_EST_BASELINE_PAIRS_PER_S = 1.0


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pope_tpu.config import (
        AMGConfig,
        CoarseMatchConfig,
        DinoV2Config,
        MatcherConfig,
        PipelineConfig,
        SamConfig,
        SamEncoderConfig,
    )
    from pope_tpu.models.dinov2 import DinoVisionTransformer
    from pope_tpu.models.matcher import Matcher
    from pope_tpu.models.sam import AutomaticMaskGenerator, Sam
    from pope_tpu.pipeline.api import PopeModels

    rng = np.random.default_rng(0)
    H1, W1 = 480, 640  # LINEMOD target frame
    H0, W0 = 480, 640  # prompt frame

    # ---- build models (random weights; compute path identical to released) ----
    sam_cfg = SamConfig(encoder=SamEncoderConfig.vit_h())
    sam = Sam(sam_cfg)
    img_s = jnp.asarray(rng.uniform(0, 255, (1024, 768, 3)), jnp.float32)
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
    models = PopeModels(
        sam=sam, sam_variables=sam_vars, dinov2=dinov2, dinov2_variables=d_vars,
        matcher=matcher, matcher_variables=m_vars, amg=amg, config=cfg,
    )

    # ---- per-pair program (stage-jitted: one fused program tops 10 min of
    # XLA compile; stages compile separately and cache) ----
    from pope_tpu.models.sam.sam import resize_longest_side
    from pope_tpu.pipeline.pose_pipeline import PipelineExecutor

    in_h, in_w = resize_longest_side(H1, W1, sam_cfg.encoder.img_size)
    img1_resized = jnp.asarray(rng.uniform(0, 255, (in_h, in_w, 3)), jnp.float32)
    img0 = jnp.asarray(rng.uniform(0, 1, (H0, W0, 3)), jnp.float32)
    img1 = jnp.asarray(rng.uniform(0, 1, (H1, W1, 3)), jnp.float32)
    K = jnp.asarray([[572.4, 0, 320], [0, 573.6, 240], [0, 0, 1]], jnp.float32)
    ref_cls = jnp.asarray(rng.normal(0, 1, (dcfg.embed_dim,)), jnp.float32)

    encode = jax.jit(
        lambda v, im: sam.apply(
            v, sam.apply(v, im, (in_h, in_w), method=sam.preprocess), method=sam.encode_image
        )
    )
    executor = PipelineExecutor(models, crop_size=256)

    def one_pair(i):
        emb = encode(sam_vars, img1_resized)
        amg_res = models.amg._generate_jit(emb, input_h=in_h, input_w=in_w, orig_h=H1, orig_w=W1)
        res = executor.estimate_pair(
            img0, img1, K, K, amg_res, ref_cls,
            jax.random.fold_in(jax.random.PRNGKey(0), i),
        )
        return float(res.R[0, 0])  # forces full completion + host readback

    one_pair(0)  # compile + warm
    n = 5
    t0 = time.time()
    for i in range(n):
        one_pair(i + 1)
    dt = (time.time() - t0) / n
    pairs_per_s = 1.0 / dt

    print(
        json.dumps(
            {
                "metric": "full POPE pipeline pairs/sec/chip (SAM-H AMG + DINOv2 retrieval + match + RANSAC, 640x480)",
                "value": round(pairs_per_s, 3),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_s / A100_EST_BASELINE_PAIRS_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
