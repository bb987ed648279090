"""Benchmark: the matcher->RANSAC end-to-end slice on the available
accelerator (real TPU chip under the default environment).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference PyTorch matcher (same LINEMOD shapes: 480x640 ref
image vs 256x256 crop) measured on this machine's CPU at 0.154 pairs/s
(6.48 s/pair, tests/torch_ref.py harness, 2026-08-16). No A100 measurement
of the reference exists (BASELINE.md: repo publishes no throughput numbers);
an A100 would be roughly 50-100x the CPU figure, so treat vs_baseline
accordingly until a GPU measurement lands.
"""

import json
import time

import numpy as np

TORCH_CPU_BASELINE_PAIRS_PER_S = 0.154


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pope_tpu.config import CoarseMatchConfig, MatcherConfig
    from pope_tpu.models.matcher import Matcher
    from pope_tpu.solver import estimate_pose_ransac

    cfg = MatcherConfig(match_coarse=CoarseMatchConfig(match_capacity=512), dtype="bfloat16")
    model = Matcher(cfg)
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.uniform(0, 1, (1, 480, 640, 1)), jnp.float32)
    img1 = jnp.asarray(rng.uniform(0, 1, (1, 256, 256, 1)), jnp.float32)
    # jit the init: on the axon TPU backend unjitted eager ops compile
    # remotely one-by-one (~200 s); one jitted init compiles in seconds
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img0[:, :64, :64], img1[:, :64, :64])
    K = jnp.asarray([[572.4, 0, 320], [0, 573.6, 240], [0, 0, 1]], jnp.float32)

    @jax.jit
    def slice_fn(variables, img0, img1, key):
        res = model.apply(variables, img0, img1)
        sol = estimate_pose_ransac(
            res.mkpts0[0], res.mkpts1[0], K, K, res.valid[0], key
        )
        return sol.R, sol.t, sol.ok, res.mconf

    key = jax.random.PRNGKey(0)
    out = slice_fn(variables, img0, img1, key)
    jax.block_until_ready(out)

    n = 10
    t0 = time.time()
    for i in range(n):
        out = slice_fn(variables, img0, img1, jax.random.fold_in(key, i))
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    pairs_per_s = 1.0 / dt

    print(
        json.dumps(
            {
                "metric": "matcher+ransac pairs/sec/chip (480x640 ref vs 256x256 crop)",
                "value": round(pairs_per_s, 3),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_s / TORCH_CPU_BASELINE_PAIRS_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
