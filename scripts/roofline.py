"""Roofline analysis of the two shipped eval programs (verdict r3 weak #2:
"close the MFU gap or pin the ceiling with an HLO-level argument").

For each program (the single-dispatch AMG and the fused retrieve/match/solve)
this pulls XLA's OWN cost analysis off the compiled executable —
`compiled.cost_analysis()['flops' / 'bytes accessed']` — and compares the
measured steady-state runtime against the hardware roofline:

    t_floor = max(flops / peak_flops, bytes_accessed / hbm_bw)

`bytes accessed` is XLA's post-fusion traffic estimate (every operand/result
crossing HBM after fusion), so t_mem is the memory-bound leg of the roofline
for THIS compiled schedule, not a hand model. The ratio measured/t_floor is
the true headroom; the analytical-MFU figure bench.py prints (0.25) divides
by PEAK flops and therefore conflates "sub-peak matmuls" with "time spent
moving bytes the program must move".

Runtime measurement: queue N async dispatches, block on a scalar of the last
— (t_N - t_1)/(N-1) cancels the per-dispatch tunnel RTT (ROADMAP measurement
discipline).

Run on the real chip: `python scripts/roofline.py` (axon backend default).
"""

import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import jax
import jax.numpy as jnp

import bench
from measure_common import V5E_BF16_PEAK, V5E_HBM_BW, cost, timed_slope



def main():
    B = 4
    H, W = bench.H, bench.W
    models = bench.build_models()
    amg = models.amg

    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.integers(0, 255, (B, H, W, 3)), jnp.uint8)
    img1 = jnp.asarray(rng.integers(0, 255, (B, H, W, 3)), jnp.uint8)
    K = jnp.asarray(
        np.tile(np.array([[572.4, 0, 320], [0, 573.6, 240], [0, 0, 1]], np.float32), (B, 1, 1))
    )
    keys = jnp.asarray(np.stack([np.array([0, i], np.uint32) for i in range(B)]))

    from pope_tpu.models.sam.sam import resize_longest_side

    S = models.config.sam.encoder.img_size
    in_h, in_w = resize_longest_side(H, W, S)

    # ---- AMG program ----
    lowered = amg.boxes_program.lower(
        amg.variables, img1, in_h=in_h, in_w=in_w, orig_h=H, orig_w=W
    )
    amg_compiled = lowered.compile()
    amg_flops, amg_bytes = cost(amg_compiled)

    boxes_b, valid_b, dropped_b = amg.generate_boxes_batch(img1)
    jax.block_until_ready(boxes_b)

    # ---- fused retrieve/match/solve program ----
    from pope_tpu.pipeline.runner import get_executor

    executor = get_executor(models, 256)
    run = executor.batched(mesh=None)
    # warm/lower at the production signature (fold_prompt: ref_cls_b=None)
    small, matches = run(img0, img1, K, K, boxes_b, valid_b, None, keys, dropped_b, packed=True)
    jax.block_until_ready(small)
    fused_lowered = run.jitted.lower(
        models.dinov2_variables, models.matcher_variables,
        img0, img1, K, K, boxes_b, valid_b, None, keys, dropped_b,
    )
    fused_compiled = fused_lowered.compile()
    fused_flops, fused_bytes = cost(fused_compiled)

    # ---- measured steady-state runtimes (warm) ----
    t_amg = timed_slope(lambda: amg.generate_boxes_batch(img1))
    t_fused = timed_slope(
        lambda: run(img0, img1, K, K, boxes_b, valid_b, None, keys, dropped_b, packed=True)
    )

    print(f"{'program':<28}{'GFLOP':>9}{'GB':>8}{'t_comp':>9}{'t_mem':>9}{'floor':>9}{'meas':>9}{'x floor':>9}")
    rows = []
    for name, fl, by, meas in (
        ("AMG (enc+dec+filters+CC)", amg_flops, amg_bytes, t_amg),
        ("fused retrieve/match/solve", fused_flops, fused_bytes, t_fused),
    ):
        t_c = fl / V5E_BF16_PEAK
        t_m = by / V5E_HBM_BW
        floor = max(t_c, t_m)
        rows.append((name, fl, by, t_c, t_m, floor, meas))
        print(
            f"{name:<28}{fl/1e9:>9.1f}{by/1e9:>8.2f}{t_c*1e3:>8.1f}m{t_m*1e3:>8.1f}m"
            f"{floor*1e3:>8.1f}m{meas*1e3:>8.1f}m{meas/floor:>9.2f}"
        )
    tot_fl = sum(r[1] for r in rows)
    tot_floor = sum(r[5] for r in rows)
    tot_meas = sum(r[6] for r in rows)
    print(
        f"{'TOTAL (per B=4 batch)':<28}{tot_fl/1e9:>9.1f}{'':>8}{'':>9}{'':>9}"
        f"{tot_floor*1e3:>8.1f}m{tot_meas*1e3:>8.1f}m{tot_meas/tot_floor:>9.2f}"
    )
    print(
        f"roofline-implied ceiling: {B / tot_floor:.2f} pairs/s; "
        f"measured device-side: {B / tot_meas:.2f} pairs/s "
        f"(headroom x{tot_meas / tot_floor:.2f})"
    )


if __name__ == "__main__":
    main()
