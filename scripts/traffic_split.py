"""Per-stage traffic split of the two shipped eval programs (follow-up to
scripts/roofline.py): lower each stage separately at the production shapes,
pull XLA's flops/bytes cost analysis, and time warm dispatch slopes. Answers
WHERE the 263 GB/batch goes so traffic-reduction work aims at the right op.

Run on the real chip: `python scripts/traffic_split.py`.
"""

import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import jax
import jax.numpy as jnp

import bench
from measure_common import V5E_BF16_PEAK, V5E_HBM_BW, cost, slope



def report(name, fl, by, meas):
    t_c, t_m = fl / V5E_BF16_PEAK, by / V5E_HBM_BW
    floor = max(t_c, t_m)
    print(
        f"{name:<30}{fl/1e9:>9.1f}{by/1e9:>8.2f}{t_c*1e3:>8.1f}m{t_m*1e3:>8.1f}m"
        f"{floor*1e3:>8.1f}m{meas*1e3:>8.1f}m{meas/floor:>8.2f}"
    )


def main():
    B = 4
    H, W = bench.H, bench.W
    models = bench.build_models()
    amg = models.amg
    sam = models.sam
    cfg = models.config

    from pope_tpu.models.sam.sam import rect_frame, resize_longest_side

    S = cfg.sam.encoder.img_size
    in_h, in_w = resize_longest_side(H, W, S)
    frame = rect_frame((in_h, in_w), cfg.sam.encoder.patch_size)

    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.integers(0, 255, (B, H, W, 3)), jnp.uint8)
    img0 = jnp.asarray(rng.integers(0, 255, (B, H, W, 3)), jnp.uint8)
    K = jnp.asarray(
        np.tile(np.array([[572.4, 0, 320], [0, 573.6, 240], [0, 0, 1]], np.float32), (B, 1, 1))
    )
    keys = jnp.asarray(np.stack([np.array([0, i], np.uint32) for i in range(B)]))

    # ---- encoder stage (resize+preprocess+encode, amg._encode twin) ----
    def encode(variables, images):
        imgs = jnp.asarray(images, jnp.float32)
        imgs = jax.image.resize(imgs, (B, in_h, in_w, 3), method="bilinear", antialias=True)
        pre = jax.vmap(
            lambda im: sam.apply(variables, im, (in_h, in_w), frame, method=sam.preprocess)[0]
        )(imgs)
        return sam.apply(variables, pre, method=sam.encode_image)

    enc_jit = jax.jit(encode)
    embs = enc_jit(amg.variables, img1)
    jax.block_until_ready(embs)
    enc_fl, enc_by = cost(enc_jit.lower(amg.variables, img1).compile())
    t_enc = slope(lambda: enc_jit(amg.variables, img1))

    # ---- decode stage (chunked prompt decode, _generate_impl's map twin) ----
    n_points = cfg.amg.points_per_side ** 2
    pts_orig = amg._grid01 * jnp.asarray([W, H], jnp.float32)
    scale = jnp.asarray([in_w / W, in_h / H], jnp.float32)
    pts = (pts_orig * scale)[:, None, :]
    pts = jnp.concatenate([pts, jnp.zeros_like(pts)], axis=1)
    labels = jnp.concatenate(
        [jnp.ones((n_points, 1), jnp.int32), -jnp.ones((n_points, 1), jnp.int32)], axis=1
    )
    chunk = cfg.amg.points_per_chunk or n_points
    n_chunks = -(-n_points // chunk)
    pts_c = pts.reshape(n_chunks, chunk, 2, 2)
    lab_c = labels.reshape(n_chunks, chunk, 2)
    sub = cfg.amg.eval_decode_subsample

    def decode(variables, embs):
        def per_image(e):
            masks, iou = jax.lax.map(
                lambda pl: sam.apply(
                    variables, e[None], pl[0], pl[1],
                    multimask_output=True, subsample=sub, method=sam.decode,
                ),
                (pts_c, lab_c),
            )
            return masks, iou
        return jax.vmap(per_image)(embs)

    dec_jit = jax.jit(decode)
    masks = dec_jit(amg.variables, embs)
    jax.block_until_ready(masks)
    dec_fl, dec_by = cost(dec_jit.lower(amg.variables, embs).compile())
    t_dec = slope(lambda: dec_jit(amg.variables, embs))

    # ---- fused-program stages (exposed stage fns off the executor) ----
    from pope_tpu.pipeline.runner import get_executor

    boxes_b, valid_b, dropped_b = amg.generate_boxes_batch(img1)
    jax.block_until_ready(boxes_b)
    ex = get_executor(models, 256)

    from pope_tpu.models.dinov2.preprocess import preprocess_image
    from pope_tpu.pipeline.pose_pipeline import _to_rgb01

    def retrieve(dv, i1, bx, vl, k1, i0):
        imgs = _to_rgb01(i0) * 255.0
        ref_in = jax.vmap(lambda im: preprocess_image(im, center_crop=True)[0])(imgs)
        return jax.vmap(ex._retrieve_folded_fn, in_axes=(None, 0, 0, 0, 0, 0))(
            dv, i1, bx, vl, k1, ref_in
        )

    r_jit = jax.jit(retrieve)
    r_out = r_jit(models.dinov2_variables, img1, boxes_b, valid_b, K, img0)
    jax.block_until_ready(r_out)
    ret_fl, ret_by = cost(
        r_jit.lower(models.dinov2_variables, img1, boxes_b, valid_b, K, img0).compile()
    )
    t_ret = slope(lambda: r_jit(models.dinov2_variables, img1, boxes_b, valid_b, K, img0))

    top_idx, sim, crops, crop_Ks, boxes = r_out

    def match(mv, i0, crops):
        return jax.vmap(ex._match_fn, in_axes=(None, 0, 0))(mv, i0, crops)

    m_jit = jax.jit(match)
    m_out = m_jit(models.matcher_variables, img0, crops)
    jax.block_until_ready(m_out)
    mat_fl, mat_by = cost(m_jit.lower(models.matcher_variables, img0, crops).compile())
    t_mat = slope(lambda: m_jit(models.matcher_variables, img0, crops))

    mkpts0, mkpts1, mconf, mvalid, n_strong, best, _ = m_out
    pre_K, _bb = jax.jit(jax.vmap(ex._select_fn))(crop_Ks, boxes, top_idx, best)

    def solve(mk0, mk1, k0, pk, mv_, ks):
        return jax.vmap(ex._solve_fn)(mk0, mk1, k0, pk, mv_, ks)

    s_jit = jax.jit(solve)
    s_out = s_jit(mkpts0, mkpts1, K, pre_K, mvalid, keys)
    jax.block_until_ready(s_out.R)
    sol_fl, sol_by = cost(s_jit.lower(mkpts0, mkpts1, K, pre_K, mvalid, keys).compile())
    t_sol = slope(lambda: s_jit(mkpts0, mkpts1, K, pre_K, mvalid, keys))

    print(f"{'stage':<30}{'GFLOP':>9}{'GB':>8}{'t_comp':>9}{'t_mem':>9}{'floor':>9}{'meas':>9}{'x flr':>8}")
    report("SAM encode (resize+pre+enc)", enc_fl, enc_by, t_enc)
    report("AMG decode (256p chunked)", dec_fl, dec_by, t_dec)
    report("retrieve (260-crop DINOv2)", ret_fl, ret_by, t_ret)
    report("match (prompt x top3)", mat_fl, mat_by, t_mat)
    report("solve (RANSAC+GN)", sol_fl, sol_by, t_sol)


if __name__ == "__main__":
    main()
