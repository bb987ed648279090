"""Ground-truth supervision from depth + pose (jnp, static shapes).

Behavioral spec: src/matcher/utils/geometry.py:5-56 (warp_kpts: unproject
with depth, rigid transform, reproject; covisibility + 0.2 relative depth
consistency) and src/matcher/utils/supervision.py:22-160 (spvs_coarse:
mutual-nearest warped coarse grids -> one-hot conf_matrix_gt; spvs_fine:
normalized window offset targets).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pope_tpu.utils.precision import f32_matmul


@f32_matmul
def warp_kpts(kpts0, depth0, depth1, T_0to1, K0, K1):
    """Warp (B, L, 2) pixel kpts from image0 to image1 via depth.

    Returns (valid (B, L) bool, warped (B, L, 2)).
    """
    B, L, _ = kpts0.shape
    kl = jnp.round(kpts0).astype(jnp.int32)
    H0, W0 = depth0.shape[1:3]
    kl_x = jnp.clip(kl[..., 0], 0, W0 - 1)
    kl_y = jnp.clip(kl[..., 1], 0, H0 - 1)
    d0 = jax.vmap(lambda d, y, x: d[y, x])(depth0, kl_y, kl_x)  # (B, L)
    nonzero = d0 != 0

    kpts0_h = jnp.concatenate([kpts0, jnp.ones_like(kpts0[..., :1])], -1) * d0[..., None]
    kpts0_cam = jnp.einsum("bij,blj->bli", jnp.linalg.inv(K0), kpts0_h)  # (B, L, 3)
    w_cam = jnp.einsum("bij,blj->bli", T_0to1[:, :3, :3], kpts0_cam) + T_0to1[:, None, :3, 3]
    w_depth = w_cam[..., 2]
    w_h = jnp.einsum("bij,blj->bli", K1, w_cam)
    w_kpts0 = w_h[..., :2] / (w_h[..., 2:] + 1e-4)

    H1, W1 = depth1.shape[1:3]
    covis = (
        (w_kpts0[..., 0] > 0) & (w_kpts0[..., 0] < W1 - 1)
        & (w_kpts0[..., 1] > 0) & (w_kpts0[..., 1] < H1 - 1)
    )
    wl = jnp.where(covis[..., None], w_kpts0, 0.0).astype(jnp.int32)
    d1 = jax.vmap(lambda d, y, x: d[y, x])(depth1, jnp.clip(wl[..., 1], 0, H1 - 1), jnp.clip(wl[..., 0], 0, W1 - 1))
    consistent = jnp.abs((d1 - w_depth) / jnp.where(d1 == 0, 1e9, d1)) < 0.2
    return nonzero & covis & consistent, w_kpts0


def _grid_pts(h, w):
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij")
    return jnp.stack([xs, ys], -1).reshape(h * w, 2)  # xy order


def spvs_coarse(batch, coarse_scale: int):
    """Build the one-hot GT confidence matrix (supervision.py:22-110).

    batch: image0/image1 (B, H, W, 1), depth0/depth1 (B, Hd, Wd),
    T_0to1/T_1to0 (B, 4, 4), K0/K1 (B, 3, 3), optional scale0/scale1 (B, 2).
    Returns dict with conf_matrix_gt (B, L, S), spv_valid (B, L) bool,
    spv_j_of_i (B, L) int, w_pt0_i (B, L, 2), grid_pt1_i (B, S, 2).
    """
    B, H0, W0 = batch["image0"].shape[0], batch["image0"].shape[1], batch["image0"].shape[2]
    H1, W1 = batch["image1"].shape[1], batch["image1"].shape[2]
    h0, w0, h1, w1 = H0 // coarse_scale, W0 // coarse_scale, H1 // coarse_scale, W1 // coarse_scale
    scale0 = coarse_scale * batch.get("scale0", jnp.ones((B, 2)))[:, None]
    scale1 = coarse_scale * batch.get("scale1", jnp.ones((B, 2)))[:, None]

    g0 = jnp.broadcast_to(_grid_pts(h0, w0)[None], (B, h0 * w0, 2)) * scale0
    g1 = jnp.broadcast_to(_grid_pts(h1, w1)[None], (B, h1 * w1, 2)) * scale1

    v0, w_pt0 = warp_kpts(g0, batch["depth0"], batch["depth1"], batch["T_0to1"][:, :3], batch["K0"], batch["K1"])
    v1, w_pt1 = warp_kpts(g1, batch["depth1"], batch["depth0"], batch["T_1to0"][:, :3], batch["K1"], batch["K0"])
    w_pt0_c = w_pt0 / scale1
    w_pt1_c = w_pt1 / scale0

    r0 = jnp.round(w_pt0_c).astype(jnp.int32)
    nearest1 = r0[..., 0] + r0[..., 1] * w1  # (B, L)
    oob0 = (r0[..., 0] < 0) | (r0[..., 0] >= w1) | (r0[..., 1] < 0) | (r0[..., 1] >= h1)
    nearest1 = jnp.where(oob0, 0, nearest1)
    r1 = jnp.round(w_pt1_c).astype(jnp.int32)
    nearest0 = r1[..., 0] + r1[..., 1] * w0
    oob1 = (r1[..., 0] < 0) | (r1[..., 0] >= w0) | (r1[..., 1] < 0) | (r1[..., 1] >= h0)
    nearest0 = jnp.where(oob1, 0, nearest0)

    loop_back = jnp.take_along_axis(nearest0, nearest1, axis=1)  # (B, L)
    correct = loop_back == jnp.arange(h0 * w0)[None]
    correct = correct.at[:, 0].set(False)  # ignore top-left corner
    # the reference doesn't apply warp validity explicitly (OOB indices are
    # redirected to 0 which the corner exclusion handles); keep identical
    conf_gt = jax.nn.one_hot(nearest1, h1 * w1) * correct[..., None]  # (B, L, S)

    return {
        "conf_matrix_gt": conf_gt,
        "spv_valid": correct,
        "spv_j_of_i": nearest1,
        "spv_w_pt0_i": w_pt0,
        "spv_grid_pt1_i": g1,
    }


def spvs_fine(spv, i_ids, j_ids, fine_scale: int, window: int, scale1=None):
    """Per selected match: GT normalized offset in image1's fine window
    (supervision.py:125-146). Returns (B, M, 2); values with |.|>1 are
    outside the window and should be masked by the loss."""
    radius = window // 2
    w0 = jnp.take_along_axis(spv["spv_w_pt0_i"], i_ids[..., None], axis=1)  # (B, M, 2)
    p1 = jnp.take_along_axis(spv["spv_grid_pt1_i"], j_ids[..., None], axis=1)
    s = fine_scale if scale1 is None else fine_scale * scale1[:, None]
    return (w0 - p1) / s / radius
