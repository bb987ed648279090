"""Demo entry points mirroring the reference demo scripts.

Reference behavior: visual_dinov2.py (patch-PCA heatmap -> headmap.jpg),
visual_sam.py (AMG mask render -> LINEMOD_mask.png), visual_3dbbox.py
(single-pair pipeline + 3-D bbox/axes render -> query_result.png /
3D_BBox.png); orchestrated by demo.sh.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def demo_dinov2_heatmap(models, image_path: str, out_path: str = "headmap.jpg", size: int = 448):
    """visual_dinov2.py: 448x448 input -> patch tokens -> PCA(1) JET heatmap."""
    import cv2

    from pope_tpu.models.dinov2.preprocess import IMAGENET_MEAN, IMAGENET_STD
    from pope_tpu.utils.draw import pca_heatmap

    img = cv2.imread(image_path)
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    img = cv2.resize(img, (size, size)).astype(np.float32) / 255.0
    x = (img - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    out = models.dinov2.apply(models.dinov2_variables, jnp.asarray(x)[None])
    patch = models.config.dinov2.patch_size
    g = size // patch
    return pca_heatmap(np.asarray(out["x_norm_patchtokens"][0]), (g, g), out_path, patch)


def demo_sam_masks(models, image_path: str, out_path: str = "LINEMOD_mask.png"):
    """visual_sam.py: AMG over the demo image, random-color render."""
    import cv2

    from pope_tpu.models.sam.sam import postprocess_masks, resize_longest_side
    from pope_tpu.utils.draw import render_masks

    img = cv2.cvtColor(cv2.imread(image_path), cv2.COLOR_BGR2RGB)
    res = models.amg.generate(img)
    ok = np.asarray(res.valid)
    # upsample surviving low-res masks to the original size
    S = models.amg.sam_cfg.encoder.img_size
    in_hw = resize_longest_side(img.shape[0], img.shape[1], S)
    masks = postprocess_masks(
        jnp.asarray(res.masks_low_res)[None], in_hw, img.shape[:2]
    )[0]
    masks_bool = np.asarray(masks > 0)[ok]
    out = render_masks(cv2.cvtColor(img, cv2.COLOR_RGB2BGR), masks_bool)
    cv2.imwrite(out_path, out)
    return out


def demo_3dbbox(
    models,
    prompt_path: str,
    target_path: str,
    K0,
    K1,
    prompt_pose,
    box3d_corners,
    target_pose=None,
    out_query: str = "query_result.png",
    out_bbox: str = "3D_BBox.png",
):
    """visual_3dbbox.py: full pipeline on one pair, then render the 3-D box
    with the predicted relative rotation composed onto the prompt pose and
    the GT TARGET translation kept (visual_3dbbox.py:119-124:
    predict_pose[:3,3] = target_pose[:3,3]). query_result.png is the
    hstack of the resized prompt and the winning crop (:112-116)."""
    import cv2

    from pope_tpu.geometry.affine import get_image_crop_resize
    from pope_tpu.geometry.pose import project_points
    from pope_tpu.models.dinov2.preprocess import preprocess_image
    from pope_tpu.pipeline.runner import get_executor
    from pope_tpu.utils.draw import draw_axis, draw_bbox_3d

    img0 = cv2.cvtColor(cv2.imread(prompt_path), cv2.COLOR_BGR2RGB)
    img1 = cv2.cvtColor(cv2.imread(target_path), cv2.COLOR_BGR2RGB)
    ref_in = preprocess_image(img0, center_crop=True)
    ref_cls = models.dinov2.apply(models.dinov2_variables, ref_in)["x_norm_clstoken"][0]
    amg_res = models.amg.generate(img1)
    result = get_executor(models, 256).estimate_pair(
        jnp.asarray(img0, jnp.float32) / 255.0,
        jnp.asarray(img1, jnp.float32) / 255.0,
        jnp.asarray(K0, jnp.float32),
        jnp.asarray(K1, jnp.float32),
        amg_res,
        ref_cls,
        jax.random.PRNGKey(0),
    )

    # compose predicted relative R with the prompt pose; keep the GT target
    # translation (the demo has no metric scale for t, :121-124)
    R_rel = np.asarray(result.R)
    prompt_pose = np.asarray(prompt_pose)
    t_src = np.asarray(target_pose) if target_pose is not None else prompt_pose
    R_obj = R_rel @ prompt_pose[:3, :3]
    t_obj = t_src[:3, 3]
    RT = np.hstack([R_obj, t_obj[:, None]]).astype(np.float32)

    corners2d, _ = project_points(jnp.asarray(box3d_corners, jnp.float32), jnp.asarray(RT), jnp.asarray(K1, jnp.float32))
    vis = cv2.cvtColor(img1, cv2.COLOR_RGB2BGR)
    vis = draw_bbox_3d(vis, np.asarray(corners2d))
    vis = draw_axis(vis, R_obj, t_obj, K1)
    cv2.imwrite(out_bbox, vis)

    # query_result.png: resized prompt beside the winning crop (:112-116)
    crop, _ = get_image_crop_resize(
        jnp.asarray(img1, jnp.float32) / 255.0,
        jnp.asarray(result.pre_bbox, jnp.float32), (256, 256),
    )
    crop_bgr = cv2.cvtColor(
        (np.clip(np.asarray(crop), 0, 1) * 255).astype(np.uint8), cv2.COLOR_RGB2BGR
    )
    que = cv2.resize(cv2.cvtColor(img0, cv2.COLOR_RGB2BGR), (256, 256))
    stack = np.hstack([que, crop_bgr])
    cv2.imwrite(out_query, stack)
    return vis, stack, result
