"""Golden-value tests for affine crop geometry vs OpenCV host reference."""

import cv2
import numpy as np
import jax.numpy as jnp

from pope_tpu.geometry import (
    get_affine_transform,
    get_affine_transform_np,
    get_image_crop_resize,
    get_K_crop_resize,
    warp_affine,
    clamped_scale_box,
)


def _cv2_affine(center, scale, rot, output_size):
    """Direct re-derivation of the reference transform via cv2 (the reference's
    own implementation path, data_utils.py:22-52)."""
    center = np.asarray(center, np.float32)
    scale = np.asarray(scale, np.float32)
    src_w = scale[0]
    dst_w, dst_h = output_size
    rot_rad = np.pi * rot / 180
    sn, cs = np.sin(rot_rad), np.cos(rot_rad)
    src_dir = np.array([0.5 * src_w * sn, -0.5 * src_w * cs], np.float32)
    dst_dir = np.array([0, dst_w * -0.5], np.float32)
    src = np.zeros((3, 2), np.float32)
    dst = np.zeros((3, 2), np.float32)
    src[0] = center
    src[1] = center + src_dir
    dst[0] = [dst_w * 0.5, dst_h * 0.5]
    dst[1] = dst[0] + dst_dir

    def third(a, b):
        d = a - b
        return b + np.array([-d[1], d[0]], np.float32)

    src[2] = third(src[0], src[1])
    dst[2] = third(dst[0], dst[1])
    return cv2.getAffineTransform(src, dst)


def test_affine_transform_matches_cv2(rng):
    for _ in range(10):
        center = rng.uniform(10, 500, 2)
        scale = rng.uniform(20, 300, 2)
        rot = rng.uniform(-90, 90)
        out = (256, 256)
        ours_np = get_affine_transform_np(center, scale, rot, out)
        ours_jnp = np.asarray(get_affine_transform(center, scale, rot, out))
        ref = _cv2_affine(center, scale, rot, out)
        np.testing.assert_allclose(ours_np, ref, rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(ours_jnp, ref, rtol=1e-3, atol=1e-2)


def test_warp_affine_matches_cv2(rng):
    img = rng.uniform(0, 255, (120, 160, 3)).astype(np.float32)
    M = _cv2_affine((80, 60), (100, 80), 0, (64, 64))
    ref = cv2.warpAffine(img, M, (64, 64), flags=cv2.INTER_LINEAR)
    ours = np.asarray(warp_affine(jnp.asarray(img), jnp.asarray(M), (64, 64)))
    # interior pixels should match bilinear interpolation closely
    np.testing.assert_allclose(ours[2:-2, 2:-2], ref[2:-2, 2:-2], rtol=1e-3, atol=0.5)


def test_image_crop_resize_matches_reference(rng):
    img = rng.uniform(0, 255, (100, 140)).astype(np.float32)
    box = np.array([20.0, 10.0, 90.0, 80.0])
    crop, T = get_image_crop_resize(jnp.asarray(img), box, (56, 56))
    # reference path via cv2
    center = np.array([(box[0] + box[2]) / 2, (box[1] + box[3]) / 2])
    scale = np.array([box[2] - box[0], box[3] - box[1]])
    trans = _cv2_affine(center, scale, 0, (56, 56))
    ref = cv2.warpAffine(img, trans, (56, 56), flags=cv2.INTER_LINEAR)
    np.testing.assert_allclose(np.asarray(crop)[1:-1, 1:-1], ref[1:-1, 1:-1], atol=0.5)
    assert T.shape == (3, 3)


def test_image_crop_resize_nonsquare_box_matches_reference(rng):
    """Non-square boxes must still use the UNIFORM scale out_w/bw on both axes
    (the reference transform reads scale[0] only, data_utils.py:22-52);
    anisotropic sampling would disagree with get_K_crop_resize."""
    img = rng.uniform(0, 255, (200, 260)).astype(np.float32)
    for box in ([30.0, 40.0, 190.0, 120.0], [50.0, 20.0, 110.0, 180.0]):
        box = np.asarray(box)
        crop, T = get_image_crop_resize(jnp.asarray(img), box, (64, 64))
        center = np.array([(box[0] + box[2]) / 2, (box[1] + box[3]) / 2])
        scale = np.array([box[2] - box[0], box[3] - box[1]])
        trans = _cv2_affine(center, scale, 0, (64, 64))
        ref = cv2.warpAffine(img, trans, (64, 64), flags=cv2.INTER_LINEAR)
        np.testing.assert_allclose(np.asarray(crop)[1:-1, 1:-1], ref[1:-1, 1:-1], atol=0.5)
        np.testing.assert_allclose(np.asarray(T)[:2], trans, rtol=1e-3, atol=1e-2)


def test_K_crop_resize_reference_formula():
    K = np.array([[600.0, 0, 320], [0, 600, 240], [0, 0, 1]])
    box = np.array([100.0, 80.0, 300.0, 260.0])
    K_crop, K_crop_homo = get_K_crop_resize(box, K, (256, 256))
    center = np.array([(box[0] + box[2]) / 2, (box[1] + box[3]) / 2])
    scale = np.array([box[2] - box[0], box[3] - box[1]])
    trans = _cv2_affine(center, scale, 0, (256, 256))
    T = np.concatenate([trans, np.array([[0, 0, 1]])], axis=0)
    K_homo = np.concatenate([K, np.zeros((3, 1))], axis=-1)
    ref = T @ K_homo
    np.testing.assert_allclose(np.asarray(K_crop_homo), ref, rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(K_crop), ref[:3, :3], rtol=1e-4, atol=1e-2)


def test_clamped_scale_box_matches_reference():
    """Mirror pope_model_api.py:125-156 semantics (float version)."""

    def ref_box(src_w, src_h, bbox, scale):
        x, y, bw, bh = bbox
        scale = min((src_h - 1) / bh, min((src_w - 1) / bw, scale))
        nw, nh = bw * scale, bh * scale
        cx, cy = bw / 2 + x, bh / 2 + y
        x0, y0 = cx - nw / 2, cy - nh / 2
        x1, y1 = cx + nw / 2, cy + nh / 2
        if x0 < 0:
            x1 -= x0
            x0 = 0
        if y0 < 0:
            y1 -= y0
            y0 = 0
        if x1 > src_w - 1:
            x0 -= x1 - src_w + 1
            x1 = src_w - 1
        if y1 > src_h - 1:
            y0 -= y1 - src_h + 1
            y1 = src_h - 1
        return np.array([x0, y0, x1, y1])

    cases = [
        ((640, 480), [100, 50, 80, 60], 1.2),
        ((640, 480), [0, 0, 30, 30], 2.0),
        ((640, 480), [600, 440, 50, 50], 1.5),
        ((200, 100), [10, 10, 180, 80], 3.0),
    ]
    for (w, h), bbox, s in cases:
        ours = np.asarray(clamped_scale_box(jnp.asarray(bbox, jnp.float32), w, h, s))
        ref = ref_box(w, h, bbox, s)
        np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_dino_box_window_equals_crop_then_center_crop():
    """pose_pipeline._dino_box_window: a DIRECT 196x196 warp of the shrunk
    box must equal crop(box -> 256) -> CenterCrop(196) (the retrieval
    stage's fused scoring path)."""
    from pope_tpu.geometry.affine import get_image_crop_resize
    from pope_tpu.pipeline.pose_pipeline import _dino_box_window

    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(0, 1, (480, 640, 3)), jnp.float32)
    for box in ([100.0, 50.0, 420.0, 300.0], [-20.0, 10.0, 200.0, 460.0],
                [300.0, 200.0, 330.0, 260.0]):
        box = jnp.asarray(box, jnp.float32)
        two_step, _ = get_image_crop_resize(img, box, (256, 256))
        two_step = two_step[30:226, 30:226]
        direct, _ = get_image_crop_resize(img, _dino_box_window(box), (196, 196))
        np.testing.assert_allclose(np.asarray(direct), np.asarray(two_step), atol=2e-5)
