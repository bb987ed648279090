"""Affine crop geometry: center/scale/rot -> 2x3 transform, on-chip warpAffine,
and the homogeneous intrinsics update K' = T @ K.

Reference parity: utils/data_utils.py:22-52 (get_affine_transform),
:239-255 (get_image_crop_resize), :258-280 (get_K_crop_resize),
pope_model_api.py:125-156 (CropImage._get_new_box), eval_linemod_json.py:74-90
(compact_percent box expansion). Warp semantics mirror cv2.warpAffine with
INTER_LINEAR + BORDER_CONSTANT(0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pope_tpu.utils.precision import f32_matmul
import numpy as np


def _third_point(a, b, xp):
    """Perpendicular third point: b + perp(a - b). (data_utils.py:7-9)"""
    d = a - b
    return b + xp.stack([-d[1], d[0]])


def _affine_src_dst(center, scale, rot_deg, out_w, out_h, xp):
    """The 3 source / destination control points of the reference transform."""
    src_w = scale[0]
    rot = xp.pi * rot_deg / 180.0
    sn, cs = xp.sin(rot), xp.cos(rot)
    # rotate [0, -0.5*src_w] by rot (data_utils.py:12-19)
    src_dir = xp.stack([0.5 * src_w * sn, -0.5 * src_w * cs])
    dst_dir = xp.stack([xp.zeros_like(src_dir[0]), -0.5 * out_w * xp.ones_like(src_dir[0])])

    src0 = center
    src1 = center + src_dir
    dst0 = xp.stack([0.5 * out_w * xp.ones_like(src_dir[0]), 0.5 * out_h * xp.ones_like(src_dir[0])])
    dst1 = dst0 + dst_dir
    src2 = _third_point(src0, src1, xp)
    dst2 = _third_point(dst0, dst1, xp)
    src = xp.stack([src0, src1, src2])  # (3, 2)
    dst = xp.stack([dst0, dst1, dst2])
    return src, dst


def _solve_affine(src, dst, xp):
    """Solve the exact 2x3 affine mapping 3 src points to 3 dst points
    (equivalent to cv2.getAffineTransform)."""
    ones = xp.ones((3, 1), dtype=src.dtype)
    A = xp.concatenate([src, ones], axis=1)  # (3, 3): [x, y, 1]
    # A @ M.T = dst  ->  M.T = A^-1 dst
    Mt = xp.linalg.solve(A, dst)  # (3, 2)
    return Mt.T  # (2, 3)


@f32_matmul
def get_affine_transform(center, scale, rot_deg, output_size, inv=False):
    """2x3 affine from a (center, scale, rotation) crop spec. jit-safe.

    Args:
      center: (2,) crop center in source pixels.
      scale: (2,) crop extent (w, h) in source pixels.
      rot_deg: scalar rotation in degrees.
      output_size: static (out_w, out_h).
      inv: if True, return the dst->src transform instead.
    """
    center = jnp.asarray(center, jnp.float32)
    scale = jnp.asarray(scale, jnp.float32)
    rot_deg = jnp.asarray(rot_deg, jnp.float32)
    out_w, out_h = output_size
    src, dst = _affine_src_dst(center, scale, rot_deg, float(out_w), float(out_h), jnp)
    if inv:
        src, dst = dst, src
    return _solve_affine(src, dst, jnp)


def get_affine_transform_np(center, scale, rot_deg, output_size, inv=False):
    """Host (numpy) twin of :func:`get_affine_transform`."""
    center = np.asarray(center, np.float64)
    scale = np.asarray(scale, np.float64)
    out_w, out_h = float(output_size[0]), float(output_size[1])
    src, dst = _affine_src_dst(center, scale, float(rot_deg), out_w, out_h, np)
    if inv:
        src, dst = dst, src
    return _solve_affine(src, dst, np).astype(np.float64)


def _to_homo3(M):
    """(2,3) affine -> (3,3) homogeneous."""
    xp = jnp if isinstance(M, jax.Array) else np
    row = xp.asarray([[0.0, 0.0, 1.0]], dtype=M.dtype)
    return xp.concatenate([M, row], axis=0)


@f32_matmul
def warp_affine(image, M, out_hw):
    """cv2.warpAffine(INTER_LINEAR, BORDER_CONSTANT=0) semantics, jit-safe.

    The output pixel (x, y) samples the source at M^-1 @ (x, y, 1), bilinear,
    with out-of-bounds taps contributing 0.

    Args:
      image: (H, W) or (H, W, C) float array.
      M: (2, 3) forward (src->dst) affine.
      out_hw: static (out_h, out_w).
    Returns:
      (out_h, out_w[, C]) warped image, same dtype as input (via float32 math).
    """
    out_h, out_w = out_hw
    squeeze = image.ndim == 2
    if squeeze:
        image = image[..., None]
    H, W, C = image.shape

    Minv = jnp.linalg.inv(_to_homo3(jnp.asarray(M, jnp.float32)))[:2]  # (2,3)
    ys, xs = jnp.meshgrid(
        jnp.arange(out_h, dtype=jnp.float32),
        jnp.arange(out_w, dtype=jnp.float32),
        indexing="ij",
    )
    ones = jnp.ones_like(xs)
    dst = jnp.stack([xs, ys, ones], axis=-1)  # (h, w, 3)
    src = dst @ Minv.T  # (h, w, 2): (sx, sy)
    sx, sy = src[..., 0], src[..., 1]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(xi, yi):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1)
        yi_c = jnp.clip(yi, 0, H - 1)
        v = image[yi_c, xi_c].astype(jnp.float32)  # (h, w, C)
        return jnp.where(valid[..., None], v, 0.0)

    v00 = tap(x0i, y0i)
    v01 = tap(x0i + 1, y0i)
    v10 = tap(x0i, y0i + 1)
    v11 = tap(x0i + 1, y0i + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    out = (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )
    out = out.astype(image.dtype)
    if squeeze:
        out = out[..., 0]
    return out


def _axis_lerp_gather(image, pos, axis):
    """1-D linear interpolation of `image` along `axis` at fractional
    positions `pos` (out-of-range taps contribute 0, cv2 BORDER_CONSTANT)."""
    n = image.shape[axis]
    i0 = jnp.floor(pos)
    frac = pos - i0
    i0i = i0.astype(jnp.int32)

    def tap(idx):
        valid = (idx >= 0) & (idx < n)
        v = jnp.take(image, jnp.clip(idx, 0, n - 1), axis=axis)
        shape = [1] * v.ndim
        shape[axis] = len(pos)
        return v * valid.reshape(shape)

    shape = [1] * image.ndim
    shape[axis] = len(pos)
    f = frac.reshape(shape)
    return tap(i0i) * (1 - f) + tap(i0i + 1) * f


def _lerp_matrix(pos, n: int):
    """(len(pos), n) interpolation matrix: row o holds the two bilinear tap
    weights of fractional position pos[o]; out-of-range taps get weight 0
    (cv2 BORDER_CONSTANT). R @ x == _axis_lerp_gather(x, pos, 0)."""
    i0 = jnp.floor(pos)
    f = pos - i0
    i0i = i0.astype(jnp.int32)
    cols = jnp.arange(n)
    w0 = jnp.where((i0i >= 0) & (i0i < n), 1.0 - f, 0.0)
    w1 = jnp.where((i0i + 1 >= 0) & (i0i + 1 < n), f, 0.0)
    return (
        (cols[None, :] == i0i[:, None]) * w0[:, None]
        + (cols[None, :] == (i0i + 1)[:, None]) * w1[:, None]
    )


def crop_resize_bilinear(image, box, out_hw):
    """Axis-aligned crop+resize with the exact sampling grid of the
    reference's rot=0 warpAffine path, as two separable 1-D lerps.

    Equivalent to warp_affine(get_affine_transform(...rot=0...)) but with a
    compile footprint that stays small under heavy vmap (the 2-D gather
    version dominates pipeline compile time when vmapped over the mask
    capacity).
    """
    out_h, out_w = out_hw
    box = jnp.asarray(box, jnp.float32)
    bw = jnp.maximum(box[2] - box[0], 1e-3)
    cx = (box[0] + box[2]) / 2.0
    cy = (box[1] + box[3]) / 2.0
    # The reference transform (data_utils.py:22-52) is a uniform-scale
    # similarity built from scale[0] ONLY: both axes scale by out_w/bw. For
    # non-square boxes the vertical crop extent is out_h*bw/out_w, NOT bh —
    # this must match get_affine_transform/get_K_crop_resize or keypoints get
    # normalized through wrong intrinsics in y.
    s = out_w / bw
    xs = (jnp.arange(out_w, dtype=jnp.float32) - out_w / 2.0) / s + cx
    ys = (jnp.arange(out_h, dtype=jnp.float32) - out_h / 2.0) / s + cy
    img = image.astype(jnp.float32)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    # separable lerp as TWO MXU MATMULS, not gathers: dynamic-index gathers
    # run on the slow path and dominated the retrieval stage (~110 ms of a
    # 126 ms stage at 4x64 crops on a v5e); the interpolation matrices cost
    # ~0.5 GFLOP per crop on the MXU instead. float32 precision keeps cv2
    # parity at [0,255] scale.
    ry = _lerp_matrix(ys, img.shape[0])  # (out_h, H)
    rx = _lerp_matrix(xs, img.shape[1])  # (out_w, W)
    img = jnp.einsum("oh,hwc->owc", ry, img, precision="float32")
    img = jnp.einsum("ow,hwc->hoc", rx, img, precision="float32")
    if squeeze:
        img = img[..., 0]
    return img.astype(image.dtype)


@f32_matmul
def get_image_crop_resize(image, box, resize_shape):
    """Crop `box` = [x0, y0, x1, y1] out of `image` and resize to `resize_shape`
    = static (h, w). Returns (crop, trans_homo 3x3). (data_utils.py:239-255)"""
    box = jnp.asarray(box, jnp.float32)
    center = jnp.stack([(box[0] + box[2]) / 2.0, (box[1] + box[3]) / 2.0])
    # guard degenerate (zero-area) boxes: padded slots in fixed-capacity
    # pipelines must not poison the batch with NaNs from a singular solve
    scale = jnp.maximum(jnp.stack([box[2] - box[0], box[3] - box[1]]), 1e-3)
    resize_h, resize_w = int(resize_shape[0]), int(resize_shape[1])
    trans = get_affine_transform(center, scale, 0.0, (resize_w, resize_h))
    crop = crop_resize_bilinear(image, box, (resize_h, resize_w))
    return crop, _to_homo3(trans)


@f32_matmul
def get_K_crop_resize(box, K, resize_shape):
    """Intrinsics update for crop+resize: K' = T_homo @ K_homo.
    (data_utils.py:258-280). jit-safe."""
    box = jnp.asarray(box, jnp.float32)
    K = jnp.asarray(K, jnp.float32)
    center = jnp.stack([(box[0] + box[2]) / 2.0, (box[1] + box[3]) / 2.0])
    scale = jnp.maximum(jnp.stack([box[2] - box[0], box[3] - box[1]]), 1e-3)
    resize_h, resize_w = int(resize_shape[0]), int(resize_shape[1])
    trans = get_affine_transform(center, scale, 0.0, (resize_w, resize_h))
    T = _to_homo3(trans)
    if K.shape == (3, 3):
        K_homo = jnp.concatenate([K, jnp.zeros((3, 1), K.dtype)], axis=-1)
    else:
        K_homo = K
    K_crop_homo = T @ K_homo  # (3, 4)
    return K_crop_homo[:3, :3], K_crop_homo


def compact_box(bbox_xywh, compact_percent=0.3):
    """Expand an xywh box by `compact_percent` of w/h on each side, returning
    [x0, y0, x1, y1]. Mirrors eval_linemod_json.py:76-84 (int truncation kept
    out: jit version stays float; drivers round at the host edge)."""
    x0, y0, w, h = bbox_xywh[0], bbox_xywh[1], bbox_xywh[2], bbox_xywh[3]
    x1 = x0 + w + w * compact_percent
    y1 = y0 + h + h * compact_percent
    x0 = x0 - w * compact_percent
    y0 = y0 - h * compact_percent
    return jnp.stack([x0, y0, x1, y1])


def clamped_scale_box(bbox_xywh, src_w, src_h, scale):
    """Scale an xywh box about its center, clamping scale so the box fits the
    image, then shift back inside the image bounds.
    (pope_model_api.py:125-156 CropImage._get_new_box, sans int truncation)."""
    x, y, bw, bh = bbox_xywh[0], bbox_xywh[1], bbox_xywh[2], bbox_xywh[3]
    scale = jnp.minimum((src_h - 1.0) / bh, jnp.minimum((src_w - 1.0) / bw, scale))
    nw, nh = bw * scale, bh * scale
    cx, cy = x + bw / 2.0, y + bh / 2.0
    x0, y0 = cx - nw / 2.0, cy - nh / 2.0
    x1, y1 = cx + nw / 2.0, cy + nh / 2.0
    # shift inside bounds (order matters: mirror the reference's if-cascade)
    x1 = jnp.where(x0 < 0, x1 - x0, x1)
    x0 = jnp.maximum(x0, 0.0)
    y1 = jnp.where(y0 < 0, y1 - y0, y1)
    y0 = jnp.maximum(y0, 0.0)
    x0 = jnp.where(x1 > src_w - 1, x0 - (x1 - src_w + 1), x0)
    x1 = jnp.minimum(x1, src_w - 1.0)
    y0 = jnp.where(y1 > src_h - 1, y0 - (y1 - src_h + 1), y0)
    y1 = jnp.minimum(y1, src_h - 1.0)
    return jnp.stack([x0, y0, x1, y1])
