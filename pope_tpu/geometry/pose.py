"""Pose and rotation algebra: projection, SE(3) composition, angular errors,
quaternion / Zhou-6d rotation parameterizations. Pure jnp, batched-friendly.

Reference parity: utils/base_utils.py:256-265 (project_points), :502-524
(pose inverse/compose/apply); src/utils/metrics.py:10-24 (relative_pose_error);
pose/utils.py:9-26 (geodesic_distance), :42-89 (qua2mat), :91-106 (o6d2mat).
"""

from __future__ import annotations

import jax.numpy as jnp

from pope_tpu.utils.precision import f32_matmul


@f32_matmul
def project_points(pts, RT, K):
    """Project (N, 3) world points through a (3, 4) [R|t] and (3, 3) K.

    Returns ((N, 2) pixels, (N,) depths). Depth is clamped away from zero with
    the same +-1e-4 guard as the reference (base_utils.py:260-263).
    """
    pts = jnp.asarray(pts, jnp.float32)
    RT = jnp.asarray(RT, jnp.float32)
    K = jnp.asarray(K, jnp.float32)
    cam = pts @ RT[:, :3].T + RT[:, 3:].T  # (N, 3)
    pix = cam @ K.T
    dpt = pix[:, 2]
    dpt = jnp.where((jnp.abs(dpt) < 1e-4) & (dpt >= 0), 1e-4, dpt)
    dpt = jnp.where((jnp.abs(dpt) < 1e-4) & (dpt < 0), -1e-4, dpt)
    pts2d = pix[:, :2] / dpt[:, None]
    return pts2d, dpt


@f32_matmul
def pose_inverse(pose):
    """Invert a (..., 3, 4) [R|t]: (R.T, -R.T t). (base_utils.py:502-505)"""
    R = jnp.swapaxes(pose[..., :3, :3], -1, -2)
    t = -R @ pose[..., :3, 3:]
    return jnp.concatenate([R, t], axis=-1)


@f32_matmul
def pose_compose(pose0, pose1):
    """Apply pose0 first, then pose1: [R1 R0 | R1 t0 + t1]."""
    R0, t0 = pose0[..., :3, :3], pose0[..., :3, 3:]
    R1, t1 = pose1[..., :3, :3], pose1[..., :3, 3:]
    return jnp.concatenate([R1 @ R0, R1 @ t0 + t1], axis=-1)


def to_homo_pose(pose34):
    """(..., 3, 4) -> (..., 4, 4)."""
    pose34 = jnp.asarray(pose34, jnp.float32)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], pose34.dtype),
        pose34.shape[:-2] + (1, 4),
    )
    return jnp.concatenate([pose34, bottom], axis=-2)


@f32_matmul
def relative_pose(pose0, pose1):
    """T_0to1 = pose1 @ inv(pose0), on (..., 4, 4) homogeneous poses.
    (eval_linemod_json.py:143: `np.matmul(pose1, inv(pose0))`)."""
    return to_homo_pose(pose1[..., :3, :4]) @ jnp.linalg.inv(to_homo_pose(pose0[..., :3, :4]))


@f32_matmul
def rotation_angle_deg(R, R_gt):
    """Angular distance (deg) between rotation matrices, batched on leading dims.
    (metrics.py:19-23)"""
    m = jnp.swapaxes(R, -1, -2) @ R_gt
    cos = (jnp.trace(m, axis1=-2, axis2=-1) - 1.0) / 2.0
    cos = jnp.clip(cos, -1.0, 1.0)
    return jnp.rad2deg(jnp.abs(jnp.arccos(cos)))


def translation_angle_deg(t, t_gt):
    """Angle (deg) between translation directions with the essential-matrix
    sign ambiguity folded: err = min(err, 180 - err). (metrics.py:12-16)"""
    n = jnp.linalg.norm(t, axis=-1) * jnp.linalg.norm(t_gt, axis=-1)
    cos = jnp.sum(t * t_gt, axis=-1) / jnp.maximum(n, 1e-12)
    err = jnp.rad2deg(jnp.arccos(jnp.clip(cos, -1.0, 1.0)))
    return jnp.minimum(err, 180.0 - err)


@f32_matmul
def relative_pose_error(T_0to1, R, t, ignore_gt_t_thr=0.0):
    """(t_err_deg, R_err_deg) vs a (..., 4, 4) GT relative pose.
    (metrics.py:10-24)"""
    t_gt = T_0to1[..., :3, 3]
    t_err = translation_angle_deg(t, t_gt)
    t_err = jnp.where(jnp.linalg.norm(t_gt, axis=-1) < ignore_gt_t_thr, 0.0, t_err)
    R_err = rotation_angle_deg(R, T_0to1[..., :3, :3])
    return t_err, R_err


@f32_matmul
def geodesic_distance(X, X1=None, mode="mean"):
    """Mean geodesic rotation distance (radians) between (B, 3, 3) batches.
    Clamps cos to +-0.999999 like the reference (pose/utils.py:20)."""
    if X.ndim == 2:
        X = X[None]
    if X1 is None:
        X1 = jnp.broadcast_to(jnp.eye(3, dtype=X.dtype), X.shape)
    m = X @ jnp.swapaxes(X1, -1, -2)
    cos = (m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2] - 1.0) / 2.0
    cos = jnp.clip(cos, -0.999999, 0.999999)
    d = jnp.arccos(cos)
    if mode == "mean":
        return jnp.mean(d)
    return d


def _normalize(v, eps=1e-8):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def quat_to_matrix(quat):
    """(B, 4) wxyz quaternion -> (B, 3, 3). (pose/utils.py:42-89)"""
    q = _normalize(quat)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    xw, yw, zw = x * w, y * w, z * w
    row0 = jnp.stack([1 - 2 * (yy + zz), 2 * (xy - zw), 2 * (xz + yw)], -1)
    row1 = jnp.stack([2 * (xy + zw), 1 - 2 * (xx + zz), 2 * (yz - xw)], -1)
    row2 = jnp.stack([2 * (xz - yw), 2 * (yz + xw), 1 - 2 * (xx + yy)], -1)
    return jnp.stack([row0, row1, row2], -2)


def matrix_to_quat(R):
    """(..., 3, 3) -> (..., 4) wxyz quaternion (Shepperd-stable branch select)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    qw0 = safe_sqrt(1.0 + tr) / 2.0
    q0 = jnp.stack([qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0), (m10 - m01) / (4 * qw0)], -1)
    s1 = 2.0 * safe_sqrt(1.0 + m00 - m11 - m22)
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1], -1)
    s2 = 2.0 * safe_sqrt(1.0 + m11 - m00 - m22)
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2], -1)
    s3 = 2.0 * safe_sqrt(1.0 + m22 - m00 - m11)
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3], -1)

    cond0 = tr > 0
    cond1 = (m00 >= m11) & (m00 >= m22)
    cond2 = m11 >= m22
    q = jnp.where(
        cond0[..., None], q0,
        jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3)),
    )
    return _normalize(q)


def o6d_to_matrix(ortho6d):
    """Zhou continuous 6-d rotation -> (B, 3, 3). (pose/utils.py:91-106)"""
    x_raw = ortho6d[..., 0:3]
    y_raw = ortho6d[..., 3:6]
    x = _normalize(x_raw)
    z = _normalize(jnp.cross(x, y_raw))
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)


def skew(v):
    """(..., 3) -> (..., 3, 3) cross-product matrix."""
    zero = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zero, -v[..., 2], v[..., 1]], -1),
            jnp.stack([v[..., 2], zero, -v[..., 0]], -1),
            jnp.stack([-v[..., 1], v[..., 0], zero], -1),
        ],
        axis=-2,
    )
