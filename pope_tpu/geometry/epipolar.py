"""Epipolar geometry: essential matrices, epipolar distances, and midpoint
triangulation for cheirality tests. Pure jnp, fully batched.

Reference parity: src/utils/metrics.py:27-44 (symmetric_epipolar_distance),
:47-66 (E = [t]x R), utils/base_utils.py:286 (compute_F), :588 (triangulate).
"""

from __future__ import annotations

import jax.numpy as jnp

from pope_tpu.utils.precision import f32_matmul

from pope_tpu.geometry.pose import skew


@f32_matmul
def essential_from_Rt(R, t):
    """E = [t]x @ R for (..., 3, 3) R and (..., 3) t."""
    return skew(t) @ R


def _homo(pts):
    return jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)


def normalize_keypoints(kpts, K):
    """Pixel -> normalized camera coordinates: (p - c) / f.
    (metrics.py:72-74: `(kpts - K[[0,1],[2,2]]) / K[[0,1],[0,1]]`)."""
    c = jnp.stack([K[..., 0, 2], K[..., 1, 2]], axis=-1)
    f = jnp.stack([K[..., 0, 0], K[..., 1, 1]], axis=-1)
    return (kpts - c[..., None, :]) / f[..., None, :]


@f32_matmul
def symmetric_epipolar_distance(pts0, pts1, E, K0=None, K1=None):
    """Squared symmetric epipolar distance (metrics.py:27-44).

    pts are pixel coords when K's are given, else normalized coords.
    pts0/pts1: (..., N, 2); E: (..., 3, 3). Returns (..., N).
    """
    if K0 is not None:
        pts0 = normalize_keypoints(pts0, K0)
    if K1 is not None:
        pts1 = normalize_keypoints(pts1, K1)
    p0 = _homo(pts0)  # (..., N, 3)
    p1 = _homo(pts1)
    Ep0 = p0 @ jnp.swapaxes(E, -1, -2)  # (..., N, 3)
    p1Ep0 = jnp.sum(p1 * Ep0, axis=-1)
    Etp1 = p1 @ E
    d = p1Ep0**2 * (
        1.0 / jnp.maximum(Ep0[..., 0] ** 2 + Ep0[..., 1] ** 2, 1e-12)
        + 1.0 / jnp.maximum(Etp1[..., 0] ** 2 + Etp1[..., 1] ** 2, 1e-12)
    )
    return d


@f32_matmul
def sampson_distance(pts0, pts1, E):
    """Squared first-order (Sampson) epipolar distance on normalized coords.
    This matches OpenCV's RANSAC inlier scoring for findEssentialMat."""
    p0 = _homo(pts0)
    p1 = _homo(pts1)
    Ep0 = p0 @ jnp.swapaxes(E, -1, -2)
    Etp1 = p1 @ E
    p1Ep0 = jnp.sum(p1 * Ep0, axis=-1)
    denom = Ep0[..., 0] ** 2 + Ep0[..., 1] ** 2 + Etp1[..., 0] ** 2 + Etp1[..., 1] ** 2
    return p1Ep0**2 / jnp.maximum(denom, 1e-12)


@f32_matmul
def triangulate_midpoint(pts0, pts1, R, t):
    """Depths of points in both cameras via the two-ray midpoint method.

    Camera 0 at identity; camera 1 at x1 = R x0 + t. pts are normalized image
    coords (..., N, 2). Returns (z0, z1): (..., N) depths in each camera, used
    for the cheirality (points-in-front) test in pose recovery.

    Solves min || z0 * R r0 + t - z1 * r1 || for each correspondence, where
    r0/r1 are the unit-free ray directions [x, y, 1].
    """
    r0 = _homo(pts0)  # (..., N, 3) ray in cam0
    r1 = _homo(pts1)  # ray in cam1
    Rr0 = r0 @ jnp.swapaxes(R, -1, -2)  # (..., N, 3) cam0 ray rotated into cam1
    # Least squares for [z0, -z1]: A = [Rr0, -r1] (3x2), b = -t
    a11 = jnp.sum(Rr0 * Rr0, axis=-1)
    a12 = -jnp.sum(Rr0 * r1, axis=-1)
    a22 = jnp.sum(r1 * r1, axis=-1)
    t_ = t[..., None, :]  # broadcast over N
    b1 = -jnp.sum(Rr0 * t_, axis=-1)
    b2 = jnp.sum(r1 * t_, axis=-1)
    det = a11 * a22 - a12 * a12
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    z0 = (b1 * a22 - a12 * b2) / det
    z1 = (a11 * b2 - a12 * b1) / det
    return z0, z1


def compute_symmetric_epipolar_errors(T_0to1, mkpts0, mkpts1, K0, K1):
    """Per-match squared symmetric epipolar error against a GT relative pose
    (metrics.py:47-66: E = [t]x R from T_0to1, then the distance above).

    T_0to1: (..., 4, 4); mkpts in pixels; K's (..., 3, 3). Returns (..., N).
    """
    E = essential_from_Rt(T_0to1[..., :3, :3], T_0to1[..., :3, 3])
    return symmetric_epipolar_distance(mkpts0, mkpts1, E, K0, K1)
