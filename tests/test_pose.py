"""Tests for pose/rotation algebra and epipolar geometry vs scipy/numpy."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from pope_tpu.geometry import (
    project_points,
    pose_inverse,
    pose_compose,
    relative_pose,
    relative_pose_error,
    rotation_angle_deg,
    geodesic_distance,
    quat_to_matrix,
    matrix_to_quat,
    o6d_to_matrix,
    essential_from_Rt,
    sampson_distance,
    symmetric_epipolar_distance,
    triangulate_midpoint,
    skew,
)


def rand_rot(rng, n=None):
    if n is None:
        return Rotation.random(random_state=int(rng.integers(1 << 31))).as_matrix()
    return Rotation.random(n, random_state=int(rng.integers(1 << 31))).as_matrix()


def test_project_points_reference(rng):
    pts = rng.normal(0, 1, (50, 3))
    R = rand_rot(rng)
    t = np.array([0.1, -0.2, 3.0])
    RT = np.concatenate([R, t[:, None]], axis=1)
    K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]])
    p2d, dpt = project_points(pts, RT, K)
    # numpy reference (base_utils.py:256-265)
    cam = pts @ R.T + t
    pix = cam @ K.T
    ref = pix[:, :2] / pix[:, 2:3]
    np.testing.assert_allclose(np.asarray(p2d), ref, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(dpt), pix[:, 2], rtol=1e-5, atol=1e-4)


def test_pose_inverse_compose(rng):
    R = rand_rot(rng)
    t = rng.normal(0, 1, 3)
    pose = np.concatenate([R, t[:, None]], 1).astype(np.float32)
    inv = np.asarray(pose_inverse(jnp.asarray(pose)))
    # compose(pose, inv) == identity
    comp = np.asarray(pose_compose(jnp.asarray(pose), jnp.asarray(inv)))
    np.testing.assert_allclose(comp[:, :3], np.eye(3), atol=1e-5)
    np.testing.assert_allclose(comp[:, 3], 0, atol=1e-5)


def test_relative_pose_matches_numpy(rng):
    def homo(R, t):
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = t
        return T

    T0 = homo(rand_rot(rng), rng.normal(0, 1, 3))
    T1 = homo(rand_rot(rng), rng.normal(0, 1, 3))
    ref = T1 @ np.linalg.inv(T0)
    ours = np.asarray(relative_pose(jnp.asarray(T0, jnp.float32), jnp.asarray(T1, jnp.float32)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_relative_pose_error_reference(rng):
    R_gt = rand_rot(rng)
    t_gt = rng.normal(0, 1, 3)
    T = np.eye(4)
    T[:3, :3] = R_gt
    T[:3, 3] = t_gt
    R = rand_rot(rng)
    t = rng.normal(0, 1, 3)
    t_err, R_err = relative_pose_error(jnp.asarray(T, jnp.float32), jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32))
    # reference formulas (metrics.py:10-24)
    n = np.linalg.norm(t) * np.linalg.norm(t_gt)
    ref_t = np.rad2deg(np.arccos(np.clip(np.dot(t, t_gt) / n, -1, 1)))
    ref_t = min(ref_t, 180 - ref_t)
    cos = np.clip((np.trace(R.T @ R_gt) - 1) / 2, -1, 1)
    ref_R = np.rad2deg(abs(np.arccos(cos)))
    assert abs(float(t_err) - ref_t) < 1e-2
    assert abs(float(R_err) - ref_R) < 1e-2


def test_rotation_angle_zero():
    R = np.eye(3, dtype=np.float32)
    assert float(rotation_angle_deg(jnp.asarray(R), jnp.asarray(R))) < 1e-3


def test_quat_roundtrip(rng):
    Rm = rand_rot(rng, 16).astype(np.float32)
    q = matrix_to_quat(jnp.asarray(Rm))
    R2 = quat_to_matrix(q)
    np.testing.assert_allclose(np.asarray(R2), Rm, atol=1e-4)


def test_quat_to_matrix_matches_scipy(rng):
    q = rng.normal(0, 1, (8, 4)).astype(np.float32)
    ours = np.asarray(quat_to_matrix(jnp.asarray(q)))
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    # scipy uses xyzw ordering
    ref = Rotation.from_quat(qn[:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_o6d_valid_rotation(rng):
    x = rng.normal(0, 1, (8, 6)).astype(np.float32)
    R = np.asarray(o6d_to_matrix(jnp.asarray(x)))
    eye = np.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-4)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-4)


def test_geodesic_distance_identity(rng):
    R = rand_rot(rng, 4).astype(np.float32)
    d_self = float(geodesic_distance(jnp.asarray(R), jnp.asarray(R)))
    assert d_self < 2e-3


def test_skew_cross(rng):
    a = rng.normal(0, 1, 3).astype(np.float32)
    b = rng.normal(0, 1, 3).astype(np.float32)
    ours = np.asarray(skew(jnp.asarray(a))) @ b
    np.testing.assert_allclose(ours, np.cross(a, b), atol=1e-5)


def _synthetic_pair(rng, n=100, noise=0.0):
    """Generate a normalized-coordinate correspondence set with known R, t."""
    R = rand_rot(rng)
    t = rng.normal(0, 1, 3)
    t = t / np.linalg.norm(t)
    X = rng.uniform(-1, 1, (n, 3)) + np.array([0, 0, 4.0])  # in front of cam0
    x0 = X[:, :2] / X[:, 2:3]
    Xc1 = X @ R.T + t
    x1 = Xc1[:, :2] / Xc1[:, 2:3]
    if noise:
        x0 = x0 + rng.normal(0, noise, x0.shape)
        x1 = x1 + rng.normal(0, noise, x1.shape)
    return x0.astype(np.float32), x1.astype(np.float32), R, t


def test_essential_epipolar_constraint(rng):
    x0, x1, R, t = _synthetic_pair(rng)
    E = np.asarray(essential_from_Rt(jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32)))
    # x1^T E x0 = 0 for perfect correspondences
    h0 = np.concatenate([x0, np.ones((len(x0), 1))], 1)
    h1 = np.concatenate([x1, np.ones((len(x1), 1))], 1)
    resid = np.einsum("ni,ij,nj->n", h1, E, h0)
    assert np.abs(resid).max() < 1e-4
    d = np.asarray(sampson_distance(jnp.asarray(x0), jnp.asarray(x1), jnp.asarray(E)))
    assert d.max() < 1e-6
    d2 = np.asarray(symmetric_epipolar_distance(jnp.asarray(x0), jnp.asarray(x1), jnp.asarray(E)))
    assert d2.max() < 1e-6


def test_triangulate_midpoint_depths(rng):
    x0, x1, R, t = _synthetic_pair(rng, n=60)
    z0, z1 = triangulate_midpoint(
        jnp.asarray(x0), jnp.asarray(x1), jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32)
    )
    # all points were generated in front of both cameras
    assert np.all(np.asarray(z0) > 0)
    assert np.all(np.asarray(z1) > 0)


def test_compute_symmetric_epipolar_errors(rng):
    from pope_tpu.geometry import compute_symmetric_epipolar_errors

    x0, x1, R, t = _synthetic_pair(rng, n=40)
    K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]], np.float32)
    pix0 = x0 * 500 + np.array([320, 240], np.float32)
    pix1 = x1 * 500 + np.array([320, 240], np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    T[:3, 3] = t
    errs = compute_symmetric_epipolar_errors(
        jnp.asarray(T), jnp.asarray(pix0), jnp.asarray(pix1), jnp.asarray(K), jnp.asarray(K)
    )
    assert float(jnp.max(errs)) < 1e-6  # perfect correspondences
