"""Solver tests: batched RANSAC vs ground truth and vs OpenCV on the same
correspondences (the reference's own solver path, metrics.py:69-94)."""

import cv2
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from pope_tpu.solver import estimate_pose_ransac, kabsch, umeyama_alignment
from pope_tpu.geometry import rotation_angle_deg, translation_angle_deg

pytestmark = pytest.mark.slow  # heavy oracle/e2e surface; core suite skips


def synth_pair(rng, n=300, noise_px=0.5, outlier_frac=0.2, f=500.0, max_angle_deg=40.0):
    # bounded rotation keeps all points in front of both cameras (unbounded
    # random rotations put the scene behind camera 1, which breaks the
    # physical correspondence model for every solver, incl. OpenCV)
    axis = rng.normal(0, 1, 3)
    axis /= np.linalg.norm(axis)
    angle = np.deg2rad(rng.uniform(5.0, max_angle_deg))
    R = Rotation.from_rotvec(axis * angle).as_matrix()
    t = rng.normal(0, 1, 3)
    t /= np.linalg.norm(t)
    X = rng.uniform(-1, 1, (n, 3)) + np.array([0, 0, 5.0])
    K = np.array([[f, 0, 320], [0, f, 240], [0, 0, 1]], np.float64)

    def proj(Xc):
        p = Xc @ K.T
        return p[:, :2] / p[:, 2:3]

    pix0 = proj(X)
    pix1 = proj(X @ R.T + t)
    pix0 += rng.normal(0, noise_px, pix0.shape)
    pix1 += rng.normal(0, noise_px, pix1.shape)
    n_out = int(n * outlier_frac)
    if n_out:
        idx = rng.choice(n, n_out, replace=False)
        pix1[idx] = rng.uniform([0, 0], [640, 480], (n_out, 2))
    return pix0.astype(np.float32), pix1.astype(np.float32), K.astype(np.float32), R, t


def test_ransac_recovers_pose(rng):
    pix0, pix1, K, R_gt, t_gt = synth_pair(rng)
    N = len(pix0)
    valid = np.ones(N, bool)
    res = estimate_pose_ransac(
        jnp.asarray(pix0), jnp.asarray(pix1), jnp.asarray(K), jnp.asarray(K),
        jnp.asarray(valid), jax.random.PRNGKey(0),
    )
    assert bool(res.ok)
    r_err = float(rotation_angle_deg(res.R, jnp.asarray(R_gt, jnp.float32)))
    t_err = float(translation_angle_deg(res.t, jnp.asarray(t_gt, jnp.float32)))
    # cv2 on identical data scores R ~2.6deg / t ~6.8deg (see
    # test_ransac_matches_opencv_quality for the head-to-head)
    assert r_err < 3.0, r_err  # cv2 scores ~2.6deg on this exact data
    assert t_err < 8.0, t_err
    # inliers should be roughly the non-outliers (80% true inlier rate,
    # ~2/3 of which fall inside the 0.5px threshold at 0.5px noise)
    assert int(res.n_inliers) > 0.4 * N


def test_ransac_matches_opencv_quality(rng):
    """The solver BEATS cv2's 5-point RANSAC head-to-head on this synthetic
    benchmark: median error over >=20 trials must be <= cv2's median (the
    enforced bar matches the README claim; measured round 3: R 0.89deg vs
    cv2 2.24deg, t 2.37deg vs 4.00deg over 24 trials)."""
    ours_R, ours_t, cv_R, cv_t = [], [], [], []
    for trial in range(20):
        pix0, pix1, K, R_gt, t_gt = synth_pair(rng, n=250, noise_px=1.0, outlier_frac=0.3)
        res = estimate_pose_ransac(
            jnp.asarray(pix0), jnp.asarray(pix1), jnp.asarray(K), jnp.asarray(K),
            jnp.ones(len(pix0), bool), jax.random.PRNGKey(trial),
        )
        ours_R.append(float(rotation_angle_deg(res.R, jnp.asarray(R_gt, jnp.float32))))
        ours_t.append(float(translation_angle_deg(res.t, jnp.asarray(t_gt, jnp.float32))))

        # reference path (metrics.py:69-94)
        k0 = (pix0 - K[[0, 1], [2, 2]][None]) / K[[0, 1], [0, 1]][None]
        k1 = (pix1 - K[[0, 1], [2, 2]][None]) / K[[0, 1], [0, 1]][None]
        thr = 0.5 / np.mean([K[0, 0], K[1, 1], K[0, 0], K[1, 1]])
        E, mask = cv2.findEssentialMat(k0, k1, np.eye(3), threshold=thr, prob=0.99, method=cv2.RANSAC)
        best_n, ret = 0, None
        for _E in np.split(E, len(E) / 3):
            nn, R, t, _ = cv2.recoverPose(_E, k0, k1, np.eye(3), 1e9, mask=mask)
            if nn > best_n:
                best_n, ret = nn, (R, t[:, 0])
        cv_R.append(float(rotation_angle_deg(jnp.asarray(ret[0], jnp.float32), jnp.asarray(R_gt, jnp.float32))))
        cv_t.append(float(translation_angle_deg(jnp.asarray(ret[1], jnp.float32), jnp.asarray(t_gt, jnp.float32))))

    # head-to-head: our median error must not exceed cv2's (tiny epsilon
    # for float jitter only, not a 2x allowance)
    assert np.median(ours_R) <= np.median(cv_R) + 1e-3, (ours_R, cv_R)
    assert np.median(ours_t) <= np.median(cv_t) + 1e-3, (ours_t, cv_t)


def test_ransac_with_padding(rng):
    """Padded (invalid) slots must not affect the estimate."""
    pix0, pix1, K, R_gt, t_gt = synth_pair(rng, n=200, outlier_frac=0.1)
    pad = 56
    pix0p = np.concatenate([pix0, np.zeros((pad, 2), np.float32)])
    pix1p = np.concatenate([pix1, np.zeros((pad, 2), np.float32)])
    valid = np.concatenate([np.ones(200, bool), np.zeros(pad, bool)])
    res = estimate_pose_ransac(
        jnp.asarray(pix0p), jnp.asarray(pix1p), jnp.asarray(K), jnp.asarray(K),
        jnp.asarray(valid), jax.random.PRNGKey(1),
    )
    assert bool(res.ok)
    assert float(rotation_angle_deg(res.R, jnp.asarray(R_gt, jnp.float32))) < 2.0
    assert not bool(jnp.any(res.inliers[200:]))


def test_ransac_too_few_points(rng):
    pix0 = np.zeros((16, 2), np.float32)
    pix1 = np.zeros((16, 2), np.float32)
    valid = np.zeros(16, bool)
    valid[:4] = True  # < 8 -> not ok (reference: <5 -> None, metrics.py:70)
    K = np.array([[500, 0, 320], [0, 500, 240], [0, 0, 1]], np.float32)
    res = estimate_pose_ransac(
        jnp.asarray(pix0), jnp.asarray(pix1), jnp.asarray(K), jnp.asarray(K),
        jnp.asarray(valid), jax.random.PRNGKey(2),
    )
    assert not bool(res.ok)
    assert np.isfinite(np.asarray(res.R)).all()  # no NaN poison even when degenerate


def _cv2_pose_few(pix0, pix1, K, n_few):
    """Reference solver path (metrics.py:69-94) on the first n_few matches."""
    k0 = (pix0[:n_few] - K[[0, 1], [2, 2]][None]) / K[[0, 1], [0, 1]][None]
    k1 = (pix1[:n_few] - K[[0, 1], [2, 2]][None]) / K[[0, 1], [0, 1]][None]
    thr = 0.5 / np.mean([K[0, 0], K[1, 1]])
    E, mask = cv2.findEssentialMat(
        k0.astype(np.float64), k1.astype(np.float64), np.eye(3),
        threshold=thr, prob=0.99, method=cv2.RANSAC,
    )
    if E is None:
        return None
    best_n, ret = 0, None
    for _E in np.split(E, len(E) / 3):
        nn, R, t, _ = cv2.recoverPose(
            _E, k0.astype(np.float64), k1.astype(np.float64), np.eye(3), 1e9, mask=mask.copy()
        )
        if nn > best_n:
            best_n, ret = nn, (R, t[:, 0])
    return ret


def test_ransac_few_matches_recovers_pose(rng):
    """5-7 valid matches: below the 8-point minimal sample the solver must
    still produce a pose (`ok=True`; the reference solves with as few as 5,
    metrics.py:70). At n=6/7 the pose should be accurate; at exactly n=5 the
    problem admits multiple interpolating solutions (cv2's true 5-point errs
    double-digit degrees on such instances too), so the bar there is
    ok-and-comparable-to-cv2, not tight accuracy."""
    for n_few in (6, 5, 7):
        pix0, pix1, K, R_gt, t_gt = synth_pair(
            rng, n=64, noise_px=0.1, outlier_frac=0.0, max_angle_deg=25.0
        )
        valid = np.zeros(64, bool)
        valid[:n_few] = True
        # scramble the padded slots: they must not influence the fit
        pix0[n_few:] = rng.uniform(0, 640, (64 - n_few, 2))
        pix1[n_few:] = rng.uniform(0, 640, (64 - n_few, 2))
        res = estimate_pose_ransac(
            jnp.asarray(pix0), jnp.asarray(pix1), jnp.asarray(K), jnp.asarray(K),
            jnp.asarray(valid), jax.random.PRNGKey(3),
        )
        assert bool(res.ok), f"n={n_few} should be solvable"
        r_err = float(rotation_angle_deg(res.R, jnp.asarray(R_gt, jnp.float32)))
        t_err = float(translation_angle_deg(res.t, jnp.asarray(t_gt, jnp.float32)))
        assert np.isfinite(r_err) and np.isfinite(t_err)

        cv2_ret = _cv2_pose_few(pix0, pix1, K, n_few)
        if cv2_ret is not None:
            cv_r = float(rotation_angle_deg(jnp.asarray(cv2_ret[0], jnp.float32), jnp.asarray(R_gt, jnp.float32)))
            cv_t = float(translation_angle_deg(jnp.asarray(cv2_ret[1], jnp.float32), jnp.asarray(t_gt, jnp.float32)))
        else:
            cv_r = cv_t = np.inf
        if n_few >= 6:
            assert r_err < max(5.0, cv_r + 1.0), (n_few, r_err, cv_r)
            assert t_err < max(15.0, cv_t + 2.0), (n_few, t_err, cv_t)
        else:  # n=5: intrinsic ambiguity — comparable-to-cv2 class
            assert r_err < max(45.0, 2.5 * cv_r), (n_few, r_err, cv_r)
            assert t_err < max(75.0, 2.5 * cv_t), (n_few, t_err, cv_t)


def test_kabsch_umeyama(rng):
    R_gt = Rotation.random(random_state=1).as_matrix()
    t_gt = np.array([0.3, -0.2, 0.7])
    P = rng.normal(0, 1, (50, 3))
    Q = P @ R_gt.T + t_gt
    R, t = kabsch(jnp.asarray(P, jnp.float32), jnp.asarray(Q, jnp.float32))
    np.testing.assert_allclose(np.asarray(R), R_gt, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), t_gt, atol=1e-4)

    s_gt = 2.5
    Q2 = s_gt * (P @ R_gt.T) + t_gt
    s, R2, t2 = umeyama_alignment(jnp.asarray(P, jnp.float32), jnp.asarray(Q2, jnp.float32))
    assert abs(float(s) - s_gt) < 1e-3
    np.testing.assert_allclose(np.asarray(R2), R_gt, atol=1e-4)
