"""Held-out ACCURACY gate for the pose-regression extension (the synthetic
substitute for the reference's 网络修改记录.md accuracy history, which needs
its datasets + checkpoints): train the mkpts-mode regressor on exactly
consistent synthetic geometry and require it to beat the identity-rotation
baseline by a wide margin on held-out pairs.

Geometry: 3-D points in front of the camera are projected into view 0 and,
after a known relative (R, t), into view 1 — so the matched keypoint sets
fully determine the pose, exactly the information the reference pipeline
feeds model0429 (pose/model0429_mkpts.py, train0429_mkpts.py).

Measured: median held-out R error ~5 deg after 600 steps vs a 29-deg
identity baseline (GT angles are drawn from [10, 60] deg, so predicting
"no rotation" is the cheap-trick floor the assertion must rule out).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from pope_tpu.config import RegressorConfig
from pope_tpu.models.regressor import MkptsRegModel, create_train_state, eval_step, train_step

pytestmark = pytest.mark.slow

M = 32  # matches per pair
K = np.array([[256.0, 0, 128], [0, 256.0, 128], [0, 0, 1]], np.float32)


def _make_pairs(n, seed):
    r = np.random.default_rng(seed)
    axes = r.normal(size=(n, 3))
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    angs = r.uniform(np.deg2rad(10), np.deg2rad(60), n)
    Rs = Rotation.from_rotvec(axes * angs[:, None]).as_matrix().astype(np.float32)
    ts = r.normal(0, 0.1, (n, 3)).astype(np.float32)
    pts = np.stack(
        [r.uniform(-0.6, 0.6, (n, M)), r.uniform(-0.6, 0.6, (n, M)),
         r.uniform(1.8, 3.0, (n, M))], -1,
    ).astype(np.float32)

    def proj(P):
        uv = P @ K.T
        return uv[..., :2] / uv[..., 2:3]

    pts1 = np.einsum("nij,nmj->nmi", Rs, pts) + ts[:, None]
    return (jnp.asarray(proj(pts)), jnp.asarray(proj(pts1)), jnp.asarray(Rs), jnp.asarray(ts))


def test_regressor_beats_identity_baseline_on_heldout():
    rng = np.random.default_rng(0)
    mk0, mk1, Rs, ts = _make_pairs(512, 1)
    te0, te1, Rte, tte = _make_pairs(64, 2)

    cfg = RegressorConfig(num_sample=M, d_model=64, nhead=4, num_layers=3, net_mode="mkpts", lr=3e-4)
    model = MkptsRegModel(cfg)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (mk0[:4], mk1[:4], None, None), cfg
    )
    step = jax.jit(train_step)
    ev = jax.jit(eval_step)
    for it in range(600):
        idx = rng.integers(0, 512, 64)
        batch = {"mkpts0": mk0[idx], "mkpts1": mk1[idx], "gt_R": Rs[idx], "gt_t": ts[idx]}
        state, _ = step(state, batch, jax.random.fold_in(jax.random.PRNGKey(1), it))

    out = ev(state, {"mkpts0": te0, "mkpts1": te1, "gt_R": Rte, "gt_t": tte})
    r_err = np.asarray(out["R_err"])  # degrees (relative_pose_error)
    assert np.isfinite(r_err).all()
    median = float(np.median(r_err))
    # identity-prediction floor: the held-out GT rotation magnitudes
    gt_ang = np.rad2deg(
        np.arccos(np.clip((np.trace(np.asarray(Rte), axis1=1, axis2=2) - 1) / 2, -1, 1))
    )
    baseline = float(np.median(gt_ang))
    assert baseline > 20.0  # the task is not degenerate
    assert median < 12.0, (median, baseline)
    assert median < baseline / 2, (median, baseline)


# --- architecture ladder (网络修改记录.md analogue) -------------------------
#
# The reference's experiment log pins an ACC15 LADDER across architecture
# revisions on OnePose++: mkpts-only 0.503 -> +ConvNeXt image branch 0.807
# (网络修改记录.md:24-27,724-728). Its datasets/checkpoints are not in this
# container, so this is the synthetic analogue of the ORDERING claim: when
# the keypoints are degraded (noise past what the geometry can absorb) and
# the crops carry complementary orientation evidence, the fused
# 'mkpts+imgs' variant must climb ACC15 well above the mkpts-only variant
# under an identical training budget.
#
# Measured at these settings (25px noise, 400 steps): mkpts 0.672 ->
# mkpts+imgs 0.984 ACC15; medians 12.6 -> 5.7 deg.

LM = 16  # matches per pair for the ladder (fewer than M: part of the degradation)
LADDER_NOISE_PX = 25.0
LIMG = 32


def _make_ladder_pairs(n, seed):
    r = np.random.default_rng(seed)
    axes = r.normal(size=(n, 3))
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    angs = r.uniform(np.deg2rad(10), np.deg2rad(60), n)
    Rs = Rotation.from_rotvec(axes * angs[:, None]).as_matrix().astype(np.float32)
    ts = r.normal(0, 0.1, (n, 3)).astype(np.float32)
    pts = np.stack(
        [r.uniform(-0.6, 0.6, (n, LM)), r.uniform(-0.6, 0.6, (n, LM)),
         r.uniform(1.8, 3.0, (n, LM))], -1).astype(np.float32)

    def proj(P):
        uv = P @ K.T
        return uv[..., :2] / uv[..., 2:3]

    pts1 = np.einsum("nij,nmj->nmi", Rs, pts) + ts[:, None]
    mk0 = proj(pts) + r.normal(0, LADDER_NOISE_PX, (n, LM, 2)).astype(np.float32)
    mk1 = proj(pts1) + r.normal(0, LADDER_NOISE_PX, (n, LM, 2)).astype(np.float32)

    # crops: img1's horizontal bands encode the relative orientation (the
    # "appearance determines orientation" premise behind the reference's
    # image branch, reduced to its learnable core); img0 is the
    # canonical-orientation crop. Both noisy.
    r6 = Rs[:, :, :2].reshape(n, 6)
    img1 = np.repeat((r6 + 1.0) / 2.0, LIMG // 6 + 1, axis=1)[:, :LIMG]
    img1 = np.broadcast_to(img1[:, :, None, None], (n, LIMG, LIMG, 3)).astype(np.float32)
    img1 = img1 + r.normal(0, 0.05, img1.shape).astype(np.float32)
    img0 = np.full((n, LIMG, LIMG, 3), 0.5, np.float32)
    img0 = img0 + r.normal(0, 0.05, img0.shape).astype(np.float32)
    return (jnp.asarray(mk0), jnp.asarray(mk1), jnp.asarray(img0), jnp.asarray(img1),
            jnp.asarray(Rs), jnp.asarray(ts))


def _train_ladder_variant(net_mode, steps=400):
    rng = np.random.default_rng(0)
    mk0, mk1, i0, i1, Rs, ts = _make_ladder_pairs(512, 1)
    te = _make_ladder_pairs(64, 2)
    cfg = RegressorConfig(num_sample=LM, d_model=64, nhead=4, num_layers=2,
                          net_mode=net_mode, lr=3e-4)
    model = MkptsRegModel(cfg, cnn_name="test")
    imgs = "imgs" in net_mode
    sample = (mk0[:2], mk1[:2], i0[:2] if imgs else None, i1[:2] if imgs else None)
    state = create_train_state(model, jax.random.PRNGKey(0), sample, cfg)
    step = jax.jit(train_step)
    ev = jax.jit(eval_step)
    for it in range(steps):
        idx = rng.integers(0, 512, 64)
        batch = {"mkpts0": mk0[idx], "mkpts1": mk1[idx], "gt_R": Rs[idx], "gt_t": ts[idx]}
        if imgs:
            batch["img0"], batch["img1"] = i0[idx], i1[idx]
        state, _ = step(state, batch, jax.random.fold_in(jax.random.PRNGKey(1), it))
    tb = {"mkpts0": te[0], "mkpts1": te[1], "gt_R": te[4], "gt_t": te[5]}
    if imgs:
        tb["img0"], tb["img1"] = te[2], te[3]
    r_err = np.asarray(ev(state, tb)["R_err"])
    assert np.isfinite(r_err).all()
    return float(np.mean(r_err < 15.0)), float(np.median(r_err))


def test_cnn_branch_climbs_accuracy_ladder():
    acc_mk, med_mk = _train_ladder_variant("mkpts")
    acc_fused, med_fused = _train_ladder_variant("mkpts+imgs")
    # the task is genuinely keypoint-limited (not trivially solved by mkpts)
    assert acc_mk < 0.9, (acc_mk, med_mk)
    # the ladder: image evidence lifts ACC15 and median, wide margins below
    # the measured 0.672 -> 0.984 / 12.6 -> 5.7 deg
    assert acc_fused >= acc_mk + 0.1, (acc_mk, acc_fused)
    assert acc_fused > 0.9, (acc_fused, med_fused)
    assert med_fused < med_mk - 2.0, (med_mk, med_fused)
