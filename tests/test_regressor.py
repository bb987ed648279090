"""Regressor tests: embedding semantics, training-step loss descent, data
collate semantics, rotation heads."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pope_tpu.config import RegressorConfig
from pope_tpu.models.regressor import (
    MkptsRegModel,
    create_train_state,
    eval_step,
    nerf_embedding,
    pose_loss,
    train_step,
)
from pope_tpu.models.regressor.data import sample_mkpts

pytestmark = pytest.mark.slow  # heavy oracle/e2e surface; core suite skips


def test_nerf_embedding_reference(rng):
    """Channel order [x, sin(f0 x), cos(f0 x), ...] with linspace freqs
    (model0429_mkpts.py:11-44, logscale=False)."""
    x = rng.normal(0, 1, (4, 2)).astype(np.float32)
    out = np.asarray(nerf_embedding(jnp.asarray(x), n_freqs=3, logscale=False))
    freqs = np.linspace(1.0, 2.0**2, 3)
    ref = [x]
    for f in freqs:
        ref.append(np.sin(f * x))
        ref.append(np.cos(f * x))
    np.testing.assert_allclose(out, np.concatenate(ref, -1), atol=1e-6)
    assert out.shape == (4, 2 * (2 * 3 + 1))


def test_sample_mkpts_pads_and_subsamples(rng):
    import random

    r = random.Random(0)
    short = rng.normal(0, 1, (3, 2)).astype(np.float32)
    padded = sample_mkpts(short, 8, r)
    assert padded.shape == (8, 2)
    np.testing.assert_array_equal(padded[3:], 0)
    long = rng.normal(0, 1, (20, 2)).astype(np.float32)
    sub = sample_mkpts(long, 8, r)
    assert sub.shape == (8, 2)


def _tiny_batch(rng, B=4, N=32):
    from scipy.spatial.transform import Rotation

    R = Rotation.random(B, random_state=0).as_matrix().astype(np.float32)
    return {
        "mkpts0": jnp.asarray(rng.uniform(0, 256, (B, N, 2)), jnp.float32),
        "mkpts1": jnp.asarray(rng.uniform(0, 256, (B, N, 2)), jnp.float32),
        "gt_R": jnp.asarray(R),
        "gt_t": jnp.asarray(rng.normal(0, 0.3, (B, 3)), jnp.float32),
    }


def test_train_step_reduces_loss(rng):
    cfg = RegressorConfig(num_sample=32, d_model=32, nhead=2, net_mode="mkpts", lr=1e-3)
    model = MkptsRegModel(cfg)
    batch = _tiny_batch(rng)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (batch["mkpts0"], batch["mkpts1"], None, None), cfg
    )
    step = jax.jit(train_step)
    losses = []
    for i in range(30):
        state, metrics = step(state, batch, jax.random.fold_in(jax.random.PRNGKey(1), i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.9, (losses[0], losses[-1])

    out = jax.jit(eval_step)(state, batch)
    assert out["R_err"].shape == (4,)
    assert np.isfinite(np.asarray(out["R_err"])).all()


def test_rotation_modes(rng):
    for mode in ("matrix", "quat", "6d"):
        cfg = RegressorConfig(num_sample=16, d_model=32, nhead=2, rotation_mode=mode)
        model = MkptsRegModel(cfg)
        m0 = jnp.asarray(rng.uniform(0, 1, (2, 16, 2)), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), m0, m0)
        t, R = model.apply(params, m0, m0)
        assert t.shape == (2, 3)
        assert R.shape == (2, 3, 3)
        if mode != "matrix":  # quat/6d heads produce orthonormal rotations
            eye = np.einsum("bij,bkj->bik", np.asarray(R), np.asarray(R))
            np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-4)


def test_mkpts_vim_mode_trains_with_frozen_vim(rng):
    """net_mode='mkpts+vim' (model0606.py MoCoPE): VisionMamba image branch,
    frozen — no gradient reaches vim params; the rest of the model descends."""
    cfg = RegressorConfig(
        num_sample=16, d_model=32, nhead=2, net_mode="mkpts+vim",
        vim_size="test", lr=2e-3,
    )
    model = MkptsRegModel(cfg)
    batch = _tiny_batch(rng, B=2, N=16)
    batch["img0"] = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)
    batch["img1"] = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        (batch["mkpts0"], batch["mkpts1"], batch["img0"], batch["img1"]), cfg,
    )
    assert "vim" in state.params, list(state.params)

    def loss_of(params):
        t, R = model.apply({"params": params}, batch["mkpts0"], batch["mkpts1"], batch["img0"], batch["img1"])
        loss, _ = pose_loss(t, R, batch["gt_t"], batch["gt_R"])
        return loss

    grads = jax.grad(loss_of)(state.params)
    vim_norm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads["vim"]))
    rest = {k: v for k, v in grads.items() if k != "vim"}
    rest_norm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(rest))
    assert vim_norm == 0.0, "vim must be frozen (stop_gradient)"
    assert rest_norm > 0.0

    step = jax.jit(train_step)
    losses = []
    for i in range(12):
        state, metrics = step(state, batch, jax.random.fold_in(jax.random.PRNGKey(1), i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all() and min(losses[1:]) < losses[0], losses


def test_transformer_fusion_mode(rng):
    """cfg.fusion='transformer' (model0604.py MoCoPE's nn.Transformer pair):
    builds, runs, and descends in 'mkpts+imgs' mode."""
    cfg = RegressorConfig(
        num_sample=16, d_model=32, nhead=2, net_mode="mkpts+imgs",
        fusion="transformer", fusion_layers=1, lr=2e-3,
    )
    model = MkptsRegModel(cfg, cnn_name="atto")
    batch = _tiny_batch(rng, B=2, N=16)
    batch["img0"] = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)
    batch["img1"] = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        (batch["mkpts0"], batch["mkpts1"], batch["img0"], batch["img1"]), cfg,
    )
    assert any("fuse_mkpts_q" in k for k in state.params), list(state.params)
    assert "enc0_attn" in state.params["fuse_mkpts_q"]
    step = jax.jit(train_step)
    losses = []
    for i in range(12):
        state, metrics = step(state, batch, jax.random.fold_in(jax.random.PRNGKey(1), i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all() and min(losses[1:]) < losses[0], losses


def test_pose_loss_zero_at_gt(rng):
    t = jnp.asarray(rng.normal(0, 1, (3, 3)), jnp.float32)
    R = jnp.broadcast_to(jnp.eye(3), (3, 3, 3))
    loss, (tl, rl) = pose_loss(t, R, t, R)
    assert float(tl) < 1e-10
    assert float(rl) < 2e-3  # geodesic clamp floor


def test_dinov2_poser_forward_and_loss(rng):
    from pope_tpu.config import DinoV2Config
    from pope_tpu.models.regressor.dinov2_poser import DINOv2Poser, posenet_loss
    from scipy.spatial.transform import Rotation

    cfg = DinoV2Config(img_size=28, patch_size=14, embed_dim=32, depth=1, num_heads=2)
    model = DINOv2Poser(dinov2=cfg, token_dim=32, nhead=2, depth=1)
    x0 = jnp.asarray(rng.normal(0, 1, (2, 28, 28, 3)), jnp.float32)
    x1 = jnp.asarray(rng.normal(0, 1, (2, 28, 28, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0, x1)
    t, quat = jax.jit(model.apply)(params, x0, x1)
    assert t.shape == (2, 3) and quat.shape == (2, 4)
    gt_R = jnp.asarray(Rotation.random(2, random_state=0).as_matrix(), jnp.float32)
    gt_t = jnp.asarray(rng.normal(0, 1, (2, 3)), jnp.float32)
    loss = float(posenet_loss(t, quat, gt_t, gt_R))
    assert np.isfinite(loss) and loss > 0
