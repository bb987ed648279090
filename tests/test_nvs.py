"""Novel-view synthesis: ray geometry, volume rendering, metric sanity, and
an end-to-end overfit on a tiny synthetic scene through the driver."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pope_tpu.nvs.nerf import (
    NerfConfig, _volume_render, init_nerf, make_rays, render_rays,
)
from pope_tpu.utils.image_metrics import psnr, ssim

pytestmark = pytest.mark.slow  # heavy oracle/e2e surface; core suite skips


def _look_at_pose(cam_pos, target=np.zeros(3)):
    """world->camera [R|t], opencv convention (x right, y down, z forward):
    +z toward `target`, y_cam tracking world +y (image-down)."""
    z = target - cam_pos
    z = z / np.linalg.norm(z)
    down = np.array([0.0, 1.0, 0.0])
    x = np.cross(down, z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z])  # rows = camera axes in world
    t = -R @ cam_pos
    return np.hstack([R, t[:, None]])


def test_make_rays_geometry():
    K = np.array([[50.0, 0, 16], [0, 50.0, 16], [0, 0, 1]])
    cam = np.array([0.0, 0.0, -2.0])
    pose = _look_at_pose(cam)
    o, d = make_rays(K, pose, (32, 32))
    # all origins at the camera center
    np.testing.assert_allclose(o.reshape(-1, 3), np.broadcast_to(cam, (32 * 32, 3)), atol=1e-5)
    # center pixel ray points at the target (origin): (16,16) is the
    # principal point, pixel center at +0.5 -> ray (16.5, 16.5) slightly off
    center_dir = d[16, 16]
    np.testing.assert_allclose(center_dir, [0.005, 0.005, 1.0] / np.linalg.norm([0.005, 0.005, 1.0]), atol=1e-2)
    assert np.allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)


def test_volume_render_opaque_surface():
    """A single opaque sample at a known depth dominates the output color
    and depth."""
    R, S = 4, 16
    ts = jnp.broadcast_to(jnp.linspace(1.0, 2.0, S), (R, S))
    sigma = jnp.full((R, S, 1), -10.0)  # transparent everywhere...
    sigma = sigma.at[:, 8, 0].set(1e4)  # ...except one opaque shell
    rgb = jnp.zeros((R, S, 3)).at[:, 8].set(jnp.asarray([0.2, 0.5, 0.9]))
    out, w, depth = _volume_render(sigma, rgb, ts, jnp.ones((R,)), False)
    np.testing.assert_allclose(np.asarray(out), np.broadcast_to([0.2, 0.5, 0.9], (R, 3)), atol=1e-3)
    np.testing.assert_allclose(np.asarray(depth), ts[:, 8], atol=1e-2)
    np.testing.assert_allclose(np.asarray(jnp.sum(w, -1)), 1.0, atol=1e-3)


def test_render_rays_shapes(rng):
    cfg = NerfConfig(hidden=16, depth=2, skip_at=1, n_coarse=8, n_fine=8,
                     dtype="float32")
    model, state = init_nerf(cfg, jax.random.PRNGKey(0))
    R = 5
    o = jnp.asarray(rng.standard_normal((R, 3)).astype(np.float32))
    d = jnp.asarray(rng.standard_normal((R, 3)).astype(np.float32))
    out = render_rays(model, state.params, o, d, jnp.ones((R,)), 2 * jnp.ones((R,)),
                      jax.random.PRNGKey(1))
    assert out["rgb"].shape == (R, 3)
    assert out["depth"].shape == (R,)
    assert np.isfinite(np.asarray(out["rgb"])).all()


def test_image_metrics():
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (32, 32, 3))
    assert psnr(a, a) == float("inf")
    assert ssim(a, a) == pytest.approx(1.0, abs=1e-6)
    noisy = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1)
    p = psnr(noisy, a)
    assert 15 < p < 25
    s_noisy = ssim(noisy, a)
    noisier = np.clip(a + rng.normal(0, 0.3, a.shape), 0, 1)
    assert ssim(noisier, a) < s_noisy < 1.0


def _render_sphere_view(K, pose, hw, radius=0.5, color=(0.9, 0.3, 0.2)):
    """Analytic ray-traced lambertian-ish sphere at the origin on a gray
    background (test scene ground truth)."""
    o, d = make_rays(K, pose, hw)
    oc = o  # sphere at origin
    b = np.sum(oc * d, -1)
    c = np.sum(oc * oc, -1) - radius**2
    disc = b * b - c
    hit = disc > 0
    t = -b - np.sqrt(np.maximum(disc, 0))
    hit &= t > 0
    pt = o + d * t[..., None]
    shade = np.clip(-np.sum(pt / radius * d, -1), 0, 1)
    img = np.full(hw + (3,), 0.55, np.float32)
    img[hit] = np.asarray(color) * shade[hit][:, None]
    return img


def test_nvs_driver_overfit(tmp_path):
    """End-to-end: 4 posed source views of a synthetic sphere -> short fit ->
    held-out view PSNR beats a mean-image baseline; driver writes the
    reference-format jpg pairs."""
    import cv2

    from pope_tpu.nvs.driver import render_novel_views

    hw = (40, 40)
    K = np.array([[45.0, 0, 20], [0, 45.0, 20], [0, 0, 1]])
    root = tmp_path / "seq"
    for sub in ("color", "poses_ba", "intrin_ba"):
        (root / sub).mkdir(parents=True)
    angles = np.linspace(0, 2 * np.pi, 6, endpoint=False)
    imgs = {}
    for i, a in enumerate(angles):
        cam = np.array([1.6 * np.sin(a), 0.25, -1.6 * np.cos(a)])
        pose = _look_at_pose(cam)
        img = _render_sphere_view(K, pose, hw)
        imgs[i] = img
        cv2.imwrite(str(root / "color" / f"{i}.png"), (img[..., ::-1] * 255).astype(np.uint8))
        np.savetxt(str(root / "poses_ba" / f"{i}.txt"), pose)
        np.savetxt(str(root / "intrin_ba" / f"{i}.txt"), K)

    from pope_tpu.utils.lpips import init_random_params

    cfg = NerfConfig(hidden=32, depth=3, skip_at=2, n_coarse=16, n_fine=16,
                     ray_batch=256, lr=2e-3, dtype="float32")
    results = render_novel_views(
        str(root), source_ids=[0, 1, 2, 4, 5], target_ids=[3],
        out_dir=str(tmp_path / "out"), label="lm-test", cfg=cfg,
        train_steps=150, seed=0, lpips_params=init_random_params(0),
    )
    (idx, p, s, lp), = results
    assert idx == 3
    assert np.isfinite(lp) and lp >= 0
    gt = imgs[3]
    baseline = psnr(np.full_like(gt, gt.mean()), gt)
    assert p > baseline + 2, (p, baseline)
    assert os.path.exists(tmp_path / "out" / "lm-test_gt_pose_3.jpg")
    assert os.path.exists(tmp_path / "out" / "lm-test_gt_3.jpg")
