"""Novel-view synthesis: per-scene NeRF, fully jittable on TPU.

Replaces the reference's novel-view application (src/novel_view_render.py),
which renders LINEMOD sequences through an external pretrained GNT package
(broken import there, :8-13). A generalizable transformer renderer without
its released weights is dead code, so the TPU rebuild ships a self-contained
per-scene radiance field instead: train on the sequence's posed source views
(the same poses_ba/intrin_ba inputs, :46-61), then volume-render the target
views (:119-137 semantics — coarse stratified + fine importance sampling).

TPU-native design: one jitted Adam train step over random ray batches (all
ops static-shape; stratified AND importance resampling via sorted inverse-CDF
with fixed sample counts), bf16 MLP matmuls with f32 integration, and a
batched render loop that fills the MXU with (rays x samples) token batches.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class NerfConfig:
    n_freq_xyz: int = 10
    n_freq_dir: int = 4
    hidden: int = 128
    depth: int = 6
    skip_at: int = 3
    n_coarse: int = 64
    n_fine: int = 64  # N_importance=64 like the reference call (:111)
    lr: float = 5e-4
    ray_batch: int = 2048
    white_bkgd: bool = False
    dtype: str = "bfloat16"


def positional_encoding(x, n_freq: int):
    """[sin(2^k x), cos(2^k x)] for k < n_freq, plus identity."""
    freqs = 2.0 ** jnp.arange(n_freq, dtype=jnp.float32)
    ang = x[..., None, :] * freqs[:, None]  # (..., n_freq, D)
    enc = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    return jnp.concatenate([x, enc.reshape(*x.shape[:-1], -1)], axis=-1)


class NerfMLP(nn.Module):
    cfg: NerfConfig = NerfConfig()

    @nn.compact
    def __call__(self, xyz, viewdir):
        """xyz (..., 3) scene-normalized; viewdir (..., 3) unit.
        Returns (sigma (..., 1) raw, rgb (..., 3) in [0, 1])."""
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        h = positional_encoding(xyz, cfg.n_freq_xyz).astype(dt)
        inp = h
        for i in range(cfg.depth):
            if i == cfg.skip_at:
                h = jnp.concatenate([h, inp], axis=-1)
            h = nn.Dense(cfg.hidden, dtype=dt, name=f"lin{i}")(h)
            h = nn.relu(h)
        sigma = nn.Dense(1, dtype=jnp.float32, name="sigma")(h)
        feat = nn.Dense(cfg.hidden, dtype=dt, name="feat")(h)
        d = positional_encoding(viewdir, cfg.n_freq_dir).astype(dt)
        h = jnp.concatenate([feat, d], axis=-1)
        h = nn.relu(nn.Dense(cfg.hidden // 2, dtype=dt, name="rgb_hidden")(h))
        rgb = nn.sigmoid(nn.Dense(3, dtype=jnp.float32, name="rgb")(h))
        return sigma, rgb


def make_rays(K: np.ndarray, pose_w2c: np.ndarray, hw: Tuple[int, int]):
    """Pixel-center rays in world coords from a 3x3 K and 3x4/4x4 [R|t]
    world->camera pose (the LINEMOD poses_ba convention the reference loads
    at novel_view_render.py:46-48). Returns origins (H, W, 3), dirs (H, W, 3)
    (unit)."""
    H, W = hw
    R = np.asarray(pose_w2c)[:3, :3]
    t = np.asarray(pose_w2c)[:3, 3]
    cam_center = -R.T @ t
    xs, ys = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
    pix = np.stack([xs, ys, np.ones_like(xs)], -1)  # (H, W, 3)
    d_cam = pix @ np.linalg.inv(np.asarray(K)).T
    d_world = d_cam @ R  # R^T @ d per pixel
    d_world = d_world / np.linalg.norm(d_world, axis=-1, keepdims=True)
    origins = np.broadcast_to(cam_center, d_world.shape)
    return origins.astype(np.float32), d_world.astype(np.float32)


def _volume_render(sigma, rgb, ts, dirs_norm, white_bkgd: bool):
    """sigma (R, S, 1) raw, rgb (R, S, 3), ts (R, S) sorted depths.
    Standard quadrature: alpha_i = 1 - exp(-relu(sigma) * delta_i)."""
    delta = jnp.diff(ts, axis=-1)
    delta = jnp.concatenate([delta, jnp.full_like(delta[..., :1], 1e10)], -1)
    delta = delta * dirs_norm[..., None]
    a = 1.0 - jnp.exp(-nn.relu(sigma[..., 0]) * delta)  # (R, S)
    trans = jnp.cumprod(1.0 - a + 1e-10, axis=-1)
    trans = jnp.concatenate([jnp.ones_like(trans[..., :1]), trans[..., :-1]], -1)
    w = a * trans  # (R, S)
    out = jnp.sum(w[..., None] * rgb, axis=-2)
    acc = jnp.sum(w, axis=-1)
    depth = jnp.sum(w * ts, axis=-1)
    if white_bkgd:
        out = out + (1.0 - acc[..., None])
    return out, w, depth


def _sample_pdf(rng, ts_mid, weights, n_fine: int):
    """Importance-sample n_fine depths from the coarse weight histogram
    (inverse-CDF, deterministic bin centers + stratified jitter; static
    shapes throughout)."""
    w = weights[..., 1:-1] + 1e-5  # (R, S-2)
    pdf = w / jnp.sum(w, -1, keepdims=True)
    cdf = jnp.concatenate([jnp.zeros_like(pdf[..., :1]), jnp.cumsum(pdf, -1)], -1)
    u = (jnp.arange(n_fine, dtype=jnp.float32) + 0.5) / n_fine
    u = u[None, :] + (jax.random.uniform(rng, (cdf.shape[0], n_fine)) - 0.5) / n_fine
    u = jnp.clip(u, 0.0, 1.0)
    # per-ray searchsorted (vmap keeps it batched on device)
    idx = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.clip(idx - 1, 0, cdf.shape[-1] - 1)
    above = jnp.clip(idx, 0, cdf.shape[-1] - 1)
    cdf_b = jnp.take_along_axis(cdf, below, -1)
    cdf_a = jnp.take_along_axis(cdf, above, -1)
    bins_b = jnp.take_along_axis(ts_mid, jnp.clip(below, 0, ts_mid.shape[-1] - 1), -1)
    bins_a = jnp.take_along_axis(ts_mid, jnp.clip(above, 0, ts_mid.shape[-1] - 1), -1)
    denom = jnp.where(cdf_a - cdf_b < 1e-5, 1.0, cdf_a - cdf_b)
    frac = (u - cdf_b) / denom
    return bins_b + frac * (bins_a - bins_b)


def render_rays(model: NerfMLP, params, origins, dirs, near, far, rng,
                deterministic: bool = False):
    """origins/dirs (R, 3); returns dict with 'rgb' (R, 3), 'depth' (R,).
    Coarse stratified pass + fine importance pass through the SAME field
    (single-net, like the reference's single_net default)."""
    cfg = model.cfg
    R = origins.shape[0]
    r1, r2 = jax.random.split(rng)
    edges = jnp.linspace(0.0, 1.0, cfg.n_coarse + 1)
    lo, hi = edges[:-1], edges[1:]
    if deterministic:
        tmids = (lo + hi) / 2.0
        ts = near[..., None] + (far - near)[..., None] * tmids[None, :]
    else:
        u = jax.random.uniform(r1, (R, cfg.n_coarse))
        ts = near[..., None] + (far - near)[..., None] * (lo[None] + u * (hi - lo)[None])
    dn = jnp.linalg.norm(dirs, axis=-1)
    dhat = dirs / dn[..., None]

    def field(ts_):
        pts = origins[:, None, :] + dirs[:, None, :] * ts_[..., None]
        sigma, rgb = model.apply({"params": params}, pts, jnp.broadcast_to(dhat[:, None, :], pts.shape))
        return sigma, rgb

    sigma, rgb = field(ts)
    out_c, w, _ = _volume_render(sigma, rgb, ts, dn, cfg.white_bkgd)

    if cfg.n_fine > 0:
        ts_mid = 0.5 * (ts[..., 1:] + ts[..., :-1])
        ts_f = _sample_pdf(r2, ts_mid, jax.lax.stop_gradient(w), cfg.n_fine)
        ts_all = jnp.sort(jnp.concatenate([ts, ts_f], -1), axis=-1)
        sigma, rgb = field(ts_all)
        out_f, w_all, depth = _volume_render(sigma, rgb, ts_all, dn, cfg.white_bkgd)
        return {"rgb": out_f, "rgb_coarse": out_c, "depth": depth}
    return {"rgb": out_c, "rgb_coarse": out_c, "depth": jnp.sum(w * ts, -1)}


class NerfState(NamedTuple):
    step: jnp.ndarray
    params: dict
    opt_state: tuple


def init_nerf(cfg: NerfConfig, rng) -> Tuple[NerfMLP, NerfState]:
    import optax

    model = NerfMLP(cfg)
    params = model.init(rng, jnp.zeros((1, 3)), jnp.zeros((1, 3)))["params"]
    tx = optax.adam(cfg.lr)
    return model, NerfState(jnp.zeros((), jnp.int32), params, tx.init(params))


def train_nerf(model: NerfMLP, state: NerfState, rays_o, rays_d, rgbs,
               near: float, far: float, n_steps: int, rng,
               log_every: int = 0):
    """Optimize the field on flattened source-view rays (N, 3)/(N, 3)/(N, 3).
    One jitted step; rays are gathered on device per batch."""
    import optax

    cfg = model.cfg
    tx = optax.adam(cfg.lr)
    N = rays_o.shape[0]

    def step_fn(state, rng):
        r_idx, r_render = jax.random.split(rng)
        idx = jax.random.randint(r_idx, (cfg.ray_batch,), 0, N)

        def loss_fn(params):
            out = render_rays(
                model, params, rays_o[idx], rays_d[idx],
                jnp.full((cfg.ray_batch,), near), jnp.full((cfg.ray_batch,), far),
                r_render,
            )
            tgt = rgbs[idx]
            return jnp.mean((out["rgb"] - tgt) ** 2) + jnp.mean(
                (out["rgb_coarse"] - tgt) ** 2
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt2 = tx.update(grads, state.opt_state, state.params)
        return NerfState(state.step + 1, optax.apply_updates(state.params, updates), opt2), loss

    jstep = jax.jit(step_fn)
    rngs = jax.random.split(rng, n_steps)
    for i in range(n_steps):
        state, loss = jstep(state, rngs[i])
        if log_every and (i + 1) % log_every == 0:
            from pope_tpu.utils.logging import get_logger

            get_logger("pope_tpu.nvs").info(
                "nerf step %d/%d mse=%.5f psnr=%.2f",
                i + 1, n_steps, float(loss), -10 * np.log10(max(float(loss) / 2, 1e-10)),
            )
    return state


def render_image(model: NerfMLP, params, K, pose_w2c, hw, near: float,
                 far: float, chunk: int = 4096):
    """Render a full (H, W, 3) view (deterministic sample placement)."""
    H, W = hw
    o, d = make_rays(K, pose_w2c, hw)
    o = jnp.asarray(o.reshape(-1, 3))
    d = jnp.asarray(d.reshape(-1, 3))
    n = o.shape[0]
    pad = (-n) % chunk
    o = jnp.pad(o, ((0, pad), (0, 0)))
    d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)

    rfn = jax.jit(
        lambda o_, d_: render_rays(
            model, params, o_, d_, jnp.full((chunk,), near), jnp.full((chunk,), far),
            jax.random.PRNGKey(0), deterministic=True,
        )["rgb"]
    )
    outs = [rfn(o[i : i + chunk], d[i : i + chunk]) for i in range(0, n + pad, chunk)]
    img = jnp.concatenate(outs, 0)[:n].reshape(H, W, 3)
    return np.asarray(jnp.clip(img, 0.0, 1.0))
