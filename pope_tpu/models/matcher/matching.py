"""Coarse dual-softmax matching and fine sub-pixel refinement, with static
fixed-capacity outputs (TPU-native replacement for the reference's dynamic
torch.where/indexing pipeline).

Behavioral spec: src/matcher/utils/coarse_matching.py:87-196 (dual-softmax
with temperature, border removal, mutual-NN, threshold), loftr_module/
fine_preprocess.py:29-59 (5x5 window unfold + gather + coarse-feature concat),
src/matcher/utils/fine_matching.py:15-74 (center-vs-window correlation softmax
heatmap -> spatial expectation + std). kornia's dsnt.spatial_expectation2d is
reimplemented inline (normalized [-1,1] grid expectation).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class CoarseMatches(NamedTuple):
    i_ids: jnp.ndarray  # (B, M) coarse cell index in image0 grid
    j_ids: jnp.ndarray  # (B, M) coarse cell index in image1 grid
    mconf: jnp.ndarray  # (B, M) confidence, 0 for padded slots
    valid: jnp.ndarray  # (B, M) bool


def dual_softmax_confidence(feat_c0, feat_c1, temperature: float = 0.1):
    """conf = softmax_rows(sim) * softmax_cols(sim), sim = <f0, f1>/sqrt(C)/T.
    (coarse_matching.py:110-119). feat: (B, L, C) / (B, S, C)."""
    C = feat_c0.shape[-1]
    f0 = feat_c0 / (C**0.5)
    f1 = feat_c1 / (C**0.5)
    sim = jnp.einsum("blc,bsc->bls", f0, f1) / temperature
    return jax.nn.softmax(sim, axis=1) * jax.nn.softmax(sim, axis=2)


def _border_mask(h: int, w: int, b: int):
    """(h*w,) bool mask, False within `b` cells of any border
    (coarse_matching.py mask_border)."""
    if b <= 0:
        return jnp.ones((h * w,), bool)
    ys = jnp.arange(h)
    xs = jnp.arange(w)
    ok_y = (ys >= b) & (ys < h - b)
    ok_x = (xs >= b) & (xs < w - b)
    return (ok_y[:, None] & ok_x[None, :]).reshape(-1)


def coarse_matching(
    conf,
    hw0_c,
    hw1_c,
    thr: float = 0.2,
    border_rm: int = 2,
    capacity: int = 1024,
) -> CoarseMatches:
    """Threshold + border-removal + mutual-NN selection with a static cap.

    The reference materializes a ragged (M,) index list via torch.where
    (coarse_matching.py:187-196); here the top-`capacity` rows by confidence
    are selected with lax.top_k and padded slots are masked, so downstream
    stages keep static shapes. Match *sets* are identical whenever the true
    match count <= capacity (matches are mutual-NN so there is at most one
    per row).
    """
    B, L, S = conf.shape
    h0, w0 = hw0_c
    h1, w1 = hw1_c
    keep = conf > thr
    keep &= _border_mask(h0, w0, border_rm)[None, :, None]
    keep &= _border_mask(h1, w1, border_rm)[None, None, :]
    # mutual nearest neighbour
    keep &= conf == jnp.max(conf, axis=2, keepdims=True)
    keep &= conf == jnp.max(conf, axis=1, keepdims=True)

    masked = jnp.where(keep, conf, 0.0)
    j_star = jnp.argmax(masked, axis=2)  # (B, L)
    row_conf = jnp.take_along_axis(masked, j_star[..., None], axis=2)[..., 0]  # (B, L)
    row_valid = jnp.any(keep, axis=2)
    score = jnp.where(row_valid, row_conf, -1.0)

    capacity = min(capacity, L)
    top_conf, i_ids = jax.lax.top_k(score, capacity)  # (B, M)
    j_ids = jnp.take_along_axis(j_star, i_ids, axis=1)
    valid = top_conf > 0.0
    mconf = jnp.where(valid, top_conf, 0.0)
    return CoarseMatches(i_ids=i_ids, j_ids=j_ids, mconf=mconf, valid=valid)


def matches_to_coords(ids, w_c, scale):
    """Grid index -> pixel coords: (i % w, i // w) * scale
    (coarse_matching.py:241-250). Returns (..., 2) [x, y]."""
    x = (ids % w_c).astype(jnp.float32) * scale
    y = (ids // w_c).astype(jnp.float32) * scale
    return jnp.stack([x, y], axis=-1)


def extract_fine_windows(feat_f, ids, hw_c, window: int, stride: int):
    """Gather (W x W) windows of fine features centred at coarse cells.

    Equivalent to F.unfold(kernel=W, stride=`stride`, padding=W//2) followed
    by selection at `ids` (fine_preprocess.py:44-52): window k of the unfold
    is centred at fine pixel k*stride; out-of-bounds taps are zero.

    Args:
      feat_f: (B, Hf, Wf, C) fine features.
      ids: (B, M) coarse cell indices.
      hw_c: (h_c, w_c) coarse grid shape.
      window: odd window size W.
      stride: fine pixels per coarse cell.
    Returns:
      (B, M, W*W, C) windows.
    """
    B, Hf, Wf, C = feat_f.shape
    h_c, w_c = hw_c
    r = window // 2
    cy = (ids // w_c) * stride  # (B, M) centre row in fine grid
    cx = (ids % w_c) * stride
    dy = jnp.arange(-r, r + 1)
    dx = jnp.arange(-r, r + 1)
    oy = jnp.repeat(dy, window)  # (W*W,) row offsets
    ox = jnp.tile(dx, window)
    ry = cy[..., None] + oy[None, None, :]  # (B, M, WW)
    rx = cx[..., None] + ox[None, None, :]
    inb = (ry >= 0) & (ry < Hf) & (rx >= 0) & (rx < Wf)
    ryc = jnp.clip(ry, 0, Hf - 1)
    rxc = jnp.clip(rx, 0, Wf - 1)
    flat = feat_f.reshape(B, Hf * Wf, C)
    gathered = jax.vmap(lambda f, idx: f[idx])(flat, ryc * Wf + rxc)  # (B, M, WW, C)
    return jnp.where(inb[..., None], gathered, 0.0)


def fine_matching(feat_f0_win, feat_f1_win, window: int):
    """Centre-vs-window correlation -> softmax heatmap -> sub-pixel expectation.

    Args:
      feat_f0_win, feat_f1_win: (B, M, WW, C) refined fine windows.
    Returns:
      coords: (B, M, 2) normalized [-1, 1] offsets in image1's window.
      std: (B, M) heatmap standard deviation (sum of per-axis stds).
    (fine_matching.py:43-60)
    """
    WW = window * window
    C = feat_f0_win.shape[-1]
    center = feat_f0_win[..., WW // 2, :]  # (B, M, C)
    sim = jnp.einsum("bmc,bmrc->bmr", center, feat_f1_win) / (C**0.5)
    heat = jax.nn.softmax(sim, axis=-1)  # (B, M, WW)

    # normalized grid in [-1, 1], xy order (kornia create_meshgrid(normalized))
    lin = jnp.linspace(-1.0, 1.0, window)
    gx = jnp.tile(lin, window)  # fast axis = x
    gy = jnp.repeat(lin, window)
    coords = jnp.stack(
        [jnp.sum(heat * gx, axis=-1), jnp.sum(heat * gy, axis=-1)], axis=-1
    )  # (B, M, 2)
    grid2 = jnp.stack([gx, gy], -1) ** 2  # (WW, 2)
    var = jnp.einsum("bmr,rk->bmk", heat, grid2) - coords**2
    std = jnp.sum(jnp.sqrt(jnp.clip(var, 1e-10)), axis=-1)
    return coords, std
