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
    # (B,) count of true mutual-NN matches the static capacity truncated
    # ("no silent caps": the reference has no cap, so saturation must be
    # observable in eval records rather than silently dropping matches)
    n_dropped: jnp.ndarray = None


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
    # capacity-saturation telemetry: true matches minus kept matches
    n_true = jnp.sum(score > 0.0, axis=1)
    n_dropped = n_true - jnp.sum(valid, axis=1)
    return CoarseMatches(i_ids=i_ids, j_ids=j_ids, mconf=mconf, valid=valid,
                         n_dropped=n_dropped)


def sinkhorn_confidence(feat_c0, feat_c1, bin_score, iters: int = 3, prefilter: bool = True):
    """Optimal-transport coarse assignment with a learned dustbin
    (coarse_matching.py:121-143 semantics; the log-domain Sinkhorn is the
    SuperGlue transport with uniform marginals where real rows/cols carry
    mass 1 and the dustbin carries the opposite side's count).

    feat: (B, L, C) / (B, S, C); bin_score: learned scalar.
    Returns (B, L, S) confidence (dustbin row/col stripped). With
    `prefilter`, rows/cols whose transport argmax is the dustbin are zeroed
    (the reference's eval-time skh_prefilter, cvpr_ds_config.py:38).
    """
    B, L, C = feat_c0.shape
    S = feat_c1.shape[1]
    sim = jnp.einsum("blc,bsc->bls", feat_c0 / (C**0.5), feat_c1 / (C**0.5))

    alpha = jnp.asarray(bin_score, sim.dtype)
    bins0 = jnp.broadcast_to(alpha, (B, L, 1))
    bins1 = jnp.broadcast_to(alpha, (B, 1, S))
    corner = jnp.broadcast_to(alpha, (B, 1, 1))
    Z = jnp.concatenate(
        [jnp.concatenate([sim, bins0], -1), jnp.concatenate([bins1, corner], -1)], 1
    )  # (B, L+1, S+1)

    ms, ns = float(L), float(S)
    norm = -jnp.log(ms + ns)
    log_mu = jnp.concatenate([jnp.full((L,), norm), jnp.asarray([jnp.log(ns) + norm])])
    log_nu = jnp.concatenate([jnp.full((S,), norm), jnp.asarray([jnp.log(ms) + norm])])

    def body(carry, _):
        u, v = carry
        u = log_mu[None] - jax.nn.logsumexp(Z + v[:, None, :], axis=2)
        v = log_nu[None] - jax.nn.logsumexp(Z + u[:, :, None], axis=1)
        return (u, v), None

    u0 = jnp.zeros((B, L + 1), Z.dtype)
    v0 = jnp.zeros((B, S + 1), Z.dtype)
    (u, v), _ = jax.lax.scan(body, (u0, v0), None, length=iters)
    log_assign = Z + u[:, :, None] + v[:, None, :] - norm
    assign = jnp.exp(log_assign)  # (B, L+1, S+1)
    conf = assign[:, :L, :S]
    if prefilter:
        row_bin = jnp.argmax(assign[:, :L, :], axis=2) == S  # (B, L)
        col_bin = jnp.argmax(assign[:, :, :S], axis=1) == L  # (B, S)
        conf = conf * (~row_bin[:, :, None]) * (~col_bin[:, None, :])
    return conf


def gt_pad_matches(cm: CoarseMatches, gt_valid, gt_j_of_i, gt_min: int, key=None) -> CoarseMatches:
    """Train-time GT padding of the fine-stage sample set
    (coarse_matching.py:200-236 semantics, static-shape):

    The last `gt_min` capacity slots — plus every slot whose prediction is
    invalid — are replaced by ground-truth coarse matches, so the fine stage
    always trains on supervised windows even when early predictions are noise.
    GT paddings get mconf=0 like the reference (:230). Predictions keep their
    top-confidence order (the reference randomly subsamples; top-conf is the
    deterministic analogue).

    gt_valid: (B, L) bool rows with a GT match; gt_j_of_i: (B, L) the GT
    column per row; key: optional PRNG key to randomize which GT matches pad.
    """
    B, M = cm.i_ids.shape
    L = gt_valid.shape[1]
    if key is not None:
        noise = jax.random.uniform(key, (B, L))
    else:
        # cheap deterministic hash noise: avoid always padding top-left cells
        h = jnp.arange(L, dtype=jnp.uint32) * jnp.uint32(2654435761)  # Knuth
        noise = ((h % jnp.uint32(65536)).astype(jnp.float32) / 65536.0)[None, :] * jnp.ones((B, 1))
    gt_score = jnp.where(gt_valid, 1.0 + noise, -1.0)
    k = min(M, L)
    gt_top, gt_rows = jax.lax.top_k(gt_score, k)  # (B, k) best GT rows
    if k < M:  # capacity exceeds grid size: cycle
        reps = -(-M // k)
        gt_top = jnp.tile(gt_top, (1, reps))[:, :M]
        gt_rows = jnp.tile(gt_rows, (1, reps))[:, :M]
    gt_ok = gt_top > 0.0
    gt_cols = jnp.take_along_axis(gt_j_of_i, gt_rows, axis=1)

    slot = jnp.arange(M)
    use_gt = (slot[None, :] >= M - gt_min) | ~cm.valid
    # k-th GT slot takes the k-th ranked GT match, cycling when there are
    # fewer GT matches than slots (the reference pads by sampling WITH
    # replacement, coarse_matching.py:226-229)
    gt_rank = jnp.clip(jnp.cumsum(use_gt.astype(jnp.int32), axis=1) - 1, 0, M - 1)
    n_gt = jnp.sum(gt_valid, axis=1, keepdims=True)
    gt_rank = jnp.where(n_gt > 0, gt_rank % jnp.maximum(n_gt, 1), gt_rank)
    gi = jnp.take_along_axis(gt_rows, gt_rank, axis=1)
    gj = jnp.take_along_axis(gt_cols, gt_rank, axis=1)
    gv = jnp.take_along_axis(gt_ok, gt_rank, axis=1)
    return CoarseMatches(
        i_ids=jnp.where(use_gt, gi, cm.i_ids),
        j_ids=jnp.where(use_gt, gj, cm.j_ids),
        mconf=jnp.where(use_gt, 0.0, cm.mconf),
        valid=jnp.where(use_gt, gv, cm.valid),
        n_dropped=cm.n_dropped,
    )


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
