"""Top-level LoFTR-style Matcher (flax), static-shape end to end.

Behavioral spec: src/matcher/matcher.py:29-79 —
backbone -> +pos-enc -> coarse transformer -> dual-softmax coarse matching ->
fine window extraction (+ coarse-feature context) -> fine transformer ->
centre-vs-window sub-pixel refinement. The reference emits ragged match lists;
here every output is a fixed-capacity (B, M, ...) tensor with a validity mask
so the whole matcher jits as one XLA program.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax.numpy as jnp

from pope_tpu.config import MatcherConfig
from pope_tpu.models.matcher.backbone import ResNetFPN
from pope_tpu.models.matcher.matching import (
    coarse_matching,
    dual_softmax_confidence,
    extract_fine_windows,
    fine_matching,
    gt_pad_matches,
    matches_to_coords,
    sinkhorn_confidence,
)
from pope_tpu.models.matcher.transformer import (
    LocalFeatureTransformer,
    sine_position_encoding,
)


class MatchResult(NamedTuple):
    mkpts0: jnp.ndarray  # (B, M, 2) pixel coords in image0
    mkpts1: jnp.ndarray  # (B, M, 2) pixel coords in image1 (sub-pixel refined)
    mconf: jnp.ndarray  # (B, M) confidence; 0 on padded slots
    valid: jnp.ndarray  # (B, M) bool
    expec_f: jnp.ndarray  # (B, M, 3) normalized fine coords + heatmap std
    # (B,) true matches truncated by the static match_capacity (telemetry)
    n_dropped: Optional[jnp.ndarray] = None
    conf_matrix: Optional[jnp.ndarray] = None  # (B, L, S) when return_aux
    i_ids: Optional[jnp.ndarray] = None  # (B, M) coarse ids the fine stage used
    j_ids: Optional[jnp.ndarray] = None  # (B, M)

    @property
    def num_matches(self):
        return jnp.sum(self.valid, axis=-1)

    def strong_match_count(self, thr: float = 0.9):
        """Retrieval vote: count of matches with mconf > thr
        (eval_linemod_json.py:118-119)."""
        return jnp.sum((self.mconf > thr) & self.valid, axis=-1)


class Matcher(nn.Module):
    """Coarse-to-fine matcher over two grayscale images.

    Inputs are NHWC (B, H, W, 1) float in [0, 1]; H, W divisible by 8.
    Shapes of the two images may differ (two backbone invocations — the
    equal-shape case shares one batched invocation like matcher.py:46-48).
    """

    config: MatcherConfig = MatcherConfig()

    @nn.compact
    def __call__(
        self,
        image0,
        image1,
        train: bool = False,
        return_aux: bool = False,
        gt_valid=None,
        gt_j_of_i=None,
        gt_pad_key=None,
    ):
        """gt_valid/gt_j_of_i: train-time GT coarse matches from
        supervision.spvs_coarse — when given, GT matches pad the fine-stage
        sample set (coarse_matching.py:200-236)."""
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        backbone = ResNetFPN(
            initial_dim=cfg.backbone.initial_dim,
            block_dims=tuple(cfg.backbone.block_dims),
            dtype=dtype,
            name="backbone",
        )
        if image0.shape == image1.shape:
            feats_c, feats_f = backbone(jnp.concatenate([image0, image1], 0), train)
            B = image0.shape[0]
            feat_c0, feat_c1 = feats_c[:B], feats_c[B:]
            feat_f0, feat_f1 = feats_f[:B], feats_f[B:]
        else:
            # one-prompt-vs-k-crops: run the prompt backbone ONCE and
            # broadcast its features (the retrieval stage matches one
            # reference against top-k crops; the reference re-runs the full
            # matcher per crop, eval_linemod_json.py:112-122)
            b0, b1 = image0.shape[0], image1.shape[0]
            if b0 == 1 and b1 > 1:
                feat_c0, feat_f0 = backbone(image0, train)
                feat_c0 = jnp.broadcast_to(feat_c0, (b1,) + feat_c0.shape[1:])
                feat_f0 = jnp.broadcast_to(feat_f0, (b1,) + feat_f0.shape[1:])
            else:
                feat_c0, feat_f0 = backbone(image0, train)
            feat_c1, feat_f1 = backbone(image1, train)

        B, h0c, w0c, C = feat_c0.shape
        _, h1c, w1c, _ = feat_c1.shape
        hf0 = feat_f0.shape[1:3]
        L, S = h0c * w0c, h1c * w1c

        pe0 = sine_position_encoding(h0c, w0c, C, cfg.temp_bug_fix)
        pe1 = sine_position_encoding(h1c, w1c, C, cfg.temp_bug_fix)
        f0 = (feat_c0 + pe0[None].astype(feat_c0.dtype)).reshape(B, L, C)
        f1 = (feat_c1 + pe1[None].astype(feat_c1.dtype)).reshape(B, S, C)

        f0, f1 = LocalFeatureTransformer(
            d_model=cfg.coarse.d_model,
            nhead=cfg.coarse.nhead,
            layer_names=tuple(cfg.coarse.layer_names),
            attention=cfg.coarse.attention,
            dtype=dtype,
            name="loftr_coarse",
        )(f0, f1)

        if cfg.match_coarse.match_type == "sinkhorn":
            bin_score = self.param(
                "bin_score",
                lambda _: jnp.asarray(cfg.match_coarse.skh_init_bin_score, jnp.float32),
            )
            conf = sinkhorn_confidence(
                f0.astype(jnp.float32), f1.astype(jnp.float32), bin_score,
                iters=cfg.match_coarse.skh_iters, prefilter=not train,
            )
        else:
            conf = dual_softmax_confidence(
                f0.astype(jnp.float32), f1.astype(jnp.float32), cfg.match_coarse.dsmax_temperature
            )
        cm = coarse_matching(
            conf,
            (h0c, w0c),
            (h1c, w1c),
            thr=cfg.match_coarse.thr,
            border_rm=cfg.match_coarse.border_rm,
            capacity=cfg.match_coarse.match_capacity,
        )
        if gt_valid is not None:
            gt_min = min(
                cfg.match_coarse.train_pad_num_gt_min,
                cfg.match_coarse.match_capacity // 2,
            )
            cm = gt_pad_matches(cm, gt_valid, gt_j_of_i, gt_min, key=gt_pad_key)

        # ---- fine stage ----
        # always f32, even when cfg.dtype is bf16: the fine window transformer
        # is ~12% of the coarse attention FLOPs (M x 25 tokens at d=128), so
        # bf16 buys ~nothing here, while its feature noise lands directly in
        # the sub-pixel expectation (measured +2 deg on the synthetic-harness
        # R median with a fully-bf16 matcher; coarse selection is robust)
        W = cfg.fine_window_size
        WW = W * W
        stride = cfg.coarse_stride // cfg.fine_stride
        d_f = cfg.fine.d_model
        win0 = extract_fine_windows(
            feat_f0.astype(jnp.float32), cm.i_ids, (h0c, w0c), W, stride
        )
        win1 = extract_fine_windows(
            feat_f1.astype(jnp.float32), cm.j_ids, (h1c, w1c), W, stride
        )

        if cfg.fine_concat_coarse_feat:
            # coarse context: project the matched coarse features and merge
            # into every window position (fine_preprocess.py:53-58)
            c0_sel = jnp.take_along_axis(f0, cm.i_ids[..., None], axis=1)  # (B, M, C)
            c1_sel = jnp.take_along_axis(f1, cm.j_ids[..., None], axis=1)
            down = nn.Dense(d_f, use_bias=True, name="fine_down_proj")
            merge = nn.Dense(d_f, use_bias=True, name="fine_merge_feat")
            c0_d = down(c0_sel.astype(jnp.float32))
            c1_d = down(c1_sel.astype(jnp.float32))
            win0 = merge(jnp.concatenate([win0, jnp.broadcast_to(c0_d[..., None, :], win0.shape[:2] + (WW, d_f))], -1))
            win1 = merge(jnp.concatenate([win1, jnp.broadcast_to(c1_d[..., None, :], win1.shape[:2] + (WW, d_f))], -1))

        M = cm.i_ids.shape[1]
        win0_t, win1_t = LocalFeatureTransformer(
            d_model=d_f,
            nhead=cfg.fine.nhead,
            layer_names=tuple(cfg.fine.layer_names),
            attention=cfg.fine.attention,
            name="loftr_fine",
        )(win0.reshape(B * M, WW, d_f), win1.reshape(B * M, WW, d_f))

        coords, std = fine_matching(
            win0_t.reshape(B, M, WW, d_f).astype(jnp.float32),
            win1_t.reshape(B, M, WW, d_f).astype(jnp.float32),
            W,
        )

        scale_c = float(cfg.coarse_stride)
        scale_f = float(cfg.fine_stride)
        mkpts0 = matches_to_coords(cm.i_ids, w0c, scale_c)
        mkpts1_c = matches_to_coords(cm.j_ids, w1c, scale_c)
        # sub-pixel correction in image1 (fine_matching.py:67-74)
        mkpts1 = mkpts1_c + coords * (W // 2) * scale_f
        mkpts1 = jnp.where(cm.valid[..., None], mkpts1, 0.0)
        mkpts0 = jnp.where(cm.valid[..., None], mkpts0, 0.0)

        expec_f = jnp.concatenate([coords, std[..., None]], axis=-1)
        return MatchResult(
            mkpts0=mkpts0,
            mkpts1=mkpts1,
            mconf=cm.mconf,
            valid=cm.valid,
            expec_f=expec_f,
            n_dropped=cm.n_dropped,
            conf_matrix=conf if return_aux else None,
            i_ids=cm.i_ids if return_aux else None,
            j_ids=cm.j_ids if return_aux else None,
        )
