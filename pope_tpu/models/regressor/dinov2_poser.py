"""DINOv2-feature relative-pose regressor ("DINOv2Poser").

Reference behavior: models/dinov2_regression_model.py:90-140 — frozen DINOv2
patch tokens for both frames, a learnable cls token cross-attended first to
frame-A tokens then to frame-B tokens (LoFTR-style attention layers), and a
7-dof head (translation 3 + quaternion 4); posenet-style loss in
utils/pose_loss.py:5-21. The reference file cannot run (imports the
nonexistent src.loftr, SURVEY.md §2.4); this is the working equivalent on
our DINOv2 + LoFTR-layer stacks.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from pope_tpu.config import DinoV2Config
from pope_tpu.geometry.pose import quat_to_matrix
from pope_tpu.models.dinov2.model import DinoVisionTransformer
from pope_tpu.models.matcher.transformer import LocalFeatureTransformer


class DINOv2Poser(nn.Module):
    """(B, H, W, 3) image pair -> 7-dof (t (3,), quat (4,)) relative pose."""

    dinov2: DinoV2Config = DinoV2Config()
    token_dim: int = 384  # matches the backbone width (ref uses ViT-L/1024)
    nhead: int = 8
    depth: int = 2
    freeze_backbone: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image0, image1):
        backbone = DinoVisionTransformer(self.dinov2, name="dino")
        feaA = backbone(image0)["x_norm_patchtokens"]
        feaB = backbone(image1)["x_norm_patchtokens"]
        if self.freeze_backbone:
            feaA = jax.lax.stop_gradient(feaA)
            feaB = jax.lax.stop_gradient(feaB)

        B = image0.shape[0]
        cls = self.param("cls_token", nn.initializers.normal(0.02), (1, 1, self.token_dim))
        cls_tokens = jnp.broadcast_to(cls, (B, 1, self.token_dim)).astype(feaA.dtype)

        layers = ("self", "cross") * self.depth
        cross_a = LocalFeatureTransformer(
            d_model=self.token_dim, nhead=self.nhead, layer_names=layers,
            attention="linear", dtype=self.dtype, name="cross_attn_a",
        )
        cross_b = LocalFeatureTransformer(
            d_model=self.token_dim, nhead=self.nhead, layer_names=layers,
            attention="linear", dtype=self.dtype, name="cross_attn_b",
        )
        q, _ = cross_a(cls_tokens, feaA)
        q, _ = cross_b(q, feaB)
        h = q[:, 0]
        h = nn.Dense(128, dtype=self.dtype, name="head_fc1")(h)
        h = nn.gelu(h)
        out = nn.Dense(7, dtype=jnp.float32, name="head_fc2")(h)
        t, quat = out[:, :3], out[:, 3:]
        return t, quat


import jax  # noqa: E402  (used for stop_gradient above)


def posenet_loss(pred_t, pred_quat, gt_t, gt_R, beta: float = 500.0):
    """PoseNet-style loss (utils/pose_loss.py:5-21): position MSE +
    normalized-direction MSE + beta-weighted orientation L1 on unit quats."""
    from pope_tpu.geometry.pose import matrix_to_quat

    pos = jnp.mean(jnp.sum((pred_t - gt_t) ** 2, axis=-1))
    dirn = jnp.mean(
        jnp.sum(
            (
                pred_t / jnp.maximum(jnp.linalg.norm(pred_t, axis=-1, keepdims=True), 1e-8)
                - gt_t / jnp.maximum(jnp.linalg.norm(gt_t, axis=-1, keepdims=True), 1e-8)
            )
            ** 2,
            axis=-1,
        )
    )
    q_pred = pred_quat / jnp.maximum(jnp.linalg.norm(pred_quat, axis=-1, keepdims=True), 1e-8)
    q_gt = matrix_to_quat(gt_R)
    # quaternion sign ambiguity
    orient = jnp.mean(
        jnp.minimum(
            jnp.sum(jnp.abs(q_pred - q_gt), axis=-1),
            jnp.sum(jnp.abs(q_pred + q_gt), axis=-1),
        )
    )
    return pos + dirn + beta * orient


def poser_rotation(pred_quat):
    return quat_to_matrix(pred_quat)
