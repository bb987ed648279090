"""Relative-pose regressor over matcher keypoints and/or image crops (flax).

Behavioral spec: pose/model0429_mkpts.py:209-350 — NeRF-embedded concatenated
(mkpts0, mkpts1) -> token transformer -> MLP summary -> fusion transformer ->
deep MLP -> translation (3) + rotation head (matrix 9 / quat 4 / 6d 6,
converted to a rotation matrix); net_mode selects the mkpts branch, the
ConvNeXtV2 image branch, or cross-attention fusion of both
(pose/model0604.py MoCoPE is the same shape with an nn.Transformer fusion).

TPU-native redesign notes: the reference flattens all tokens into a
num_sample-dependent MLP (38k-wide dense layer); here a mean-pooled token
summary keeps the parameter count independent of num_sample and the matmuls
MXU-shaped, with the same capability surface (modes, heads, loss).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from pope_tpu.config import RegressorConfig
from pope_tpu.geometry.pose import o6d_to_matrix, quat_to_matrix
from pope_tpu.models.regressor.convnextv2 import ConvNeXtV2
from pope_tpu.models.regressor.embedding import nerf_embedding


class TransformerFusion(nn.Module):
    """Encoder-decoder fusion (the shape of model0604.py MoCoPE's
    nn.Transformer pair used as cross-attention: `fuse(src, tgt)` encodes src
    into memory, then the decoder lets tgt self-attend and cross-attend to
    it)."""

    d_model: int
    nhead: int
    layers: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, tgt, deterministic: bool = True):
        d = self.d_model

        def ffn(x, name):
            h = nn.Dense(2 * d, dtype=self.dtype, name=f"{name}_ffn1")(x)
            h = nn.relu(h)
            return nn.Dense(d, dtype=self.dtype, name=f"{name}_ffn2")(h)

        mem = src
        for i in range(self.layers):  # encoder
            a = nn.MultiHeadDotProductAttention(
                num_heads=self.nhead, qkv_features=d, dtype=self.dtype, name=f"enc{i}_attn"
            )(mem, mem, mem)
            mem = nn.LayerNorm(dtype=jnp.float32, name=f"enc{i}_n1")(mem + a)
            mem = nn.LayerNorm(dtype=jnp.float32, name=f"enc{i}_n2")(mem + ffn(mem, f"enc{i}"))
        out = tgt
        for i in range(self.layers):  # decoder: self + cross + ffn
            a = nn.MultiHeadDotProductAttention(
                num_heads=self.nhead, qkv_features=d, dtype=self.dtype, name=f"dec{i}_self"
            )(out, out, out)
            out = nn.LayerNorm(dtype=jnp.float32, name=f"dec{i}_n1")(out + a)
            c = nn.MultiHeadDotProductAttention(
                num_heads=self.nhead, qkv_features=d, dtype=self.dtype, name=f"dec{i}_cross"
            )(inputs_q=out, inputs_k=mem, inputs_v=mem)
            out = nn.LayerNorm(dtype=jnp.float32, name=f"dec{i}_n2")(out + c)
            out = nn.LayerNorm(dtype=jnp.float32, name=f"dec{i}_n3")(out + ffn(out, f"dec{i}"))
        return out


class CrossAttnBlock(nn.Module):
    """Post-norm cross-attention + FFN block (model0429_mkpts.py:164-207:
    tgt attends to src, residual + LN, FFN, residual + LN)."""

    d_model: int
    nhead: int
    d_ffn: int = 2048
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, tgt, deterministic: bool = True):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, qkv_features=self.d_model, dtype=self.dtype, name="attn"
        )(inputs_q=tgt, inputs_k=src, inputs_v=src)
        tgt = nn.LayerNorm(dtype=jnp.float32, name="norm1")(tgt + attn)
        ffn = nn.Dense(self.d_ffn, dtype=self.dtype, name="ffn1")(tgt)
        ffn = nn.relu(ffn)
        ffn = nn.Dense(self.d_model, dtype=self.dtype, name="ffn2")(ffn)
        return nn.LayerNorm(dtype=jnp.float32, name="norm2")(tgt + ffn)


class MkptsRegModel(nn.Module):
    """Pose regressor; modes 'mkpts' | 'imgs' | 'mkpts+imgs' | 'mkpts+vim' |
    'vim' ('+vim' is model0606.py's MoCoPE: a frozen VisionMamba image
    branch; cfg.fusion='transformer' selects model0604's nn.Transformer-pair
    fusion instead of the 0429 cross-attention blocks).

    Inputs:
      mkpts0, mkpts1: (B, N, 2) matched keypoints (zero-padded to N, the
        collate semantics of pose/utils.py:108-128).
      img0, img1: optional (B, H, W, 3) crops for the image branch.
    Returns:
      (pred_t (B, 3), pred_R (B, 3, 3)).
    """

    config: RegressorConfig = RegressorConfig()
    cnn_name: str = "large"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mkpts0, mkpts1, img0=None, img1=None, deterministic: bool = True):
        cfg = self.config
        mode = cfg.net_mode
        d = cfg.d_model
        tokens = []

        if "mkpts" in mode:
            x = jnp.concatenate([mkpts0, mkpts1], axis=-1)  # (B, N, 4)
            x = nerf_embedding(x, cfg.n_freqs, logscale=False)  # (B, N, 76)
            x = nn.Dense(d, dtype=self.dtype, name="mkpts_in")(x)
            for i in range(2):
                x = CrossAttnBlock(d, cfg.nhead, 2 * d, self.dtype, name=f"mkpts_attn{i}")(x, x, deterministic)
            # summary token: masked tokens are zero-padded; mean pool
            tokens.append(jnp.mean(x, axis=1, keepdims=True))  # (B, 1, d)

        if "imgs" in mode or "vim" in mode:
            if "vim" in mode:
                # model0606.py:86-144: frozen Vim as the image branch; the
                # stop_gradient mirrors requires_grad=False (no signal flows
                # back into the backbone)
                from pope_tpu.models.regressor.vim import VimConfig, VisionMamba

                dim, depth = {"tiny": (192, 24), "small": (384, 24), "test": (32, 2)}[cfg.vim_size]
                vim = VisionMamba(
                    VimConfig(embed_dim=dim, depth=depth, num_classes=0, dtype=str(jnp.dtype(self.dtype))),
                    name="vim",
                )
                f0, f1 = vim(img0), vim(img1)  # (B, dim)
                if cfg.freeze_vim:
                    f0 = jax.lax.stop_gradient(f0)
                    f1 = jax.lax.stop_gradient(f1)
            else:
                cnn = ConvNeXtV2.from_name(self.cnn_name, num_classes=0, dtype=self.dtype, name="cnn")
                f0 = cnn(img0)  # (B, C)
                f1 = cnn(img1)
            f = nn.Dense(d, dtype=self.dtype, name="img_in")(jnp.stack([f0, f1], axis=1))  # (B, 2, d)
            tokens.append(f)

        if len(tokens) == 2:
            tm, ti = tokens
            if cfg.fusion == "transformer":
                # model0604.py MoCoPE: fuse(src, tgt) nn.Transformer pair
                q_m = TransformerFusion(d, cfg.nhead, cfg.fusion_layers, self.dtype, name="fuse_mkpts_q")(ti, tm, deterministic)
                q_i = TransformerFusion(d, cfg.nhead, cfg.fusion_layers, self.dtype, name="fuse_img_q")(tm, ti, deterministic)
            else:
                # cross-attention fusion (model0429_mkpts.py:330-337)
                q_m = CrossAttnBlock(d, cfg.nhead, 2 * d, self.dtype, name="fuse_mkpts_q")(ti, tm, deterministic)
                q_i = CrossAttnBlock(d, cfg.nhead, 2 * d, self.dtype, name="fuse_img_q")(tm, ti, deterministic)
            fused = jnp.concatenate([jnp.mean(q_m, 1), jnp.mean(q_i, 1)], axis=-1)
        else:
            fused = jnp.mean(tokens[0], axis=1)

        h = fused
        for i, width in enumerate((512, 256, 128, 64)):
            h = nn.Dense(width, dtype=self.dtype, name=f"mlp{i}")(h)
            h = nn.leaky_relu(h, negative_slope=0.01)
            if not deterministic:
                h = nn.Dropout(rate=0.1, deterministic=False)(h)

        pred_t = nn.Dense(3, dtype=jnp.float32, name="translation_head")(h)
        rot_dims = {"matrix": 9, "quat": 4, "6d": 6}[cfg.rotation_mode]
        raw = nn.Dense(rot_dims, dtype=jnp.float32, name="rotation_head")(h)
        if cfg.rotation_mode == "matrix":
            pred_R = raw.reshape(-1, 3, 3)
        elif cfg.rotation_mode == "quat":
            pred_R = quat_to_matrix(raw)
        else:
            pred_R = o6d_to_matrix(raw)
        return pred_t, pred_R
