"""SAM two-way transformer + mask decoder (flax).

Behavioral spec: segment_anything/modeling/transformer.py:16-240
(TwoWayTransformer: per-layer sparse self-attn -> token->image cross-attn ->
MLP -> image->token cross-attn, with downsampled internal attention dim;
final token->image attention + LN) and modeling/mask_decoder.py:16-176
(iou token + 4 mask tokens, 2x2 transposed-conv 4x upscaling with channel
LN, per-token hypernetwork MLPs -> mask logits, iou MLP head).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pope_tpu.models.sam.encoder import LayerNorm2d


class DownsampledAttention(nn.Module):
    """q/k/v projections into an internal (possibly downsampled) dim
    (transformer.py:185-240)."""

    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        """q: (Bq, Nq, C), k/v: (Bk, Nk, C) with Bq/Bk either equal or one
        of them 1 (shared side). Size-1 leading dims are NOT materialized to
        the full batch: the projection runs once and the attention einsums
        broadcast — this is what lets the AMG decode hoist block-0's
        image-side projections out of the prompt axis (the dense no-mask
        prompt is identical for every grid point, so the pre-i2t image state
        is too). Output batch = max(Bq, Bk)."""
        internal = self.embedding_dim // self.downsample_rate
        d = internal // self.num_heads
        Bq, Nq, _ = q.shape
        Bk, Nk = k.shape[:2]
        if Bq != Bk and 1 not in (Bq, Bk):
            raise ValueError(f"batch mismatch: q {Bq} vs k/v {Bk} (one must be 1)")
        qp = nn.Dense(internal, dtype=self.dtype, name="q_proj")(q).reshape(Bq, Nq, self.num_heads, d)
        kp = nn.Dense(internal, dtype=self.dtype, name="k_proj")(k).reshape(Bk, Nk, self.num_heads, d)
        vp = nn.Dense(internal, dtype=self.dtype, name="v_proj")(v).reshape(Bk, Nk, self.num_heads, d)
        # einsum + f32 softmax instead of jax.nn.dot_product_attention:
        # measurably faster at the decoder's skinny shapes (<=8 tokens on
        # one side; see the same trade in dinov2/model.py)
        scale = d**-0.5
        if Bq == Bk:
            logits = jnp.einsum("bqhd,bkhd->bhqk", qp * scale, kp)
        elif Bk == 1:
            logits = jnp.einsum("bqhd,khd->bhqk", qp * scale, kp[0])
        else:  # Bq == 1: shared queries against per-batch keys
            logits = jnp.einsum("qhd,bkhd->bhqk", qp[0] * scale, kp)
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(qp.dtype)
        if vp.shape[0] == attn.shape[0]:
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, vp)
        else:
            out = jnp.einsum("bhqk,khd->bqhd", attn, vp[0])
        out = out.reshape(attn.shape[0], Nq, internal)
        return nn.Dense(self.embedding_dim, dtype=self.dtype, name="out_proj")(out)


class TwoWayAttentionBlock(nn.Module):
    embedding_dim: int
    num_heads: int
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    skip_first_layer_pe: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        dim, nh = self.embedding_dim, self.num_heads
        if self.skip_first_layer_pe:
            queries = DownsampledAttention(dim, nh, 1, self.dtype, name="self_attn")(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + DownsampledAttention(dim, nh, 1, self.dtype, name="self_attn")(q, q, queries)
        queries = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + DownsampledAttention(
            dim, nh, self.attention_downsample_rate, self.dtype, name="cross_attn_t2i"
        )(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(queries)

        h = nn.Dense(self.mlp_dim, dtype=self.dtype, name="mlp_lin1")(queries)
        h = nn.relu(h)
        h = nn.Dense(dim, dtype=self.dtype, name="mlp_lin2")(h)
        queries = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm3")(queries + h)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + DownsampledAttention(
            dim, nh, self.attention_downsample_rate, self.dtype, name="cross_attn_i2t"
        )(k, q, queries)
        keys = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    depth: int = 2
    embedding_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        """image_embedding/image_pe: (Bk, h, w, C); point_embedding: (B, N, C).
        Bk == 1 with B > 1 is the shared-image fast path: block 0's
        image-side projections (t2i k/v, i2t q) then run ONCE instead of
        per prompt — numerically the same matmuls, ~half the decode matmul
        FLOPs on the AMG grid (the image state only becomes prompt-dependent
        after block 0's i2t update). Returns (tokens (B, N, C), image state
        (B, hw, C))."""
        Bk, h, w, C = image_embedding.shape
        keys = image_embedding.reshape(Bk, h * w, C)
        key_pe = image_pe.reshape(-1, h * w, C)[:1]  # (1, hw, C), broadcasts
        queries = point_embedding

        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                self.embedding_dim, self.num_heads, self.mlp_dim,
                skip_first_layer_pe=(i == 0), dtype=self.dtype, name=f"layer_{i}",
            )(queries, keys, point_embedding, key_pe)

        q = queries + point_embedding
        k = keys + key_pe
        attn = DownsampledAttention(
            self.embedding_dim, self.num_heads, 2, self.dtype, name="final_attn_t2i"
        )(q, k, keys)
        queries = queries + attn
        queries = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm_final")(queries)
        return queries, keys


class UpConvT(nn.Module):
    """2x2-stride-2 transposed conv with an optional exact-subsample mode.

    Param layout ('kernel' (2,2,in,out) + 'bias') and full-resolution numerics
    are identical to nn.ConvTranspose(features, (2,2), strides=(2,2)) — the
    torch converter and all full-res parity tests are unaffected.

    Because kernel == stride the output blocks never overlap: output pixel
    (2i+a, 2j+b) = x[i,j] @ kernel[1-a,1-b] + bias (lax.conv_transpose with
    transpose_kernel=False flips the taps; verified numerically). So
    `subsample=True` returns ONLY subpixel (0,0) — the exact stride-2
    subsample of the full output — as a plain per-pixel matmul at 1/4 cost.
    Chained through both decoder stages this yields exact stride-4-subsampled
    mask logits at 64x64 (the AMG low-res filter/eval path)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, subsample: bool = False):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (2, 2, x.shape[-1], self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        bias = bias.astype(self.dtype)
        if subsample:
            return jnp.einsum("bhwc,cf->bhwf", x, kernel[1, 1]) + bias
        y = jax.lax.conv_transpose(
            x,
            kernel,
            strides=(2, 2),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=False,
        )
        return y + bias


class HyperMLP(nn.Module):
    """3-layer relu MLP (mask_decoder.py:160-176)."""

    hidden: int
    out: int
    layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers - 1):
            x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name=f"lin{i}")(x))
        return nn.Dense(self.out, dtype=self.dtype, name=f"lin{self.layers - 1}")(x)


class MaskDecoder(nn.Module):
    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    depth: int = 2
    num_heads: int = 8
    mlp_dim: int = 2048
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        image_embeddings,
        image_pe,
        sparse_prompt,
        dense_prompt,
        multimask_output: bool = True,
        subsample: int = 1,
        return_all_tokens: bool = False,
    ):
        """
        image_embeddings: (1 or B, h, w, C); image_pe: (h, w, C);
        sparse_prompt: (B, N, C); dense_prompt: (B, h, w, C).
        Returns (masks (B, K, 4h, 4w), iou_pred (B, K)) with K = 3 when
        multimask_output else 1; return_all_tokens=True returns all 4 mask
        tokens unsliced (the SamOnnxModel surface, utils/onnx.py:123-131,
        whose runtime select_masks needs token 0 AND the multimask slots).

        subsample=4 returns the EXACT stride-4 subsample of the full-res mask
        logits as (B, K, h, w), skipping 15/16 of the upscale compute (see
        UpConvT) — iou_pred is unchanged. Only 1 and 4 are supported.
        """
        C = self.transformer_dim
        num_mask_tokens = self.num_multimask_outputs + 1
        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, C))
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0), (num_mask_tokens, C))

        B = sparse_prompt.shape[0]
        out_tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(out_tokens[None], (B, 1 + num_mask_tokens, C)), sparse_prompt], axis=1
        )

        # natural broadcasting: when dense_prompt is shared (B=1 — the AMG
        # grid's no-mask embedding), src stays (1, h, w, C) and the
        # transformer's shared-image fast path hoists block-0's image-side
        # projections out of the prompt axis (bit-same matmuls, ~2x fewer
        # decode matmul FLOPs)
        src = image_embeddings + dense_prompt
        h, w = src.shape[1:3]

        hs, keys = TwoWayTransformer(
            self.depth, C, self.num_heads, self.mlp_dim, self.dtype, name="transformer"
        )(src, image_pe[None], tokens)
        iou_out = hs[:, 0]
        mask_out = hs[:, 1 : 1 + num_mask_tokens]

        if subsample not in (1, 4):
            raise ValueError(f"subsample must be 1 or 4, got {subsample}")
        sub = subsample == 4
        src2 = keys.reshape(B, h, w, C)
        up = UpConvT(C // 4, dtype=self.dtype, name="up_conv1")(src2, subsample=sub)
        up = LayerNorm2d(C // 4, name="up_ln")(up)
        up = nn.gelu(up, approximate=False)
        up = UpConvT(C // 8, dtype=self.dtype, name="up_conv2")(up, subsample=sub)
        up = nn.gelu(up, approximate=False)  # (B, 4h, 4w, C/8); sub: (B, h, w, C/8)

        hyper = jnp.stack(
            [
                HyperMLP(C, C // 8, dtype=self.dtype, name=f"hyper_{i}")(mask_out[:, i])
                for i in range(num_mask_tokens)
            ],
            axis=1,
        )  # (B, K, C/8)
        masks = jnp.einsum("bkc,bhwc->bkhw", hyper, up)
        iou_pred = HyperMLP(
            self.iou_head_hidden_dim, num_mask_tokens, self.iou_head_depth,
            dtype=self.dtype, name="iou_head",
        )(iou_out)

        if return_all_tokens:
            return masks, iou_pred
        if multimask_output:
            return masks[:, 1:], iou_pred[:, 1:]
        return masks[:, :1], iou_pred[:, :1]
