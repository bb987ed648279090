"""DINOv2 vision transformer (flax).

Behavioral spec: dinov2/dinov2/models/vision_transformer.py:45-304
(cls token + patch embed + interpolated pos embed -> pre-norm blocks with
LayerScale -> final LayerNorm; forward_features returns cls/patch tokens),
layers/attention.py:29-60 (fused qkv projection), layers/block.py:36-103,
layers/patch_embed.py (14x14 conv), layers/layer_scale.py, layers/mlp.py.
vit_small = 384 dim / 12 blocks / 6 heads (vision_transformer.py:306);
pretrain config: patch 14, img 518, layerscale 1e-5, qkv bias
(configs/ssl_default_config.yaml:75-80, configs/eval/vits14_pretrain.yaml).

The xformers MemEffAttention CUDA path maps to XLA's fused attention here
(jax.nn.dot_product_attention); token counts in this pipeline are <=1370 so
a flash kernel is unnecessary — SAM's 4096-token encoder is where the Pallas
attention kernel lives.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from pope_tpu.config import DinoV2Config


class Attention(nn.Module):
    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, use_bias=True, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        # plain einsum + f32 softmax: measured 29% faster per block than
        # jax.nn.dot_product_attention at retrieval shapes (256x197 tokens,
        # 6 heads, d=64) on a v5e — at ~200 tokens the fused-attention
        # machinery costs more than the (N, N) logits it avoids
        scale = head_dim**-0.5
        logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        out = out.reshape(B, N, C)
        return nn.Dense(self.dim, use_bias=True, dtype=self.dtype, name="proj")(out)


class LayerScale(nn.Module):
    dim: int
    init_value: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "gamma", nn.initializers.constant(self.init_value), (self.dim,)
        )
        return x * gamma


class DropPath(nn.Module):
    """Per-sample stochastic depth on a residual branch
    (dinov2/layers/drop_path.py:15-24: Bernoulli(1-p) keep mask over the
    batch axis, scaled by 1/keep). The reference's fixed-size-subset
    compute-skipping variant (block.py:110-131) is a CUDA throughput trick;
    on TPU a dynamic batch gather would shuffle dp shards across chips, so
    the mask form — identical in distribution — is the right mapping."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(
            self.make_rng("drop_path"), keep, (x.shape[0],) + (1,) * (x.ndim - 1)
        )
        return x * mask.astype(x.dtype) / keep


class SwiGLUFFNFused(nn.Module):
    """SwiGLU FFN with the reference's fused hidden sizing
    (layers/swiglu_ffn.py:14-63: hidden = round8(2/3 * mlp_hidden); one
    w12 matmul split into gate/value, silu(x1)*x2, w3 out)."""

    dim: int
    mlp_hidden: int  # int(dim * mlp_ratio) BEFORE the 2/3 fusion resize
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = (int(self.mlp_hidden * 2 / 3) + 7) // 8 * 8
        x12 = nn.Dense(2 * hidden, use_bias=True, dtype=self.dtype, name="w12")(x)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        return nn.Dense(self.dim, use_bias=True, dtype=self.dtype, name="w3")(
            nn.silu(x1) * x2
        )


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    init_values: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    drop_path: float = 0.0  # this block's stochastic-depth rate
    ffn_layer: str = "mlp"
    gelu: str = "erf"  # DinoV2Config.gelu; 'erf' = reference-exact

    @nn.compact
    def __call__(self, x, train: bool = False):
        dp = DropPath(self.drop_path, name="drop_path")
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        h = Attention(self.dim, self.num_heads, self.dtype, name="attn")(h)
        x = x + dp(LayerScale(self.dim, self.init_values, name="ls1")(h), not train)
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        hidden = int(self.dim * self.mlp_ratio)
        if self.ffn_layer == "swiglufused":
            h = SwiGLUFFNFused(self.dim, hidden, self.dtype, name="mlp")(h)
        elif self.ffn_layer == "mlp":
            h = nn.Dense(hidden, use_bias=True, dtype=self.dtype, name="mlp_fc1")(h)
            h = nn.gelu(h, approximate=(self.gelu == "tanh"))
            h = nn.Dense(self.dim, use_bias=True, dtype=self.dtype, name="mlp_fc2")(h)
        else:
            raise ValueError(f"unknown ffn_layer {self.ffn_layer!r}")
        x = x + dp(LayerScale(self.dim, self.init_values, name="ls2")(h), not train)
        return x


def _interpolate_pos_embed(pos_embed, grid_hw, patch_grid):
    """Bicubic-resample the (1, 1+N, C) pos embed to a (h, w) patch grid
    (vision_transformer.py:165-189). jax's cubic kernel is Catmull-Rom
    (a=-0.5) vs torch's a=-0.75 — sub-1e-3 differences on smooth embeddings.
    """
    h, w = grid_hw
    n = pos_embed.shape[1] - 1
    side = int(n**0.5)
    cls_pe = pos_embed[:, :1]
    patch_pe = pos_embed[:, 1:].reshape(1, side, side, -1)
    if (h, w) != (side, side):
        patch_pe = jax.image.resize(
            patch_pe, (1, h, w, patch_pe.shape[-1]), method="bicubic"
        )
    return jnp.concatenate([cls_pe, patch_pe.reshape(1, h * w, -1)], axis=1)


class DinoVisionTransformer(nn.Module):
    """forward_features semantics: returns dict with x_norm_clstoken /
    x_norm_patchtokens (vision_transformer.py:221-236)."""

    config: DinoV2Config = DinoV2Config()

    @nn.compact
    def __call__(self, x, masks: Optional[jnp.ndarray] = None, train: bool = False):
        """`masks` (B, gh*gw) bool: replace masked patch embeddings with the
        learnable mask token before pos-embed (iBOT student path,
        vision_transformer.py:191-195). `train=True` enables stochastic
        depth (needs a 'drop_path' rng when drop_path_rate > 0)."""
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        B, H, W, _ = x.shape
        p = cfg.patch_size
        gh, gw = H // p, W // p

        x = nn.Conv(
            cfg.embed_dim, (p, p), strides=(p, p), use_bias=True, dtype=dtype,
            name="patch_embed",
        )(x)
        x = x.reshape(B, gh * gw, cfg.embed_dim)

        mask_token = self.param(
            "mask_token", nn.initializers.zeros, (1, cfg.embed_dim)
        )
        if masks is not None:
            x = jnp.where(masks[..., None], mask_token[None].astype(x.dtype), x)

        cls_token = self.param(
            "cls_token", nn.initializers.normal(1e-6), (1, 1, cfg.embed_dim)
        )
        n_base = (cfg.img_size // p) ** 2
        pos_embed = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, 1 + n_base, cfg.embed_dim)
        )
        x = jnp.concatenate([jnp.broadcast_to(cls_token, (B, 1, cfg.embed_dim)).astype(x.dtype), x], axis=1)
        x = x + _interpolate_pos_embed(pos_embed, (gh, gw), p).astype(x.dtype)

        # per-block stochastic-depth rates: uniform, or the linspace decay
        # rule (vision_transformer.py:104-107)
        if cfg.drop_path_uniform:
            dpr = [cfg.drop_path_rate] * cfg.depth
        else:
            dpr = [
                cfg.drop_path_rate * i / max(cfg.depth - 1, 1)
                for i in range(cfg.depth)
            ]
        for i in range(cfg.depth):
            x = Block(
                cfg.embed_dim, cfg.num_heads, cfg.mlp_ratio, cfg.init_values,
                dtype, drop_path=dpr[i], ffn_layer=cfg.ffn_layer, gelu=cfg.gelu,
                name=f"block_{i}",
            )(x, train=train)

        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x)
        return {
            "x_norm_clstoken": x[:, 0],
            "x_norm_patchtokens": x[:, 1:],
        }


def vit_small(**kw):
    return DinoVisionTransformer(DinoV2Config(embed_dim=384, depth=12, num_heads=6, **kw))


def vit_base(**kw):
    return DinoVisionTransformer(DinoV2Config(embed_dim=768, depth=12, num_heads=12, **kw))


def vit_large(**kw):
    return DinoVisionTransformer(DinoV2Config(embed_dim=1024, depth=24, num_heads=16, **kw))


def vit_giant2(**kw):
    """embed 1536 / 40 blocks / 24 heads (d=64/head), SwiGLU-fused FFN
    (vision_transformer.py:345-361 + the swiglufused ffn_layer its SSL
    configs select)."""
    kw.setdefault("ffn_layer", "swiglufused")
    return DinoVisionTransformer(
        DinoV2Config(embed_dim=1536, depth=40, num_heads=24, **kw)
    )
