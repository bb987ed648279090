"""Vision Mamba (Vim) image encoder, TPU-native.

Reference behavior: pose/vim/models_mamba.py — DeiT-style patch embedding
with a cls token inserted at the middle of the sequence (:387-396),
bidirectional Mamba blocks with RMSNorm (:99-175), selective-state-space
mixing imported from the mamba_ssm CUDA package (:20-28), mean/cls pooling
head. Used frozen as MoCoPE's image branch (pose/model0606.py:86-144).

TPU-native redesign: the CUDA selective-scan kernel becomes a
jax.lax.associative_scan over the linear state recurrence
  h_t = exp(dt_t A) h_{t-1} + dt_t B_t u_t,   y_t = C_t . h_t + D u_t
which XLA parallelizes in O(log L) depth on-chip — no custom kernel needed
at vision sequence lengths. The Triton RMSNorm fusion maps to a plain jnp
RMSNorm that XLA fuses.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VimConfig:
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 384  # vim_small; vim_tiny = 192
    depth: int = 24
    d_state: int = 16
    expand: int = 2
    d_conv: int = 4
    num_classes: int = 1000
    bidirectional: bool = True
    cls_position: str = "middle"  # models_mamba.py inserts cls mid-sequence
    dtype: str = "float32"


def selective_scan(u, delta, A, B, C, D):
    """Parallel selective scan (the mamba_ssm CUDA kernel's math).

    u, delta: (L, Din); A: (Din, N); B, C: (L, N); D: (Din,).
    Returns y: (L, Din).
    """
    # discretize: a_t = exp(dt_t * A) (L, Din, N); b_t = dt*B*u
    dA = jnp.exp(delta[:, :, None] * A[None])  # (L, Din, N)
    dBu = delta[:, :, None] * B[:, None, :] * u[:, :, None]  # (L, Din, N)

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a1 * a2, a2 * b1 + b2

    _, h = jax.lax.associative_scan(combine, (dA, dBu), axis=0)
    y = jnp.sum(h * C[:, None, :], axis=-1)  # (L, Din)
    return y + u * D[None]


class RMSNorm(nn.Module):
    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf**2, axis=-1, keepdims=True)
        return (w * xf * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)


class MambaMixer(nn.Module):
    """One selective-SSM mixer (mamba_simple.Mamba semantics): in_proj ->
    causal depthwise conv1d + SiLU -> (dt, B, C) projections -> selective
    scan -> SiLU-gated output projection. Optionally bidirectional (Vim)."""

    d_model: int
    d_state: int = 16
    expand: int = 2
    d_conv: int = 4
    bidirectional: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B_, L, _ = x.shape
        d_inner = self.expand * self.d_model
        dt_rank = max(self.d_model // 16, 1)

        xz = nn.Dense(2 * d_inner, use_bias=False, dtype=self.dtype, name="in_proj")(x)
        xs, z = jnp.split(xz, 2, axis=-1)  # (B, L, Din) each

        def direction(xs_dir, suffix):
            conv = nn.Conv(
                d_inner, (self.d_conv,), padding=[(self.d_conv - 1, 0)],
                feature_group_count=d_inner, dtype=self.dtype, name=f"conv1d{suffix}",
            )
            h = jax.nn.silu(conv(xs_dir))
            proj = nn.Dense(dt_rank + 2 * self.d_state, use_bias=False, dtype=self.dtype, name=f"x_proj{suffix}")(h)
            dt, Bc, Cc = jnp.split(proj, [dt_rank, dt_rank + self.d_state], axis=-1)
            dt = nn.Dense(d_inner, use_bias=True, dtype=self.dtype, name=f"dt_proj{suffix}")(dt)
            dt = jax.nn.softplus(dt)
            A_log = self.param(
                f"A_log{suffix}",
                lambda k, shape: jnp.log(
                    jnp.broadcast_to(jnp.arange(1, self.d_state + 1, dtype=jnp.float32), shape)
                ),
                (d_inner, self.d_state),
            )
            D = self.param(f"D{suffix}", nn.initializers.ones, (d_inner,))
            A = -jnp.exp(A_log)
            y = jax.vmap(selective_scan, in_axes=(0, 0, None, 0, 0, None))(
                h.astype(jnp.float32), dt.astype(jnp.float32), A,
                Bc.astype(jnp.float32), Cc.astype(jnp.float32), D,
            )
            return y.astype(x.dtype)

        y = direction(xs, "")
        if self.bidirectional:
            y_b = direction(xs[:, ::-1], "_b")[:, ::-1]
            y = y + y_b
        y = y * jax.nn.silu(z)
        return nn.Dense(self.d_model, use_bias=False, dtype=self.dtype, name="out_proj")(y)


class VimBlock(nn.Module):
    d_model: int
    d_state: int
    expand: int
    d_conv: int
    bidirectional: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = RMSNorm(self.d_model, name="norm")(x)
        h = MambaMixer(
            self.d_model, self.d_state, self.expand, self.d_conv,
            self.bidirectional, self.dtype, name="mixer",
        )(h)
        return x + h


class VisionMamba(nn.Module):
    """Vim backbone; returns pooled features (num_classes=0) or logits."""

    config: VimConfig = VimConfig()

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        p = cfg.patch_size
        B = x.shape[0]
        x = nn.Conv(cfg.embed_dim, (p, p), strides=(p, p), dtype=dtype, name="patch_embed")(x)
        gh, gw = x.shape[1:3]
        x = x.reshape(B, gh * gw, cfg.embed_dim)

        cls = self.param("cls_token", nn.initializers.normal(0.02), (1, 1, cfg.embed_dim))
        mid = x.shape[1] // 2
        x = jnp.concatenate(
            [x[:, :mid], jnp.broadcast_to(cls, (B, 1, cfg.embed_dim)).astype(x.dtype), x[:, mid:]],
            axis=1,
        )
        pos = self.param("pos_embed", nn.initializers.normal(0.02), (1, x.shape[1], cfg.embed_dim))
        x = x + pos.astype(x.dtype)

        for i in range(cfg.depth):
            x = VimBlock(
                cfg.embed_dim, cfg.d_state, cfg.expand, cfg.d_conv,
                cfg.bidirectional, dtype, name=f"block_{i}",
            )(x)
        x = RMSNorm(cfg.embed_dim, name="norm_f")(x)
        feat = x[:, mid]  # cls token (middle position)
        if cfg.num_classes:
            return nn.Dense(cfg.num_classes, dtype=jnp.float32, name="head")(feat)
        return feat


def vim_tiny(**kw):
    return VisionMamba(VimConfig(embed_dim=192, depth=24, **kw))


def vim_small(**kw):
    return VisionMamba(VimConfig(embed_dim=384, depth=24, **kw))
