"""SAM image encoder: ViTDet-style ViT with 14x14 window attention, 4 global
layers, and decomposed relative position bias (flax, NHWC).

Behavioral spec: segment_anything/modeling/image_encoder.py —
`ImageEncoderViT` :17-116 (patch embed + abs pos embed + blocks + 1x1/3x3
neck with channel LayerNorm), `Block` :118-185 (window partition around
attention), `Attention` + decomposed rel-pos :187-239, `window_partition/
unpartition` :242-289, `get_rel_pos`/`add_decomposed_rel_pos` :292-360,
`PatchEmbed` :363-394. Sizes: build_sam.py:13-50 (vit_h: 1280 dim / 32
blocks / 16 heads / global at 7,15,23,31).

TPU notes: all window partitions are static reshapes (64x64 grid padded to
70x70 -> 25 windows of 196 tokens); the rel-pos bias is a static gather +
two einsums. Attention materializes (.., N, N) logits to add the decomposed
bias — compute dtype bfloat16 keeps the 4096-token global layers inside HBM
comfortably; a fused Pallas flash-attention kernel with on-tile rel-pos bias
is the planned upgrade for the global layers.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pope_tpu.config import SamEncoderConfig


class LayerNorm2d(nn.Module):
    """Channel LayerNorm with biased variance (modeling/common.py:31-43);
    in NHWC this is a LayerNorm over the trailing channel axis."""

    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        xf = x.astype(jnp.float32)
        u = jnp.mean(xf, axis=-1, keepdims=True)
        s = jnp.mean((xf - u) ** 2, axis=-1, keepdims=True)
        xf = (xf - u) / jnp.sqrt(s + self.eps)
        return (w * xf + b).astype(x.dtype)


def _rel_pos_table(rel_pos, q_size: int, k_size: int):
    """Index the (2*T-1, d) table at relative coords
    (image_encoder.py:292-325; equal q/k sizes in this pipeline).

    For q_size == k_size the table's center entry is zero displacement, so a
    sub-grid (q_size <= T, the rect-encode eval mode) slices the EXACT
    displacement entries the square-frame compute would use for those token
    pairs. (The reference never hits sub-grid sizes — it always pads to the
    square frame — so its length-interpolation branch is not the spec here.)
    """
    if q_size == k_size:
        center = (rel_pos.shape[0] - 1) // 2
        rel = jnp.arange(q_size)[:, None] - jnp.arange(k_size)[None, :] + center
        return rel_pos[rel]  # (q, k, d)
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(jnp.int32)]  # (q, k, d)


def _attention_with_rel_pos(q, k, v, rel_pos_h, rel_pos_w, hw: Tuple[int, int], use_flash: bool = False):
    """(B, N, nh, d) attention with decomposed rel-pos bias
    (image_encoder.py:326-360). When `use_flash` and the token count is
    large (the 4096-token global layers), the fused Pallas kernel keeps the
    (N, N) logits in VMEM instead of round-tripping them through HBM."""
    B, N, nh, d = q.shape
    H, W = hw

    Rh = _rel_pos_table(rel_pos_h, H, H)  # (H, H, d)
    Rw = _rel_pos_table(rel_pos_w, W, W)
    r_q = q.reshape(B, H, W, nh, d)
    rel_h = jnp.einsum("bhwnc,hkc->bnhwk", r_q, Rh.astype(q.dtype))  # (B, nh, H, W, Hk)
    rel_w = jnp.einsum("bhwnc,wkc->bnhwk", r_q, Rw.astype(q.dtype))

    if use_flash and N >= 1024:
        # global layers (4096 tokens): the streaming kernel keeps the (N, N)
        # logits out of HBM, ~3.6x the XLA materializing path on a v5e
        from pope_tpu.ops.flash_attention import flash_attention_relpos

        qf = q.transpose(0, 2, 1, 3).reshape(B * nh, N, d)
        kf = k.transpose(0, 2, 1, 3).reshape(B * nh, N, d)
        vf = v.transpose(0, 2, 1, 3).reshape(B * nh, N, d)
        out = flash_attention_relpos(
            qf, kf, vf,
            rel_h.reshape(B * nh, N, H), rel_w.reshape(B * nh, N, W), H, W,
        )
        return out.reshape(B, nh, N, d).transpose(0, 2, 1, 3).reshape(B, N, nh * d)

    # windowed layers (N=196): natural-layout einsums — XLA folds the head
    # permutes into the batched matmuls, so nothing materializes a
    # transposed copy (the flash kernel here was NET SLOWER: pallas operands
    # force the q/k/v layout copies the einsum form avoids; measured
    # 6.7 -> 6.0 ms per attention half at (100, 196, 16, 80) on a v5e)
    scale = d**-0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)  # (B, nh, N, N)
    bias = (rel_h[..., :, None] + rel_w[..., None, :]).reshape(B, nh, N, N)
    attn = jax.nn.softmax(
        (logits + bias.astype(logits.dtype)).astype(jnp.float32), axis=-1
    ).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
    return out.reshape(B, N, nh * d)


class EncoderBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float
    window_size: int  # 0 = global
    use_rel_pos: bool
    grid: int  # full feature grid side (img/patch)
    dtype: jnp.dtype = jnp.bfloat16
    use_flash: bool = False
    fused_window: bool = False  # Pallas fused windowed attention (TPU only)
    quantize: str = "none"
    gelu: str = "erf"  # config.py SamEncoderConfig.gelu; 'erf' = reference-exact

    @nn.compact
    def __call__(self, x):
        from pope_tpu.ops.quant import make_dense

        Dense = make_dense(self.quantize)
        B, H, W, C = x.shape
        nh = self.num_heads
        d = C // nh
        shortcut = x
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        # the qkv Dense computes in self.dtype anyway; casting BEFORE the
        # window partition keeps the pad/reshape/transpose chain in bf16
        # (half the HBM traffic of shuffling the f32 LayerNorm output)
        h = h.astype(self.dtype)

        ws = self.window_size
        if ws > 0:
            pad_h = (ws - H % ws) % ws
            pad_w = (ws - W % ws) % ws
            hp = jnp.pad(h, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            Hp, Wp = H + pad_h, W + pad_w
            hp = hp.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
            hp = hp.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)
            q_hw = (ws, ws)
            tokens = hp.reshape(hp.shape[0], ws * ws, C)
        else:
            q_hw = (H, W)
            tokens = h.reshape(B, H * W, C)

        qkv = Dense(3 * C, use_bias=True, dtype=self.dtype, name="qkv")(tokens)

        if self.use_rel_pos:
            side = ws if ws > 0 else self.grid
            rel_pos_h = self.param("rel_pos_h", nn.initializers.zeros, (2 * side - 1, d))
            rel_pos_w = self.param("rel_pos_w", nn.initializers.zeros, (2 * side - 1, d))

        fused_win = (
            self.use_rel_pos and ws > 0 and self.fused_window
            and jax.default_backend() == "tpu"
        )
        if fused_win:
            # windowed layers, fused path: the Pallas kernel consumes qkv in
            # the layout the Dense already produced — no (.., 3, nh, d)
            # reshape copy, no q/k/v slices, no (N, N) logits/bias in HBM.
            # Only the tiny q-projected rel tables are built here (XLA fuses
            # the q column-slice into the einsums).
            from pope_tpu.ops.window_attention import windowed_attention_relpos

            n_tok = ws * ws
            Rh = _rel_pos_table(rel_pos_h, ws, ws).astype(self.dtype)
            Rw = _rel_pos_table(rel_pos_w, ws, ws).astype(self.dtype)
            q4 = qkv[..., :C].reshape(-1, ws, ws, nh, d)
            rel_h = jnp.einsum("bhwnc,hkc->bnhwk", q4, Rh).reshape(-1, nh, n_tok, ws)
            rel_w = jnp.einsum("bhwnc,wkc->bnhwk", q4, Rw).reshape(-1, nh, n_tok, ws)
            attn_out = windowed_attention_relpos(qkv, rel_h, rel_w, nh, d, ws, ws)
        else:
            qkv = qkv.reshape(tokens.shape[0], tokens.shape[1], 3, nh, d)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            if self.use_rel_pos:
                flash_ok = self.use_flash and jax.default_backend() == "tpu"
                attn_out = _attention_with_rel_pos(
                    q, k, v, rel_pos_h, rel_pos_w, q_hw, use_flash=flash_ok
                )
            else:
                attn_out = jax.nn.dot_product_attention(q, k, v).reshape(
                    tokens.shape[0], tokens.shape[1], C
                )
        attn_out = Dense(C, use_bias=True, dtype=self.dtype, name="proj")(attn_out)

        if ws > 0:
            wn = attn_out.reshape(-1, ws, ws, C)
            Hp, Wp = H + pad_h, W + pad_w
            wn = wn.reshape(B, Hp // ws, Wp // ws, ws, ws, C)
            wn = wn.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
            attn_sp = wn[:, :H, :W]
        else:
            attn_sp = attn_out.reshape(B, H, W, C)

        x = shortcut + attn_sp
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        h = Dense(int(C * self.mlp_ratio), dtype=self.dtype, name="mlp_lin1")(h)
        h = nn.gelu(h, approximate=(self.gelu == "tanh"))
        h = Dense(C, dtype=self.dtype, name="mlp_lin2")(h)
        return x + h


class ImageEncoderViT(nn.Module):
    """(B, 1024, 1024, 3) preprocessed image -> (B, 64, 64, out_chans).

    Also accepts RECT frames (B, fh, fw, 3) with fh/fw multiples of the patch
    size and <= img_size (the rect-encode eval mode: a 640x480 frame resized
    to 1024x768 encodes a 48x64 grid — 25% fewer tokens than the square
    frame, which spends them on pure padding). Abs pos embed and the global
    rel-pos tables are sliced, not interpolated, so content tokens see the
    identical per-position parameters the square frame would give them."""

    config: SamEncoderConfig = SamEncoderConfig()

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        grid = cfg.img_size // cfg.patch_size
        x = nn.Conv(
            cfg.embed_dim, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), use_bias=True, dtype=dtype,
            name="patch_embed",
        )(x.astype(dtype))
        pos_embed = self.param(
            "pos_embed", nn.initializers.zeros, (1, grid, grid, cfg.embed_dim)
        )
        gh, gw = x.shape[1:3]
        x = x + pos_embed[:, :gh, :gw].astype(x.dtype)

        for i in range(cfg.depth):
            x = EncoderBlock(
                dim=cfg.embed_dim,
                num_heads=cfg.num_heads,
                mlp_ratio=cfg.mlp_ratio,
                window_size=0 if i in cfg.global_attn_indexes else cfg.window_size,
                use_rel_pos=cfg.use_rel_pos,
                grid=grid,
                dtype=dtype,
                use_flash=cfg.use_flash_attention,
                fused_window=cfg.fused_window_attention,
                quantize=cfg.quantize,
                gelu=cfg.gelu,
                name=f"block_{i}",
            )(x)

        x = nn.Conv(cfg.out_chans, (1, 1), use_bias=False, dtype=dtype, name="neck_conv1")(x)
        x = LayerNorm2d(cfg.out_chans, name="neck_ln1")(x)
        x = nn.Conv(cfg.out_chans, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False, dtype=dtype, name="neck_conv2")(x)
        x = LayerNorm2d(cfg.out_chans, name="neck_ln2")(x)
        return x.astype(jnp.float32)
