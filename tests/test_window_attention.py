"""Parity tests for the fused windowed-attention Pallas kernel
(ops/window_attention.py) against the einsum math it replaces
(models/sam/encoder.py `_attention_with_rel_pos`, the window branch —
behavioral spec segment_anything/modeling/image_encoder.py:187-239,
326-360). Runs in interpret mode on the CPU test platform."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pope_tpu.ops.window_attention import windowed_attention_relpos


def _make(seed, BW, N, NH, D, HW, dtype):
    C = NH * D
    rng = np.random.default_rng(seed)
    qkv = jnp.asarray(rng.standard_normal((BW, N, 3 * C)).astype(np.float32), dtype)
    rel = jnp.asarray(rng.standard_normal((2 * HW - 1, D)).astype(np.float32) * 0.2)
    center = HW - 1
    idx = jnp.arange(HW)[:, None] - jnp.arange(HW)[None, :] + center
    return qkv, rel[idx]  # R: (HW, HW, D)


def _einsum_ref(qkv, R, BW, N, NH, D, HW):
    """The shipped einsum windowed-attention math, verbatim."""
    C = NH * D
    q = qkv[..., :C].reshape(BW, N, NH, D)
    k = qkv[..., C:2 * C].reshape(BW, N, NH, D)
    v = qkv[..., 2 * C:].reshape(BW, N, NH, D)
    r_q = q.reshape(BW, HW, HW, NH, D)
    rel_h = jnp.einsum("bhwnc,hkc->bnhwk", r_q, R.astype(q.dtype))
    rel_w = jnp.einsum("bhwnc,wkc->bnhwk", r_q, R.astype(q.dtype))
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * (D ** -0.5), k)
    bias = (rel_h[..., :, None] + rel_w[..., None, :]).reshape(BW, NH, N, N)
    attn = jax.nn.softmax(
        (logits + bias.astype(logits.dtype)).astype(jnp.float32), axis=-1
    ).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
    return out.reshape(BW, N, C), (rel_h, rel_w)


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-6), (jnp.bfloat16, 0.08)])
def test_kernel_matches_einsum_math(dtype, tol):
    BW, N, NH, D, HW = 5, 196, 4, 80, 14
    qkv, R = _make(0, BW, N, NH, D, HW, dtype)
    ref, (rel_h, rel_w) = _einsum_ref(qkv, R, BW, N, NH, D, HW)
    out = windowed_attention_relpos(
        qkv, rel_h.reshape(BW, NH, N, HW), rel_w.reshape(BW, NH, N, HW),
        NH, D, HW, HW, interpret=True,
    )
    assert out.shape == ref.shape and out.dtype == qkv.dtype
    dev = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32)).max()
    # bf16: the kernel keeps logits+bias in f32 where the einsum path rounds
    # them to bf16 before the softmax, so the tolerance is the einsum path's
    # own bf16 logit rounding; f32: identical math, mere reassociation.
    assert dev < tol, dev


def test_kernel_closer_to_exact_than_einsum_path():
    """The fused kernel must not be an accuracy regression: vs exact f32
    attention its bf16 output error is at most the einsum path's (in
    practice ~2x smaller — f32 logits vs bf16-rounded logits)."""
    BW, N, NH, D, HW = 5, 196, 4, 80, 14
    C = NH * D
    qkv, R = _make(1, BW, N, NH, D, HW, jnp.bfloat16)
    ref, (rel_h, rel_w) = _einsum_ref(qkv, R, BW, N, NH, D, HW)
    out = windowed_attention_relpos(
        qkv, rel_h.reshape(BW, NH, N, HW), rel_w.reshape(BW, NH, N, HW),
        NH, D, HW, HW, interpret=True,
    )
    qkv32, R32 = qkv.astype(jnp.float32), R.astype(jnp.float32)
    exact, _ = _einsum_ref(qkv32, R32, BW, N, NH, D, HW)
    exact = np.asarray(exact, np.float32)
    err_kernel = np.abs(np.asarray(out, np.float32) - exact).max()
    err_einsum = np.abs(np.asarray(ref, np.float32) - exact).max()
    assert err_kernel <= err_einsum * 1.05, (err_kernel, err_einsum)


def test_encoder_fused_flag_inert_off_tpu():
    """On the CPU test platform the fused_window_attention flag must not
    change the encoder's numbers (the gate requires the tpu backend)."""
    from pope_tpu.config import SamEncoderConfig
    from pope_tpu.models.sam.encoder import ImageEncoderViT

    base = dict(
        img_size=64, patch_size=16, embed_dim=32, depth=2, num_heads=2,
        out_chans=16, window_size=2, global_attn_indexes=(1,),
        dtype="float32", gelu="erf",
    )
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((1, 64, 64, 3)), jnp.float32
    )
    m0 = ImageEncoderViT(SamEncoderConfig(**base, fused_window_attention=False))
    v0 = m0.init(jax.random.PRNGKey(0), x)
    y0 = m0.apply(v0, x)
    m1 = ImageEncoderViT(SamEncoderConfig(**base, fused_window_attention=True))
    y1 = m1.apply(v0, x)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
