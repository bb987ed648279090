"""w8a8 QuantDense (ops/quant.py): quantization properties, Dense-output
error bounds, parameter-tree compatibility, and the int8 encoder mode.

The int8 path is opt-in TPU headroom beyond reference parity (the reference
runs f16/f32 torch matmuls); these tests pin the numerical contract the
on-chip speedup rides on.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import flax.linen as nn

from pope_tpu.ops.quant import (
    QuantDense, dense_w8a8, make_dense, quantize_rows, quantize_weight_cols,
)


def test_quantize_rows_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((7, 33, 256)), jnp.float32)
    x8, s = quantize_rows(x)
    assert x8.dtype == jnp.int8 and s.shape == (7, 33, 1)
    # max |error| per element is scale/2; scale = rowmax/127
    err = np.abs(np.asarray(x8, np.float32) * np.asarray(s) - np.asarray(x))
    bound = np.asarray(s)[..., 0] / 2 + 1e-7
    assert (err <= bound[..., None]).all()
    # the row max quantizes to exactly +-127
    assert np.abs(np.asarray(x8)).max(axis=-1).min() == 127


def test_quantize_rows_zero_row():
    x = jnp.zeros((3, 16))
    x8, s = quantize_rows(x)
    assert np.asarray(x8).sum() == 0 and np.isfinite(np.asarray(s)).all()


def test_quantize_weight_cols(rng):
    w = jnp.asarray(rng.standard_normal((128, 64)), jnp.float32)
    w8, s = quantize_weight_cols(w)
    assert w8.dtype == jnp.int8 and s.shape == (1, 64)
    err = np.abs(np.asarray(w8, np.float32) * np.asarray(s) - np.asarray(w))
    assert (err <= np.asarray(s)[0] / 2 + 1e-7).all()


def test_dense_w8a8_matches_f32_dense(rng):
    """End-to-end w8a8 dense vs the exact f32 matmul: relative error on the
    output stays in the ~1% regime for well-conditioned inputs (both
    operands carry <=0.4% per-element quantization noise)."""
    x = jnp.asarray(rng.standard_normal((6, 196, 384)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((384, 512)) / np.sqrt(384), jnp.float32)
    b = jnp.asarray(rng.standard_normal((512,)), jnp.float32)
    ref = x @ w + b
    w8, ws = quantize_weight_cols(w)
    out = dense_w8a8(x, w8, ws, b, jnp.float32)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 2e-2, rel
    cos = float(
        jnp.vdot(out, ref) / (jnp.linalg.norm(out) * jnp.linalg.norm(ref))
    )
    assert cos > 0.999, cos


def test_quantdense_param_tree_matches_dense(rng):
    """Same names/shapes/init as nn.Dense: a variable tree trained for the
    bf16 encoder applies unchanged to the int8 one (and vice versa)."""
    x = jnp.asarray(rng.standard_normal((2, 10, 64)), jnp.float32)
    k = jax.random.PRNGKey(0)
    vq = QuantDense(48).init(k, x)
    vd = nn.Dense(48).init(k, x)
    assert jax.tree_util.tree_structure(vq) == jax.tree_util.tree_structure(vd)
    for a, b in zip(jax.tree_util.tree_leaves(vq), jax.tree_util.tree_leaves(vd)):
        assert a.shape == b.shape and a.dtype == b.dtype
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # cross-application: Dense params through QuantDense
    out_q = QuantDense(48, dtype=jnp.float32).apply(vd, x)
    out_d = nn.Dense(48, dtype=jnp.float32).apply(vd, x)
    rel = float(jnp.linalg.norm(out_q - out_d) / jnp.linalg.norm(out_d))
    assert rel < 3e-2, rel


def test_make_dense():
    assert make_dense("none") is nn.Dense
    assert make_dense("int8") is QuantDense
    with pytest.raises(ValueError):
        make_dense("int4")


@pytest.mark.slow
def test_encoder_int8_mode(rng):
    """The int8 encoder (quantize='int8') applies the SAME variables as the
    bf16 one and tracks its output closely: per-position cosine similarity
    of the final embedding stays high through a multi-block forward (the
    per-matmul ~1% noise does not compound destructively through LayerNorm
    + residuals)."""
    import dataclasses

    from pope_tpu.config import SamEncoderConfig
    from pope_tpu.models.sam.encoder import ImageEncoderViT

    cfg = SamEncoderConfig(
        img_size=128, patch_size=16, embed_dim=64, depth=4, num_heads=4,
        window_size=4, global_attn_indexes=(3,), out_chans=32,
        use_flash_attention=False, dtype="float32", gelu="erf",
    )
    enc = ImageEncoderViT(cfg)
    enc8 = ImageEncoderViT(dataclasses.replace(cfg, quantize="int8"))
    x = jnp.asarray(rng.standard_normal((1, 128, 128, 3)), jnp.float32)
    variables = jax.jit(enc.init)(jax.random.PRNGKey(0), x)
    # identical parameter trees: int8 is a pure apply-time reinterpretation
    v8 = jax.jit(enc8.init)(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v8) == jax.tree_util.tree_structure(variables)

    ref = jax.jit(enc.apply)(variables, x)
    out = jax.jit(enc8.apply)(variables, x)
    assert out.shape == ref.shape
    a = np.asarray(ref, np.float64).reshape(-1, ref.shape[-1])
    b = np.asarray(out, np.float64).reshape(-1, ref.shape[-1])
    cos = np.sum(a * b, -1) / np.maximum(
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1), 1e-12
    )
    assert cos.min() > 0.98, cos.min()
    rel = np.linalg.norm(a - b) / np.linalg.norm(a)
    assert rel < 5e-2, rel
