"""bf16 weight storage is bit-identical for the bf16-computing SAM encoder.

The claim in utils/bf16_storage.py: every leaf we cast to bf16 storage is
consumed at bf16 compute precision anyway (flax promote_dtype casts f32 params
to the module dtype before each matmul), so f32-stored and bf16-stored trees
must produce EXACTLY the same outputs — while the f32-consumed LayerNorm
params must be left f32, or outputs would drift.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pope_tpu.config import SamEncoderConfig
from pope_tpu.models.sam.encoder import ImageEncoderViT
from pope_tpu.utils.bf16_storage import cast_sam_storage

TINY = SamEncoderConfig(
    img_size=64,
    patch_size=16,
    embed_dim=32,
    depth=3,
    num_heads=2,
    out_chans=16,
    window_size=2,
    global_attn_indexes=(1,),
    use_flash_attention=False,
    dtype="bfloat16",
)


def _encode(cfg, variables, x):
    return jax.jit(lambda v, xx: ImageEncoderViT(cfg).apply(v, xx))(variables, x)


@pytest.mark.slow  # two full tiny-encoder jits (~15s 1-cpu); the cast also
# runs inside the slow joint gate and the dtype-tree tests stay fast
def test_bf16_storage_bit_identical():
    enc = ImageEncoderViT(TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    v_f32 = enc.init(jax.random.PRNGKey(0), x)
    v_cast = cast_sam_storage({"params": {"image_encoder": v_f32["params"]}}, TINY)
    v_bf16 = {"params": v_cast["params"]["image_encoder"]}

    out_f32 = _encode(TINY, v_f32, x)
    out_bf16 = _encode(TINY, v_bf16, x)
    np.testing.assert_array_equal(np.asarray(out_f32), np.asarray(out_bf16))


def test_layernorm_params_stay_f32():
    enc = ImageEncoderViT(TINY)
    x = jnp.zeros((1, 64, 64, 3))
    # dtype-tree check only: eval_shape traces without compiling/executing
    # init (a real init jit costs ~20s on a busy 1-cpu box)
    shapes = jax.eval_shape(lambda: enc.init(jax.random.PRNGKey(0), x))
    v = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    cast = cast_sam_storage({"params": {"image_encoder": v["params"]}}, TINY)
    p = cast["params"]["image_encoder"]
    # f32-consumed leaves keep f32 storage
    assert p["block_0"]["norm1"]["scale"].dtype == jnp.float32
    assert p["block_0"]["norm2"]["bias"].dtype == jnp.float32
    assert p["neck_ln1"]["weight"].dtype == jnp.float32
    assert p["neck_ln2"]["bias"].dtype == jnp.float32
    # bf16-consumed leaves are cast
    assert p["block_0"]["qkv"]["kernel"].dtype == jnp.bfloat16
    assert p["block_0"]["mlp_lin1"]["kernel"].dtype == jnp.bfloat16
    assert p["block_1"]["rel_pos_h"].dtype == jnp.bfloat16
    assert p["pos_embed"].dtype == jnp.bfloat16
    assert p["patch_embed"]["kernel"].dtype == jnp.bfloat16


@pytest.mark.parametrize("dtype,quantize", [("float32", "none"), ("bfloat16", "int8")])
def test_cast_is_noop_for_f32_or_quantized(dtype, quantize):
    cfg = dataclasses.replace(TINY, dtype=dtype, quantize=quantize)
    v = {"params": {"image_encoder": {"block_0": {"qkv": {"kernel": jnp.ones((4, 4))}}}}}
    out = cast_sam_storage(v, cfg)
    assert out["params"]["image_encoder"]["block_0"]["qkv"]["kernel"].dtype == jnp.float32
