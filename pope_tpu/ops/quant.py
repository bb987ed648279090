"""w8a8 int8 dense layers for the MXU's double-rate int8 path.

The v5e MXU runs int8xint8->int32 matmuls at 2x the bf16 FLOP rate
(measured on this chip: 374 TOP/s int8 vs 179 TF/s bf16 at SAM-encoder
shapes — 95% / 91% of the respective peaks). `QuantDense` exploits that for
inference: weights are quantized symmetrically per OUTPUT channel and
activations symmetrically per TOKEN (row), the matmul runs int8->int32 on
the MXU, and the two scales multiply back in f32 afterwards. LayerNorm'd
ViT activations are well-conditioned for per-token symmetric quantization;
the error this introduces is bounded by tests (test_quant.py) and the
pipeline keeps it opt-in (`SamEncoderConfig.quantize='int8'`).

Parameter layout is IDENTICAL to `nn.Dense` ("kernel" (in, out) + "bias"),
so converted reference checkpoints load unchanged and the same variables
can be applied quantized or not.

No reference counterpart (the reference runs f16/f32 torch matmuls); this
is TPU-native headroom beyond parity.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def quantize_rows(x: jnp.ndarray, eps: float = 1e-8):
    """Symmetric per-row (last-axis) int8 quantization: returns (x8, scale)
    with x ~= x8 * scale, scale shaped like x with the last axis size 1."""
    scale = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32) / 127.0
    scale = jnp.maximum(scale, eps)
    x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return x8, scale


def quantize_weight_cols(w: jnp.ndarray, eps: float = 1e-8):
    """Symmetric per-output-channel quantization of a (in, out) kernel:
    returns (w8, scale) with w ~= w8 * scale, scale shaped (1, out)."""
    scale = jnp.max(jnp.abs(w), axis=0, keepdims=True).astype(jnp.float32) / 127.0
    scale = jnp.maximum(scale, eps)
    w8 = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return w8, scale


def dense_w8a8(x: jnp.ndarray, w8: jnp.ndarray, w_scale: jnp.ndarray,
               bias: jnp.ndarray | None, out_dtype) -> jnp.ndarray:
    """int8 x int8 -> int32 dense over the last axis of x, rescaled to
    out_dtype. x: (..., in); w8: (in, out) int8; w_scale: (1, out) f32."""
    x8, x_scale = quantize_rows(x)
    y = jax.lax.dot_general(
        x8, w8, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (x_scale * w_scale.reshape((1,) * (x.ndim - 1) + (-1,)))
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


class QuantDense(nn.Module):
    """Drop-in Dense with the matmul on the int8 MXU path. Same parameter
    names/shapes/initializers as `nn.Dense`, so a variable tree trained or
    converted for Dense applies unchanged. Weights are quantized inside the
    program (a cheap per-channel abs-max over (in, out) — negligible next to
    the token x in x out matmul); XLA CSEs the quantization across reuses of
    the same kernel within one jit."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (x.shape[-1], self.features)
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        w8, w_scale = quantize_weight_cols(kernel)
        return dense_w8a8(x, w8, w_scale, bias, self.dtype)


def make_dense(quantize: str):
    """Dense factory: 'none' -> nn.Dense, 'int8' -> QuantDense (w8a8)."""
    if quantize == "int8":
        return QuantDense
    if quantize in ("none", "", None):
        return nn.Dense
    raise ValueError(f"unknown quantize mode: {quantize!r}")
