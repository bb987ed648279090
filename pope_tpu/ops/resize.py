"""Image resampling with exact PyTorch interpolation semantics.

The matcher FPN uses F.interpolate(scale_factor=2, mode='bilinear',
align_corners=True) (resnet_fpn.py:110,114); jax.image.resize implements
half-pixel (align_corners=False) sampling only, so we implement the
align-corners grid directly. Separable 1-D lerps — gathers + FMAs on the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def _resize_axis_align_corners(x, axis, out_size):
    """Linear resample along `axis` with align_corners=True grid mapping."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    if in_size == 1:
        reps = [1] * x.ndim
        reps[axis] = out_size
        return jnp.tile(x, reps)
    pos = jnp.arange(out_size, dtype=jnp.float32) * ((in_size - 1) / (out_size - 1))
    i0 = jnp.floor(pos).astype(jnp.int32)
    i0 = jnp.clip(i0, 0, in_size - 2)
    frac = pos - i0.astype(jnp.float32)
    a = jnp.take(x, i0, axis=axis)
    b = jnp.take(x, i0 + 1, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    frac = frac.reshape(shape).astype(x.dtype)
    return a * (1 - frac) + b * frac


def upsample2x_align_corners(x):
    """2x bilinear upsample with align_corners=True on NHWC tensors."""
    B, H, W, C = x.shape
    x = _resize_axis_align_corners(x, 1, 2 * H)
    x = _resize_axis_align_corners(x, 2, 2 * W)
    return x


def resize_bilinear_torch(x, out_hw, align_corners=False):
    """Bilinear resize on NHWC matching torch F.interpolate semantics.

    align_corners=False uses the half-pixel grid (what torchvision's Resize
    and SAM's postprocess use); True matches the FPN path above.
    """
    out_h, out_w = out_hw
    if align_corners:
        x = _resize_axis_align_corners(x, 1, out_h)
        x = _resize_axis_align_corners(x, 2, out_w)
        return x

    def axis_resize(x, axis, out_size):
        in_size = x.shape[axis]
        if in_size == out_size:
            return x
        scale = in_size / out_size
        pos = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
        pos = jnp.clip(pos, 0.0, in_size - 1.0)
        i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, in_size - 2) if in_size > 1 else jnp.zeros(out_size, jnp.int32)
        frac = pos - i0.astype(jnp.float32)
        a = jnp.take(x, i0, axis=axis)
        b = jnp.take(x, jnp.minimum(i0 + 1, in_size - 1), axis=axis)
        shape = [1] * x.ndim
        shape[axis] = out_size
        frac = frac.reshape(shape).astype(x.dtype)
        return a * (1 - frac) + b * frac

    x = axis_resize(x, 1, out_h)
    x = axis_resize(x, 2, out_w)
    return x
