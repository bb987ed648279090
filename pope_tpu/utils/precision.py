"""Precision control for small, numerically sensitive math.

On TPU, jax's default matmul precision routes f32 matmuls through bf16 passes
on the MXU. For tiny geometry/solver matrices (3x3 intrinsics updates, affine
solves, epipolar algebra) that costs real accuracy for zero speed benefit, so
those functions are wrapped to force full float32 precision. Large NN matmuls
elsewhere keep the fast default.
"""

from __future__ import annotations

import functools

import jax


def f32_matmul(fn):
    """Decorator: run `fn` under float32 matmul precision."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped
