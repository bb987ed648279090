"""ConvNeXtV2 image backbone (flax, NHWC), atto..huge zoo.

Behavioral spec: pose/convnextv2/convnextv2.py:14-139 (7x7 depthwise conv ->
LN -> 4x pointwise MLP with GRN -> residual; 4-stage stem/downsample layout;
global-average-pool + LN + linear head) and pose/convnextv2/utils.py:105-116
(Global Response Normalization). Used frozen as the regressor's image branch
(pose/model0429_mkpts.py:46-155).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

ZOO = {
    # tiny config for tests (the vim branch has the same convention)
    "test": ((1, 1, 2, 1), (16, 32, 64, 128)),
    "atto": ((2, 2, 6, 2), (40, 80, 160, 320)),
    "femto": ((2, 2, 6, 2), (48, 96, 192, 384)),
    "pico": ((2, 2, 6, 2), (64, 128, 256, 512)),
    "nano": ((2, 2, 8, 2), (80, 160, 320, 640)),
    "tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
    "base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
    "large": ((3, 3, 27, 3), (192, 384, 768, 1536)),
    "huge": ((3, 3, 27, 3), (352, 704, 1408, 2816)),
}


class GRN(nn.Module):
    """Global Response Normalization over spatial dims (utils.py:105-116)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.zeros, (self.dim,))
        beta = self.param("beta", nn.initializers.zeros, (self.dim,))
        gx = jnp.sqrt(jnp.sum(x**2, axis=(1, 2), keepdims=True))  # (B,1,1,C)
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        return gamma * (x * nx) + beta + x


class ConvNeXtV2Block(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inp = x
        x = nn.Conv(
            self.dim, (7, 7), padding=[(3, 3), (3, 3)], feature_group_count=self.dim,
            dtype=self.dtype, name="dwconv",
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x)
        x = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)
        x = GRN(4 * self.dim, name="grn")(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(x)
        return inp + x


class ConvNeXtV2(nn.Module):
    """4-stage ConvNeXtV2; returns pooled features (num_classes=0) or logits.

    Input NHWC float images (already normalized).
    """

    depths: Sequence[int] = (3, 3, 27, 3)
    dims: Sequence[int] = (192, 384, 768, 1536)
    num_classes: int = 1000
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def from_name(cls, variant: str, **kw):
        depths, dims = ZOO[variant]
        return cls(depths=depths, dims=dims, **kw)

    @nn.compact
    def __call__(self, x):
        for i in range(4):
            if i == 0:
                x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), dtype=self.dtype, name="stem_conv")(x)
                x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="stem_norm")(x)
            else:
                x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name=f"down{i}_norm")(x)
                x = nn.Conv(self.dims[i], (2, 2), strides=(2, 2), dtype=self.dtype, name=f"down{i}_conv")(x)
            for j in range(self.depths[i]):
                x = ConvNeXtV2Block(self.dims[i], self.dtype, name=f"stage{i}_block{j}")(x)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="head_norm")(x)
        if self.num_classes:
            x = nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)
        return x
