"""ResNet-FPN local-feature CNN (flax, NHWC).

Behavioral spec: src/matcher/backbone/resnet_fpn.py:43-119 (ResNetFPN_8_2:
7x7/2 stem -> 3 residual stages at 1/2,1/4,1/8 -> top-down FPN with
align-corners bilinear 2x upsampling; outputs [1/8 coarse 256-d, 1/2 fine
128-d]) and :121-199 (ResNetFPN_16_4). Convs are bias-free with BatchNorm;
inference uses running statistics.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from pope_tpu.ops.resize import upsample2x_align_corners


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(self.kernel // 2, self.kernel // 2)] * 2,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            name="bn",
        )(x)
        return x


class BasicBlock(nn.Module):
    """Two 3x3 conv-bn with identity/downsample skip (resnet_fpn.py:15-41)."""

    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.relu(ConvBN(self.features, 3, self.stride, self.dtype, name="cb1")(x, train))
        y = ConvBN(self.features, 3, 1, self.dtype, name="cb2")(y, train)
        if self.stride != 1:
            x = ConvBN(self.features, 1, self.stride, self.dtype, name="down")(x, train)
        return nn.relu(x + y)


class FPNOutBlock(nn.Module):
    """conv3x3 -> BN -> LeakyReLU -> conv3x3 (resnet_fpn.py:73-85)."""

    mid: int
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(self.mid, 3, 1, self.dtype, name="cb")(x, train)
        x = nn.leaky_relu(x, negative_slope=0.01)
        x = nn.Conv(self.out, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype, name="conv_out")(x)
        return x


class ResNetFPN(nn.Module):
    """ResNetFPN_8_2: returns (coarse 1/8 features, fine 1/2 features).

    Input: (B, H, W, 1) grayscale in [0, 1]; H, W divisible by 8.
    """

    initial_dim: int = 128
    block_dims: Sequence[int] = (128, 196, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d1, d2, d3 = self.block_dims
        # stem: 7x7/2
        x0 = nn.Conv(
            self.initial_dim, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=self.dtype, name="stem_conv",
        )(x)
        x0 = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=jnp.float32, name="stem_bn")(x0)
        x0 = nn.relu(x0)

        x1 = BasicBlock(d1, 1, self.dtype, name="layer1_0")(x0, train)
        x1 = BasicBlock(d1, 1, self.dtype, name="layer1_1")(x1, train)  # 1/2
        x2 = BasicBlock(d2, 2, self.dtype, name="layer2_0")(x1, train)
        x2 = BasicBlock(d2, 1, self.dtype, name="layer2_1")(x2, train)  # 1/4
        x3 = BasicBlock(d3, 2, self.dtype, name="layer3_0")(x2, train)
        x3 = BasicBlock(d3, 1, self.dtype, name="layer3_1")(x3, train)  # 1/8

        # FPN top-down
        x3_out = nn.Conv(d3, (1, 1), use_bias=False, dtype=self.dtype, name="l3_out")(x3)

        x3_up = upsample2x_align_corners(x3_out)
        x2_lat = nn.Conv(d3, (1, 1), use_bias=False, dtype=self.dtype, name="l2_lat")(x2)
        x2_out = FPNOutBlock(d3, d2, self.dtype, name="l2_out")(x2_lat + x3_up, train)

        x2_up = upsample2x_align_corners(x2_out)
        x1_lat = nn.Conv(d2, (1, 1), use_bias=False, dtype=self.dtype, name="l1_lat")(x1)
        x1_out = FPNOutBlock(d2, d1, self.dtype, name="l1_out")(x1_lat + x2_up, train)

        return x3_out, x1_out
