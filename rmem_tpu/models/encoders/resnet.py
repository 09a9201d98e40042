"""ResNet-50/101 backbone, output-stride 16, frozen BN, stage 5 dropped.

Reference: aot_plus/networks/encoders/resnet.py:71-213. OS16 config uses
strides [1,2,2,1]; only layers 1-3 run and the 16x feature is emitted twice
(resnet.py:184-195), so every in-use stage has dilation 1. Frozen BN is a
folded affine (see rmem_tpu.ops.layers.FoldedBN). NHWC throughout.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from rmem_tpu.ops.layers import FoldedBN, conv, max_pool_3x3_s2


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride/dilation) -> 1x1(x4) with projection shortcut
    (resnet.py:10-68)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        residual = x
        out = conv(self.planes, 1, bias=False, name="conv1",
                   dtype=self.dtype)(x)
        out = FoldedBN(self.planes, name="bn1")(out)
        out = nn.relu(out)
        out = conv(self.planes, 3, stride=self.stride,
                   dilation=self.dilation, bias=False, name="conv2",
                   dtype=self.dtype)(out)
        out = FoldedBN(self.planes, name="bn2")(out)
        out = nn.relu(out)
        out = conv(self.planes * 4, 1, bias=False, name="conv3",
                   dtype=self.dtype)(out)
        out = FoldedBN(self.planes * 4, name="bn3")(out)
        if self.has_downsample:
            residual = conv(self.planes * 4, 1, stride=self.stride,
                            bias=False, name="downsample_conv",
                            dtype=self.dtype)(x)
            residual = FoldedBN(self.planes * 4, name="downsample_bn")(residual)
        return nn.relu(out + residual)


class ResNet(nn.Module):
    """Returns the 4-level pyramid [4x, 8x, 16x, 16x] (resnet.py:178-195)."""

    layers: Sequence[int] = (3, 4, 6, 3)
    dtype: object = None

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        x = conv(64, 7, stride=2, bias=False, name="conv1",
                 dtype=self.dtype)(x)
        x = FoldedBN(64, name="bn1")(x)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)

        xs = []
        strides = (1, 2, 2)
        for stage, (planes, blocks, stride) in enumerate(
                zip((64, 128, 256), self.layers[:3], strides), start=1):
            for i in range(blocks):
                x = Bottleneck(
                    planes=planes,
                    stride=stride if i == 0 else 1,
                    dilation=1,
                    has_downsample=(i == 0),
                    name=f"layer{stage}_{i}",
                    dtype=self.dtype,
                )(x)
            xs.append(x)
        xs.append(x)  # 16x duplicated (STMVOS convention, resnet.py:192-194)
        return tuple(xs)


def ResNet50(dtype=None) -> ResNet:
    return ResNet(layers=(3, 4, 6, 3), dtype=dtype)


def ResNet101(dtype=None) -> ResNet:
    return ResNet(layers=(3, 4, 23, 3), dtype=dtype)
