"""ResNeSt-50/101 backbone (split-attention), output-stride 16, frozen BN.

Reference: aot_plus/networks/encoders/resnest/{splat.py,resnet.py,resnest.py}.
VOS configuration (encoders/__init__.py:27-33): dilation=2 -> layer3 keeps
stride 2 / dilation 1 and layer4 is dropped, so all in-use stages are plain
strides; ResNeSt specifics that remain are the deep 3-conv stem, radix-2
split attention in conv2, the 3x3 average-pool 'avd' in strided blocks, and
average-pool downsample shortcuts. NHWC, radix softmax in fp32.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from rmem_tpu.ops.layers import FoldedBN, conv, max_pool_3x3_s2


class SplAtConv2d(nn.Module):
    """Split-Attention conv (splat.py:15-115): grouped radix conv -> global
    pooled gate -> radix softmax -> weighted sum of splits."""

    channels: int
    radix: int = 2
    cardinality: int = 1
    dilation: int = 1
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        r, card, ch = self.radix, self.cardinality, self.channels
        inter = max(ch * r // 4, 32)
        y = conv(ch * r, 3, dilation=self.dilation, groups=card * r,
                 bias=False, name="conv", dtype=self.dtype)(x)
        y = FoldedBN(ch * r, name="bn0")(y)
        y = nn.relu(y)

        splits = jnp.split(y, r, axis=-1)            # r x [B,H,W,ch]
        gap = sum(splits)
        gap = jnp.mean(gap, axis=(1, 2), keepdims=True)
        gap = conv(inter, 1, groups=card, name="fc1", dtype=self.dtype)(gap)
        gap = FoldedBN(inter, name="bn1")(gap)
        gap = nn.relu(gap)
        atten = conv(ch * r, 1, groups=card, name="fc2",
                     dtype=self.dtype)(gap)           # [B,1,1,ch*r]

        # rSoftMax (splat.py:118-131): softmax over radix per cardinal group
        b = atten.shape[0]
        a = atten.reshape(b, card, r, ch // card)
        a = jax.nn.softmax(a.astype(jnp.float32), axis=2).astype(y.dtype)
        a = a.reshape(b, 1, 1, card, r, ch // card)
        attens = [a[..., i, :].reshape(b, 1, 1, ch) for i in range(r)]
        return sum(at * sp for at, sp in zip(attens, splits))


class ResNeStBottleneck(nn.Module):
    """resnest/resnet.py:37-166: 1x1 -> SplAt 3x3 (+avd avgpool) -> 1x1 with
    avg-down projection shortcut."""

    planes: int
    stride: int = 1
    is_first: bool = False
    has_downsample: bool = False
    radix: int = 2
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        gw = self.planes  # group_width with cardinality 1, width 64
        avd = self.stride > 1 or self.is_first

        out = conv(gw, 1, bias=False, name="conv1", dtype=self.dtype)(x)
        out = FoldedBN(gw, name="bn1")(out)
        out = nn.relu(out)
        out = SplAtConv2d(gw, radix=self.radix, dtype=self.dtype,
                          name="conv2")(out)
        if avd:  # avd_first=False (resnest.py:41)
            out = nn.avg_pool(out, (3, 3), strides=(self.stride,) * 2,
                              padding=((1, 1), (1, 1)))
        out = conv(self.planes * 4, 1, bias=False, name="conv3",
                   dtype=self.dtype)(out)
        out = FoldedBN(self.planes * 4, name="bn3")(out)

        residual = x
        if self.has_downsample:
            # avg_down shortcut (resnest/resnet.py:318-338):
            # AvgPool(stride, ceil, count_include_pad=False) + 1x1 conv
            if self.stride > 1:
                residual = nn.avg_pool(
                    residual, (self.stride,) * 2,
                    strides=(self.stride,) * 2, padding="SAME",
                    count_include_pad=False)
            residual = conv(self.planes * 4, 1, bias=False,
                            name="downsample_conv", dtype=self.dtype)(
                residual)
            residual = FoldedBN(self.planes * 4,
                                name="downsample_bn")(residual)
        return nn.relu(out + residual)


class ResNeSt(nn.Module):
    layers: Sequence[int] = (3, 4, 6)
    stem_width: int = 32
    dtype: object = None

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        sw = self.stem_width
        # deep stem (resnest/resnet.py:237-266)
        x = conv(sw, 3, stride=2, bias=False, name="stem0",
                 dtype=self.dtype)(x)
        x = nn.relu(FoldedBN(sw, name="stem0_bn")(x))
        x = conv(sw, 3, bias=False, name="stem1", dtype=self.dtype)(x)
        x = nn.relu(FoldedBN(sw, name="stem1_bn")(x))
        x = conv(sw * 2, 3, bias=False, name="stem2", dtype=self.dtype)(x)
        x = FoldedBN(sw * 2, name="bn1")(x)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)

        xs = []
        strides = (1, 2, 2)
        firsts = (False, True, True)  # layer1 is_first=False (resnet.py:271)
        for stage, (planes, blocks, stride, is_first) in enumerate(
                zip((64, 128, 256), self.layers, strides, firsts), start=1):
            for i in range(blocks):
                x = ResNeStBottleneck(
                    planes=planes,
                    stride=stride if i == 0 else 1,
                    is_first=is_first and i == 0,
                    has_downsample=(i == 0),
                    dtype=self.dtype,
                    name=f"layer{stage}_{i}")(x)
            xs.append(x)
        xs.append(x)
        return tuple(xs)


def ResNeSt50(dtype=None) -> ResNeSt:
    return ResNeSt(layers=(3, 4, 6), stem_width=32, dtype=dtype)


def ResNeSt101(dtype=None) -> ResNeSt:
    return ResNeSt(layers=(3, 4, 23), stem_width=64, dtype=dtype)
