"""MobileNetV2 backbone, output-stride 16, frozen BN, NHWC.

Reference: aot_plus/networks/encoders/mobilenetv2.py. Stage taps at features
[0:4] (4x, 24ch), [4:7] (8x, 32ch), [7:14] (16x, 96ch), [14:] (16x dilated,
1280ch) matching MODEL_ENCODER_DIM=[24,32,96,1280]
(configs/models/default.py:11).
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from rmem_tpu.ops.layers import FoldedBN, conv


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def _relu6(x):
    return jnp.minimum(nn.relu(x), 6.0)


class ConvBNReLU6(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    dilation: int = 1
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        x = conv(self.features, self.kernel, stride=self.stride,
                 dilation=self.dilation, bias=False, groups=self.groups,
                 name="conv", dtype=self.dtype)(x)
        x = FoldedBN(self.features, name="bn")(x)
        return _relu6(x)


class InvertedResidual(nn.Module):
    inp: int
    oup: int
    stride: int
    dilation: int
    expand: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        hidden = int(round(self.inp * self.expand))
        out = x
        if self.expand != 1:
            out = ConvBNReLU6(hidden, kernel=1, name="pw",
                              dtype=self.dtype)(out)
        out = ConvBNReLU6(hidden, kernel=3, stride=self.stride,
                          dilation=self.dilation, groups=hidden,
                          name="dw", dtype=self.dtype)(out)
        out = conv(self.oup, 1, bias=False, name="pw_linear",
                   dtype=self.dtype)(out)
        out = FoldedBN(self.oup, name="bn_out")(out)
        if self.stride == 1 and self.inp == self.oup:
            out = out + x
        return out


# (expand t, channels c, repeats n, stride s) — mobilenetv2.py:149-158
_SETTING = [
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]
_TAPS = (4, 7, 14)  # feature indices ending the 4x / 8x / 16x stages


class MobileNetV2(nn.Module):
    output_stride: int = 16
    width_mult: float = 1.0
    dtype: object = None

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        input_channel = _make_divisible(32 * self.width_mult)
        last_channel = _make_divisible(1280 * max(1.0, self.width_mult))

        feats: List[jnp.ndarray] = []
        x = ConvBNReLU6(input_channel, kernel=3, stride=2, name="stem",
                        dtype=self.dtype)(x)
        idx = 1
        current_stride, rate = 2, 1
        xs = []
        inp = input_channel
        for t, c, n, s in _SETTING:
            if current_stride == self.output_stride:
                stride, dilation = 1, rate
                rate *= s
            else:
                stride, dilation = s, 1
                current_stride *= s
            oup = _make_divisible(c * self.width_mult)
            for i in range(n):
                x = InvertedResidual(
                    inp, oup,
                    stride if i == 0 else 1,
                    dilation if i == 0 else rate,
                    t, name=f"block{idx}", dtype=self.dtype)(x)
                inp = oup
                idx += 1
                if idx in _TAPS:
                    xs.append(x)
        x = ConvBNReLU6(last_channel, kernel=1, name="head",
                        dtype=self.dtype)(x)
        xs.append(x)
        return tuple(xs)
