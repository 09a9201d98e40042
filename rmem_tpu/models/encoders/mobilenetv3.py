"""MobileNetV3-Large backbone, output-stride 16, frozen BN, NHWC.

Reference: aot_plus/networks/encoders/mobilenetv3.py:140-239 (cfgs table,
OS16 dilation schedule, taps at blocks [0:4]/[4:7]/[7:13]/[13:] with a final
1x1 expansion conv on the last tap). Pyramid dims: 24 / 40 / 112 / 960.
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


def _h_sigmoid(x):
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def _h_swish(x):
    return x * _h_sigmoid(x)


class SELayer(nn.Module):
    channel: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        hidden = _make_divisible(self.channel // 4)
        y = jnp.mean(x, axis=(1, 2))
        y = nn.relu(nn.Dense(hidden, name="fc1", dtype=self.dtype)(y))
        y = _h_sigmoid(nn.Dense(self.channel, name="fc2",
                                dtype=self.dtype)(y))
        return x * y[:, None, None, :]


class InvertedResidualV3(nn.Module):
    inp: int
    hidden: int
    oup: int
    kernel: int
    stride: int
    use_se: bool
    use_hs: bool
    dilation: int = 1
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        act = _h_swish if self.use_hs else nn.relu
        out = x
        if self.inp != self.hidden:
            out = conv(self.hidden, 1, bias=False, name="pw",
                       dtype=self.dtype)(out)
            out = FoldedBN(self.hidden, name="pw_bn")(out)
            out = act(out)
        out = conv(self.hidden, self.kernel, stride=self.stride,
                   dilation=self.dilation, groups=self.hidden, bias=False,
                   name="dw", dtype=self.dtype)(out)
        out = FoldedBN(self.hidden, name="dw_bn")(out)
        if self.use_se:
            out = SELayer(self.hidden, dtype=self.dtype, name="se")(out)
        out = act(out)
        out = conv(self.oup, 1, bias=False, name="pw_linear",
                   dtype=self.dtype)(out)
        out = FoldedBN(self.oup, name="out_bn")(out)
        if self.stride == 1 and self.inp == self.oup:
            out = out + x
        return out


# (kernel k, expand t, channels c, SE, HS, stride s) — mobilenetv3.py:150-166
_CFGS = [
    (3, 1.0, 16, 0, 0, 1),
    (3, 4.0, 24, 0, 0, 2),
    (3, 3.0, 24, 0, 0, 1),
    (5, 3.0, 40, 1, 0, 2),
    (5, 3.0, 40, 1, 0, 1),
    (5, 3.0, 40, 1, 0, 1),
    (3, 6.0, 80, 0, 1, 2),
    (3, 2.5, 80, 0, 1, 1),
    (3, 2.3, 80, 0, 1, 1),
    (3, 2.3, 80, 0, 1, 1),
    (3, 6.0, 112, 1, 1, 1),
    (3, 6.0, 112, 1, 1, 1),
    (5, 6.0, 160, 1, 1, 2),
    (5, 6.0, 160, 1, 1, 1),
    (5, 6.0, 160, 1, 1, 1),
]
_TAPS = (4, 7, 13)  # block indices ending the 4x / 8x / 16x stages


class MobileNetV3Large(nn.Module):
    output_stride: int = 16
    width_mult: float = 1.0
    dtype: object = None

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        inp = _make_divisible(16 * self.width_mult)
        x = conv(inp, 3, stride=2, bias=False, name="stem",
                 dtype=self.dtype)(x)
        x = FoldedBN(inp, name="stem_bn")(x)
        x = _h_swish(x)

        xs: List[jnp.ndarray] = []
        now_stride, rate = 2, 1
        exp = inp
        for idx, (k, t, c, se, hs, s) in enumerate(_CFGS, start=1):
            if now_stride == self.output_stride:
                dilation = rate
                rate *= s
                s = 1
            else:
                dilation = 1
                now_stride *= s
            oup = _make_divisible(c * self.width_mult)
            exp = _make_divisible(inp * t)
            x = InvertedResidualV3(inp, exp, oup, k, s, bool(se), bool(hs),
                                   dilation, dtype=self.dtype,
                                   name=f"block{idx}")(x)
            inp = oup
            if idx + 1 in _TAPS:
                xs.append(x)
        # final 1x1 expansion (mobilenetv3.py:193-212); pyramid is
        # [24@4x, 40@8x, 112@16x, 960@16x]
        x = conv(exp, 1, bias=False, name="head", dtype=self.dtype)(x)
        x = FoldedBN(exp, name="head_bn")(x)
        x = _h_swish(x)
        return (xs[0], xs[1], xs[2], x)
