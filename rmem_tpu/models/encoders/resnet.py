"""ResNet-50/101 backbone, output-stride 16, frozen BN, stage 5 dropped.

Reference: aot_plus/networks/encoders/resnet.py:71-213. OS16 config uses
strides [1,2,2,1]; only layers 1-3 run and the 16x feature is emitted twice
(resnet.py:184-195), so every in-use stage has dilation 1. Frozen BN is a
folded affine (see rmem_tpu.ops.layers.FoldedBN). NHWC throughout.
"""

from __future__ import annotations

import os
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from rmem_tpu.ops.layers import FoldedBN, conv, max_pool_3x3_s2


class _StemConvS2D(nn.Module):
    """The 7x7/stride-2/pad-3 stem conv as space-to-depth + 4x4 VALID conv.

    A 3-input-channel 7x7 conv is MXU-hostile (the contraction is 147
    mostly-padding elements); measured by graph ablation it costs
    0.94 ms/frame of the 6.5 ms step at 481x849 (ROUND_NOTES r3). The
    MLPerf-classic rewrite performs the SAME multiply-adds: pad by
    (4, 3) / (3 + evenness) so the grid is even with one extra zero
    row/col on top/left, 2x2 space-to-depth to 12 channels, and a 4x4
    stride-1 VALID conv whose [4,4,2,2,3,64] weights are a static scatter
    of the original [7,7,3,64] kernel (tap a of the 7-window maps to
    s2d offset (a+1)//2 with parity (a+1)%2; the (0, parity-0) taps are
    zero). Parameter path/shape are unchanged (`conv1/kernel`), so
    checkpoints and the .pth converter are untouched.
    """

    dtype: object = None

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, 3, 64))
        dt = self.dtype or x.dtype
        k = kernel.astype(dt)
        x = x.astype(dt)
        b, h, w, c = x.shape
        x2 = jnp.pad(x, ((0, 0), (4, 3 + (h % 2 == 0)),
                         (4, 3 + (w % 2 == 0)), (0, 0)))
        hp2, wp2 = x2.shape[1], x2.shape[2]
        s = x2.reshape(b, hp2 // 2, 2, wp2 // 2, 2, c)
        s = s.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp2 // 2, wp2 // 2,
                                                  4 * c)
        w4 = jnp.zeros((4, 4, 2, 2, c, 64), k.dtype)
        for a in range(7):
            ua, pa = (a + 1) // 2, (a + 1) % 2
            for bb in range(7):
                vb, qb = (bb + 1) // 2, (bb + 1) % 2
                w4 = w4.at[ua, vb, pa, qb].set(k[a, bb])
        w4 = w4.reshape(4, 4, 4 * c, 64)
        y = jax.lax.conv_general_dilated(
            s, w4, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out_h, out_w = (h - 1) // 2 + 1, (w - 1) // 2 + 1
        return y[:, :out_h, :out_w]


class _StemConvIm2col(nn.Module):
    """7x7/s2/pad3 stem as explicit im2col + ONE MXU matmul.

    The plain conv runs at ~2% MFU — with Cin=3 the MXU contraction
    occupies 3 of 128 lanes — and cost 0.54 ms/frame at 481x849 in the r3
    eval profile, plus ~0.1 ms of layout copies around it. Here the 49
    taps are gathered once into a [B, Ho, Wo, 147] patch tensor (one
    fused strided-slice concat, ~30 MB bf16 written once) and contracted
    with the [147, 64] reshaped kernel in a single dot, so K=147 fills a
    full MXU pass. Same multiply-adds, same `conv1/kernel` [7,7,3,64]
    param (checkpoints/converter untouched); exactness pinned by
    test_stem_im2col_matches_plain_conv."""

    dtype: object = None

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, 3, 64))
        dt = self.dtype or x.dtype
        k = kernel.astype(dt).reshape(49 * 3, 64)
        # materialize the normalized image once: without the barrier the
        # normalize chain fuses into the 49-slice concat and is recomputed
        # per tap read.
        x = jax.lax.optimization_barrier(x.astype(dt))
        b, h, w, c = x.shape
        ho, wo = (h - 1) // 2 + 1, (w - 1) // 2 + 1
        xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        taps = []
        for dy in range(7):
            for dx in range(7):
                taps.append(jax.lax.slice(
                    xp, (0, dy, dx, 0),
                    (b, dy + 2 * (ho - 1) + 1, dx + 2 * (wo - 1) + 1, c),
                    (1, 2, 2, 1)))
        # concat order (dy, dx, c) matches kernel.reshape(147, 64)
        patches = jnp.concatenate(taps, axis=-1)
        return jnp.einsum("bhwk,ko->bhwo", patches, k)


class _StemKernelParam(nn.Module):
    """Parameter-only stand-in for the stem conv: declares the SAME
    `conv1/kernel` [7,7,3,64] param as nn.Conv (checkpoints/converter
    untouched) and returns it for the fused Pallas stem."""

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (7, 7, 3, 64))


class _AffineParam(nn.Module):
    """Parameter-only stand-in for FoldedBN (same `scale`/`bias` tree)."""

    features: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.features,)),
                self.param("bias", nn.initializers.zeros, (self.features,)))


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
    # Three exact formulations of the same stem (identical params/math).
    # The plain conv wins on this chip despite running its Cin=3
    # contraction at ~2% MFU (0.54 ms/frame of the 5.1 ms 481x849 step,
    # r3 profile): both rewrites lose MORE to full-res data formatting
    # than they gain on the MXU — "s2d" (space-to-depth + 4x4 conv)
    # measured 147.1 vs 153.6 FPS, and "im2col" (49 stride-2 slices ->
    # [.,.,147] patch tensor -> one K=147 matmul) measured 90.6 vs 183.0:
    # stride-2 slices in the sublane dim lower to per-tap relayout copies
    # that dwarf the conv. Override via RMEM_STEM for co-located retuning.
    stem: str = "conv"

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        variant = os.environ.get("RMEM_STEM", self.stem)
        if (variant in ("pallas", "pallas_train") and x.shape[-1] == 3
                and self.dtype == jnp.bfloat16
                and (x.shape[0] == 1 or variant == "pallas_train")):
            # fused conv+BN+relu+maxpool Pallas kernel (kernels/stem.py);
            # same param tree as the plain path (conv1/kernel + bn1
            # affine). "pallas" fires on batch-1 (inference) calls only;
            # "pallas_train" also takes the B*T-frame training batches
            # (gradients via the custom XLA-transposed VJP).
            from rmem_tpu.kernels.stem import pallas_stem_trainable
            kernel = _StemKernelParam(name="conv1")()
            scale, bias = _AffineParam(64, name="bn1")()
            x = pallas_stem_trainable(x, kernel, scale, bias)
        else:
            if variant == "s2d":
                x = _StemConvS2D(name="conv1", dtype=self.dtype)(x)
            elif variant == "im2col":
                x = _StemConvIm2col(name="conv1", dtype=self.dtype)(x)
            else:
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


def ResNet50(dtype=None, stem: str = "conv") -> ResNet:
    return ResNet(layers=(3, 4, 6, 3), dtype=dtype, stem=stem)


def ResNet101(dtype=None, stem: str = "conv") -> ResNet:
    return ResNet(layers=(3, 4, 23, 3), dtype=dtype, stem=stem)
