"""ResNet50 with top-down feedback (experimental USE_MASK encoder).

Reference: aot_plus/networks/encoders/resnet.py:216-356 (ResNet_TopDown):
a first bottom-up pass produces the 16x feature, which is gated (by an
externally supplied mask or a learned prompt's cosine similarity), linearly
transformed, and decoded back down the pyramid as additive top-down signals
for a second bottom-up pass; a reconstruction `var_loss` regularizes the
decoders. Off by default (USE_MASK=False in all shipped configs).

The (pyramid, var_loss) pair is returned directly; callers that only want
features use `[0]`. var-loss plumbing into the train objective
(VAR_LOSS_WEIGHT, aot_engine.py:115-118) is wired when use_mask configs are
exercised.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from rmem_tpu.models.encoders.resnet import Bottleneck
from rmem_tpu.ops.layers import FoldedBN, conv, max_pool_3x3_s2
from rmem_tpu.ops.resize import resize_bilinear


def _conv_transpose_torch(x, features, kernel, stride, pad, name, dtype,
                          bias: bool = False):
    """torch ConvTranspose2d semantics: out = (in-1)*s - 2p + k, via VALID
    transpose conv + crop."""
    y = nn.ConvTranspose(features, (kernel, kernel),
                         strides=(stride, stride), padding="VALID",
                         use_bias=bias, name=name, dtype=dtype)(x)
    if pad:
        y = y[:, pad:-pad, pad:-pad, :]
    return y


class _DecodeBlock(nn.Module):
    """ConvTranspose + 1x1 head (resnet.py:216-238)."""

    out_ch: int
    kernel: int
    stride: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        y = _conv_transpose_torch(x, self.out_ch, self.kernel, self.stride,
                                  self.kernel // 2, "linear", self.dtype)
        out = conv(self.out_ch, 1, bias=False, name="linear2",
                   dtype=self.dtype)(y)
        return y, out


class _StemDecode(nn.Module):
    """decoders[0] (resnet.py:272-279): maxpool-inverse ConvTranspose then a
    stride-2 k7 Decode_Block back to image space."""

    dtype: object = None

    @nn.compact
    def __call__(self, x):
        # the maxpool-inverse transpose keeps its bias (resnet.py:274 uses
        # torch's default bias=True, unlike the Decode_Block transposes)
        y = _conv_transpose_torch(x, 64, 3, 2, 1, "unpool", self.dtype,
                                  bias=True)
        y = _conv_transpose_torch(y, 3, 7, 2, 3, "linear", self.dtype)
        out = conv(3, 1, bias=False, name="linear2", dtype=self.dtype)(y)
        return y, out


class ResNet50TopDown(nn.Module):
    use_mask: bool = True
    dtype: object = None

    def setup(self):
        layers = (3, 4, 6)
        self.conv1 = conv(64, 7, stride=2, bias=False, name="conv1",
                          dtype=self.dtype)
        self.bn1 = FoldedBN(64, name="bn1")
        blocks = []
        for stage, (planes, n, stride) in enumerate(
                zip((64, 128, 256), layers, (1, 2, 2)), start=1):
            for i in range(n):
                blocks.append(Bottleneck(
                    planes=planes, stride=stride if i == 0 else 1,
                    has_downsample=(i == 0), dtype=self.dtype,
                    name=f"layer{stage}_{i}"))
        self.blocks = blocks
        self.stage_sizes = layers
        dims = (64, 256, 512, 1024)
        self.decoders = [
            _StemDecode(self.dtype, name="dec0"),           # 64@17 -> 3@65
            _DecodeBlock(dims[0], 3, 1, self.dtype, name="dec1"),  # 256->64
            _DecodeBlock(dims[1], 3, 2, self.dtype, name="dec2"),  # 512->256
            _DecodeBlock(dims[2], 3, 2, self.dtype, name="dec3"),  # 1024->512
        ]
        self.prompt = self.param("prompt", nn.initializers.normal(1.0),
                                 (dims[-1],))
        self.top_down_transform = self.param(
            "top_down_transform",
            lambda key, shape: jnp.eye(shape[0]), (dims[-1], dims[-1]))

    def _bottom_up(self, x, td=None):
        outs = []
        ins = []
        # stage 0: stem
        ins.append(x)
        if td is not None:
            x = x + td[0]
        x = self.conv1(x)
        x = nn.relu(self.bn1(x))
        x = max_pool_3x3_s2(x)
        outs.append(x)
        idx = 0
        for stage, n in enumerate(self.stage_sizes, start=1):
            ins.append(x)
            if td is not None:
                x = x + td[stage]
            for _ in range(n):
                x = self.blocks[idx](x)
                idx += 1
            outs.append(x)
        return x, ins, outs

    def _feedback(self, x):
        td = []
        for dec in reversed(self.decoders):
            x, out = dec(x)
            td.insert(0, out)
        return td

    def __call__(self, img, mask: Optional[jnp.ndarray] = None
                 ) -> Tuple[Tuple[jnp.ndarray, ...], jnp.ndarray]:
        x, _, out1 = self._bottom_up(img)
        if self.use_mask and mask is not None:
            gate = resize_bilinear(mask.astype(jnp.float32)[..., None],
                                   x.shape[1:3])
        else:
            xn = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-6)
            pn = self.prompt / (jnp.linalg.norm(self.prompt) + 1e-6)
            gate = jnp.clip(jnp.einsum("bhwc,c->bhw", xn, pn), 0, 1)[..., None]
        x = (x * gate) @ self.top_down_transform.astype(x.dtype)
        td = self._feedback(x)

        x2, ins, outs = self._bottom_up(img, td)

        # reconstruction var_loss (resnet.py:344-356)
        var_loss = 0.0
        feed_ins = [ins[0]] + ins[1:]
        for dec, stage_out, target in zip(
                self.decoders, outs, feed_ins):
            recon, _ = dec(jax.lax.stop_gradient(stage_out))
            t = jax.lax.stop_gradient(target)
            if recon.shape != t.shape:
                recon = resize_bilinear(recon, t.shape[1:3])
            var_loss = var_loss + jnp.mean(
                (recon.astype(jnp.float32) - t.astype(jnp.float32)) ** 2)

        pyramid = (outs[1], outs[2], outs[3], outs[3])
        return pyramid, var_loss
