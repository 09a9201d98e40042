"""FPN segmentation head (aot_plus/networks/decoders/fpn.py:7-73).

Concats the LSTT intermediate outputs, then refines through 16x/8x/4x levels
with encoder shortcut adapters and align-corners bilinear upsampling
(matmul-formulated, see rmem_tpu.ops.resize). NHWC.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from rmem_tpu.ops.layers import ConvGN, conv
from rmem_tpu.ops.resize import resize_bilinear


class FPNSegmentationHead(nn.Module):
    in_dim: int
    out_dim: int
    decode_intermediate_input: bool = True
    hidden_dim: int = 256
    shortcut_dims: Sequence[int] = (24, 32, 96, 1280)
    align_corners: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray],
                 shortcuts: Sequence[jnp.ndarray]) -> jnp.ndarray:
        """inputs: [16x-projected-encoder-feat, lstt_out_1..N] NHWC;
        shortcuts: raw encoder pyramid [4x, 8x, 16x, 16x] NHWC."""
        if self.decode_intermediate_input:
            x = jnp.concatenate(inputs, axis=-1)
        else:
            x = inputs[-1]

        hd = self.hidden_dim
        dt = self.dtype
        x = nn.relu(ConvGN(hd, 1, name="conv_in", dtype=dt)(x))
        s16 = conv(hd, 1, name="adapter_16x", dtype=dt)(shortcuts[-2])
        x = nn.relu(ConvGN(hd, 3, name="conv_16x", dtype=dt)(s16 + x))

        x = resize_bilinear(x, shortcuts[-3].shape[1:3], self.align_corners)
        s8 = conv(hd, 1, name="adapter_8x", dtype=dt)(shortcuts[-3])
        x = nn.relu(ConvGN(hd // 2, 3, name="conv_8x", dtype=dt)(s8 + x))

        x = resize_bilinear(x, shortcuts[-4].shape[1:3], self.align_corners)
        s4 = conv(hd // 2, 1, name="adapter_4x", dtype=dt)(shortcuts[-4])
        x = nn.relu(ConvGN(hd // 2, 3, name="conv_4x", dtype=dt)(s4 + x))

        # logits in fp32: downstream masking/softmax/interpolation stability
        return conv(self.out_dim, 1, name="conv_out",
                    dtype=jnp.float32)(x.astype(jnp.float32))
