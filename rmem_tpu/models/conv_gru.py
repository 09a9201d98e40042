"""ConvGRU cells for the GRU_MEMORY compressed-eviction variant.

Reference: aot_plus/networks/layers/transformer.py:35-118 (ConvGRUCell /
ConvGRUCellOutput) and the compress-instead-of-delete eviction
(transformer.py:420-430): the evicted slot's features are folded into slot 1
through a ConvGRU whose hidden state persists across evictions. Off by
default in every shipped config (r50_aotl.py:9); LSTT-only, like the
reference (DualBranchGPM hardcodes gru_memory=False, transformer.py:728).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from rmem_tpu.ops.layers import conv


class ConvGRUCell(nn.Module):
    """Gates + candidate convs (transformer.py:35-99), NHWC."""

    hidden_dim: int
    kernel: int = 2
    dtype: object = None

    @nn.compact
    def __call__(self, x, h):
        """x, h: [B, H, W, C] -> next hidden state."""
        # torch padding='same' for even kernels pads the extra pixel on the
        # bottom/right (transformer.py:52)
        k = self.kernel
        pad = ((k // 2 - (1 - k % 2), k // 2),) * 2 if k % 2 == 0 \
            else None
        combined = jnp.concatenate([x, h], axis=-1)
        gates = conv(2 * self.hidden_dim, k, name="conv_gates",
                     padding=pad, dtype=self.dtype)(combined)
        reset, update = jnp.split(jax.nn.sigmoid(gates), 2, axis=-1)
        cand_in = jnp.concatenate([x, reset * h], axis=-1)
        cand = jnp.tanh(conv(self.hidden_dim, k, name="conv_can",
                             padding=pad, dtype=self.dtype)(cand_in))
        return (1.0 - update) * h + update * cand


class ConvGRUCellOutput(nn.Module):
    """ConvGRU + 1x1 output head (transformer.py:102-118)."""

    hidden_dim: int
    output_dim: int
    kernel: int = 2
    dtype: object = None

    @nn.compact
    def __call__(self, x, h) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h_next = ConvGRUCell(self.hidden_dim, self.kernel,
                             self.dtype, name="cell")(x, h)
        out = conv(self.output_dim, 1, name="output_conv",
                   dtype=self.dtype)(h_next)
        return h_next, out
