"""Tiny strided-conv encoder for smoke tests and CI.

No reference equivalent — a 3-stage conv pyramid (4x/8x/16x + duplicated 16x)
that keeps the full AOT/DeAOT graph structure compiling in seconds on CPU.
"""

from __future__ import annotations

import flax.linen as nn

from rmem_tpu.ops.layers import conv

TINY_DIMS = (32, 48, 64, 64)


class TinyEncoder(nn.Module):
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        x = nn.relu(conv(TINY_DIMS[0], 5, stride=4, name="stem",
                         dtype=self.dtype)(x))
        xs = [x]
        x = nn.relu(conv(TINY_DIMS[1], 3, stride=2, name="s8",
                         dtype=self.dtype)(x))
        xs.append(x)
        x = nn.relu(conv(TINY_DIMS[2], 3, stride=2, name="s16",
                         dtype=self.dtype)(x))
        xs.append(x)
        xs.append(x)
        return tuple(xs)


class TinyTopDownEncoder(nn.Module):
    """Tiny analogue of resnet50_topdown: returns (pyramid, var_loss) so the
    aux-loss plumbing (encode_image sow -> train_forward mutable apply ->
    cfg.var_loss_weight term, aot_engine.py:115-118) is exercised in CI."""

    dtype: object = None

    @nn.compact
    def __call__(self, x):
        import jax.numpy as jnp

        from rmem_tpu.ops.resize import resize_bilinear

        xs = TinyEncoder(dtype=self.dtype, name="body")(x)
        recon = conv(TINY_DIMS[0], 1, name="recon", dtype=self.dtype)(xs[2])
        recon = resize_bilinear(recon, xs[0].shape[1:3])
        var_loss = jnp.mean(
            (recon.astype(jnp.float32) - xs[0].astype(jnp.float32)) ** 2)
        return tuple(xs), var_loss
