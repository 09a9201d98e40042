"""Layer primitives (flax.linen), NHWC / [B, HW, C] layouts.

Reference: aot_plus/networks/layers/basic.py (ConvGN, GNActDWConv2d, DWConv2d,
GroupNorm1D, DropPath) and networks/encoders (FrozenBatchNorm2d folded here
into a constant affine — BN is frozen in every shipped config,
configs/models/default.py:15).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# torch eps defaults
LN_EPS = 1e-5
GN_EPS = 1e-5


class FoldedBN(nn.Module):
    """Frozen BatchNorm folded to y = x*scale + bias.

    The checkpoint converter folds (gamma, beta, mean, var) into
    (scale, bias); training never updates these (reference freezes BN:
    encoders/normalization.py:6, trainer.py:61-88).
    """

    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


def conv(features: int, kernel: int, stride: int = 1, dilation: int = 1,
         bias: bool = True, groups: int = 1, name: Optional[str] = None,
         padding=None, dtype=None) -> nn.Conv:
    """torch-style conv: explicit symmetric padding k//2*dilation.
    `dtype` is the computation dtype (bf16 on the fast path); params stay
    fp32 (mixed precision, the reference's AMP equivalent)."""
    if padding is None:
        pad = (kernel // 2) * dilation
        padding = ((pad, pad), (pad, pad))
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   kernel_dilation=(dilation, dilation), padding=padding,
                   use_bias=bias, feature_group_count=groups, name=name,
                   dtype=dtype)


def max_pool_3x3_s2(x):
    """torch MaxPool2d(3, 2, padding=1) on NHWC."""
    return nn.max_pool(x, (3, 3), strides=(2, 2),
                       padding=((1, 1), (1, 1)))


class ConvGN(nn.Module):
    """Conv + GroupNorm (basic.py:60-70)."""

    out_dim: int
    kernel_size: int
    gn_groups: int = 8
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x):
        x = conv(self.out_dim, self.kernel_size, name="conv",
                 dtype=self.dtype)(x)
        return nn.GroupNorm(num_groups=self.gn_groups, epsilon=GN_EPS,
                            name="gn", dtype=self.dtype)(x)


class GNActDWConv2d(nn.Module):
    """GroupNorm(32) + GELU + 5x5 depthwise conv on seq input
    (basic.py:15-35). x: [B, HW, C] with size_2d giving (H, W)."""

    indim: int
    gn_groups: int = 32
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x, size_2d: Tuple[int, int]):
        h, w = size_2d
        b, hw, c = x.shape
        x2 = x.reshape(b, h, w, c)
        x2 = nn.GroupNorm(num_groups=self.gn_groups, epsilon=GN_EPS,
                          name="gn", dtype=self.dtype)(x2)
        x2 = jax.nn.gelu(x2, approximate=False)
        x2 = conv(self.indim, 5, bias=False, groups=self.indim,
                  name="conv", dtype=self.dtype)(x2)
        return x2.reshape(b, hw, c)


class _DWKernel5x5(nn.Module):
    """Depthwise 5x5 as 25 shifted multiply-adds instead of a grouped conv:
    feature-group convs lower poorly on TPU (no MXU work to map), while the
    unrolled form fuses into one VPU pass over the map. Parameter path and
    shape ((5,5,1,C), lecun-normal) match nn.Conv so checkpoints are
    interchangeable. Measured: the GPM gated tails' 10 depthwise convs cost
    0.85 ms/frame as grouped convs on the 480p bench."""

    features: int
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x2, gate2=None, use_pallas: bool = False):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (5, 5, 1, self.features))
        dt = self.dtype or x2.dtype
        k = kernel.astype(dt)
        if use_pallas and gate2 is not None and self.features % 128 == 0:
            # fused gate-multiply + all 25 shifts in VMEM (inference only;
            # lane-dim DMAs need 128-aligned channels)
            from rmem_tpu.kernels.dwconv import pallas_gated_dwconv
            return pallas_gated_dwconv(x2.astype(dt), gate2.astype(dt), k)
        if gate2 is not None:
            x2 = x2 * gate2
        # Materialize the gated input ONCE before the 25 shifted reads.
        # Without the barrier XLA fuses the producer chain (gate silu,
        # attention epilogue) into the tap loop and recomputes it per tap:
        # the nine eval-step dwconv fusions each cost 1.55 ms/30 frames
        # (profile r3), ~25x the bandwidth cost of re-reading a
        # materialized 0.9 MB bf16 map.
        x2 = jax.lax.optimization_barrier(x2.astype(dt))
        xp = jnp.pad(x2, ((0, 0), (2, 2), (2, 2), (0, 0)))
        h, w = x2.shape[1:3]
        out = jnp.zeros(x2.shape, jnp.float32)
        for dy in range(5):
            for dx in range(5):
                out = out + (xp[:, dy:dy + h, dx:dx + w, :]
                             * k[dy, dx, 0]).astype(jnp.float32)
        return out.astype(dt)


class DWConv2d(nn.Module):
    """5x5 depthwise conv + dropout on seq input (basic.py:38-57).

    `unrolled` selects the formulation (identical params/math): the 25
    shift-add form is ~0.6 ms/frame faster at inference, but its backward
    graph bloats the training program (slower compile + step), so the
    trainer builds models with the grouped-conv form."""

    indim: int
    dropout: float = 0.1
    dtype: Optional[object] = None
    unrolled: bool = True

    @nn.compact
    def __call__(self, x, size_2d: Tuple[int, int],
                 deterministic: bool = True, gate=None,
                 use_pallas: bool = False):
        h, w = size_2d
        b, hw, c = x.shape
        x2 = x.reshape(b, h, w, c)
        gate2 = gate.reshape(b, h, w, c) if gate is not None else None
        if self.unrolled:
            x2 = _DWKernel5x5(self.indim, dtype=self.dtype,
                              name="conv")(x2, gate2, use_pallas)
        else:
            if gate2 is not None:
                x2 = x2 * gate2
            x2 = conv(self.indim, 5, bias=False, groups=self.indim,
                      name="conv", dtype=self.dtype)(x2)
        x2 = x2.reshape(b, hw, c)
        if self.dropout > 0.0 and not deterministic:
            # torch Dropout2d over channels of [B,C,H,W]: per (B, C) mask
            keep = 1.0 - self.dropout
            mask = jax.random.bernoulli(
                self.make_rng("dropout"), keep, (b, 1, c))
            x2 = x2 * mask.astype(x2.dtype) / keep
        return x2


def layer_norm(name: str) -> nn.LayerNorm:
    return nn.LayerNorm(epsilon=LN_EPS, name=name)


class GroupNorm1D(nn.Module):
    """GroupNorm over the channel axis of [B, HW, C] (basic.py:6-12)."""

    groups: int = 8

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=self.groups, epsilon=GN_EPS,
                            name="gn")(x)


def drop_path(x: jnp.ndarray, rate: float, rng: Optional[jax.Array],
              deterministic: bool) -> jnp.ndarray:
    """Stochastic depth over the batch dim (basic.py:98-117)."""
    if deterministic or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jnp.floor(keep + jax.random.uniform(rng, shape, x.dtype))
    return x / keep * mask


def silu(x):
    return x * jax.nn.sigmoid(x)
