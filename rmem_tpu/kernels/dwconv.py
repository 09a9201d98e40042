"""Pallas TPU kernel: fused gate-multiply + depthwise 5x5 conv.

The GPM gated tails compute projection(dwconv5x5(agg * gate)) six times per
frame (attention.py:206-209). The XLA unrolled form re-reads the padded map
25 times from HBM per conv (ablation budget: 0.51 ms/frame for the six
tails). This kernel DMAs each T-row band of agg and gate ONCE into VMEM,
forms the gated product and all 25 shifted multiply-adds on-chip, and
writes the band result — HBM traffic drops to read-agg + read-gate +
write-out. The 1x1 projection stays in XLA (a clean MXU matmul).

Parameter layout matches _DWKernel5x5 / nn.Conv ((5, 5, 1, C)); the caller
reshapes to [25, C].
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, g_ref, w_ref, out_ref, xb, gb, sems, *,
            T: int, W: int, Wp: int, C: int):
    b0 = pl.program_id(0)
    i = pl.program_id(1)
    y0 = i * T

    cx = pltpu.make_async_copy(
        x_ref.at[b0, pl.ds(y0, T + 4), :, :], xb, sems.at[0])
    cg = pltpu.make_async_copy(
        g_ref.at[b0, pl.ds(y0, T + 4), :, :], gb, sems.at[1])
    cx.start()
    cg.start()
    cx.wait()
    cg.wait()

    xg = xb[:] * gb[:]                                # [T+4, Wp, C]
    acc = jnp.zeros((T, W, C), jnp.float32)
    for dy in range(5):
        for dx in range(5):
            wv = w_ref[dy * 5 + dx:dy * 5 + dx + 1, :].reshape(1, 1, C)
            acc = acc + (xg[dy:dy + T, dx:dx + W, :]
                         * wv).astype(jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


def pallas_gated_dwconv(x: jnp.ndarray, gate: jnp.ndarray,
                        kernel: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
    """dwconv5x5(x * gate), depthwise, zero-padded — fused in VMEM.

    x, gate: [B, H, W, C]; kernel: [5, 5, 1, C] (nn.Conv layout).
    Returns [B, H, W, C] in x.dtype. Inference-only (no VJP).
    """
    b, h, w, c = x.shape
    T = 8
    ty = -(-h // T)
    # pad: conv halo (2) on each side, bottom slack so the last band's
    # [T+4]-row DMA stays in bounds, and the width rounded to the sublane
    # tile (8) — Mosaic requires DMA'd sublane extents to be 8-aligned
    wp = -(-(w + 4) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (2, 2 + (ty * T - h)),
                     (2, wp - w - 2), (0, 0)))
    gp = jnp.pad(gate, ((0, 0), (2, 2 + (ty * T - h)),
                        (2, wp - w - 2), (0, 0)))
    k25 = kernel.reshape(25, c).astype(x.dtype)

    fn = functools.partial(_kernel, T=T, W=w, Wp=wp, C=c)
    out = pl.pallas_call(
        fn,
        grid=(b, ty),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((25, c), lambda b0, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, T, w, c), lambda b0, i: (b0, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, ty * T, w, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((T + 4, wp, c), x.dtype),
            pltpu.VMEM((T + 4, wp, c), gate.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, gp, k25)
    return out[:, :h]
