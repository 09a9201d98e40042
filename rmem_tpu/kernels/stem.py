"""Pallas TPU kernel: fused ResNet stem (7x7/s2 conv + BN + relu + 3x3/s2
maxpool) for 3-channel inputs.

The reference delegates the stem to cuDNN (aot_plus/networks/encoders/
resnet.py:83-90). On TPU the plain XLA conv runs its Cin=3 contraction at
~3% effective MXU utilization and costs 0.36 ms/frame at 481x849 by graph
ablation (~27% of the encoder) — the single clearest hardware mismatch left
after r4. Both XLA-level rewrites measured as dead ends (space-to-depth
147 vs 154 FPS; im2col 91 vs 183: stride-2 sublane slices lower to per-tap
relayout copies), so this kernel does the patch assembly in VMEM where
layout is free:

* the image is transposed once to channel-major planes [3, H, W] and
  column-deinterleaved (even/odd) in XLA, so the stride-2 column access
  becomes contiguous-plus-lane-roll;
* each grid step DMAs one 40-row window of both parities (double-buffered
  across steps, as in kernels/local_attention.py) and assembles, per conv
  row, a [168, We] patch matrix from 21 slice+roll ops — tap (dx, c, dy)
  lives at sublane dx*24 + c*8 + dy, with the dy=7 pad row carrying real
  data but a zero weight;
* ONE MXU contraction per conv row ([We, 168] x [168, 64]) replaces the
  Cin=3 conv: K=168 fills the systolic array;
* BN affine + relu + the 3x3/s2 maxpool fuse in VMEM: the column max is
  two lane rolls, the row max spans the per-row scratch slabs, and the
  final stride-2 column selection is an exact 0/1 matmul on bf16 values
  (one nonzero per row, so f32 accumulation reproduces the value bit-for-
  bit), emitting pooled NHWC-ready [rows, cols, 64] blocks directly.

Pool-edge semantics: torch MaxPool2d(3, 2, padding=1) excludes padding from
the max; post-relu all values are >= 0, so zeroing out-of-range conv
rows/cols makes them max-neutral — EXCEPT that a conv row computed from
zero padding is relu(bias) != 0, which is why out-of-grid conv rows/cols
are masked to zero explicitly before pooling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xe_ref, xo_ref, w2_ref, ab_ref, sel_ref, out_ref,
            win, pbuf, mbuf, sems, *, nb: int, we: int, wo: int, ho: int,
            pwp: int):
    bi_img = pl.program_id(0)                   # batch image
    b = pl.program_id(1)                        # pool-row block
    lin = bi_img * nb + b
    total = pl.num_programs(0) * nb
    slot = jax.lax.rem(lin, 2)

    def issue(lin_, sl):
        i_ = lin_ // nb
        b_ = jax.lax.rem(lin_, nb)
        ce = pltpu.make_async_copy(
            xe_ref.at[i_, :, pl.ds(32 * b_, 40), :], win.at[sl, 0],
            sems.at[0, sl])
        co = pltpu.make_async_copy(
            xo_ref.at[i_, :, pl.ds(32 * b_, 40), :], win.at[sl, 1],
            sems.at[1, sl])
        return ce, co

    @pl.when(lin == 0)
    def _warmup():
        ce, co = issue(lin, slot)
        ce.start()
        co.start()

    @pl.when(lin + 1 < total)
    def _prefetch():
        ce, co = issue(lin + 1, jax.lax.rem(lin + 1, 2))
        ce.start()
        co.start()

    ce, co = issue(lin, slot)  # same descriptors, for the waits
    ce.wait()
    co.wait()

    w2 = w2_ref[:]                              # [168, 64] bf16
    sc = ab_ref[0:1, :]                         # [1, 64] bf16 (BN scale)
    bi = ab_ref[1:2, :]                         # [1, 64] bf16 (BN bias)
    colmask = jax.lax.broadcasted_iota(jnp.int32, (we, 64), 0) < wo

    for r in range(17):                         # conv rows 16b-1 .. 16b+15
        cr = 16 * b - 1 + r
        for dx in range(7):
            par, off = dx % 2, dx // 2
            for c in range(3):
                # window is f32: Mosaic rotates are 32-bit only; the cast
                # to bf16 AFTER the roll is the same rounding the plain
                # chain applies to x before its conv
                rows = win[slot, par, c, 2 * r:2 * r + 8, :]   # [8, we]
                row0 = dx * 24 + c * 8
                if off:
                    # left-shift by `off` (pltpu.roll wants shift >= 0)
                    rows = pltpu.roll(rows, we - off, axis=1)
                pbuf[row0:row0 + 8, :] = rows.astype(jnp.bfloat16)
        cm = jax.lax.dot_general(                      # [we, 64] f32
            pbuf[:], w2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # match the XLA stem's dtype chain exactly: conv emits bf16, BN
        # affine and relu run in bf16 (FoldedBN casts params to x.dtype)
        a = jnp.maximum(cm.astype(jnp.bfloat16) * sc + bi, 0)
        valid = jnp.logical_and(cr >= 0, cr <= ho - 1)
        a = jnp.where(jnp.logical_and(colmask, valid), a,
                      jnp.bfloat16(0))
        # pool rolls in f32 (32-bit rotate); values are exactly-representable
        # bf16, and max is a selection, so the round-trip is exact
        a32 = a.astype(jnp.float32)
        m = jnp.maximum(jnp.maximum(a32, pltpu.roll(a32, 1, axis=0)),
                        pltpu.roll(a32, we - 1, axis=0))
        mbuf[r] = m.astype(jnp.bfloat16)               # [17, we, 64]

    sel = sel_ref[:]                                   # [pwp, we] bf16
    for p in range(8):
        o = jnp.maximum(jnp.maximum(mbuf[2 * p], mbuf[2 * p + 1]),
                        mbuf[2 * p + 2])
        comp = jax.lax.dot_general(                    # exact 0/1 selection
            sel, o, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[0, 0, p] = comp.astype(out_ref.dtype)


@functools.lru_cache(maxsize=64)
def _sel_np(pwp: int, we: int) -> np.ndarray:
    s = np.zeros((pwp, we), np.float32)
    j = np.arange(pwp)
    keep = 2 * j < we
    s[j[keep], 2 * j[keep]] = 1.0
    return s


def pallas_stem(x: jnp.ndarray, kernel: jnp.ndarray, scale: jnp.ndarray,
                bias: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """maxpool3x3s2(relu(conv7x7s2(x) * scale + bias)) for x [B, H, W, 3].

    kernel: [7, 7, 3, 64] (the unchanged `conv1/kernel` param); scale/bias:
    [64] FoldedBN affine. Returns [B, ph, pw, 64] bf16 where ph/pw are the
    pooled dims ((H-1)//2//2 + 1 style, matching torch). Batch rides a
    leading grid dimension (the train graph encodes B*T frames at once);
    windows stay double-buffered across the flattened (image, block)
    sequence. bf16 compute path only (the f32 parity path keeps the plain
    conv)."""
    B, H, W, C = x.shape
    assert C == 3, C
    dt = jnp.bfloat16
    ho, wo = (H - 1) // 2 + 1, (W - 1) // 2 + 1
    ph, pw = (ho - 1) // 2 + 1, (wo - 1) // 2 + 1
    nb = -(-ph // 8)
    hp = 32 * (nb - 1) + 40
    wp = -(-(W + 7) // 256) * 256       # even; each parity is a 128-mult
    we = wp // 2
    pwp = -(-pw // 8) * 8

    xT = jnp.transpose(x.astype(jnp.float32), (0, 3, 1, 2))  # [B, 3, H, W]
    xp = jnp.pad(xT, ((0, 0), (0, 0), (5, hp - 5 - H), (3, wp - 3 - W)))
    xe, xo = xp[..., 0::2], xp[..., 1::2]           # [B, 3, hp, we] f32

    # K-dim order (dx, c, dy) with dy padded 7->8 (zero weight, real data)
    w2 = jnp.pad(kernel.astype(dt).transpose(1, 2, 0, 3),
                 ((0, 0), (0, 0), (0, 1), (0, 0))).reshape(168, 64)
    ab = jnp.stack([scale.astype(dt), bias.astype(dt)])  # [2, 64]
    sel = jnp.asarray(_sel_np(pwp, we), dt)

    kern = functools.partial(_kernel, nb=nb, we=we, wo=wo, ho=ho, pwp=pwp)
    out = pl.pallas_call(
        kern,
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),       # xe (HBM, DMA'd)
            pl.BlockSpec(memory_space=pltpu.ANY),       # xo
            pl.BlockSpec(memory_space=pltpu.VMEM),      # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),      # ab
            pl.BlockSpec(memory_space=pltpu.VMEM),      # sel
        ],
        out_specs=pl.BlockSpec((1, 1, 8, pwp, 64),
                               lambda i, b: (i, b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, nb, 8, pwp, 64), dt),
        scratch_shapes=[
            pltpu.VMEM((2, 2, 3, 40, we), jnp.float32),  # windows (dbl-buf)
            pltpu.VMEM((168, we), dt),                  # patch matrix
            pltpu.VMEM((17, we, 64), dt),               # col-pooled rows
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(xe, xo, w2, ab, sel)

    return out.reshape(B, nb * 8, pwp, 64)[:, :ph, :pw]


def xla_stem_chain(x, kernel, scale, bias):
    """The plain-stem chain as one function (bf16 conv -> FoldedBN affine
    -> relu -> torch maxpool 3x3/s2): the math the kernel reproduces, and
    the backward used by pallas_stem_trainable."""
    import flax.linen as nn

    dt = jnp.bfloat16
    y = jax.lax.conv_general_dilated(
        x.astype(dt), kernel.astype(dt), (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = nn.relu(y * scale.astype(dt) + bias.astype(dt))
    return nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def pallas_stem_trainable(x, kernel, scale, bias, interpret=False):
    """Differentiable stem: Pallas forward, XLA-VJP backward (the same
    saved-inputs transposition pattern as pallas_local_attention_trainable).
    Every forward execution — including the remat recompute inside the
    backward — runs the fused kernel; gradients come from transposing the
    math-identical XLA chain at the saved inputs."""
    return pallas_stem(x, kernel, scale, bias, interpret=interpret)


def _stem_fwd(x, kernel, scale, bias, interpret):
    out = pallas_stem(x, kernel, scale, bias, interpret=interpret)
    return out, (x, kernel, scale, bias)


def _stem_bwd(interpret, res, g):
    x, kernel, scale, bias = res
    _, vjp = jax.vjp(xla_stem_chain, x, kernel, scale, bias)
    return vjp(g.astype(jnp.bfloat16))


pallas_stem_trainable.defvjp(_stem_fwd, _stem_bwd)
