"""Pallas TPU kernel: fused query -> memory-bank cross-attention with a
per-slot attention-mass epilogue.

This is the RMem hot path: every frame attends from [Lq] query tokens into
S fixed slots x [Lk] tokens of bank keys/values, and eviction additionally
needs the softmax mass each *slot* received (the reference materializes the
full [Lq, S*Lk] weight matrix to get it, aot_plus/networks/layers/
attention.py:45-64 + transformer.py:636-643). Flash-style streaming makes the
mass free: while the online softmax accumulates (m, l, acc) per query tile,
we also accumulate a [TQ, S] per-slot partial sum that is rescaled together
with l; the final division by l yields exactly softmax-mass-per-slot.

Grid: (B*heads, q_tiles, S * kv_chunks), kv minor-most so scratch carries the
online-softmax state across the key stream for one query tile. Invalid slots
(slot >= count) and key padding are masked with -inf before the max.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(count_ref, q_ref, k_ref, v_ref, out_ref, rec_ref,
            m_scr, l_scr, acc_scr, mass_scr,
            *, scale: float, lk: int, tk: int, chunks_per_slot: int,
            num_slots: int):
    skv = pl.program_id(2)
    s = skv // chunks_per_slot
    c = skv % chunks_per_slot
    total = pl.num_programs(2)

    @pl.when(skv == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        mass_scr[:] = jnp.zeros_like(mass_scr)

    valid_slot = s < count_ref[0]

    @pl.when(valid_slot)
    def _step():
        # keep q/k/v in their storage dtype (bf16 on the fast path) so the
        # MXU runs at full rate; accumulate in fp32 via preferred_element_type
        q = q_ref[0]                               # [TQ, dh]
        k = k_ref[0, 0]                            # [TK, dh]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # [TQ, TK]
        # mask key padding beyond the slot's true length
        key_pos = c * tk + jax.lax.broadcasted_iota(
            jnp.int32, logits.shape, 1)
        logits = jnp.where(key_pos < lk, logits, NEG_INF)

        m_prev = m_scr[:]                          # [TQ, 1]
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new)                # [TQ, TK]
        psum = jnp.sum(p, axis=-1, keepdims=True)

        l_scr[:] = l_scr[:] * alpha + psum
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # rescale all slot masses, add this chunk's mass to slot s
        slot_ids = jax.lax.broadcasted_iota(jnp.int32, mass_scr.shape, 1)
        mass_scr[:] = mass_scr[:] * alpha + jnp.where(
            slot_ids == s, psum, 0.0)
        m_scr[:] = m_new

    @pl.when(skv == total - 1)
    def _finalize():
        l = jnp.maximum(l_scr[:], 1e-30)
        out_ref[0] = (acc_scr[:] / l).astype(out_ref.dtype)
        rec_ref[0] = (mass_scr[:] / l).astype(rec_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def pallas_bank_attention(q: jnp.ndarray, bank_k: jnp.ndarray,
                          bank_v: jnp.ndarray, count: jnp.ndarray,
                          num_heads: int, scale: Optional[float] = None,
                          tile_q: int = 256, tile_k: int = 512
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Same contract as ops.attention.bank_attention but fused.

    q: [B, Lq, h*dh]; bank_k: [S, B, Lk, h*dh]; bank_v: [S, B, Lk, h*dv];
    count: scalar int32 (valid slots). Returns (out [B, Lq, h*dv],
    record [B, Lq, S] head-averaged slot mass).
    """
    s_slots, b, lk, _ = bank_k.shape
    lq = q.shape[1]
    dh = q.shape[-1] // num_heads
    dv = bank_v.shape[-1] // num_heads
    scale = scale if scale is not None else dh ** -0.5

    tq = min(tile_q, _round_up(lq, 128))
    tk = min(tile_k, _round_up(lk, 128))
    lq_pad = _round_up(lq, tq)
    lk_pad = _round_up(lk, tk)
    chunks = lk_pad // tk

    # [BH, Lq_pad, dh]
    qh = q.reshape(b, lq, num_heads, dh).transpose(0, 2, 1, 3)
    qh = qh.reshape(b * num_heads, lq, dh)
    qh = jnp.pad(qh, ((0, 0), (0, lq_pad - lq), (0, 0)))
    # [S, BH, Lk_pad, d*]
    kh = bank_k.reshape(s_slots, b, lk, num_heads, dh).transpose(0, 1, 3, 2, 4)
    kh = kh.reshape(s_slots, b * num_heads, lk, dh)
    kh = jnp.pad(kh, ((0, 0), (0, 0), (0, lk_pad - lk), (0, 0)))
    vh = bank_v.reshape(s_slots, b, lk, num_heads, dv).transpose(0, 1, 3, 2, 4)
    vh = vh.reshape(s_slots, b * num_heads, lk, dv)
    vh = jnp.pad(vh, ((0, 0), (0, 0), (0, lk_pad - lk), (0, 0)))

    bh = b * num_heads
    grid = (bh, lq_pad // tq, s_slots * chunks)

    kernel = functools.partial(
        _kernel, scale=scale, lk=lk, tk=tk, chunks_per_slot=chunks,
        num_slots=s_slots)

    out, rec = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                # index maps receive the scalar-prefetch ref as a trailing
                # arg; invalid slots re-point at the last valid slot's block
                # so Mosaic skips their DMAs entirely
                pl.BlockSpec((1, tq, dh),
                             lambda bh_, qt, skv, *_: (bh_, qt, 0)),
                pl.BlockSpec((1, 1, tk, dh),
                             lambda bh_, qt, skv, cnt:
                             (jnp.minimum(skv // chunks, cnt[0] - 1),
                              bh_, skv % chunks, 0)),
                pl.BlockSpec((1, 1, tk, dv),
                             lambda bh_, qt, skv, cnt:
                             (jnp.minimum(skv // chunks, cnt[0] - 1),
                              bh_, skv % chunks, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, tq, dv),
                             lambda bh_, qt, skv, *_: (bh_, qt, 0)),
                pl.BlockSpec((1, tq, s_slots),
                             lambda bh_, qt, skv, *_: (bh_, qt, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((tq, 1), jnp.float32),        # m
                pltpu.VMEM((tq, 1), jnp.float32),        # l
                pltpu.VMEM((tq, dv), jnp.float32),       # acc
                pltpu.VMEM((tq, s_slots), jnp.float32),  # slot mass
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh, lq_pad, dv), bank_v.dtype),
            jax.ShapeDtypeStruct((bh, lq_pad, s_slots), jnp.float32),
        ],
    )(count.reshape(1).astype(jnp.int32), qh, kh, vh)

    out = out[:, :lq].reshape(b, num_heads, lq, dv).transpose(0, 2, 1, 3)
    out = out.reshape(b, lq, num_heads * dv)
    rec = rec[:, :lq].reshape(b, num_heads, lq, s_slots).mean(axis=1)
    return out, rec
