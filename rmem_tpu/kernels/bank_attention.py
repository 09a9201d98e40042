"""Pallas TPU kernels: fused query -> memory-bank cross-attention with a
per-slot attention-mass epilogue, forward AND backward (custom VJP).

This is the RMem hot path: every frame attends from [Lq] query tokens into
S fixed slots x [Lk] tokens of bank keys/values, and eviction additionally
needs the softmax mass each *slot* received (the reference materializes the
full [Lq, S*Lk] weight matrix to get it, aot_plus/networks/layers/
attention.py:45-64 + transformer.py:636-643). Flash-style streaming makes the
mass free: while the online softmax accumulates (m, l, acc) per query tile,
we also accumulate a [TQ, S] per-slot partial sum that is rescaled together
with l; the final division by l yields exactly softmax-mass-per-slot.

Backward is the standard flash-attention two-kernel split (a dq kernel
streaming over kv chunks, and a dk/dv kernel streaming over query tiles),
extended for the mass epilogue: the slot-mass output rec contributes
g_k += drec[slot(k)] to the softmax backward  ds = p * (g - delta)  with
delta = rowsum(dout*out) + rowsum(drec_h*rec_h), so gradients flow through
both outputs. Forward saves the per-row logsumexp, so nothing is
re-normalized in the backward pass.

Grid (fwd, dq): (B*heads, q_tiles, S * kv_chunks), kv minor-most so scratch
carries the online-softmax / dq state across the key stream for one query
tile. Grid (dk/dv): (B*heads, S * kv_chunks, q_tiles), q minor-most.
Invalid slots (slot >= count) and key padding are masked; input DMAs of
invalid slots are re-pointed at the last valid slot so Mosaic skips them.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(count_ref, q_ref, k_ref, v_ref, *refs,
            scale: float, lk: int, tk: int, chunks_per_slot: int,
            num_slots: int, want_lse: bool, has_bias: bool = False):
    if has_bias:
        bias_ref, refs = refs[0], refs[1:]
    else:
        bias_ref = None
    if want_lse:
        out_ref, rec_ref, lse_ref, m_scr, l_scr, acc_scr, mass_scr = refs
    else:
        out_ref, rec_ref, m_scr, l_scr, acc_scr, mass_scr = refs
        lse_ref = None
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
        if bias_ref is not None:
            # pre-scaled per-(query, slot) additive term (the factored slot
            # temporal PE): pick this slot's column with a masked row-sum
            sid = jax.lax.broadcasted_iota(jnp.int32, bias_ref[0].shape, 1)
            logits = logits + jnp.sum(
                jnp.where(sid == s, bias_ref[0], 0.0), axis=1, keepdims=True)
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
        if want_lse:
            lse_ref[0] = m_scr[:] + jnp.log(l)


def _dq_kernel(count_ref, q_ref, k_ref, v_ref, dout_ref, lse_ref, delta_ref,
               drech_ref, dq_ref, dq_scr,
               *, scale: float, lk: int, tk: int, chunks_per_slot: int,
               num_slots: int):
    skv = pl.program_id(2)
    s = skv // chunks_per_slot
    c = skv % chunks_per_slot
    total = pl.num_programs(2)

    @pl.when(skv == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    @pl.when(s < count_ref[0])
    def _step():
        q = q_ref[0]                               # [TQ, dh]
        k = k_ref[0, 0]                            # [TK, dh]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        key_pos = c * tk + jax.lax.broadcasted_iota(
            jnp.int32, logits.shape, 1)
        p = jnp.where(key_pos < lk,
                      jnp.exp(logits - lse_ref[0]), 0.0)   # [TQ, TK]
        # g_k = dout . v_k + drec[slot(k)]
        g = jax.lax.dot_general(
            dout_ref[0], v_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        slot_ids = jax.lax.broadcasted_iota(
            jnp.int32, drech_ref[0].shape, 1)
        r = jnp.sum(jnp.where(slot_ids == s, drech_ref[0], 0.0),
                    axis=1, keepdims=True)                 # [TQ, 1]
        ds = p * (g + r - delta_ref[0])                    # [TQ, TK]
        dq_scr[:] = dq_scr[:] + jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    @pl.when(skv == total - 1)
    def _fin():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _dkv_kernel(count_ref, q_ref, k_ref, v_ref, dout_ref, lse_ref, delta_ref,
                drech_ref, dk_ref, dv_ref, dk_scr, dv_scr,
                *, scale: float, lk: int, tk: int, chunks_per_slot: int,
                num_slots: int):
    skv = pl.program_id(1)
    s = skv // chunks_per_slot
    c = skv % chunks_per_slot
    qt = pl.program_id(2)
    q_total = pl.num_programs(2)

    @pl.when(qt == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    @pl.when(s < count_ref[0])
    def _step():
        q = q_ref[0]                               # [TQ, dh]
        k = k_ref[0, 0]                            # [TK, dh]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        key_pos = c * tk + jax.lax.broadcasted_iota(
            jnp.int32, logits.shape, 1)
        p = jnp.where(key_pos < lk,
                      jnp.exp(logits - lse_ref[0]), 0.0)   # [TQ, TK]
        dout = dout_ref[0]                         # [TQ, dv]
        dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
            p.astype(dout.dtype), dout, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        g = jax.lax.dot_general(
            dout, v_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        slot_ids = jax.lax.broadcasted_iota(
            jnp.int32, drech_ref[0].shape, 1)
        r = jnp.sum(jnp.where(slot_ids == s, drech_ref[0], 0.0),
                    axis=1, keepdims=True)
        ds = p * (g + r - delta_ref[0])            # [TQ, TK]
        dk_scr[:] = dk_scr[:] + jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    @pl.when(qt == q_total - 1)
    def _fin():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _divisor_tile(lk_pad: int, tile_k: int) -> int:
    """Largest multiple-of-128 tile <= tile_k that divides lk_pad (which is
    itself a multiple of 128), so pre-padded inputs need NO further pad."""
    best = 128
    t = 128
    while t <= min(tile_k, lk_pad):
        if lk_pad % t == 0:
            best = t
        t += 128
    return best


# Key-tile cap for the pre-padded inference path. 2176 (= 128*17) VMEM-fits
# on v5e (V tile 2176x1024 bf16 = 4.45 MB, double-buffered ~10 MB) and is
# the divisor that makes 480p's hw=6527 pad to 6528 instead of 8192 — 20%
# less QK+PV compute over pads.
INFER_TILE_K = 2304


def preferred_token_pad(hw: int, max_tile: int = INFER_TILE_K,
                        min_tile: int = 1024) -> int:
    """Smallest 128-multiple >= hw whose largest 128-multiple divisor
    <= max_tile is >= min_tile (or covers the whole extent in one chunk).

    The engine stores bank slots at this token count so the kernel's
    relayout emits no pad copy AND the tile stays wide enough to pipeline
    (a bare 128-multiple like 6527->6528 only admits a 384 tile under a
    2048 cap — measured 8 FPS slower than the 2048-tile layout; with the
    2176 tile admitted, 6528 beats 8192 by skipping 20% pad compute).
    Terminates at worst at the next 2048-multiple (2048 divides it)."""
    p = _round_up(hw, 128)
    while True:
        t = _divisor_tile(p, max_tile)
        if t >= min(min_tile, p):
            return p
        p += 128


def _layout(q, bank_k, bank_v, num_heads, tile_q, tile_k, true_lk=None,
            v_prelaid: bool = False):
    """Split heads, pad to tiles: q -> [BH, Lq_pad, dh], bank -> [S, BH,
    Lk_pad, d]. Returns the padded arrays plus the geometry tuple.

    true_lk: the number of VALID key tokens when the bank arrives already
    padded (the engine stores slots at a 128-multiple token count so this
    relayout is free at inference); tokens >= true_lk are masked inside the
    kernel. When the token dim is already 128-aligned the key tile is
    chosen as a DIVISOR so no pad copy is emitted.
    v_prelaid: bank_v is already in kernel layout ([S_total, BH, Lk_pad,
    dv], heads folded) and is passed through untouched — the zero-copy
    full-bank read path (requires num_heads == 1)."""
    s_slots, b, lk_in, _ = bank_k.shape
    lk = true_lk if true_lk is not None else lk_in
    lq = q.shape[1]
    dh = q.shape[-1] // num_heads
    dv = bank_v.shape[-1] // num_heads

    tq = min(tile_q, _round_up(lq, 128))
    if lk_in % 128 == 0:
        tk = _divisor_tile(lk_in, tile_k)
        lk_pad = lk_in
    else:
        tk = min(tile_k, _round_up(lk, 128))
        lk_pad = _round_up(lk, tk)
    lq_pad = _round_up(lq, tq)

    qh = q.reshape(b, lq, num_heads, dh).transpose(0, 2, 1, 3)
    qh = qh.reshape(b * num_heads, lq, dh)
    qh = jnp.pad(qh, ((0, 0), (0, lq_pad - lq), (0, 0)))
    kh = bank_k.reshape(s_slots, b, lk_in, num_heads, dh)
    kh = kh.transpose(0, 1, 3, 2, 4).reshape(s_slots, b * num_heads,
                                             lk_in, dh)
    kh = jnp.pad(kh, ((0, 0), (0, 0), (0, lk_pad - lk_in), (0, 0)))
    if v_prelaid:
        assert num_heads == 1 and bank_v.shape[2] == lk_pad, \
            (bank_v.shape, lk_pad, num_heads)
        vh = bank_v
        dv = bank_v.shape[-1]
    else:
        vh = bank_v.reshape(s_slots, b, lk_in, num_heads, dv)
        vh = vh.transpose(0, 1, 3, 2, 4).reshape(s_slots, b * num_heads,
                                                 lk_in, dv)
        vh = jnp.pad(vh, ((0, 0), (0, 0), (0, lk_pad - lk_in), (0, 0)))
    geom = (s_slots, b, lq, lk, dh, dv, tq, tk, lq_pad, lk_pad)
    return qh, kh, vh, geom


def _forward(q, bank_k, bank_v, count, num_heads, scale, tile_q, tile_k,
             want_lse: bool = False, true_lk=None, v_slot_base=None,
             qbias=None):
    """Raw fused forward. Returns (out_bh [BH,Lq_pad,dv], rec_bh
    [BH,Lq_pad,S], lse [BH,Lq_pad,1] | None, geom). lse is only emitted on
    the VJP forward — the inference path skips the extra output store.

    v_slot_base: when not None, bank_v is the FULL multi-layer bank in
    kernel layout ([L*S, B, Lk_pad, dv]) and this layer's slots start at
    the given static offset — the value operand is then a free reshape of
    the engine state (no per-layer slice/pad copy; the custom call reads
    straight from the persistent bank buffer).
    qbias: [BH, Lq, S] pre-scaled per-(query, slot) logit bias (the
    factored slot temporal PE)."""
    qh, kh, vh, geom = _layout(q, bank_k, bank_v, num_heads, tile_q, tile_k,
                               true_lk=true_lk,
                               v_prelaid=v_slot_base is not None)
    s_slots, b, lq, lk, dh, dv, tq, tk, lq_pad, lk_pad = geom
    chunks = lk_pad // tk
    bh = b * num_heads
    grid = (bh, lq_pad // tq, s_slots * chunks)
    vb = 0 if v_slot_base is None else int(v_slot_base)

    kernel = functools.partial(
        _kernel, scale=scale, lk=lk, tk=tk, chunks_per_slot=chunks,
        num_slots=s_slots, want_lse=want_lse, has_bias=qbias is not None)

    bias_in, bias_spec = [], []
    if qbias is not None:
        qb = jnp.pad(qbias.astype(jnp.float32),
                     ((0, 0), (0, lq_pad - qbias.shape[1]), (0, 0)))
        bias_in = [qb]
        bias_spec = [pl.BlockSpec((1, tq, s_slots),
                                  lambda bh_, qt, skv, *_: (bh_, qt, 0))]

    outs = pl.pallas_call(
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
                             (jnp.minimum(skv // chunks, jnp.maximum(cnt[0] - 1, 0)),
                              bh_, skv % chunks, 0)),
                pl.BlockSpec((1, 1, tk, dv),
                             lambda bh_, qt, skv, cnt:
                             (vb + jnp.minimum(skv // chunks,
                                               jnp.maximum(cnt[0] - 1, 0)),
                              bh_, skv % chunks, 0)),
            ] + bias_spec,
            out_specs=[
                pl.BlockSpec((1, tq, dv),
                             lambda bh_, qt, skv, *_: (bh_, qt, 0)),
                pl.BlockSpec((1, tq, s_slots),
                             lambda bh_, qt, skv, *_: (bh_, qt, 0)),
            ] + ([pl.BlockSpec((1, tq, 1),
                               lambda bh_, qt, skv, *_: (bh_, qt, 0))]
                 if want_lse else []),
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
        ] + ([jax.ShapeDtypeStruct((bh, lq_pad, 1), jnp.float32)]
             if want_lse else []),
    )(count.reshape(1).astype(jnp.int32), qh, kh, vh, *bias_in)
    out, rec = outs[0], outs[1]
    lse = outs[2] if want_lse else None
    return out, rec, lse, geom


def _kernel_qminor(count_ref, q_ref, k_ref, v_ref, out_ref, rec_ref,
                   m_scr, l_scr, acc_scr, mass_scr, o_stage, r_stage, sems,
                   *, scale: float, lk: int, tk: int, chunks_per_slot: int,
                   num_slots: int, tq: int):
    """Query-MINOR grid (bh, s*chunks, q_tiles): each K/V chunk is DMA'd
    once and every query tile streams past it, with the online-softmax
    state held for ALL query rows in VMEM scratch. The q-major `_kernel`
    re-streams the whole bank's V once per query tile (S*Lk*dv bytes x
    Lq/tq ~= 0.9 ms/frame of pure HBM traffic at eval shapes); this order
    reads V once per chunk at the cost of an [Lq_pad, dv] f32 accumulator
    (~7 MB — fits v5e VMEM with tk<=896). Inference-only (the VJP pair
    keeps the q-major layout)."""
    bh_ = pl.program_id(0)
    skv = pl.program_id(1)
    qt = pl.program_id(2)
    s = skv // chunks_per_slot
    c = jax.lax.rem(skv, chunks_per_slot)
    total_kv = pl.num_programs(1)
    row = pl.ds(qt * tq, tq)

    @pl.when(skv == 0)
    def _init():
        m_scr[row] = jnp.full((tq, 1), NEG_INF, jnp.float32)
        l_scr[row] = jnp.zeros((tq, 1), jnp.float32)
        acc_scr[row] = jnp.zeros_like(acc_scr[row])
        mass_scr[row] = jnp.zeros_like(mass_scr[row])

    @pl.when(s < count_ref[0])
    def _step():
        q = q_ref[0]                               # [TQ, dh]
        k = k_ref[0, 0]                            # [TK, dh]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        key_pos = c * tk + jax.lax.broadcasted_iota(
            jnp.int32, logits.shape, 1)
        logits = jnp.where(key_pos < lk, logits, NEG_INF)

        m_prev = m_scr[row]
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new)
        psum = jnp.sum(p, axis=-1, keepdims=True)

        l_scr[row] = l_scr[row] * alpha + psum
        acc_scr[row] = acc_scr[row] * alpha + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        slot_ids = jax.lax.broadcasted_iota(jnp.int32,
                                            mass_scr[row].shape, 1)
        mass_scr[row] = mass_scr[row] * alpha + jnp.where(
            slot_ids == s, psum, 0.0)
        m_scr[row] = m_new

    @pl.when(skv == total_kv - 1)
    def _finalize():
        # outputs live in ANY (HBM) space — blocked outputs would be
        # "revisited" under the q-minor grid (same out block touched at
        # every skv), which Pallas forbids; stage the final values in VMEM
        # and DMA the q-slice out once. The mass/rec lane dim is padded to
        # 128 (DMA lane extents must be 128-aligned)
        l = jnp.maximum(l_scr[row], 1e-30)
        o_stage[:] = (acc_scr[row] / l).astype(o_stage.dtype)
        r_stage[:] = (mass_scr[row] / l).astype(r_stage.dtype)
        co = pltpu.make_async_copy(
            o_stage, out_ref.at[bh_, row, :], sems.at[0])
        cr = pltpu.make_async_copy(
            r_stage, rec_ref.at[bh_, row, :], sems.at[1])
        co.start()
        cr.start()
        co.wait()
        cr.wait()


def _forward_qminor(q, bank_k, bank_v, count, num_heads, scale, tile_q,
                    tile_k):
    qh, kh, vh, geom = _layout(q, bank_k, bank_v, num_heads, tile_q, tile_k)
    s_slots, b, lq, lk, dh, dv, tq, tk, lq_pad, lk_pad = geom
    chunks = lk_pad // tk
    bh = b * num_heads
    grid = (bh, s_slots * chunks, lq_pad // tq)

    kernel = functools.partial(
        _kernel_qminor, scale=scale, lk=lk, tk=tk, chunks_per_slot=chunks,
        num_slots=s_slots, tq=tq)

    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, tq, dh),
                             lambda bh_, skv, qt, *_: (bh_, qt, 0)),
                # kv block index is constant across the q-minor axis, so
                # each chunk is fetched once and reused for every q tile
                pl.BlockSpec((1, 1, tk, dh),
                             lambda bh_, skv, qt, cnt:
                             (jnp.minimum(skv // chunks,
                                          jnp.maximum(cnt[0] - 1, 0)),
                              bh_, jax.lax.rem(skv, chunks), 0)),
                pl.BlockSpec((1, 1, tk, dv),
                             lambda bh_, skv, qt, cnt:
                             (jnp.minimum(skv // chunks,
                                          jnp.maximum(cnt[0] - 1, 0)),
                              bh_, jax.lax.rem(skv, chunks), 0)),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            scratch_shapes=[
                pltpu.VMEM((lq_pad, 1), jnp.float32),        # m
                pltpu.VMEM((lq_pad, 1), jnp.float32),        # l
                pltpu.VMEM((lq_pad, dv), jnp.float32),       # acc
                pltpu.VMEM((lq_pad, 128), jnp.float32),      # slot mass
                pltpu.VMEM((tq, dv), bank_v.dtype),          # out staging
                pltpu.VMEM((tq, 128), jnp.float32),          # rec staging
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh, lq_pad, dv), bank_v.dtype),
            jax.ShapeDtypeStruct((bh, lq_pad, 128), jnp.float32),
        ],
    )(count.reshape(1).astype(jnp.int32), qh, kh, vh)
    return outs[0], outs[1][..., :s_slots], geom


def pallas_bank_attention_infer(q, bank_k, bank_v, count, num_heads: int,
                                scale: Optional[float] = None,
                                tile_q: int = 256,
                                tile_k: int = INFER_TILE_K,
                                true_lk: Optional[int] = None,
                                v_slot_base: Optional[int] = None,
                                qbias: Optional[jnp.ndarray] = None
                                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inference-only forward with padded-state support (no VJP).

    true_lk: number of valid key tokens when the bank is stored pre-padded
    to a 128-multiple (the engine's layout) — padding is masked in-kernel
    and the relayout pad copy is skipped entirely.
    v_slot_base: read this layer's values straight out of the FULL
    multi-layer value bank ([L*S, B, Lk_pad, dv], a free reshape of the
    engine state) at the given static slot offset — the custom call's value
    operand aliases the persistent bank buffer instead of a per-layer
    slice+pad copy (the r3 profile's 4.6 ms/30 frames of
    slice_bitcast_fusions). Requires num_heads == 1.
    qbias: [B*heads, Lq, S] pre-scaled per-(query, slot) logit bias — the
    factored slot temporal PE (see ops.attention._slot_pe_bias), exact and
    avoids rebuilding the bank_k + pe slab every frame.
    """
    import os
    tile_q = int(os.environ.get("RMEM_BANK_TQ", tile_q))
    tile_k = int(os.environ.get("RMEM_BANK_TK", tile_k))
    dh = q.shape[-1] // num_heads
    scale = scale if scale is not None else dh ** -0.5
    out_bh, rec_bh, _, geom = _forward(q, bank_k, bank_v, count, num_heads,
                                       float(scale), int(tile_q),
                                       int(tile_k), true_lk=true_lk,
                                       v_slot_base=v_slot_base, qbias=qbias)
    return _unlayout_out(out_bh, rec_bh, geom, num_heads)


def pallas_bank_attention_qminor(q, bank_k, bank_v, count, num_heads: int,
                                 scale: Optional[float] = None,
                                 tile_q: int = 256, tile_k: int = 896):
    """Inference-only q-minor bank attention (V streamed once per chunk).
    Same contract as pallas_bank_attention; no VJP."""
    import os
    tile_q = int(os.environ.get("RMEM_BANKI_TQ", tile_q))
    tile_k = int(os.environ.get("RMEM_BANKI_TK", tile_k))
    dh = q.shape[-1] // num_heads
    scale = scale if scale is not None else dh ** -0.5
    out_bh, rec_bh, geom = _forward_qminor(q, bank_k, bank_v, count,
                                           num_heads, float(scale),
                                           int(tile_q), int(tile_k))
    return _unlayout_out(out_bh, rec_bh, geom, num_heads)


def _unlayout_out(out_bh, rec_bh, geom, num_heads):
    s_slots, b, lq, lk, dh, dv, *_ = geom
    out = out_bh[:, :lq].reshape(b, num_heads, lq, dv).transpose(0, 2, 1, 3)
    out = out.reshape(b, lq, num_heads * dv)
    rec = rec_bh[:, :lq].reshape(b, num_heads, lq, s_slots).mean(axis=1)
    return out, rec


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _bank_attention(q, bank_k, bank_v, count, num_heads, scale,
                    tile_q, tile_k):
    out_bh, rec_bh, _, geom = _forward(q, bank_k, bank_v, count, num_heads,
                                       scale, tile_q, tile_k)
    return _unlayout_out(out_bh, rec_bh, geom, num_heads)


def _bank_attention_fwd(q, bank_k, bank_v, count, num_heads, scale,
                        tile_q, tile_k):
    out_bh, rec_bh, lse, geom = _forward(q, bank_k, bank_v, count, num_heads,
                                         scale, tile_q, tile_k,
                                         want_lse=True)
    out, rec = _unlayout_out(out_bh, rec_bh, geom, num_heads)
    return (out, rec), (q, bank_k, bank_v, count, out_bh, rec_bh, lse)


def _bank_attention_bwd(num_heads, scale, tile_q, tile_k, res, cts):
    q, bank_k, bank_v, count, out_bh, rec_bh, lse = res
    dout, drec = cts
    # the backward kernels carry much larger per-block state than the
    # forward (dk [TK,dh] + dv [TK,dv] fp32 scratch plus the double-buffered
    # in/out blocks), so the forward's one-chunk-per-slot tile_k would blow
    # VMEM (observed: Mosaic compile failures / spills at dv=1024). Cap the
    # bwd key tile; the saved out/rec/lse layouts only depend on tile_q.
    tile_k = min(tile_k, 512)
    qh, kh, vh, geom = _layout(q, bank_k, bank_v, num_heads, tile_q, tile_k)
    s_slots, b, lq, lk, dh, dv, tq, tk, lq_pad, lk_pad = geom
    chunks = lk_pad // tk
    bh = b * num_heads

    # cotangents into the padded [BH, ...] layout
    douth = dout.reshape(b, lq, num_heads, dv).transpose(0, 2, 1, 3)
    douth = douth.reshape(bh, lq, dv).astype(jnp.float32)
    douth = jnp.pad(douth, ((0, 0), (0, lq_pad - lq), (0, 0)))
    # rec output is the head MEAN, so each head sees drec / H
    drech = (drec.astype(jnp.float32) / num_heads)[:, None]
    drech = jnp.broadcast_to(drech, (b, num_heads, lq, s_slots))
    drech = drech.reshape(bh, lq, s_slots)
    drech = jnp.pad(drech, ((0, 0), (0, lq_pad - lq), (0, 0)))

    # delta = sum_k p_k g_k = rowsum(dout*out) + rowsum(drec_h * rec_h)
    delta = jnp.sum(douth * out_bh.astype(jnp.float32), axis=-1,
                    keepdims=True)
    delta = delta + jnp.sum(drech * rec_bh, axis=-1, keepdims=True)

    cnt = count.reshape(1).astype(jnp.int32)
    common = dict(scale=scale, lk=lk, tk=tk, chunks_per_slot=chunks,
                  num_slots=s_slots)

    def q_spec(width):
        return pl.BlockSpec((1, tq, width),
                            lambda bh_, a, b_, *_: (bh_, a, 0))

    def q_spec_minor(width):
        return pl.BlockSpec((1, tq, width),
                            lambda bh_, skv, qt, *_: (bh_, qt, 0))

    def kv_spec(width, clamp=True):
        def idx(bh_, a, b_, cnt_):
            skv = b_
            sl = skv // chunks
            if clamp:
                sl = jnp.minimum(sl, jnp.maximum(cnt_[0] - 1, 0))
            return (sl, bh_, skv % chunks, 0)
        return pl.BlockSpec((1, 1, tk, width), idx)

    def kv_spec_minor(width, clamp=True):
        def idx(bh_, skv, qt, cnt_):
            sl = skv // chunks
            if clamp:
                sl = jnp.minimum(sl, jnp.maximum(cnt_[0] - 1, 0))
            return (sl, bh_, skv % chunks, 0)
        return pl.BlockSpec((1, 1, tk, width), idx)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, lq_pad // tq, s_slots * chunks),
            in_specs=[q_spec(dh), kv_spec(dh), kv_spec(dv), q_spec(dv),
                      q_spec(1), q_spec(1), q_spec(s_slots)],
            out_specs=[q_spec(dh)],
            scratch_shapes=[pltpu.VMEM((tq, dh), jnp.float32)],
        ),
        out_shape=[jax.ShapeDtypeStruct((bh, lq_pad, dh), jnp.float32)],
    )(cnt, qh, kh, vh, douth, lse, delta, drech)[0]

    dk, dvv = pl.pallas_call(
        functools.partial(_dkv_kernel, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, s_slots * chunks, lq_pad // tq),
            in_specs=[q_spec_minor(dh), kv_spec_minor(dh),
                      kv_spec_minor(dv), q_spec_minor(dv),
                      q_spec_minor(1), q_spec_minor(1),
                      q_spec_minor(s_slots)],
            out_specs=[kv_spec_minor(dh, clamp=False),
                       kv_spec_minor(dv, clamp=False)],
            scratch_shapes=[pltpu.VMEM((tk, dh), jnp.float32),
                            pltpu.VMEM((tk, dv), jnp.float32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((s_slots, bh, lk_pad, dh), jnp.float32),
            jax.ShapeDtypeStruct((s_slots, bh, lk_pad, dv), jnp.float32),
        ],
    )(cnt, qh, kh, vh, douth, lse, delta, drech)

    # back to caller layouts
    dq = dq[:, :lq].reshape(b, num_heads, lq, dh).transpose(0, 2, 1, 3)
    dq = dq.reshape(b, lq, num_heads * dh).astype(q.dtype)
    dk = dk[:, :, :lk].reshape(s_slots, b, num_heads, lk, dh)
    dk = dk.transpose(0, 1, 3, 2, 4).reshape(s_slots, b, lk, num_heads * dh)
    dvv = dvv[:, :, :lk].reshape(s_slots, b, num_heads, lk, dv)
    dvv = dvv.transpose(0, 1, 3, 2, 4).reshape(s_slots, b, lk, num_heads * dv)
    dcount = np.zeros(count.shape, jax.dtypes.float0)
    return dq.astype(q.dtype), dk.astype(bank_k.dtype), \
        dvv.astype(bank_v.dtype), dcount


_bank_attention.defvjp(_bank_attention_fwd, _bank_attention_bwd)


def pallas_bank_attention(q: jnp.ndarray, bank_k: jnp.ndarray,
                          bank_v: jnp.ndarray, count: jnp.ndarray,
                          num_heads: int, scale: Optional[float] = None,
                          tile_q: int = 256, tile_k: int = 2048
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Same contract as ops.attention.bank_attention but fused, and
    differentiable (flash-style Pallas backward, incl. gradient flow
    through the slot-mass record).

    q: [B, Lq, h*dh]; bank_k: [S, B, Lk, h*dh]; bank_v: [S, B, Lk, h*dv];
    count: scalar int32 (valid slots). Returns (out [B, Lq, h*dv],
    record [B, Lq, S] head-averaged slot mass).

    tile_k defaults high so each slot is ONE kv chunk when it fits VMEM
    (the internal tile clamps to round_up(Lk, 128)): at the 1674-token eval
    grid, 512-key chunks pad Lk to 2048 (18% wasted MXU work) — on-chip
    sweep: tk=2048 -> 115.7 FPS vs tk=512 -> 109.4 on the 480p bench.
    V is re-streamed from HBM once per QUERY tile (S*Lk*dv bytes each), so
    fewer/larger query tiles cut the dominant HBM traffic; tile_q is
    VMEM-bound against the [tq, tk] f32 logits and [tq, dv] f32 accumulator.
    RMEM_BANK_TQ / RMEM_BANK_TK env knobs exist for on-chip sweeps.
    """
    import os
    tile_q = int(os.environ.get("RMEM_BANK_TQ", tile_q))
    tile_k = int(os.environ.get("RMEM_BANK_TK", tile_k))
    dh = q.shape[-1] // num_heads
    scale = scale if scale is not None else dh ** -0.5
    return _bank_attention(q, bank_k, bank_v, count, num_heads, float(scale),
                           int(tile_q), int(tile_k))
