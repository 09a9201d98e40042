"""Attention ops, TPU-first formulations.

Three reference primitives (aot_plus/networks/layers/attention.py) map to:

- `multihead_attention`: plain scaled-dot-product over [B, L, C] sequences
  (attention.py:8-86). fp32 softmax, bf16 matmuls.
- `bank_attention`: query -> fixed-capacity memory bank cross-attention with
  invalid slots masked and an optional per-slot attention-mass epilogue (the
  RMem eviction signal, transformer.py:632-643). This replaces the
  reference's flatten-[T*HW]-then-SDPA with an explicitly slot-blocked einsum
  so slot masses fall out of the softmax for free; the Pallas kernel
  (rmem_tpu/kernels) implements the same contract fused.
- `dense_local_attention`: DeAOT's 15x15 windowed attention
  (attention.py:220-413). The reference unfolds K into a 225x blow-up (the
  memory hot spot); on TPU we instead run a *dense* HW x HW attention on the
  MXU with a static window mask and scatter the learned relative-position
  bias into dense form via a precomputed index map. At VOS resolutions
  (HW ~ 900-2500) dense logits are small and the matmul is
  systolic-array-shaped, so this is both simpler and faster than
  gather-based windowing.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


def multihead_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                        num_heads: int,
                        scale: Optional[float] = None) -> jnp.ndarray:
    """q [B,Lq,C], k [B,Lk,C], v [B,Lk,Cv] -> [B,Lq,Cv]."""
    b, lq, c = q.shape
    dh = c // num_heads
    dv = v.shape[-1] // num_heads
    scale = scale if scale is not None else dh ** -0.5
    qh = q.reshape(b, lq, num_heads, dh)
    kh = k.reshape(b, -1, num_heads, dh)
    vh = v.reshape(b, -1, num_heads, dv)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * scale
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), vh)
    return out.reshape(b, lq, num_heads * dv)


def bank_attention(q: jnp.ndarray, bank_k: jnp.ndarray, bank_v: jnp.ndarray,
                   slot_mask: jnp.ndarray, num_heads: int,
                   need_record: bool = False,
                   scale: Optional[float] = None,
                   true_lk: Optional[int] = None,
                   logit_bias: Optional[jnp.ndarray] = None
                   ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Cross-attention from the current frame into the memory bank.

    q: [B, Lq, Ck] (temporal PE already added by caller)
    bank_k: [S, B, Lk, Ck] (slot temporal PE already added, unless it rides
      in via logit_bias)
    bank_v: [S, B, Lk, Cv]
    slot_mask: [S] bool — valid slots.
    logit_bias: [B, h, Lq, S] pre-scaled per-slot additive logit term —
      the factored form of the slot temporal PE: since the PE is constant
      over a slot's tokens, q.(k+pe_s) == q.k + q.pe_s, so adding the tiny
      q.pe product to the logits is exact and skips materializing the
      bank_k + pe slab (S*B*Lk*Ck, ~100 MB/frame at eval shapes).

    Returns (out [B, Lq, Cv], record [B, Lq, S] or None) where record is the
    head-averaged attention mass per slot (sums to 1 over valid slots per
    query) — the importance signal for eviction (transformer.py:636-643).
    """
    s, b, lk, ck = bank_k.shape
    lq = q.shape[1]
    dh = ck // num_heads
    dv = bank_v.shape[-1] // num_heads
    scale = scale if scale is not None else dh ** -0.5

    qh = q.reshape(b, lq, num_heads, dh)
    kh = bank_k.reshape(s, b, lk, num_heads, dh)
    vh = bank_v.reshape(s, b, lk, num_heads, dv)

    logits = jnp.einsum("bqhd,sbkhd->bhqsk", qh, kh) * scale
    if logit_bias is not None:
        logits = logits + logit_bias[..., None].astype(logits.dtype)
    logits = jnp.where(slot_mask[None, None, None, :, None], logits, NEG_INF)
    if true_lk is not None and true_lk < lk:
        # bank stored pre-padded to a 128-multiple token count: padded key
        # positions get exactly-zero softmax weight (exp(-1e30-max) == 0.0
        # in f32), so outputs and slot masses are unchanged
        logits = jnp.where(jnp.arange(lk) < true_lk, logits, NEG_INF)
    flat = logits.reshape(b, num_heads, lq, s * lk).astype(jnp.float32)
    probs = jax.nn.softmax(flat, axis=-1).reshape(b, num_heads, lq, s, lk)
    out = jnp.einsum("bhqsk,sbkhd->bqhd", probs.astype(bank_v.dtype), vh)
    out = out.reshape(b, lq, num_heads * dv)

    record = None
    if need_record:
        record = probs.mean(axis=1).sum(axis=-1)  # [B, Lq, S]
    return out, record


@functools.lru_cache(maxsize=16)
def _local_offset_map(h: int, w: int, max_dis: int) -> np.ndarray:
    """Static [HW, HW] int32 map: key position -> window-offset index in
    [0, win^2), or win^2 for out-of-window (sentinel).

    Encodes the same geometry as the reference's pad_and_unfold + local2global
    scatter (attention.py:363-413) but as a dense gather index.
    """
    win = 2 * max_dis + 1
    qy, qx = np.divmod(np.arange(h * w), w)
    ky, kx = np.divmod(np.arange(h * w), w)
    dy = ky[None, :] - qy[:, None]
    dx = kx[None, :] - qx[:, None]
    inside = (np.abs(dy) <= max_dis) & (np.abs(dx) <= max_dis)
    off = (dy + max_dis) * win + (dx + max_dis)
    return np.where(inside, off, win * win).astype(np.int32)


def dense_local_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          rel_emb: jnp.ndarray, size_2d: Tuple[int, int],
                          num_heads: int, max_dis: int = 7,
                          scale: Optional[float] = None,
                          need_record: bool = False
                          ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Windowed local attention as masked dense attention.

    q, k: [B, HW, h*d_att]; v: [B, HW, Cv]; rel_emb: [B, HW, h*win^2]
    (the learned relative bias produced from *unscaled* q by a 1x1 conv,
    attention.py:314). Softmax runs over each query's (2*max_dis+1)^2 window;
    off-image positions are masked exactly like the reference's zero-pad
    unfold mask (attention.py:305-312,344).
    """
    h2d, w2d = size_2d
    b, hw, chd = q.shape
    dh = chd // num_heads
    dv = v.shape[-1] // num_heads
    win2 = (2 * max_dis + 1) ** 2
    scale = scale if scale is not None else dh ** -0.5

    omap = jnp.asarray(_local_offset_map(h2d, w2d, max_dis))  # [HW, HW]

    qh = q.reshape(b, hw, num_heads, dh)
    kh = k.reshape(b, hw, num_heads, dh)
    vh = v.reshape(b, hw, num_heads, dv)

    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * scale

    # scatter relative bias to dense: rel[b, q, h, o] -> bias[b, h, q, k]
    rel = rel_emb.reshape(b, hw, num_heads, win2)
    rel = jnp.concatenate(
        [rel, jnp.full((b, hw, num_heads, 1), NEG_INF, rel.dtype)], axis=-1)
    rel = rel.transpose(0, 2, 1, 3)  # [b, h, q, win2+1]
    bias = jnp.take_along_axis(
        rel, omap[None, None].astype(jnp.int32), axis=-1)  # [b,h,HW,HW]

    logits = jnp.maximum(logits + bias, NEG_INF)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), vh)
    out = out.reshape(b, hw, num_heads * dv)
    return out, (probs if need_record else None)


def windowed_local_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                             rel_emb: jnp.ndarray, size_2d: Tuple[int, int],
                             num_heads: int, max_dis: int = 7,
                             scale: Optional[float] = None) -> jnp.ndarray:
    """Shift-based windowed local attention — gather-free TPU formulation.

    Mathematically identical to `dense_local_attention` (same reference
    semantics, attention.py:289-361) but built from (2m+1)^2 static spatial
    shifts of zero-padded K/V: logits live in window space [B,h,HW,win^2]
    where the learned relative bias applies with NO [HW,HW] gather, and the
    value aggregation is a per-offset multiply-accumulate. On TPU the dense
    variant's bias gather costs ~35 ms/layer at VOS sizes; this one is
    pure VPU shifts.
    """
    h2d, w2d = size_2d
    b, hw, chd = q.shape
    dh = chd // num_heads
    cv = v.shape[-1]
    dv = cv // num_heads
    full_win = 2 * max_dis + 1
    # offsets beyond the grid are always masked out, so clamping the window
    # to the grid is exact and shrinks the unrolled shift count on small
    # feature maps (matters for compile time)
    eff_dis = min(max_dis, h2d - 1, w2d - 1)
    win = 2 * eff_dis + 1
    if eff_dis != max_dis:
        r = rel_emb.reshape(b, hw, num_heads, full_win, full_win)
        lo, hi = max_dis - eff_dis, max_dis + eff_dis + 1
        rel_emb = r[..., lo:hi, lo:hi].reshape(b, hw, num_heads * win * win)
    max_dis = eff_dis
    scale = scale if scale is not None else dh ** -0.5

    q4 = q.reshape(b, h2d, w2d, num_heads, dh)
    k4 = jnp.pad(k.reshape(b, h2d, w2d, num_heads, dh),
                 ((0, 0), (max_dis, max_dis), (max_dis, max_dis),
                  (0, 0), (0, 0)))
    valid = jnp.pad(jnp.ones((1, h2d, w2d, 1, 1), q.dtype),
                    ((0, 0), (max_dis, max_dis), (max_dis, max_dis),
                     (0, 0), (0, 0)))

    logits = []
    for dy in range(win):
        for dx in range(win):
            ks = jax.lax.dynamic_slice(
                k4, (0, dy, dx, 0, 0), (b, h2d, w2d, num_heads, dh))
            val = jax.lax.dynamic_slice(
                valid, (0, dy, dx, 0, 0), (1, h2d, w2d, 1, 1))
            lg = jnp.sum(q4 * ks, axis=-1) * scale          # [b,H,W,h]
            lg = jnp.where(val[..., 0] > 0, lg, NEG_INF)
            logits.append(lg)
    logits = jnp.stack(logits, axis=-1)                      # [b,H,W,h,win2]
    logits = logits.astype(jnp.float32) + \
        rel_emb.reshape(b, h2d, w2d, num_heads, win * win).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)

    v4 = jnp.pad(v.reshape(b, h2d, w2d, num_heads, dv),
                 ((0, 0), (max_dis, max_dis), (max_dis, max_dis),
                  (0, 0), (0, 0)))
    out = jnp.zeros((b, h2d, w2d, num_heads, dv), v.dtype)
    o = 0
    for dy in range(win):
        for dx in range(win):
            vs = jax.lax.dynamic_slice(
                v4, (0, dy, dx, 0, 0), (b, h2d, w2d, num_heads, dv))
            out = out + probs[..., o:o + 1] * vs
            o += 1
    return out.reshape(b, hw, num_heads * dv)


def scatter_rel_bias(rel_emb: jnp.ndarray, size_2d: Tuple[int, int],
                     num_heads: int, T: int, m: int, halo_x: int,
                     hp: int, wp: int) -> jnp.ndarray:
    """Per-query [win, win] relative bias -> halo space, as ONE one-hot
    MXU matmul per in-tile query position.

    Query (i, j) of a tile maps window slot (wy, wx) to halo cell
    (i+wy, j+wx); the mapping is static and shared by every tile/batch/
    head, so the whole scatter is an einsum against a [T^2, win^2, HH]
    one-hot operand (built in-graph from a small index constant). The
    previous 2xT stacked-pad build measured ~0.47 ms/frame on the eval
    profile — pure HBM rearrangement the MXU does in a single pass.

    rel_emb [b, hw, heads*win^2] (win = 2m+1, already clamped);
    returns [b, nT, heads, T^2, (T+2m)*halo_x] f32 (0 at unmapped cells).
    halo_x >= T+2m allows the Pallas kernel's sublane-aligned x-halo.
    """
    h2d, w2d = size_2d
    b = rel_emb.shape[0]
    win = 2 * m + 1
    w2 = win * win
    ty, tx = -(-h2d // T), -(-w2d // T)
    TT, HH = T * T, (T + 2 * m) * halo_x
    r = rel_emb.reshape(b, h2d, w2d, num_heads, w2)
    r = jnp.pad(r, ((0, 0), (0, hp), (0, wp), (0, 0), (0, 0)))
    r = r.reshape(b, ty, T, tx, T, num_heads, w2)
    r = r.transpose(0, 1, 3, 5, 2, 4, 6).reshape(b, ty * tx, num_heads,
                                                 TT, w2)
    qi, qj = np.divmod(np.arange(TT), T)          # query pos within tile
    wy, wx = np.divmod(np.arange(w2), win)        # window slot
    tgt = ((qi[:, None] + wy[None, :]) * halo_x
           + qj[:, None] + wx[None, :]).astype(np.int32)   # [TT, w2]
    # bf16 operands with f32 accumulation on TPU (native MXU mode); the
    # XLA:CPU dot thunk lacks BF16xBF16=F32, so CPU upcasts (the values
    # are bf16-born under the default compute dtype either way)
    et = (jnp.bfloat16 if (r.dtype == jnp.bfloat16
                           and jax.default_backend() != "cpu")
          else jnp.float32)
    onehot = (jnp.asarray(tgt)[:, :, None] ==
              jnp.arange(HH)[None, None, :]).astype(et)    # [TT, w2, HH]
    return jnp.einsum("bnhpw,pwq->bnhpq", r.astype(et), onehot,
                      preferred_element_type=jnp.float32)


def tiled_local_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          rel_emb: jnp.ndarray, size_2d: Tuple[int, int],
                          num_heads: int, max_dis: int = 7,
                          scale: Optional[float] = None,
                          tile: Optional[int] = None) -> jnp.ndarray:
    """Tile-halo windowed local attention — the MXU formulation.

    Same semantics as `dense_local_attention` / `windowed_local_attention`
    (reference attention.py:289-361), but instead of (2m+1)^2 shifted
    elementwise passes over the full K/V maps (which stream ~win^2 x the
    map per layer), the grid is cut into T x T query tiles; each tile does
    ONE dense [T^2, (T+2m)^2] QK^T / PV matmul against its halo'd key
    patch. Halo patches come from `conv_general_dilated_patches` (a single
    strided copy), window validity is a static separable mask, and the
    learned per-query relative bias is scattered into halo space with 2T
    static pads. ~10x less HBM traffic than the shift formulation at VOS
    sizes.
    """
    h2d, w2d = size_2d
    b, hw, chd = q.shape
    dh = chd // num_heads
    dv = v.shape[-1] // num_heads
    full_win = 2 * max_dis + 1
    m = min(max_dis, h2d - 1, w2d - 1)
    win = 2 * m + 1
    if m != max_dis:
        r = rel_emb.reshape(b, hw, num_heads, full_win, full_win)
        lo, hi = max_dis - m, max_dis + m + 1
        rel_emb = r[..., lo:hi, lo:hi].reshape(b, hw, num_heads * win * win)
    scale = scale if scale is not None else dh ** -0.5

    # tile sweep on-chip at 31x54/m=7 (ROUND_NOTES r2): T=8 -> 109 FPS,
    # T=16 -> 102, T=24 -> 64. Small tiles waste fewer halo FLOPs
    # ((T+2m)^2 keys per query); 8 sublanes is still MXU-friendly.
    # halo_patches' 3x3 slice assembly needs T >= m (each tile's window may
    # only reach one tile-row/col of neighbors), so grow the tile for wide
    # windows instead of mis-slicing via negative indexing.
    T = tile or max(8, m)
    assert m <= T, (m, T)
    ty, tx = -(-h2d // T), -(-w2d // T)
    hp, wp = ty * T - h2d, tx * T - w2d
    halo = T + 2 * m

    def halo_patches(x, heads, d):
        """[bx,hw,heads*d] -> [bx, ty*tx, halo*halo, heads, d]

        Overlapping halo tiles assembled from 3x3 static slices of a
        tile-padded reshape (conv_general_dilated_patches lowers to a
        catastrophically slow kernel for large windows on TPU)."""
        bx = x.shape[0]
        c = heads * d
        x4 = x.reshape(bx, h2d, w2d, c)
        # pad a full tile of zeros on every side so each tile's -1/+1
        # neighbors exist, plus alignment padding on the far edges
        x4 = jnp.pad(x4, ((0, 0), (T, T + hp), (T, T + wp), (0, 0)))
        t6 = x4.reshape(bx, ty + 2, T, tx + 2, T, c)
        rows = jnp.concatenate([
            t6[:, 0:ty, T - m:], t6[:, 1:ty + 1], t6[:, 2:ty + 2, :m],
        ], axis=2)                                  # [bx,ty,halo,tx+2,T,c]
        cols = jnp.concatenate([
            rows[:, :, :, 0:tx, T - m:], rows[:, :, :, 1:tx + 1],
            rows[:, :, :, 2:tx + 2, :m],
        ], axis=4)                                  # [bx,ty,halo,tx,halo,c]
        p = cols.transpose(0, 1, 3, 2, 4, 5).reshape(
            bx, ty * tx, halo * halo, c)
        return p.reshape(bx, ty * tx, halo * halo, heads, d)

    kt = halo_patches(k, num_heads, dh)
    vt = halo_patches(v, num_heads, dv)
    ones = jnp.ones((1, h2d * w2d, 1), jnp.float32)
    valid = halo_patches(ones, 1, 1)[..., 0, 0]     # [1, nT, halo^2]

    q4 = q.reshape(b, h2d, w2d, num_heads, dh)
    q4 = jnp.pad(q4, ((0, 0), (0, hp), (0, wp), (0, 0), (0, 0)))
    qt = q4.reshape(b, ty, T, tx, T, num_heads, dh)
    qt = qt.transpose(0, 1, 3, 2, 4, 5, 6).reshape(
        b, ty * tx, T * T, num_heads, dh)

    logits = jnp.einsum("bnqhd,bnkhd->bnhqk", qt, kt,
                        preferred_element_type=jnp.float32) * scale

    # static separable window mask: query in-tile (i,j) sees halo (a,b)
    # iff a-i and b-j fall in [0, 2m] (i.e. |dy|,|dx| <= m)
    ax_q = np.arange(T)
    ax_k = np.arange(halo)
    ax_ok = (ax_k[None, :] - ax_q[:, None] >= 0) & \
            (ax_k[None, :] - ax_q[:, None] <= 2 * m)      # [T, halo]
    mask2d = (ax_ok[:, None, :, None] & ax_ok[None, :, None, :]).reshape(
        T * T, halo * halo)
    ok = jnp.asarray(mask2d)[None, None, None] & (valid[:, :, None, None]
                                                  > 0.5)
    logits = jnp.where(ok, logits, NEG_INF)

    # scatter the per-query [win, win] bias into halo space with one
    # one-hot MXU matmul per query position (scatter_rel_bias)
    r = scatter_rel_bias(rel_emb, (h2d, w2d), num_heads, T, m, halo,
                         hp, wp)
    logits = logits + r

    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bnhqk,bnkhd->bnqhd", probs, vt)
    out = out.reshape(b, ty, tx, T, T, num_heads * dv)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, ty * T, tx * T, num_heads * dv)
    return out[:, :h2d, :w2d].reshape(b, hw, num_heads * dv)


def _slot_pe_bias(q, slot_pe, num_heads, scale):
    """Factored slot temporal PE: pre-scaled [B, h, Lq, S] logit bias.

    Exact because the PE is constant across a slot's tokens:
    (q.(k + pe_s)) * scale == q.k * scale + (q.pe_s) * scale."""
    b, lq, ck = q.shape
    dh = ck // num_heads
    qh = q.reshape(b, lq, num_heads, dh).astype(jnp.float32)
    peh = slot_pe.reshape(slot_pe.shape[0], num_heads, dh).astype(jnp.float32)
    return jnp.einsum("bqhd,shd->bhqs", qh, peh) * scale


def bank_attention_dispatch(q, bank_k, bank_v, slot_mask, num_heads: int,
                            need_record: bool = False,
                            scale: Optional[float] = None,
                            use_pallas: bool = False,
                            true_lk: Optional[int] = None,
                            v_slot_base: Optional[int] = None,
                            slot_pe: Optional[jnp.ndarray] = None):
    """Route to the fused Pallas kernel or the XLA einsum formulation.

    The Pallas path derives the valid-slot count from the (prefix) mask.
    Both paths are differentiable: the Pallas kernel carries a flash-style
    custom VJP (kernels/bank_attention.py) with gradient flow through both
    the output and the slot-mass record.

    true_lk masks pre-padded key tokens (the engine stores bank slots at a
    128-multiple token count). v_slot_base (Pallas inference only, callers
    guarantee it) selects this layer's slots from the FULL multi-layer
    value bank so the kernel reads the state buffer with zero copies.
    slot_pe ([S, Ck]) is the slot temporal PE, applied here as a factored
    q.pe logit bias on the einsum and pad-aware-kernel paths (exact, and
    skips rebuilding the bank_k + pe slab every frame); the VJP/q-minor
    kernels fall back to the slab add.
    """
    if scale is None:
        scale = (q.shape[-1] // num_heads) ** -0.5
    if use_pallas:
        import os
        count = jnp.sum(slot_mask.astype(jnp.int32))
        if v_slot_base is not None or (
                true_lk is not None and true_lk != bank_k.shape[2]):
            # pre-padded bank (any use_pallas flavor, incl. the AOT True
            # path): must go through the pad-aware inference kernel — the
            # plain kernel would attend over the zero padding
            from rmem_tpu.kernels.bank_attention import \
                pallas_bank_attention_infer
            bias = None
            if slot_pe is not None:
                bias = _slot_pe_bias(q, slot_pe, num_heads, scale)
                b, h, lq, s = bias.shape
                bias = bias.reshape(b * h, lq, s)
            out, rec = pallas_bank_attention_infer(
                q, bank_k, bank_v, count, num_heads, scale=scale,
                true_lk=true_lk, v_slot_base=v_slot_base, qbias=bias)
            return out, (rec if need_record else None)
        if slot_pe is not None:   # VJP / q-minor kernels: slab add
            bank_k = bank_k + slot_pe[:, None, None, :].astype(bank_k.dtype)
            slot_pe = None
        if (use_pallas in ("all", "all+dw")
                and os.environ.get("RMEM_BANK_QMINOR")):
            # q-minor layout (V streamed once per chunk instead of once per
            # query tile). Measured SLOWER on the 480p bench (152.2 vs
            # 153.6 FPS): bank attention is transcendental-bound (softmax
            # exp over Lq x S*Lk logits), not V-bandwidth-bound, so the
            # bigger accumulator buys nothing. Kept behind this env knob
            # with the measurement; inference-only (no VJP).
            from rmem_tpu.kernels.bank_attention import \
                pallas_bank_attention_qminor
            out, rec = pallas_bank_attention_qminor(q, bank_k, bank_v,
                                                    count, num_heads,
                                                    scale=scale)
        else:
            from rmem_tpu.kernels.bank_attention import pallas_bank_attention
            out, rec = pallas_bank_attention(q, bank_k, bank_v, count,
                                             num_heads, scale=scale)
        return out, (rec if need_record else None)
    bias = (None if slot_pe is None
            else _slot_pe_bias(q, slot_pe, num_heads, scale))
    return bank_attention(q, bank_k, bank_v, slot_mask, num_heads,
                          need_record=need_record, scale=scale,
                          true_lk=true_lk, logit_bias=bias)


def interleave_heads(x1: jnp.ndarray, x2: jnp.ndarray,
                     num_heads: int) -> jnp.ndarray:
    """GatedPropagation's per-head concat of two half-value streams
    (attention.py:154-162): split each into heads, concat within each head."""
    b, l, c = x1.shape
    if num_heads == 1:
        return jnp.concatenate([x1, x2], axis=-1)
    h1 = x1.reshape(b, l, num_heads, c // num_heads)
    h2 = x2.reshape(b, l, num_heads, c // num_heads)
    return jnp.concatenate([h1, h2], axis=-1).reshape(b, l, 2 * c)
