"""Dual-branch Gated Propagation Module (DeAOT's decoupled transformer).

Reference: aot_plus/networks/layers/transformer.py:700-1249 (DualBranchGPM +
GatedPropagationModule) and networks/layers/attention.py:93-413
(GatedPropagation / LocalGatedPropagation).

Two streams per layer: visual `tgt` and identity `tgt_id` (populated from
layer 0's output on). Memory entries are (K, V, ID_V); long/short attention
read the concatenated [V, ID_V] values jointly and the output splits back
into the two streams. Attention is gated: output * silu(U) followed by a
depthwise conv and projection.

TPU formulation: the 15x15 windowed short-term attention runs as masked
*dense* attention on the MXU (see ops.attention.dense_local_attention)
instead of the reference's 225x unfold blow-up; long-term attention is the
slot-blocked bank attention shared with AOT.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from rmem_tpu.ops.attention import (bank_attention_dispatch,
                                    interleave_heads, multihead_attention,
                                    tiled_local_attention)
from rmem_tpu.ops.layers import DWConv2d, drop_path, layer_norm, silu

MAX_LOCAL_DIS = 7  # window 15 (transformer.py:1023)


class DenseParams(nn.Module):
    """nn.Dense-compatible parameter holder (same tree paths/shapes/init)
    whose compute is done by the caller — used to merge sibling projections
    that read the same activation into ONE dot (the kernels are concatenated
    at trace time; XLA hoists the concat out of the frame scan since params
    are loop-invariant). Per-output-column matmul results are identical to
    separate Dense calls, so numerics are unchanged (exactness pinned by
    tests/test_models.py::test_merged_projections_exact)."""

    in_features: int
    features: int

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 (self.in_features, self.features))
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.features,))


def merged_dense(x, mods, dtype=None):
    """Apply several DenseParams sharing input `x` as one dot; returns the
    per-module outputs (split back at their widths)."""
    dt = dtype or x.dtype
    k = jnp.concatenate([m.kernel for m in mods], axis=1).astype(dt)
    b = jnp.concatenate([m.bias for m in mods]).astype(dt)
    y = x.astype(dt) @ k + b
    widths = [m.features for m in mods]
    splits = []
    off = 0
    for w in widths[:-1]:
        off += w
        splits.append(off)
    return jnp.split(y, splits, axis=-1)


class GatedTail(nn.Module):
    """Gate + depthwise conv + projection shared by all gated attentions
    (attention.py:206-209)."""

    expand_dim: int
    out_dim: int
    dtype: object = None
    unrolled_dw: bool = True

    def setup(self):
        self.dw_conv = DWConv2d(self.expand_dim, name="dw_conv",
                                dtype=self.dtype,
                                unrolled=self.unrolled_dw)
        self.projection = nn.Dense(self.out_dim, name="projection",
                                   dtype=self.dtype)

    def __call__(self, agg, gate, size_2d, deterministic=True,
                 fused: bool = False):
        if fused:
            # gate-multiply + dwconv fused in VMEM (kernels/dwconv.py); the
            # 1x1 projection stays in XLA (clean MXU matmul)
            out = self.dw_conv(agg, size_2d, deterministic=deterministic,
                               gate=gate, use_pallas=True)
        else:
            out = self.dw_conv(agg * gate, size_2d,
                               deterministic=deterministic)
        return self.projection(out)


class GatedSelfAttention(nn.Module):
    """GatedPropagation with use_linear=True (attention.py:93-216), used for
    GPM self-attention over the concatenated [vis, id] stream."""

    d_vu: int          # 512
    num_heads: int
    d_att: int         # 128
    dtype: object = None
    unrolled_dw: bool = True
    merged_proj: bool = False

    def setup(self):
        dt = self.dtype
        self.linear_QK = nn.Dense(self.d_att * self.num_heads,
                                  name="linear_QK", dtype=dt)
        half = self.d_vu  # hidden*heads/2 with expand 2
        if self.merged_proj:
            din = self.d_vu // 2  # v1/v2 are halves of the 2*d input
            self.linear_V1 = DenseParams(din, half, name="linear_V1")
            self.linear_V2 = DenseParams(din, half, name="linear_V2")
            self.linear_U1 = DenseParams(din, half, name="linear_U1")
            self.linear_U2 = DenseParams(din, half, name="linear_U2")
        else:
            self.linear_V1 = nn.Dense(half, name="linear_V1", dtype=dt)
            self.linear_V2 = nn.Dense(half, name="linear_V2", dtype=dt)
            self.linear_U1 = nn.Dense(half, name="linear_U1", dtype=dt)
            self.linear_U2 = nn.Dense(half, name="linear_U2", dtype=dt)
        self.tail = GatedTail(2 * self.d_vu, self.d_vu, name="tail",
                              dtype=dt, unrolled_dw=self.unrolled_dw)

    def __call__(self, x, size_2d, deterministic=True, use_pallas=False):
        qk = self.linear_QK(x)
        v1, v2 = jnp.split(x, 2, axis=-1)
        if self.merged_proj:
            va, ua = merged_dense(v1, (self.linear_V1, self.linear_U1),
                                  self.dtype)
            vb, ub = merged_dense(v2, (self.linear_V2, self.linear_U2),
                                  self.dtype)
        else:
            va, vb = self.linear_V1(v1), self.linear_V2(v2)
            ua, ub = self.linear_U1(v1), self.linear_U2(v2)
        v = silu(interleave_heads(va, vb, self.num_heads))
        u = silu(interleave_heads(ua, ub, self.num_heads))
        # (the flash bank kernel with a single slot was tried here and
        # measured 148.1 vs 149.4 FPS — the mass-epilogue overhead beats
        # XLA's fused MHA at this size; keep the einsum form)
        agg = multihead_attention(qk, qk, v, self.num_heads,
                                  scale=self.d_att ** -0.5)
        return self.tail(agg, u, size_2d, deterministic,
                         fused=use_pallas == "all+dw")


class GPMBlock(nn.Module):
    """GatedPropagationModule (transformer.py:1010-1236): long-term + local
    short-term gated attention, then gated self-attention. No FFN."""

    d_model: int       # 256
    self_heads: int
    att_heads: int
    layer_idx: int
    droppath: float = 0.1
    expand_ratio: float = 2.0
    dtype: object = None
    unrolled_dw: bool = True
    merged_proj: bool = False

    def setup(self):
        d = self.d_model
        dt = self.dtype
        self.expand_d = int(d * self.expand_ratio)        # 512
        self.d_att = d // 2 if self.att_heads == 1 else d // self.att_heads
        win2 = (2 * MAX_LOCAL_DIS + 1) ** 2

        self.norm1 = layer_norm("norm1")
        if self.merged_proj:
            self.linear_QV = DenseParams(
                d, self.d_att * self.att_heads + self.expand_d,
                name="linear_QV")
            self.linear_U = DenseParams(d, self.expand_d, name="linear_U")
        else:
            self.linear_QV = nn.Dense(
                self.d_att * self.att_heads + self.expand_d,
                name="linear_QV", dtype=dt)
            self.linear_U = nn.Dense(self.expand_d, name="linear_U", dtype=dt)
        if self.layer_idx == 0:
            self.linear_ID_V = nn.Dense(self.expand_d, name="linear_ID_V",
                                        dtype=dt)
        else:
            self.id_norm1 = layer_norm("id_norm1")
            self.linear_ID_V = nn.Dense(self.expand_d, name="linear_ID_V",
                                        dtype=dt)
            self.linear_ID_U = nn.Dense(self.expand_d, name="linear_ID_U",
                                        dtype=dt)

        self.long_tail = GatedTail(2 * self.expand_d, 2 * d, name="long_tail",
                                   dtype=dt, unrolled_dw=self.unrolled_dw)
        self.relative_emb_k = nn.Dense(self.att_heads * win2,
                                       name="relative_emb_k", dtype=dt)
        self.short_tail = GatedTail(2 * self.expand_d, 2 * d,
                                    name="short_tail", dtype=dt,
                                    unrolled_dw=self.unrolled_dw)

        self.norm2 = layer_norm("norm2")
        self.id_norm2 = layer_norm("id_norm2")
        self.self_attn = GatedSelfAttention(2 * d, self.self_heads,
                                            self.d_att, name="self_attn",
                                            dtype=dt,
                                            unrolled_dw=self.unrolled_dw,
                                            merged_proj=self.merged_proj)

    def fuse_id_value(self, curr_id_v, id_emb):
        """(transformer.py:1238-1244): layer 0 embeds the id alone; deeper
        layers fuse [id-stream features, id embedding]."""
        if self.layer_idx == 0:
            return silu(self.linear_ID_V(id_emb))
        return silu(self.linear_ID_V(
            jnp.concatenate([curr_id_v, id_emb], axis=-1)))

    def __call__(self, tgt, tgt_id, bank_k, bank_v, slot_mask,
                 short_k, short_v, id_emb, cur_pe, slot_pe,
                 size_2d, need_record=False, deterministic=True, dp_rng=None,
                 use_pallas=False, true_lk=None, v_slot_base=None):
        """bank_v / short_v carry [V, ID_V] concatenated on channels (the
        storage layout — see MemoryBank): attention reads them jointly
        (transformer.py:1180-1184), so no per-frame concat is needed.
        On the Pallas inference path bank_v may be the FULL multi-layer
        value bank with v_slot_base pointing at this layer's slots
        (zero-copy read of the engine state); true_lk gives the valid
        token count of pre-padded slots."""
        _tgt = self.norm1(tgt)
        if self.merged_proj:
            qv, curr_u = merged_dense(_tgt, (self.linear_QV, self.linear_U),
                                      self.dtype)
        else:
            qv = self.linear_QV(_tgt)
            curr_u = self.linear_U(_tgt)
        curr_q = curr_k = qv[..., : self.d_att * self.att_heads]
        curr_v = silu(qv[..., self.d_att * self.att_heads:])

        if tgt_id is None:  # layer 0 (transformer.py:1114-1123)
            curr_id_v = None
            cat_u = jnp.concatenate([silu(curr_u), jnp.ones_like(curr_u)],
                                    axis=-1)
        else:
            _tgt_id = self.id_norm1(tgt_id)
            curr_id_v = _tgt_id
            cat_u = silu(jnp.concatenate(
                [curr_u, self.linear_ID_U(_tgt_id)], axis=-1))

        if id_emb is not None:
            # reference frame: self-memory (transformer.py:1125-1135)
            g_id_v = self.fuse_id_value(curr_id_v, id_emb)
            cat_v = jnp.concatenate([curr_v, g_id_v], axis=-1)
            bank_k, bank_v = curr_k[None], cat_v[None]
            slot_mask = jnp.ones((1,), bool)
            short_k, short_v = curr_k, cat_v
            true_lk, v_slot_base = None, None

        q_t = curr_q + cur_pe if cur_pe is not None else curr_q
        # slot temporal PE rides in as a factored q.pe logit bias (exact;
        # dispatch falls back to the bank_k + pe slab add where a kernel
        # path lacks bias support)
        agg, record = bank_attention_dispatch(
            q_t, bank_k, bank_v, slot_mask, self.att_heads,
            need_record=need_record, scale=self.d_att ** -0.5,
            use_pallas=use_pallas, true_lk=true_lk,
            v_slot_base=v_slot_base, slot_pe=slot_pe)
        fused_tail = use_pallas == "all+dw"
        cat_tgt2 = self.long_tail(agg, cat_u, size_2d, deterministic,
                                  fused=fused_tail)

        cat_local_v = short_v
        rel = self.relative_emb_k(curr_q)  # from unscaled q (attention.py:314)
        with jax.named_scope("local_attention"):  # profile attribution
            if use_pallas == "train_all":
                # differentiable form: Pallas forward + XLA-VJP backward
                from rmem_tpu.kernels.local_attention import \
                    pallas_local_attention_trainable
                agg3 = pallas_local_attention_trainable(
                    curr_q, short_k, cat_local_v, rel, size_2d,
                    self.att_heads, MAX_LOCAL_DIS, self.d_att ** -0.5)
            elif use_pallas in ("all", "all+dw"):
                # fused VMEM-resident kernel; inference only (no VJP)
                from rmem_tpu.kernels.local_attention import \
                    pallas_local_attention
                agg3 = pallas_local_attention(
                    curr_q, short_k, cat_local_v, rel, size_2d,
                    self.att_heads, max_dis=MAX_LOCAL_DIS,
                    scale=self.d_att ** -0.5)
            else:
                agg3 = tiled_local_attention(
                    curr_q, short_k, cat_local_v, rel, size_2d,
                    self.att_heads, max_dis=MAX_LOCAL_DIS,
                    scale=self.d_att ** -0.5)
        cat_tgt3 = self.short_tail(agg3, cat_u, size_2d, deterministic,
                                   fused=fused_tail)

        tgt2, tgt_id2 = jnp.split(cat_tgt2, 2, axis=-1)
        tgt3, tgt_id3 = jnp.split(cat_tgt3, 2, axis=-1)

        # droppath_lst=False path: plain dropout(0) == identity at lt/st=0
        # (transformer.py:1215-1220)
        tgt = tgt + tgt2 + tgt3
        tgt_id = (tgt_id if tgt_id is not None else 0.0) + tgt_id2 + tgt_id3

        cat_in = jnp.concatenate([self.norm2(tgt), self.id_norm2(tgt_id)],
                                 axis=-1)
        cat_out = self.self_attn(cat_in, size_2d, deterministic,
                                 use_pallas=use_pallas)
        tgt2, tgt_id2 = jnp.split(cat_out, 2, axis=-1)
        tgt = tgt + drop_path(tgt2, self.droppath, dp_rng, deterministic)
        tgt_id = tgt_id + drop_path(tgt_id2, self.droppath, dp_rng,
                                    deterministic)

        mems = dict(
            curr_k=curr_k, curr_v=curr_v,
            curr_id_v=(curr_id_v if curr_id_v is not None
                       else jnp.zeros_like(tgt_id)),
        )
        return tgt, tgt_id, mems, record


class GPM(nn.Module):
    """DualBranchGPM stack (transformer.py:700-824)."""

    num_layers: int
    d_model: int
    self_heads: int = 1
    att_heads: int = 1
    droppath: float = 0.1
    intermediate_norm: bool = False
    final_norm: bool = True
    dtype: object = None
    unrolled_dw: bool = True
    merged_proj: bool = False

    def setup(self):
        self.blocks = [
            GPMBlock(self.d_model, self.self_heads, self.att_heads,
                     layer_idx=i, droppath=self.droppath, dtype=self.dtype,
                     unrolled_dw=self.unrolled_dw,
                     merged_proj=self.merged_proj, name=f"block{i}")
            for i in range(self.num_layers)
        ]
        num_norms = (self.num_layers - 1 if self.intermediate_norm else 0)
        if self.final_norm:
            num_norms += 1
        # GroupNorm(2) over the 2*d channel axis (transformer.py:755-758)
        self.decoder_norms = [
            nn.GroupNorm(num_groups=2, epsilon=1e-5, name=f"decoder_norm{i}")
            for i in range(num_norms)
        ]

    def __call__(self, tgt, bank, slot_mask, short, id_emb, self_pos,
                 cur_pe, slot_pe, size_2d, need_record=False,
                 deterministic=True, dp_rng=None, use_pallas=False):
        """bank: (k, v) each [L,S,B,HW,*] or None; short likewise
        [L,B,HW,*]; v carries [V, ID_V] concatenated. self_pos is unused by
        GPM (reference parity). Returns (intermediates [L x (B,HW,2C)],
        mems, record)."""
        del self_pos
        out, out_id = tgt, None
        intermediates: List[jnp.ndarray] = []
        mems_list: List[Dict[str, Any]] = []
        record0 = None
        true_lk = size_2d[0] * size_2d[1]
        # OPT-IN zero-copy value reads (Pallas inference, single head): pass
        # the FULL value bank — [L,S,B,HWp,Cv] -> [L*S,B,HWp,Cv] is a free
        # reshape — and a static per-layer slot offset, so the kernel's
        # value operand nominally aliases the persistent state buffer.
        # Measured SLOWER on v5e 480p (176.3 vs 183.4 FPS avg, two runs
        # each): the scan body also UPDATES the bank, so XLA inserts a
        # defensive copy of the whole ~550 MB value slab for the custom
        # call — worse than the per-layer slice it replaces. The padded
        # slot layout itself (pad-free relayout, true_lk in-kernel mask)
        # is the production win and stays on unconditionally.
        import os
        fast_v = (bank is not None and self.att_heads == 1
                  and use_pallas in ("all", "all+dw")
                  and bool(os.environ.get("RMEM_BANK_ZEROCOPY_V")))
        if fast_v:
            n_slots = bank[1].shape[1]
            v_full = bank[1].reshape((-1,) + bank[1].shape[2:])
        for i, block in enumerate(self.blocks):
            bk = bank[0][i] if bank is not None else None
            bv = (v_full if fast_v else
                  (bank[1][i] if bank is not None else None))
            sk = short[0][i] if short is not None else None
            sv = short[1][i] if short is not None else None
            out, out_id, mems, rec = block(
                out, out_id, bk, bv, slot_mask, sk, sv, id_emb,
                cur_pe, slot_pe, size_2d,
                need_record=(need_record and i == 0),
                deterministic=deterministic, dp_rng=dp_rng,
                use_pallas=use_pallas,
                true_lk=(true_lk if bank is not None else None),
                v_slot_base=(i * n_slots if fast_v else None))
            if i == 0:
                record0 = rec
            intermediates.append(jnp.concatenate([out, out_id], axis=-1))
            mems_list.append(mems)

        if self.decoder_norms:
            if self.final_norm:
                intermediates[-1] = self.decoder_norms[-1](intermediates[-1])
            if self.intermediate_norm:
                for i in range(len(intermediates) - 1):
                    intermediates[i] = self.decoder_norms[i](intermediates[i])

        mems = {k: jnp.stack([m[k] for m in mems_list]) for k in mems_list[0]}
        return intermediates, mems, record0

    def project_memories(self, mems: Dict[str, jnp.ndarray], id_emb):
        """Fuse id embedding into the identity values at write time
        (transformer.py:826-848). Returns (long_v, id_v) — GPM's long V is
        the raw curr_v (no re-projection), unlike AOT."""
        id_vs = []
        for i, block in enumerate(self.blocks):
            id_vs.append(block.fuse_id_value(mems["curr_id_v"][i], id_emb))
        return mems["curr_v"], jnp.stack(id_vs)
