"""Long Short-Term Transformer (AOT memory transformer), TPU formulation.

Reference: aot_plus/networks/layers/transformer.py:133-697
(LongShortTermTransformer + SimplifiedTransformerBlock). Differences by
design:

- The bank is an explicit argument (fixed-capacity arrays + validity mask)
  instead of module state; blocks are pure functions of (features, memory).
- Memory *emission* and memory *projection* are separated: the forward
  returns raw current K/V; `project_memories` applies the id-conditioned
  linear_V / linear_VMem re-projections (transformer.py:269-304) when the
  engine decides to write, so reference frames and predicted frames share one
  code path.
- Long-term attention runs slot-blocked with a per-slot attention-mass
  epilogue (the eviction signal) instead of flattening [T*HW] and separately
  materializing weights (transformer.py:632-643).

Shapes: features [B, HW, C]; bank k/v [S, B, HW, C]; short k/v [B, HW, C].
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from rmem_tpu.ops.attention import (bank_attention_dispatch,
                                    multihead_attention)
from rmem_tpu.ops.layers import GNActDWConv2d, drop_path, layer_norm


class MultiheadAttentionModule(nn.Module):
    """QKV-linear + projection MHA (attention.py:8-86)."""

    d_model: int
    num_heads: int
    use_linear: bool = True
    dtype: object = None

    def setup(self):
        if self.use_linear:
            self.linear_Q = nn.Dense(self.d_model, name="linear_Q",
                                     dtype=self.dtype)
            self.linear_K = nn.Dense(self.d_model, name="linear_K",
                                     dtype=self.dtype)
            self.linear_V = nn.Dense(self.d_model, name="linear_V",
                                     dtype=self.dtype)
        self.projection = nn.Dense(self.d_model, name="projection",
                                   dtype=self.dtype)

    def __call__(self, q, k, v):
        if self.use_linear:
            q = self.linear_Q(q)
            k = self.linear_K(k)
            v = self.linear_V(v)
        out = multihead_attention(q, k, v, self.num_heads)
        return self.projection(out)


class LSTTBlock(nn.Module):
    """SimplifiedTransformerBlock (transformer.py:466-692).

    self-attn -> long-term bank cross-attn (+temporal PE) -> short-term attn
    vs previous frame -> conv FFN.
    """

    d_model: int
    self_heads: int
    att_heads: int
    dim_feedforward: int
    linear_q: bool = False
    droppath: float = 0.1
    dtype: object = None
    gru_memory: bool = False

    def setup(self):
        dt = self.dtype
        if self.gru_memory:
            from rmem_tpu.models.conv_gru import ConvGRUCellOutput
            # K-plane GRU kernel 2, V-plane kernel 1 (transformer.py:529-545)
            self.memory_gru_k = ConvGRUCellOutput(self.d_model, self.d_model,
                                                  kernel=2, dtype=dt,
                                                  name="memory_gru_k")
            self.memory_gru_v = ConvGRUCellOutput(self.d_model, self.d_model,
                                                  kernel=1, dtype=dt,
                                                  name="memory_gru_v")
        self.norm1 = layer_norm("norm1")
        self.self_attn = MultiheadAttentionModule(
            self.d_model, self.self_heads, name="self_attn", dtype=dt)
        self.norm2 = layer_norm("norm2")
        self.linear_Q = nn.Dense(self.d_model, name="linear_Q", dtype=dt)
        self.linear_V = nn.Dense(self.d_model, name="linear_V", dtype=dt)
        self.linear_QMem = nn.Dense(self.d_model, name="linear_QMem",
                                    dtype=dt)
        self.linear_VMem = nn.Dense(self.d_model, name="linear_VMem",
                                    dtype=dt)
        if not self.linear_q:
            self.norm4 = layer_norm("norm4")
        self.long_proj = nn.Dense(self.d_model, name="long_proj", dtype=dt)
        self.short_proj = nn.Dense(self.d_model, name="short_proj", dtype=dt)
        self.norm3 = layer_norm("norm3")
        self.linear1 = nn.Dense(self.dim_feedforward, name="linear1",
                                dtype=dt)
        self.activation = GNActDWConv2d(self.dim_feedforward,
                                        name="activation", dtype=dt)
        self.linear2 = nn.Dense(self.d_model, name="linear2", dtype=dt)

    def __call__(self, tgt, bank_k, bank_v, slot_mask, short_k, short_v,
                 id_emb, self_pos, cur_pe, slot_pe, size_2d,
                 need_record: bool = False, deterministic: bool = True,
                 dp_rng=None, use_pallas: bool = False):
        """Returns (tgt_out, mems, record).

        mems = dict(curr_k, curr_v, short_k, short_v): raw emissions for the
        engine to project+write (see project_memories).
        """
        # --- self attention (transformer.py:566-571) ---
        _tgt = self.norm1(tgt)
        q = k = _tgt + self_pos if self_pos is not None else _tgt
        tgt2 = self.self_attn(q, k, _tgt)
        tgt = tgt + drop_path(tgt2, self.droppath, dp_rng, deterministic)

        # --- long short-term attention (transformer.py:573-680) ---
        _tgt = self.norm2(tgt)
        curr_q = self.linear_Q(_tgt)
        curr_k = curr_q
        curr_v = _tgt

        if id_emb is not None:
            # reference frame: memory is this frame itself, id-conditioned
            # (transformer.py:582-588)
            gv = self.linear_V(curr_v + id_emb)
            bank_k = curr_k[None]
            bank_v = gv[None]
            slot_mask = jnp.ones((1,), bool)
            local_k, local_v = curr_k, gv
        else:
            local_k, local_v = short_k, short_v

        q_t = curr_q + cur_pe if cur_pe is not None else curr_q
        # slot temporal PE rides in as a factored q.pe logit bias (exact;
        # dispatch falls back to the bank_k + pe slab add where needed)
        tgt2, record = bank_attention_dispatch(
            q_t, bank_k, bank_v, slot_mask, self.att_heads,
            need_record=need_record, use_pallas=use_pallas,
            true_lk=(size_2d[0] * size_2d[1] if id_emb is None else None),
            slot_pe=slot_pe)
        tgt2 = self.long_proj(tgt2)

        if self.linear_q:
            # concat previous-frame memory with current (transformer.py:650-655)
            sk = jnp.concatenate([local_k, curr_k], axis=1)
            sv = jnp.concatenate([local_v, curr_v], axis=1)
        else:
            sk = self.norm4(local_k + curr_k)
            sv = self.norm4(local_v + curr_v)
        tgt3 = multihead_attention(curr_q, sk, sv, self.att_heads)
        tgt3 = self.short_proj(tgt3)

        new_short_k = self.linear_QMem(tgt3)
        new_short_v = tgt3

        tgt = tgt + tgt2 + tgt3

        # --- conv FFN (transformer.py:682-687) ---
        _tgt = self.norm3(tgt)
        tgt2 = self.linear2(self.activation(self.linear1(_tgt), size_2d))
        tgt = tgt + drop_path(tgt2, self.droppath, dp_rng, deterministic)

        mems = dict(curr_k=curr_k, curr_v=curr_v,
                    short_k=new_short_k, short_v=new_short_v)
        return tgt, mems, record

    def project_memories(self, curr_v, short_v, id_emb):
        """Id-conditioned value re-projection at memory-write time
        (transformer.py:277-286). Returns (long_v, short_v)."""
        return (self.linear_V(curr_v + id_emb),
                self.linear_VMem(short_v + id_emb))

    def compress_slot(self, k_slot, v_slot, hid_k, hid_v, size_2d):
        """GRU-compress an evicted slot into the persistent hidden state
        (transformer.py:420-430). Inputs [B, HW, C] + hiddens [B, H, W, C];
        returns (out_k, out_v, new_hid_k, new_hid_v)."""
        h, w = size_2d
        b, hw, c = k_slot.shape
        k2 = k_slot.reshape(b, h, w, c)
        v2 = v_slot.reshape(b, h, w, c)
        nhk, ok = self.memory_gru_k(k2, hid_k)
        nhv, ov = self.memory_gru_v(v2, hid_v)
        return (ok.reshape(b, hw, c), ov.reshape(b, hw, c), nhk, nhv)


class LSTT(nn.Module):
    """Stack of LSTTBlocks + decoder norms (transformer.py:133-197)."""

    num_layers: int
    d_model: int
    self_heads: int = 8
    att_heads: int = 8
    dim_feedforward: int = 1024
    linear_q: bool = False
    droppath: float = 0.1
    intermediate_norm: bool = True
    final_norm: bool = True
    dtype: object = None
    gru_memory: bool = False

    def setup(self):
        self.blocks = [
            LSTTBlock(self.d_model, self.self_heads, self.att_heads,
                      self.dim_feedforward, self.linear_q, self.droppath,
                      dtype=self.dtype, gru_memory=self.gru_memory,
                      name=f"block{i}")
            for i in range(self.num_layers)
        ]
        num_norms = (self.num_layers - 1 if self.intermediate_norm else 0)
        if self.final_norm:
            num_norms += 1
        self.decoder_norms = [layer_norm(f"decoder_norm{i}")
                              for i in range(num_norms)]

    def __call__(self, tgt, bank, slot_mask, short, id_emb, self_pos,
                 cur_pe, slot_pe, size_2d, need_record: bool = False,
                 deterministic: bool = True, dp_rng=None,
                 use_pallas: bool = False):
        """bank: (k [L,S,B,HW,C], v [L,S,B,HW,C]) or None (ref frame).
        short: (k [L,B,HW,C], v) or None.

        Returns (intermediates [L x (B,HW,C)], mems stacked dict, record)
        where record is layer 0's per-slot mass (transformer.py:341-346 uses
        layer 0 only).
        """
        out = tgt
        intermediates: List[jnp.ndarray] = []
        mems_list: List[Dict[str, Any]] = []
        record0 = None
        for i, block in enumerate(self.blocks):
            bk = bank[0][i] if bank is not None else None
            bv = bank[1][i] if bank is not None else None
            sk = short[0][i] if short is not None else None
            sv = short[1][i] if short is not None else None
            out, mems, rec = block(
                out, bk, bv, slot_mask, sk, sv, id_emb, self_pos, cur_pe,
                slot_pe, size_2d, need_record=(need_record and i == 0),
                deterministic=deterministic, dp_rng=dp_rng,
                use_pallas=use_pallas)
            if i == 0:
                record0 = rec
            intermediates.append(out)
            mems_list.append(mems)

        if self.decoder_norms:
            if self.final_norm:
                intermediates[-1] = self.decoder_norms[-1](intermediates[-1])
            if self.intermediate_norm:
                for i in range(len(intermediates) - 1):
                    intermediates[i] = self.decoder_norms[i](intermediates[i])

        mems = {k: jnp.stack([m[k] for m in mems_list])
                for k in mems_list[0]}
        return intermediates, mems, record0

    def project_memories(self, mems: Dict[str, jnp.ndarray], id_emb):
        """Per-layer id-conditioned projections for memory writes.

        mems: stacked dict from __call__ ([L, B, HW, C] arrays).
        Returns (long_v [L,B,HW,C], short_v [L,B,HW,C]).
        """
        long_vs, short_vs = [], []
        for i, block in enumerate(self.blocks):
            lv, sv = block.project_memories(mems["curr_v"][i],
                                            mems["short_v"][i], id_emb)
            long_vs.append(lv)
            short_vs.append(sv)
        return jnp.stack(long_vs), jnp.stack(short_vs)

    def compress_evicted(self, k_slots, v_slots, hid_k, hid_v, size_2d):
        """Per-layer GRU compression of the evicted slot. k_slots/v_slots:
        [L, B, HW, C]; hiddens [L, B, H, W, C]. Returns stacked outputs and
        new hiddens."""
        oks, ovs, nhks, nhvs = [], [], [], []
        for i, block in enumerate(self.blocks):
            ok, ov, nhk, nhv = block.compress_slot(
                k_slots[i], v_slots[i], hid_k[i], hid_v[i], size_2d)
            oks.append(ok)
            ovs.append(ov)
            nhks.append(nhk)
            nhvs.append(nhv)
        return (jnp.stack(oks), jnp.stack(ovs), jnp.stack(nhks),
                jnp.stack(nhvs))
