"""End-to-end DeAOT/GPM engine golden test vs a torch mini-engine.

Same harness as test_engine_golden.py but for the flagship dual-branch GPM:
memory is (K, V, ID_V), the identity value is fused at write time, short-term
attention is the 15x15 windowed local attention, and the decoder consumes
only the final concatenated [vis, id] stream (intermediate_lstt=False).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from rmem_tpu.config import get_config
from rmem_tpu.engine import InferenceEngine
from rmem_tpu.models import build_vos_model, init_params
from rmem_tpu.ops.position import sine_position_embedding
from tests.test_engine_golden import TTinyEncoder, _torch_slot_pe
from tests.test_torch_parity import (TConvGN, TGPMBlock, _sd, _silu,
                                     _to_params)
import rmem_tpu.models.gpm as gpm_mod

torch.manual_seed(2)

D, L = 64, 2
D_ATT = D // 2
HW_IN = (64, 64)
EH = EW = 4
HW = EH * EW
FORMER, LATTER = 1, 4
GAP = 1
FRAMES = 7
OBJ = 2


class TFPNLast(nn.Module):
    """FPN with decode_intermediate_input=False (fpn.py:38-41)."""

    def __init__(self, in_dim, out_dim, hidden, shortcut_dims):
        super().__init__()
        self.conv_in = TConvGN(in_dim, hidden, 1)
        self.conv_16x = TConvGN(hidden, hidden, 3)
        self.conv_8x = TConvGN(hidden, hidden // 2, 3)
        self.conv_4x = TConvGN(hidden // 2, hidden // 2, 3)
        self.adapter_16x = nn.Conv2d(shortcut_dims[-2], hidden, 1)
        self.adapter_8x = nn.Conv2d(shortcut_dims[-3], hidden, 1)
        self.adapter_4x = nn.Conv2d(shortcut_dims[-4], hidden // 2, 1)
        self.conv_out = nn.Conv2d(hidden // 2, out_dim, 1)

    def forward(self, inputs, shortcuts):
        x = inputs[-1]
        x = F.relu(self.conv_in(x))
        x = F.relu(self.conv_16x(self.adapter_16x(shortcuts[-2]) + x))
        x = F.interpolate(x, size=shortcuts[-3].shape[-2:], mode="bilinear",
                          align_corners=True)
        x = F.relu(self.conv_8x(self.adapter_8x(shortcuts[-3]) + x))
        x = F.interpolate(x, size=shortcuts[-4].shape[-2:], mode="bilinear",
                          align_corners=True)
        x = F.relu(self.conv_4x(self.adapter_4x(shortcuts[-4]) + x))
        return self.conv_out(x)


class TorchGPMEngine:
    def __init__(self, enc, id_bank, id_norm, proj, blocks, dec_norms, fpn,
                 cur_pe, mem_pe):
        self.enc = enc
        self.id_bank = id_bank
        self.id_norm = id_norm
        self.proj = proj
        self.blocks = blocks
        self.dec_norms = dec_norms
        self.fpn = fpn
        self.cur_pe = cur_pe
        self.mem_pe = mem_pe

    def _id_emb(self, label):
        oh = F.one_hot(label.long().clamp(0, 10), 11).float()
        ignore = (label == 255).float()[..., None]
        oh[..., 0:1] = oh[..., 0:1] * (1 - ignore)
        full = torch.cat([oh, ignore], dim=-1)
        e = self.id_bank(full.permute(0, 3, 1, 2))
        # DeAOT id LayerNorm over channels (deaot.py:65-69)
        e = self.id_norm(e.permute(0, 2, 3, 1))
        b, h, w, c = e.shape
        return e.reshape(b, h * w, c)

    def _feat(self, img):
        xs = self.enc(img)
        xs[-1] = self.proj(xs[-1])
        f = xs[-1]
        b, c, h, w = f.shape
        return xs, f.view(b, c, h * w).permute(0, 2, 1)

    def _fuse_id(self, blk, i, curr_id_v, id_emb):
        if i == 0:
            return _silu(blk.linear_ID_V(id_emb))
        return _silu(blk.linear_ID_V(torch.cat([curr_id_v, id_emb], -1)))

    def _block_forward(self, i, blk, tgt, tgt_id, bank, short, id_emb,
                       need_record):
        """GatedPropagationModule forward (transformer.py:1091-1236)."""
        t = blk.norm1(tgt)
        qv = blk.linear_QV(t)
        curr_q = curr_k = qv[..., :D_ATT]
        curr_v = _silu(qv[..., D_ATT:])
        curr_u = blk.linear_U(t)
        if tgt_id is None:
            curr_id_v = None
            cat_u = torch.cat([_silu(curr_u), torch.ones_like(curr_u)], -1)
        else:
            tid = blk.id_norm1(tgt_id)
            curr_id_v = tid
            cat_u = _silu(torch.cat([curr_u, blk.linear_ID_U(tid)], -1))
        if id_emb is not None:
            g_idv = self._fuse_id(blk, i, curr_id_v, id_emb)
            bank_k, bank_v, bank_idv = (curr_k[None], curr_v[None],
                                        g_idv[None])
            local = (curr_k, curr_v, g_idv)
        else:
            bank_k, bank_v, bank_idv = bank
            local = short
        T = bank_k.shape[0]
        spe = _torch_slot_pe(self.mem_pe, T)
        gk = (bank_k + spe[:, None, None, :]).permute(1, 0, 2, 3)
        gk = gk.reshape(1, T * HW, D_ATT)
        catv = torch.cat([bank_v, bank_idv], -1)
        gv = catv.permute(1, 0, 2, 3).reshape(1, T * HW, 2 * 2 * D)
        q_t = (curr_q + self.cur_pe) / math.sqrt(D_ATT)
        attn = torch.softmax(q_t @ gk.transpose(-1, -2), dim=-1)
        rec = attn.view(HW, T, HW).sum(dim=2) if need_record else None
        agg = (attn @ gv) * cat_u
        cat2 = blk.long_term_attn.projection(
            blk.long_term_attn.dw_conv(agg, (EH, EW)))
        cat_lv = torch.cat([local[1], local[2]], -1)
        cat3 = blk.short_term_attn(curr_q, local[0], cat_lv, cat_u, (EH, EW))
        t2, ti2 = cat2.split(D, -1)
        t3, ti3 = cat3.split(D, -1)
        tgt = tgt + t2 + t3
        tgt_id = (tgt_id if tgt_id is not None else 0) + ti2 + ti3
        cat_in = torch.cat([blk.norm2(tgt), blk.id_norm2(tgt_id)], -1)
        so = blk.self_attn(cat_in, (EH, EW))
        s2, si2 = so.split(D, -1)
        tgt = tgt + s2
        tgt_id = tgt_id + si2
        return tgt, tgt_id, dict(curr_k=curr_k, curr_v=curr_v,
                                 curr_id_v=curr_id_v), rec

    def _stack(self, feat, bank, short, id_emb, need_record):
        out, out_id = feat, None
        mems, rec0 = [], None
        cat_out = None
        for i, blk in enumerate(self.blocks):
            out, out_id, m, rec = self._block_forward(
                i, blk, out, out_id, bank[i] if bank else None,
                short[i] if short else None, id_emb, need_record and i == 0)
            if i == 0:
                rec0 = rec
            cat_out = torch.cat([out, out_id], -1)
            mems.append(m)
        cat_out = self.dec_norms[-1](cat_out.permute(0, 2, 1)
                                     ).permute(0, 2, 1)
        return [cat_out], mems, rec0

    def _decode(self, inters, xs, obj_num):
        dec_in = [xs[-1]] + [e.view(1, EH, EW, 2 * D).permute(0, 3, 1, 2)
                             for e in inters]
        logits = self.fpn(dec_in, xs)
        logits[:, obj_num + 1:] = -1e10
        return logits

    def add_reference(self, img, label, obj_num):
        xs, feat = self._feat(img)
        id_emb = self._id_emb(label)
        inters, mems, _ = self._stack(feat, None, None, id_emb, False)
        self.bank, self.short = [], []
        for i, (blk, m) in enumerate(zip(self.blocks, mems)):
            idv = self._fuse_id(blk, i, m["curr_id_v"], id_emb)
            self.bank.append([m["curr_k"][None].clone(),
                              m["curr_v"][None].clone(), idv[None].clone()])
            self.short.append([m["curr_k"], m["curr_v"], idv])
        self.score_dict, self.times_dict = {}, {}
        self.indexes = [0]
        self.frame = 0
        self.last_mem = 0
        self.obj_num = obj_num
        return self._decode(inters, xs, obj_num)

    def propagate(self, img):
        self.frame += 1
        xs, feat = self._feat(img)
        bank = [tuple(b) for b in self.bank]
        short = [tuple(s) for s in self.short]
        inters, mems, rec = self._stack(feat, bank, short, None, True)
        self.pending = mems
        self.record = rec
        self.logits = self._decode(inters, xs, self.obj_num)
        return self.logits

    def update(self, label):
        id_emb = self._id_emb(label)
        for i, blk in enumerate(self.blocks):
            m = self.pending[i]
            idv = self._fuse_id(blk, i, m["curr_id_v"], id_emb)
            self.short[i] = [m["curr_k"], m["curr_v"], idv]
            if self.frame - self.last_mem >= GAP:
                self.bank[i][0] = torch.cat(
                    [self.bank[i][0], m["curr_k"][None]], 0)
                self.bank[i][1] = torch.cat(
                    [self.bank[i][1], m["curr_v"][None]], 0)
                self.bank[i][2] = torch.cat([self.bank[i][2], idv[None]], 0)
        if self.frame - self.last_mem >= GAP:
            self.last_mem = self.frame
            self.indexes.append(self.frame)
            self._restrict()

    def _restrict(self):
        if self.bank[0][0].shape[0] <= FORMER + LATTER:
            return
        up = F.interpolate(self.logits, size=(EH, EW), mode="bilinear",
                           align_corners=True)
        fg = 1 - torch.softmax(up, dim=1)[:, 0]
        w = (self.record * fg.flatten()[:, None]).sum(0)
        w = w / w.sum()
        for i, f_idx in enumerate(self.indexes[:-1]):
            if f_idx in self.score_dict:
                self.score_dict[f_idx] = (0.2 * self.score_dict[f_idx]
                                          + 0.8 * float(w[i]))
            else:
                self.score_dict[f_idx] = float(w[i])
        for f_idx in self.indexes:
            self.times_dict[f_idx] = self.times_dict.get(f_idx, 0) + 1
        counts = np.array([self.times_dict[f] for f in self.indexes[:-1]],
                          np.float64)
        counts[0] = len(counts)
        bonus = 1.5 * np.sqrt(np.log(counts.sum()) / (counts + 8))
        total = np.array([self.score_dict[f] for f in self.indexes[:-1]])
        total = total + bonus
        drop = int(np.argmin(total[1:])) + 1
        for i in range(L):
            for j in range(3):
                m = self.bank[i][j]
                self.bank[i][j] = torch.cat([m[:drop], m[drop + 1:]], 0)
        self.indexes.pop(drop)


def test_deaot_engine_golden():
    old = gpm_mod.MAX_LOCAL_DIS
    gpm_mod.MAX_LOCAL_DIS = 7
    try:
        cfg = get_config("pre_vost", model="tiny_deaotl",
                         latter_mem_len=LATTER, former_mem_len=FORMER,
                         compute_dtype="float32",
                         use_pallas_bank_attention=False)
        model = build_vos_model(cfg.model_vos, cfg)
        params0 = init_params(model, jax.random.PRNGKey(0), HW_IN)

        tenc = TTinyEncoder().eval()
        tid = nn.Conv2d(12, D, 17, 16, 8).eval()
        tid_norm = nn.LayerNorm(D).eval()
        with torch.no_grad():
            tid_norm.weight.normal_(1, 0.2)
            tid_norm.bias.normal_(0, 0.2)
        tproj = nn.Conv2d(64, D, 1).eval()
        tblocks = [TGPMBlock(D, max_dis=7).eval() for _ in range(L)]
        # layer 0 has no id branch modules in the reference; emulate by
        # overriding its fuse to the id-only projection. TGPMBlock is built
        # as layer_idx=1; for layer 0 replace linear_ID_V with a 64->128.
        tblocks[0].linear_ID_V = nn.Linear(D, 2 * D).eval()
        tnorm = nn.GroupNorm(2, 2 * D).eval()
        with torch.no_grad():
            tnorm.weight.normal_(1, 0.2)
            tnorm.bias.normal_(0, 0.2)
        tfpn = TFPNLast(2 * D, 11, D, (32, 48, 64, 64)).eval()
        cur_pe = torch.randn(1, D_ATT) * 0.3
        mem_pe = torch.randn(4, D_ATT) * 0.3

        sd = {}
        for i, tb in enumerate(tblocks):
            sd.update(_sd(tb, f"LSTT.layers.{i}"))
        # layer 0 must not expose id-branch extras (id_norm1/linear_ID_U)
        for k in list(sd):
            if k.startswith("LSTT.layers.0.id_norm1") or \
                    k.startswith("LSTT.layers.0.linear_ID_U"):
                del sd[k]
        sd.update(_sd(tnorm, "LSTT.decoder_norms.0"))
        sd.update(_sd(tfpn, "decoder"))
        sd.update(_sd(tid, "patch_wise_id_bank"))
        sd.update(_sd(tid_norm, "id_norm"))
        sd.update(_sd(tproj, "encoder_projector"))

        from rmem_tpu.utils.checkpoint import (_convert_fpn,
                                               _convert_gpm_block, _conv,
                                               _put_norm)
        flat = {}
        for i in range(L):
            _convert_gpm_block(sd, flat, i)
        _put_norm(sd, flat, "LSTT.decoder_norms.0",
                  ("lstt", "decoder_norm0"))
        _convert_fpn(sd, flat)
        flat[("patch_wise_id_bank", "kernel")] = _conv(
            sd["patch_wise_id_bank.weight"])
        flat[("patch_wise_id_bank", "bias")] = sd["patch_wise_id_bank.bias"]
        _put_norm(sd, flat, "id_norm", ("id_norm",))
        flat[("encoder_projector", "kernel")] = _conv(
            sd["encoder_projector.weight"])
        flat[("encoder_projector", "bias")] = sd["encoder_projector.bias"]
        for tname, fpath in (("stem", "stem"), ("s8", "s8"), ("s16", "s16")):
            flat[("encoder", fpath, "kernel")] = _conv(
                tenc.state_dict()[f"{tname}.weight"].numpy())
            flat[("encoder", fpath, "bias")] = \
                tenc.state_dict()[f"{tname}.bias"].numpy()
        flat[("cur_pos_emb",)] = cur_pe.numpy()
        flat[("mem_pos_emb",)] = mem_pe.numpy()
        params = _to_params(params0, flat)

        teng = TorchGPMEngine(tenc, tid, tid_norm, tproj, tblocks, [tnorm],
                              tfpn, cur_pe, mem_pe)
        engine = InferenceEngine(model, params, cfg, donate=False)

        rng = np.random.RandomState(1)
        imgs = rng.rand(FRAMES, 1, *HW_IN, 3).astype(np.float32)
        labels = np.zeros((FRAMES, 1, *HW_IN), np.int32)
        for t in range(FRAMES):
            labels[t, :, 8 + 2 * t:36 + 2 * t, 10:40] = 1
            labels[t, :, 44:60, 6 + t:24 + t] = 2

        with torch.no_grad():
            t_logits = teng.add_reference(
                torch.from_numpy(imgs[0].transpose(0, 3, 1, 2)),
                torch.from_numpy(labels[0]), OBJ)
        state, j_logits = engine.add_reference(
            jnp.asarray(imgs[0]), jnp.asarray(labels[0]), [OBJ], gap=GAP)
        np.testing.assert_allclose(
            np.asarray(j_logits)[..., :OBJ + 1],
            t_logits.numpy().transpose(0, 2, 3, 1)[..., :OBJ + 1],
            atol=3e-3, rtol=5e-3)

        for t in range(1, FRAMES):
            with torch.no_grad():
                t_logits = teng.propagate(
                    torch.from_numpy(imgs[t].transpose(0, 3, 1, 2)))
            state, j_logits = engine.propagate(state, jnp.asarray(imgs[t]))
            np.testing.assert_allclose(
                np.asarray(j_logits)[..., :OBJ + 1],
                t_logits.numpy().transpose(0, 2, 3, 1)[..., :OBJ + 1],
                atol=3e-3, rtol=5e-3, err_msg=f"frame {t}")
            with torch.no_grad():
                teng.update(torch.from_numpy(labels[t]))
            state = engine.update_memory(state, jnp.asarray(labels[t]))
            assert int(state.bank.count) == teng.bank[0][0].shape[0]

        assert teng.bank[0][0].shape[0] == FORMER + LATTER
    finally:
        gpm_mod.MAX_LOCAL_DIS = old
