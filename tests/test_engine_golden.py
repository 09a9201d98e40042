"""End-to-end engine golden test vs a torch mini-engine.

A complete AOT model (tiny conv encoder + id bank + 2 LSTT blocks + decoder
norms + FPN + learned temporal PE) is replicated in torch from the reference
equations, given random weights, and driven through 8 frames of a synthetic
video with gap-1 long-term writes so the bank fills past the 4-slot temporal
PE table (exercising append, scored eviction, the moving-mean/UCB statistics
and both PE interpolation branches). Per-frame decoded logits from our
jitted InferenceEngine (weights loaded through the converter) must match the
torch replica.

Both engines are fed the same ground-truth labels for memory updates so the
comparison is numeric, not argmax-chaotic.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import flax.traverse_util as trav

from rmem_tpu.config import get_config
from rmem_tpu.engine import InferenceEngine
from rmem_tpu.models import build_vos_model, init_params
from rmem_tpu.ops.position import sine_position_embedding
from tests.test_torch_parity import TFPN, TLSTTBlock, _sd, _to_params

torch.manual_seed(1)

D, L, HEADS = 64, 2, 8
HW_IN = (64, 64)
EH = EW = 4          # tiny encoder: stride 16
HW = EH * EW
FORMER, LATTER = 1, 4
GAP = 1
FRAMES = 8
OBJ = 2


class TTinyEncoder(nn.Module):
    """Torch replica of models/encoders/tiny.py."""

    def __init__(self):
        super().__init__()
        self.stem = nn.Conv2d(3, 32, 5, 4, 2)
        self.s8 = nn.Conv2d(32, 48, 3, 2, 1)
        self.s16 = nn.Conv2d(48, 64, 3, 2, 1)

    def forward(self, x):
        a = F.relu(self.stem(x))
        b = F.relu(self.s8(a))
        c = F.relu(self.s16(b))
        return [a, b, c, c]


def _torch_slot_pe(mem_pe: torch.Tensor, t: int) -> torch.Tensor:
    """transformer.py:594-629 semantics (incl. the [:T] truncation BEFORE
    interpolating, transformer.py:601-602, so t<=P uses rows 0..t-1)."""
    P, C = mem_pe.shape
    if t <= P:
        mem_pe = mem_pe[:t]
    if t == 1:
        return mem_pe[0:1]
    x = mem_pe.permute(1, 0).view(1, C, -1)
    if t <= P:
        x = F.interpolate(x, size=t, mode="linear", align_corners=True)
    else:
        x = F.interpolate(x, size=P, mode="linear", align_corners=True)
        x = torch.flip(x, dims=(-1,))
        x = F.interpolate(x, size=t, mode="nearest")
        x = torch.flip(x, dims=(-1,))
    return x.view(C, t).permute(1, 0).contiguous()


class TorchMiniEngine:
    """Reference-flow engine: add_reference / propagate / update_memory
    (aot_engine.py:241-436, transformer.py:269-436)."""

    def __init__(self, enc, id_bank, proj, blocks, dec_norms, fpn,
                 cur_pe, mem_pe, self_pos):
        self.enc = enc
        self.id_bank = id_bank
        self.proj = proj
        self.blocks = blocks
        self.dec_norms = dec_norms
        self.fpn = fpn
        self.cur_pe = cur_pe
        self.mem_pe = mem_pe
        self.self_pos = self_pos

    # helpers ----------------------------------------------------------
    def _id_emb(self, label):
        oh = F.one_hot(label.long().clamp(0, 10), 11).float()
        ignore = (label == 255).float()[..., None]
        oh[..., 0:1] = oh[..., 0:1] * (1 - ignore)
        full = torch.cat([oh, ignore], dim=-1)           # [B,H,W,12]
        e = self.id_bank(full.permute(0, 3, 1, 2))
        b, c, h, w = e.shape
        return e.view(b, c, h * w).permute(0, 2, 1)      # [B,HW,C]

    def _feat(self, img):
        xs = self.enc(img)
        xs[-1] = self.proj(xs[-1])
        f = xs[-1]
        b, c, h, w = f.shape
        return xs, f.view(b, c, h * w).permute(0, 2, 1)

    def _block_mems(self, tgt, bank, short, id_emb, need_record):
        """Run the stack; returns (intermediates, per-layer mems, record0)."""
        inters, mems, rec0 = [], [], None
        out = tgt
        for i, blk in enumerate(self.blocks):
            out, m, rec = self._block_forward(
                blk, out, bank[i] if bank else None,
                short[i] if short else None, id_emb,
                need_record and i == 0)
            if i == 0:
                rec0 = rec
            inters.append(out)
            mems.append(m)
        inters[-1] = self.dec_norms[-1](inters[-1])
        for i in range(L - 1):
            inters[i] = self.dec_norms[i](inters[i])
        return inters, mems, rec0

    def _block_forward(self, blk, tgt, bank, short, id_emb, need_record):
        """SimplifiedTransformerBlock forward (transformer.py:553-692) with
        memory emission."""
        t = blk.norm1(tgt)
        q = k = t + self.self_pos
        tgt = tgt + blk.self_attn(q, k, t)
        t = blk.norm2(tgt)
        curr_q = blk.linear_Q(t)
        curr_k, curr_v = curr_q, t
        if id_emb is not None:
            gv = blk.linear_V(curr_v + id_emb)
            bank_k = curr_k[None]
            bank_v = gv[None]
            local_k, local_v = curr_k, gv
        else:
            bank_k, bank_v = bank
            local_k, local_v = short
        T = bank_k.shape[0]
        spe = _torch_slot_pe(self.mem_pe, T)
        gk = (bank_k + spe[:, None, None, :]).permute(1, 0, 2, 3)
        gk = gk.reshape(1, T * HW, D)
        gv_flat = bank_v.permute(1, 0, 2, 3).reshape(1, T * HW, D)
        qh = ((curr_q + self.cur_pe) / math.sqrt(D // HEADS)).view(
            1, HW, HEADS, D // HEADS).transpose(1, 2)
        kh = gk.view(1, T * HW, HEADS, D // HEADS).transpose(1, 2)
        vh = gv_flat.view(1, T * HW, HEADS, D // HEADS).transpose(1, 2)
        attn = torch.softmax(qh @ kh.transpose(-1, -2), dim=-1)
        rec = None
        if need_record:
            # head-mean, sum over intra-slot keys (transformer.py:636-643)
            rec = attn.mean(dim=1).view(HW, T, HW).sum(dim=2)  # [HW, T]
        out2 = (attn @ vh).transpose(1, 2).reshape(1, HW, D)
        tgt2 = blk.long_term_attn.projection(out2)
        tgt3 = blk.short_term_attn(curr_q, blk.norm4(local_k + curr_k),
                                   blk.norm4(local_v + curr_v))
        new_sk = blk.linear_QMem(tgt3)
        tgt = tgt + tgt2 + tgt3
        t = blk.norm3(tgt)
        tgt = tgt + blk.linear2(blk.activation(blk.linear1(t), (EH, EW)))
        return tgt, dict(curr_k=curr_k, curr_v=curr_v, short_k=new_sk,
                         short_v=tgt3), rec

    def _decode(self, inters, xs, obj_num):
        dec_in = [xs[-1]] + [e.view(1, EH, EW, D).permute(0, 3, 1, 2)
                             for e in inters]
        logits = self.fpn(dec_in, xs)
        logits[:, obj_num + 1:] = -1e10
        return logits

    # engine ops --------------------------------------------------------
    def add_reference(self, img, label, obj_num):
        xs, feat = self._feat(img)
        id_emb = self._id_emb(label)
        inters, mems, _ = self._block_mems(feat, None, None, id_emb, False)
        self.bank = []
        self.short = []
        for blk, m in zip(self.blocks, mems):
            lv = blk.linear_V(m["curr_v"] + id_emb)
            self.bank.append([m["curr_k"][None].clone(), lv[None].clone()])
            sv = blk.linear_VMem(m["short_v"] + id_emb)
            self.short.append([m["short_k"], sv])
        self.score_dict, self.times_dict = {}, {}
        self.indexes = [0]
        self.frame = 0
        self.last_mem = 0
        self.obj_num = obj_num
        return self._decode(inters, xs, obj_num)

    def propagate(self, img):
        self.frame += 1
        xs, feat = self._feat(img)
        bank = [(b[0], b[1]) for b in self.bank]
        short = [(s[0], s[1]) for s in self.short]
        inters, mems, rec = self._block_mems(feat, bank, short, None, True)
        self.pending = mems
        self.record = rec
        logits = self._decode(inters, xs, self.obj_num)
        self.logits = logits
        return logits

    def update(self, label):
        id_emb = self._id_emb(label)
        for i, blk in enumerate(self.blocks):
            m = self.pending[i]
            lv = blk.linear_V(m["curr_v"] + id_emb)
            sv = blk.linear_VMem(m["short_v"] + id_emb)
            self.short[i] = [m["short_k"], sv]
            if self.frame - self.last_mem >= GAP:
                self.bank[i][0] = torch.cat(
                    [self.bank[i][0], m["curr_k"][None]], 0)
                self.bank[i][1] = torch.cat([self.bank[i][1], lv[None]], 0)
        if self.frame - self.last_mem >= GAP:
            self.last_mem = self.frame
            self.indexes.append(self.frame)
            self._restrict()

    def _restrict(self):
        """transformer.py:324-436 scored eviction."""
        if self.bank[0][0].shape[0] <= FORMER + LATTER:
            return
        # fg prob at enc res (aot_engine.py:355-362)
        up = F.interpolate(self.logits, size=(EH, EW), mode="bilinear",
                           align_corners=True)
        fg = 1 - torch.softmax(up, dim=1)[:, 0]          # [1,EH,EW]
        w = (self.record * fg.flatten()[:, None]).sum(0)  # [T]
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
            for j in range(2):
                m = self.bank[i][j]
                self.bank[i][j] = torch.cat([m[:drop], m[drop + 1:]], 0)
        self.indexes.pop(drop)


def test_engine_golden_vs_torch_mini_engine():
    cfg = get_config("pre_vost", model="tiny_aotl", latter_mem_len=LATTER,
                     former_mem_len=FORMER, compute_dtype="float32",
                     use_pallas_bank_attention=False)
    model = build_vos_model(cfg.model_vos, cfg)
    params0 = init_params(model, jax.random.PRNGKey(0), HW_IN)

    # torch replica with reference naming
    tenc = TTinyEncoder().eval()
    tid = nn.Conv2d(12, D, 17, 16, 8).eval()
    tproj = nn.Conv2d(64, D, 1).eval()
    tblocks = [TLSTTBlock(D).eval() for _ in range(L)]
    tnorms = [nn.LayerNorm(D).eval() for _ in range(L)]
    with torch.no_grad():
        for n in tnorms:
            n.weight.normal_(1, 0.2)
            n.bias.normal_(0, 0.2)
    tfpn = TFPN(D * (L + 1), 11, D, (32, 48, 64, 64)).eval()
    cur_pe = torch.randn(1, D) * 0.3
    mem_pe = torch.randn(4, D) * 0.3

    sd = {}
    for i, tb in enumerate(tblocks):
        sd.update(_sd(tb, f"LSTT.layers.{i}"))
    for i, n in enumerate(tnorms):
        sd.update(_sd(n, f"LSTT.decoder_norms.{i}"))
    sd.update(_sd(tfpn, "decoder"))
    sd.update(_sd(tid, "patch_wise_id_bank"))
    sd.update(_sd(tproj, "encoder_projector"))

    from rmem_tpu.utils.checkpoint import (_convert_fpn, _convert_lstt_block,
                                           _conv, _dense, _put_norm)
    flat = {}
    for i in range(L):
        _convert_lstt_block(sd, flat, i)
        _put_norm(sd, flat, f"LSTT.decoder_norms.{i}",
                  ("lstt", f"decoder_norm{i}"))
    _convert_fpn(sd, flat)
    flat[("patch_wise_id_bank", "kernel")] = _conv(
        sd["patch_wise_id_bank.weight"])
    flat[("patch_wise_id_bank", "bias")] = sd["patch_wise_id_bank.bias"]
    flat[("encoder_projector", "kernel")] = _conv(
        sd["encoder_projector.weight"])
    flat[("encoder_projector", "bias")] = sd["encoder_projector.bias"]
    # tiny encoder + temporal PE
    for tname, fpath in (("stem", "stem"), ("s8", "s8"), ("s16", "s16")):
        flat[("encoder", fpath, "kernel")] = _conv(
            tenc.state_dict()[f"{tname}.weight"].numpy())
        flat[("encoder", fpath, "bias")] = \
            tenc.state_dict()[f"{tname}.bias"].numpy()
    flat[("cur_pos_emb",)] = cur_pe.numpy()
    flat[("mem_pos_emb",)] = mem_pe.numpy()
    params = _to_params(params0, flat)

    self_pos_np = np.asarray(sine_position_embedding(EH, EW, D))
    teng = TorchMiniEngine(tenc, tid, tproj, tblocks, tnorms, tfpn,
                           cur_pe, mem_pe, torch.from_numpy(self_pos_np))

    engine = InferenceEngine(model, params, cfg, donate=False)

    rng = np.random.RandomState(0)
    imgs = rng.rand(FRAMES, 1, *HW_IN, 3).astype(np.float32)
    labels = np.zeros((FRAMES, 1, *HW_IN), np.int32)
    for t in range(FRAMES):
        labels[t, :, 10 + t:40 + t, 12:44] = 1
        labels[t, :, 45:60, 5 + t:20 + t] = 2

    with torch.no_grad():
        t_logits = teng.add_reference(
            torch.from_numpy(imgs[0].transpose(0, 3, 1, 2)),
            torch.from_numpy(labels[0]), OBJ)
    state, j_logits = engine.add_reference(
        jnp.asarray(imgs[0]), jnp.asarray(labels[0]), [OBJ], gap=GAP)
    np.testing.assert_allclose(
        np.asarray(j_logits)[..., :OBJ + 1],
        t_logits.numpy().transpose(0, 2, 3, 1)[..., :OBJ + 1],
        atol=2e-3, rtol=5e-3)

    for t in range(1, FRAMES):
        with torch.no_grad():
            t_logits = teng.propagate(
                torch.from_numpy(imgs[t].transpose(0, 3, 1, 2)))
        state, j_logits = engine.propagate(state, jnp.asarray(imgs[t]))
        np.testing.assert_allclose(
            np.asarray(j_logits)[..., :OBJ + 1],
            t_logits.numpy().transpose(0, 2, 3, 1)[..., :OBJ + 1],
            atol=2e-3, rtol=5e-3, err_msg=f"frame {t}")
        with torch.no_grad():
            teng.update(torch.from_numpy(labels[t]))
        state = engine.update_memory(state, jnp.asarray(labels[t]))
        assert int(state.bank.count) == teng.bank[0][0].shape[0], f"frame {t}"

    # the bank overflowed the 4-slot PE table and evicted at least twice
    assert teng.bank[0][0].shape[0] == FORMER + LATTER
    assert int(state.frame_step) == FRAMES - 1
