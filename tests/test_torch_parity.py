"""Value-level converter/formula parity vs independent torch replicas.

Each torch module below re-implements the reference equations (with the
reference's parameter naming so its state_dict looks like a released
checkpoint), gets random weights, and is compared against our flax modules
loaded through the converter. This catches transpose errors, eps/norm
mismatches, and formula drift — the closest available proxy for golden
tests against the released .pth files (not present in this image).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import flax.traverse_util as trav

from rmem_tpu.config import get_config
from rmem_tpu.models import build_vos_model, init_params
from rmem_tpu.utils.checkpoint import convert_torch_checkpoint

torch.manual_seed(0)


# ---------------------------------------------------------------------------
# torch replicas (reference equations, reference parameter names)
# ---------------------------------------------------------------------------

class TMHA(nn.Module):
    """MultiheadAttention (attention.py:8-86)."""

    def __init__(self, d, heads, use_linear=True):
        super().__init__()
        self.h = heads
        self.dh = d // heads
        self.use_linear = use_linear
        if use_linear:
            self.linear_Q = nn.Linear(d, d)
            self.linear_K = nn.Linear(d, d)
            self.linear_V = nn.Linear(d, d)
        self.projection = nn.Linear(d, d)

    def forward(self, q, k, v):  # [B, L, C]
        if self.use_linear:
            q, k, v = self.linear_Q(q), self.linear_K(k), self.linear_V(v)
        b, lq, c = q.shape
        qh = q.view(b, lq, self.h, self.dh).transpose(1, 2)
        kh = k.view(b, -1, self.h, self.dh).transpose(1, 2)
        vh = v.view(b, -1, self.h, v.shape[-1] // self.h).transpose(1, 2)
        attn = torch.softmax(qh @ kh.transpose(-1, -2) / math.sqrt(self.dh),
                             dim=-1)
        out = (attn @ vh).transpose(1, 2).reshape(b, lq, -1)
        return self.projection(out)


class TGNActDWConv2d(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.gn = nn.GroupNorm(32, dim)
        self.conv = nn.Conv2d(dim, dim, 5, padding=2, groups=dim, bias=False)

    def forward(self, x, hw):  # [B, HW, C]
        h, w = hw
        b, l, c = x.shape
        y = x.view(b, h, w, c).permute(0, 3, 1, 2)
        y = self.conv(F.gelu(self.gn(y)))
        return y.permute(0, 2, 3, 1).reshape(b, l, c)


class TLSTTBlock(nn.Module):
    """SimplifiedTransformerBlock (transformer.py:466-692), linear_q=False."""

    def __init__(self, d=64, self_heads=8, att_heads=8, ffn=1024):
        super().__init__()
        self.d = d
        self.att_heads = att_heads
        self.norm1 = nn.LayerNorm(d)
        self.self_attn = TMHA(d, self_heads)
        self.norm2 = nn.LayerNorm(d)
        self.linear_Q = nn.Linear(d, d)
        self.linear_V = nn.Linear(d, d)
        self.linear_QMem = nn.Linear(d, d)
        self.linear_VMem = nn.Linear(d, d)
        self.norm4 = nn.LayerNorm(d)
        self.long_term_attn = TMHA(d, att_heads, use_linear=False)
        self.short_term_attn = TMHA(d, att_heads, use_linear=False)
        self.norm3 = nn.LayerNorm(d)
        self.linear1 = nn.Linear(d, ffn)
        self.activation = TGNActDWConv2d(ffn)
        self.linear2 = nn.Linear(ffn, d)

    def forward(self, tgt, bank_k, bank_v, short_k, short_v, self_pos,
                cur_pe, slot_pe, hw):
        # self attention
        t = self.norm1(tgt)
        q = k = t + self_pos
        tgt = tgt + self.self_attn(q, k, t)
        # long-term
        t = self.norm2(tgt)
        curr_q = self.linear_Q(t)
        curr_k, curr_v = curr_q, t
        T = bank_k.shape[0]
        gk = (bank_k + slot_pe[:, None, None, :]).reshape(
            -1, *bank_k.shape[2:])  # [T*HW, B, C] flattened over slots
        gv = bank_v.reshape(-1, *bank_v.shape[2:])
        # flatten slot dim into keys: bank [T, B, HW, C] -> [B, T*HW, C]
        gk = gk.reshape(T, bank_k.shape[1], bank_k.shape[2], -1)
        gk = gk.permute(1, 0, 2, 3).reshape(bank_k.shape[1], -1, self.d)
        gv = gv.reshape(T, bank_v.shape[1], bank_v.shape[2], -1)
        gv = gv.permute(1, 0, 2, 3).reshape(bank_v.shape[1], -1, self.d)
        tgt2 = self.long_term_attn(curr_q + cur_pe, gk, gv)
        # short-term (linear_q=False path, transformer.py:656-662)
        tgt3 = self.short_term_attn(curr_q, self.norm4(short_k + curr_k),
                                    self.norm4(short_v + curr_v))
        tgt = tgt + tgt2 + tgt3
        t = self.norm3(tgt)
        return tgt + self.linear2(self.activation(self.linear1(t), hw))


def _sd(module, prefix):
    return {f"{prefix}.{k}": v.detach().numpy()
            for k, v in module.state_dict().items()}


def _to_params(template_params, flat_conv):
    flat_old = trav.flatten_dict(template_params)
    merged = {}
    for k, v in flat_old.items():
        merged[k] = jnp.asarray(flat_conv[k], jnp.float32) \
            if k in flat_conv else v
    return trav.unflatten_dict(merged)


def test_lstt_block_parity():
    """Full LSTT block vs torch replica through the converter naming."""
    d, hw2d, T, B = 64, (6, 7), 3, 1
    HW = hw2d[0] * hw2d[1]
    tb = TLSTTBlock(d).eval()
    sd = _sd(tb, "LSTT.layers.0")

    from rmem_tpu.models.lstt import LSTTBlock
    fb = LSTTBlock(d_model=d, self_heads=8, att_heads=8, dim_feedforward=1024,
                   linear_q=False, droppath=0.0)
    rngk = jax.random.PRNGKey(0)
    tgt0 = jnp.zeros((B, HW, d))
    bank_k0 = jnp.zeros((T, B, HW, d))
    mask = jnp.ones((T,), bool)
    sp = jnp.zeros((1, HW, d))
    cpe = jnp.zeros((1, d))
    spe = jnp.zeros((T, d))
    variables = fb.init(rngk, tgt0, bank_k0, bank_k0, mask, tgt0[0:1] * 0 +
                        jnp.zeros((B, HW, d)), jnp.zeros((B, HW, d)), None,
                        sp, cpe, spe, hw2d)

    from rmem_tpu.utils.checkpoint import _convert_lstt_block
    out_flat = {}
    _convert_lstt_block(sd, out_flat, 0)
    # strip the ("lstt", "block0") prefix for the bare block
    conv = {k[2:]: v for k, v in out_flat.items()}
    params = _to_params(variables["params"], conv)

    rng = np.random.RandomState(1)
    tgt = rng.randn(B, HW, d).astype(np.float32)
    bank_k = rng.randn(T, B, HW, d).astype(np.float32)
    bank_v = rng.randn(T, B, HW, d).astype(np.float32)
    short_k = rng.randn(B, HW, d).astype(np.float32)
    short_v = rng.randn(B, HW, d).astype(np.float32)
    self_pos = rng.randn(1, HW, d).astype(np.float32)
    cur_pe = rng.randn(1, d).astype(np.float32)
    slot_pe = rng.randn(T, d).astype(np.float32)

    ours, mems, _ = fb.apply(
        {"params": params}, jnp.asarray(tgt), jnp.asarray(bank_k),
        jnp.asarray(bank_v), mask, jnp.asarray(short_k),
        jnp.asarray(short_v), None, jnp.asarray(self_pos),
        jnp.asarray(cur_pe), jnp.asarray(slot_pe), hw2d)

    with torch.no_grad():
        theirs = tb(torch.from_numpy(tgt),
                    torch.from_numpy(bank_k).permute(0, 1, 2, 3),
                    torch.from_numpy(bank_v),
                    torch.from_numpy(short_k), torch.from_numpy(short_v),
                    torch.from_numpy(self_pos), torch.from_numpy(cur_pe),
                    torch.from_numpy(slot_pe), hw2d)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               atol=2e-4, rtol=1e-3)


class TResNetStem(nn.Module):
    """conv1+bn1+maxpool+layer1[0] bottleneck (resnet.py:71-136)."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        # bottleneck with projection
        self.layer1 = nn.Sequential(_TBottleneck(64, 64, 1, True))

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, 2, 1)
        return self.layer1(x)


class _TBottleneck(nn.Module):
    def __init__(self, inp, planes, stride, down):
        super().__init__()
        self.conv1 = nn.Conv2d(inp, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = nn.Sequential(
            nn.Conv2d(inp, planes * 4, 1, stride, bias=False),
            nn.BatchNorm2d(planes * 4)) if down else None

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        o = F.relu(self.bn1(self.conv1(x)))
        o = F.relu(self.bn2(self.conv2(o)))
        o = self.bn3(self.conv3(o))
        return F.relu(o + r)


def test_resnet_stem_parity():
    """Stem + first bottleneck with folded frozen BN vs torch eval BN."""
    t = TResNetStem().eval()
    # randomize BN stats so folding is actually exercised
    with torch.no_grad():
        for m in t.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_(1, 0.2)
                m.bias.normal_(0, 0.2)
    sd = {f"encoder.{k}": v.detach().numpy() for k, v in t.state_dict().items()
          if "num_batches" not in k}
    # rename layer1.0.x -> layer1.0.x (already matches converter expectation)
    from rmem_tpu.utils.checkpoint import _convert_resnet
    out = {}
    _convert_resnet(sd, out, layers=(1,))

    from rmem_tpu.models.encoders.resnet import Bottleneck
    import flax.linen as nn_flax
    from rmem_tpu.ops.layers import FoldedBN, conv, max_pool_3x3_s2

    class Stem(nn_flax.Module):
        @nn_flax.compact
        def __call__(self, x):
            x = conv(64, 7, stride=2, bias=False, name="conv1")(x)
            x = FoldedBN(64, name="bn1")(x)
            x = nn_flax.relu(x)
            x = max_pool_3x3_s2(x)
            return Bottleneck(planes=64, stride=1, has_downsample=True,
                              name="layer1_0")(x)

    stem = Stem()
    x = np.random.RandomState(0).rand(1, 33, 33, 3).astype(np.float32)
    variables = stem.init(jax.random.PRNGKey(0), jnp.asarray(x))
    conv_params = {k[1:]: v for k, v in out.items()}  # strip ("encoder",)
    params = _to_params(variables["params"], conv_params)
    ours = stem.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        theirs = t(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1),
        atol=2e-4, rtol=1e-3)


def test_id_bank_parity():
    """patch_wise_id_bank 17x17/s16 conv (models/aot.py:64-83)."""
    tconv = nn.Conv2d(12, 64, 17, 16, 8).eval()
    sd = {f"patch_wise_id_bank.{k}": v.detach().numpy()
          for k, v in tconv.state_dict().items()}
    import flax.linen as nn_flax
    fconv = nn_flax.Conv(64, (17, 17), strides=(16, 16),
                         padding=((8, 8), (8, 8)))
    x = np.random.RandomState(0).rand(1, 65, 65, 12).astype(np.float32)
    variables = fconv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    from rmem_tpu.utils.checkpoint import _conv
    params = {"kernel": jnp.asarray(_conv(sd["patch_wise_id_bank.weight"])),
              "bias": jnp.asarray(sd["patch_wise_id_bank.bias"])}
    ours = fconv.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        theirs = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1),
        atol=1e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# GPM (DeAOT) block replica (transformer.py:1010-1236)
# ---------------------------------------------------------------------------

def _silu(x):
    return x * torch.sigmoid(x)


class TDWConv(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 5, padding=2, groups=c, bias=False)

    def forward(self, x, hw):  # [B, HW, C]
        h, w = hw
        b, l, c = x.shape
        y = x.view(b, h, w, c).permute(0, 3, 1, 2)
        y = self.conv(y)
        return y.permute(0, 2, 3, 1).reshape(b, l, c)


class TGatedLong(nn.Module):
    """GatedPropagation use_linear=False (attention.py:93-216)."""

    def __init__(self, d_att, cvu):
        super().__init__()
        self.d_att = d_att
        self.dw_conv = TDWConv(cvu)
        self.projection = nn.Linear(cvu, cvu // 2)

    def forward(self, q, k, v, u, hw):
        attn = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(self.d_att),
                             dim=-1)
        out = (attn @ v) * u
        return self.projection(self.dw_conv(out, hw))


class TLocalGated(nn.Module):
    """LocalGatedPropagation use_linear=False, heads=1 (attention.py:220-413).
    Unfold-based windowed attention with relative bias + zero-pad mask."""

    def __init__(self, d_att, cvu, max_dis=2):
        super().__init__()
        self.d_att = d_att
        self.max_dis = max_dis
        self.win = 2 * max_dis + 1
        self.relative_emb_k = nn.Conv2d(d_att, self.win ** 2, 1)
        self.dw_conv = TDWConv(cvu)
        self.projection = nn.Linear(cvu, cvu // 2)

    def forward(self, q, k, v, u, hw):  # q,k [B,HW,d_att]; v,u [B,HW,cvu]
        h, w = hw
        b = q.shape[0]
        q2 = q.view(b, h, w, -1).permute(0, 3, 1, 2)
        k2 = k.view(b, h, w, -1).permute(0, 3, 1, 2)
        v2 = v.view(b, h, w, -1).permute(0, 3, 1, 2)
        rel = self.relative_emb_k(q2).view(b, self.win ** 2, h * w)

        def unfold(x):
            x = F.pad(x, (self.max_dis,) * 4)
            return F.unfold(x, kernel_size=self.win)

        uk = unfold(k2).view(b, self.d_att, self.win ** 2, h * w)
        uv = unfold(v2).view(b, v.shape[-1], self.win ** 2, h * w)
        valid = unfold(torch.ones(1, 1, h, w)).view(1, self.win ** 2, h * w)
        qk = (q2.view(b, self.d_att, 1, h * w) * uk).sum(1) \
            / math.sqrt(self.d_att)
        qk = qk + rel - (1 - valid) * 1e8
        attn = torch.softmax(qk, dim=1)
        out = (attn.unsqueeze(1) * uv).sum(2)          # [b, cvu, hw]
        out = out.permute(0, 2, 1) * u
        return self.projection(self.dw_conv(out, hw))


class TGPMBlock(nn.Module):
    """GatedPropagationModule, layer_idx=1 (id branch active)."""

    def __init__(self, d=64, max_dis=2):
        super().__init__()
        d_att = d // 2
        e = 2 * d
        self.d, self.d_att = d, d_att
        self.norm1 = nn.LayerNorm(d)
        self.linear_QV = nn.Linear(d, d_att + e)
        self.linear_U = nn.Linear(d, e)
        self.id_norm1 = nn.LayerNorm(d)
        self.linear_ID_V = nn.Linear(2 * d, e)
        self.linear_ID_U = nn.Linear(d, e)
        self.long_term_attn = TGatedLong(d_att, 2 * e)
        self.short_term_attn = TLocalGated(d_att, 2 * e, max_dis)
        self.norm2 = nn.LayerNorm(d)
        self.id_norm2 = nn.LayerNorm(d)
        self.self_attn = TSelfGated(d, d_att)

    def forward(self, tgt, tgt_id, bk, bv, biv, sk, sv, siv, cur_pe,
                slot_pe, hw):
        t = self.norm1(tgt)
        qv = self.linear_QV(t)
        curr_q = qv[..., : self.d_att]
        curr_u = self.linear_U(t)
        tid = self.id_norm1(tgt_id)
        cat_u = _silu(torch.cat([curr_u, self.linear_ID_U(tid)], dim=-1))

        T, B, HW, _ = bk.shape
        gk = (bk + slot_pe[:, None, None, :]).permute(1, 0, 2, 3) \
            .reshape(B, T * HW, -1)
        gv = torch.cat([bv, biv], dim=-1).permute(1, 0, 2, 3) \
            .reshape(B, T * HW, -1)
        cat2 = self.long_term_attn(curr_q + cur_pe, gk, gv, cat_u, hw)
        cat3 = self.short_term_attn(curr_q, sk,
                                    torch.cat([sv, siv], dim=-1), cat_u, hw)
        t2, ti2 = cat2.split(self.d, dim=-1)
        t3, ti3 = cat3.split(self.d, dim=-1)
        tgt = tgt + t2 + t3
        tgt_id = tgt_id + ti2 + ti3
        cat_in = torch.cat([self.norm2(tgt), self.id_norm2(tgt_id)], dim=-1)
        so = self.self_attn(cat_in, hw)
        s2, si2 = so.split(self.d, dim=-1)
        return tgt + s2, tgt_id + si2


class TSelfGated(nn.Module):
    """GatedPropagation use_linear=True, heads=1 (attention.py:139-211)."""

    def __init__(self, d, d_att):
        super().__init__()
        e = 2 * d
        self.d_att = d_att
        self.linear_QK = nn.Linear(2 * d, d_att)
        self.linear_V1 = nn.Linear(d, e)
        self.linear_V2 = nn.Linear(d, e)
        self.linear_U1 = nn.Linear(d, e)
        self.linear_U2 = nn.Linear(d, e)
        self.dw_conv = TDWConv(2 * e)
        self.projection = nn.Linear(2 * e, 2 * d)

    def forward(self, x, hw):
        qk = self.linear_QK(x)
        v1, v2 = x.split(x.shape[-1] // 2, dim=-1)
        v = _silu(torch.cat([self.linear_V1(v1), self.linear_V2(v2)], -1))
        u = _silu(torch.cat([self.linear_U1(v1), self.linear_U2(v2)], -1))
        attn = torch.softmax(qk @ qk.transpose(-1, -2)
                             / math.sqrt(self.d_att), dim=-1)
        out = (attn @ v) * u
        return self.projection(self.dw_conv(out, hw))


def test_gpm_block_parity():
    d, hw2d, T, B = 64, (6, 7), 3, 1
    HW = hw2d[0] * hw2d[1]
    d_att = d // 2

    import rmem_tpu.models.gpm as gpm_mod
    old = gpm_mod.MAX_LOCAL_DIS
    gpm_mod.MAX_LOCAL_DIS = 2  # small window for the test
    try:
        tb = TGPMBlock(d, max_dis=2).eval()
        sd = _sd(tb, "LSTT.layers.1")
        fb = gpm_mod.GPMBlock(d_model=d, self_heads=1, att_heads=1,
                              layer_idx=1, droppath=0.0)
        rng = np.random.RandomState(2)
        tgt = rng.randn(B, HW, d).astype(np.float32)
        tgt_id = rng.randn(B, HW, d).astype(np.float32)
        bk = rng.randn(T, B, HW, d_att).astype(np.float32)
        bv = rng.randn(T, B, HW, 2 * d).astype(np.float32)
        biv = rng.randn(T, B, HW, 2 * d).astype(np.float32)
        sk = rng.randn(B, HW, d_att).astype(np.float32)
        sv = rng.randn(B, HW, 2 * d).astype(np.float32)
        siv = rng.randn(B, HW, 2 * d).astype(np.float32)
        cur_pe = rng.randn(1, d_att).astype(np.float32)
        slot_pe = rng.randn(T, d_att).astype(np.float32)
        mask = jnp.ones((T,), bool)

        bv_cat = jnp.concatenate([jnp.asarray(bv), jnp.asarray(biv)], -1)
        sv_cat = jnp.concatenate([jnp.asarray(sv), jnp.asarray(siv)], -1)
        variables = fb.init(
            jax.random.PRNGKey(0), jnp.asarray(tgt), jnp.asarray(tgt_id),
            jnp.asarray(bk), bv_cat, mask,
            jnp.asarray(sk), sv_cat, None,
            jnp.asarray(cur_pe), jnp.asarray(slot_pe), hw2d)
        from rmem_tpu.utils.checkpoint import _convert_gpm_block
        out_flat = {}
        _convert_gpm_block(sd, out_flat, 1)
        conv = {k[2:]: v for k, v in out_flat.items()}
        params = _to_params(variables["params"], conv)

        ours_t, ours_id, mems, _ = fb.apply(
            {"params": params}, jnp.asarray(tgt), jnp.asarray(tgt_id),
            jnp.asarray(bk), bv_cat, mask,
            jnp.asarray(sk), sv_cat, None,
            jnp.asarray(cur_pe), jnp.asarray(slot_pe), hw2d)
        with torch.no_grad():
            theirs_t, theirs_id = tb(
                torch.from_numpy(tgt), torch.from_numpy(tgt_id),
                torch.from_numpy(bk), torch.from_numpy(bv),
                torch.from_numpy(biv), torch.from_numpy(sk),
                torch.from_numpy(sv), torch.from_numpy(siv),
                torch.from_numpy(cur_pe), torch.from_numpy(slot_pe), hw2d)
        np.testing.assert_allclose(np.asarray(ours_t), theirs_t.numpy(),
                                   atol=3e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(ours_id), theirs_id.numpy(),
                                   atol=3e-4, rtol=1e-3)
    finally:
        gpm_mod.MAX_LOCAL_DIS = old


# ---------------------------------------------------------------------------
# stack-level parity: 2-layer LSTT + decoder norms + FPN decode
# ---------------------------------------------------------------------------

class TConvGN(nn.Module):
    def __init__(self, indim, outdim, k, groups=8):
        super().__init__()
        self.conv = nn.Conv2d(indim, outdim, k, padding=k // 2)
        self.gn = nn.GroupNorm(groups, outdim)

    def forward(self, x):
        return self.gn(self.conv(x))


class TFPN(nn.Module):
    """FPNSegmentationHead replica (decoders/fpn.py:7-73), NCHW."""

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
        x = torch.cat(inputs, dim=1)
        x = F.relu(self.conv_in(x))
        x = F.relu(self.conv_16x(self.adapter_16x(shortcuts[-2]) + x))
        x = F.interpolate(x, size=shortcuts[-3].shape[-2:], mode="bilinear",
                          align_corners=True)
        x = F.relu(self.conv_8x(self.adapter_8x(shortcuts[-3]) + x))
        x = F.interpolate(x, size=shortcuts[-4].shape[-2:], mode="bilinear",
                          align_corners=True)
        x = F.relu(self.conv_4x(self.adapter_4x(shortcuts[-4]) + x))
        return self.conv_out(x)


def test_lstt_stack_and_fpn_parity():
    """2-layer LSTT stack with decoder norms feeding the FPN, vs torch."""
    d, L = 64, 2
    eh, ew = 5, 6
    HW, B, T = eh * ew, 1, 2
    sc_dims = (8, 12, 16, 16)

    tblocks = [TLSTTBlock(d).eval() for _ in range(L)]
    tnorms = [nn.LayerNorm(d).eval() for _ in range(L)]
    with torch.no_grad():
        for n in tnorms:
            n.weight.normal_(1, 0.2)
            n.bias.normal_(0, 0.2)
    tfpn = TFPN(d * (L + 1), 11, d, sc_dims).eval()

    sd = {}
    for i, tb in enumerate(tblocks):
        sd.update(_sd(tb, f"LSTT.layers.{i}"))
    for i, n in enumerate(tnorms):
        sd.update(_sd(n, f"LSTT.decoder_norms.{i}"))
    sd.update(_sd(tfpn, "decoder"))

    from rmem_tpu.models.lstt import LSTT
    from rmem_tpu.models.decoders.fpn import FPNSegmentationHead
    import flax.linen as nn_flax

    class StackAndDecode(nn_flax.Module):
        def setup(self):
            self.lstt = LSTT(num_layers=L, d_model=d, self_heads=8,
                             att_heads=8, linear_q=False, droppath=0.0,
                             intermediate_norm=True, final_norm=True,
                             name="lstt")
            self.decoder = FPNSegmentationHead(
                in_dim=d * (L + 1), out_dim=11, hidden_dim=d,
                shortcut_dims=sc_dims, align_corners=True, name="decoder")

        def __call__(self, feat, bank, mask, short, self_pos, cpe, spe,
                     shortcuts):
            inter, mems, rec = self.lstt(feat, bank, mask, short, None,
                                         self_pos, cpe, spe, (eh, ew))
            b = shortcuts[-1].shape[0]
            inputs = [shortcuts[-1]] + [e.reshape(b, eh, ew, -1)
                                        for e in inter]
            return self.decoder(inputs, shortcuts)

    rng = np.random.RandomState(7)
    feat = rng.randn(B, HW, d).astype(np.float32)
    bank_k = rng.randn(L, T, B, HW, d).astype(np.float32)
    bank_v = rng.randn(L, T, B, HW, d).astype(np.float32)
    short_k = rng.randn(L, B, HW, d).astype(np.float32)
    short_v = rng.randn(L, B, HW, d).astype(np.float32)
    self_pos = rng.randn(1, HW, d).astype(np.float32)
    cpe = rng.randn(1, d).astype(np.float32)
    spe = rng.randn(T, d).astype(np.float32)
    mask = jnp.ones((T,), bool)
    # NHWC shortcuts at 4x/8x/16x/16x(proj, d channels)
    shortcuts = [rng.randn(B, eh * 4 - 3, ew * 4 - 3, sc_dims[0]
                           ).astype(np.float32),
                 rng.randn(B, eh * 2 - 1, ew * 2 - 1, sc_dims[1]
                           ).astype(np.float32),
                 rng.randn(B, eh, ew, sc_dims[2]).astype(np.float32),
                 rng.randn(B, eh, ew, d).astype(np.float32)]

    m = StackAndDecode()
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(feat),
                       (jnp.asarray(bank_k), jnp.asarray(bank_v)), mask,
                       (jnp.asarray(short_k), jnp.asarray(short_v)),
                       jnp.asarray(self_pos), jnp.asarray(cpe),
                       jnp.asarray(spe), [jnp.asarray(s) for s in shortcuts])

    from rmem_tpu.utils.checkpoint import (_convert_lstt_block, _convert_fpn,
                                           _put_norm)
    flat = {}
    for i in range(L):
        _convert_lstt_block(sd, flat, i)
    for i in range(L):
        _put_norm(sd, flat, f"LSTT.decoder_norms.{i}",
                  ("lstt", f"decoder_norm{i}"))
    _convert_fpn(sd, flat)
    params = _to_params(variables["params"], flat)

    ours = m.apply({"params": params}, jnp.asarray(feat),
                   (jnp.asarray(bank_k), jnp.asarray(bank_v)), mask,
                   (jnp.asarray(short_k), jnp.asarray(short_v)),
                   jnp.asarray(self_pos), jnp.asarray(cpe), jnp.asarray(spe),
                   [jnp.asarray(s) for s in shortcuts])

    # torch side
    with torch.no_grad():
        out = torch.from_numpy(feat)
        inters = []
        for i, tb in enumerate(tblocks):
            out = tb(out, torch.from_numpy(bank_k[i]),
                     torch.from_numpy(bank_v[i]),
                     torch.from_numpy(short_k[i]),
                     torch.from_numpy(short_v[i]),
                     torch.from_numpy(self_pos), torch.from_numpy(cpe),
                     torch.from_numpy(spe), (eh, ew))
            inters.append(out)
        # final norm on last, intermediate norm on earlier
        # (transformer.py:248-259)
        inters[-1] = tnorms[-1](inters[-1])
        for i in range(L - 1):
            inters[i] = tnorms[i](inters[i])
        sc_t = [torch.from_numpy(s.transpose(0, 3, 1, 2)) for s in shortcuts]
        dec_in = [sc_t[-1]] + [
            e.view(B, eh, ew, d).permute(0, 3, 1, 2) for e in inters]
        theirs = tfpn(dec_in, sc_t)
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1),
        atol=5e-4, rtol=2e-3)


def test_topdown_decode_block_parity():
    """_DecodeBlock (ConvTranspose + 1x1) matches a torch Decode_Block
    (resnet.py:216-238) through the _conv_t weight mapping."""
    from rmem_tpu.models.encoders.topdown import _DecodeBlock
    from rmem_tpu.utils.checkpoint import _conv, _conv_t

    torch.manual_seed(0)
    lin = nn.ConvTranspose2d(32, 16, 3, stride=2, padding=1, bias=False)
    lin2 = nn.Conv2d(16, 16, 1, bias=False)
    x = torch.randn(1, 32, 9, 9)
    y_t = lin(x)
    out_t = lin2(y_t)

    blk = _DecodeBlock(16, 3, 2)
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    params = blk.init(jax.random.PRNGKey(0), xj)["params"]
    params = {
        "linear": {"kernel": jnp.asarray(
            _conv_t(lin.weight.detach().numpy()).copy())},
        "linear2": {"kernel": jnp.asarray(
            _conv(lin2.weight.detach().numpy()))},
    }
    y_j, out_j = blk.apply({"params": params}, xj)
    np.testing.assert_allclose(
        np.transpose(np.asarray(y_j), (0, 3, 1, 2)),
        y_t.detach().numpy(), atol=2e-5)
    np.testing.assert_allclose(
        np.transpose(np.asarray(out_j), (0, 3, 1, 2)),
        out_t.detach().numpy(), atol=2e-5)
