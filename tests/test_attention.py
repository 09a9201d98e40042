"""Attention op parity: bank attention vs flat SDPA; dense local attention vs
an unfold-based torch formulation (the reference's algorithm, re-implemented
independently)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from rmem_tpu.ops.attention import (bank_attention, dense_local_attention,
                                    interleave_heads, multihead_attention)


def test_multihead_attention_matches_torch_sdpa():
    rng = np.random.RandomState(0)
    b, lq, lk, c, h = 2, 5, 7, 16, 4
    q = rng.randn(b, lq, c).astype(np.float32)
    k = rng.randn(b, lk, c).astype(np.float32)
    v = rng.randn(b, lk, c).astype(np.float32)

    def t(x, l):
        return torch.from_numpy(x).view(b, l, h, c // h).permute(0, 2, 1, 3)

    ref = F.scaled_dot_product_attention(t(q, lq), t(k, lk), t(v, lk))
    ref = ref.permute(0, 2, 1, 3).reshape(b, lq, c).numpy()
    got = multihead_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), h)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-3, rtol=1e-3)


def test_bank_attention_equals_flat_attention_with_record():
    rng = np.random.RandomState(1)
    s, b, lk, lq, ck, cv, h = 4, 1, 6, 5, 8, 12, 2
    n_valid = 3
    q = rng.randn(b, lq, ck).astype(np.float32)
    bk = rng.randn(s, b, lk, ck).astype(np.float32)
    bv = rng.randn(s, b, lk, cv).astype(np.float32)
    mask = np.arange(s) < n_valid

    out, rec = bank_attention(jnp.asarray(q), jnp.asarray(bk),
                              jnp.asarray(bv), jnp.asarray(mask), h,
                              need_record=True)

    # flat reference: concat valid slots along key axis
    kf = bk[:n_valid].transpose(1, 0, 2, 3).reshape(b, n_valid * lk, ck)
    vf = bv[:n_valid].transpose(1, 0, 2, 3).reshape(b, n_valid * lk, cv)
    ref = multihead_attention(jnp.asarray(q), jnp.asarray(kf),
                              jnp.asarray(vf), h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    r = np.asarray(rec)
    assert r.shape == (b, lq, s)
    np.testing.assert_allclose(r.sum(-1), 1.0, atol=1e-5)
    assert np.all(r[..., n_valid:] < 1e-6)

    # explicit per-slot mass: mean over heads of softmax mass per slot
    dh = ck // h
    qh = q.reshape(b, lq, h, dh)
    kh = kf.reshape(b, n_valid * lk, h, dh)
    logits = np.einsum("bqhd,bkhd->bhqk", qh, kh) / np.sqrt(dh)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    mass = p.reshape(b, h, lq, n_valid, lk).sum(-1).mean(1)
    np.testing.assert_allclose(r[..., :n_valid], mass, atol=1e-5)


def _torch_local_attention(q, k, v, rel, max_dis, num_heads, scale):
    """Unfold-based local attention following attention.py:289-361 semantics,
    re-derived independently: softmax over the (2m+1)^2 window with zero-pad
    positions masked, plus relative bias, probs applied to unfolded V."""
    b, hw, chd = q.shape
    h2d = w2d = int(np.sqrt(hw))
    win = 2 * max_dis + 1
    d = chd // num_heads
    dv = v.shape[-1] // num_heads
    qt = torch.from_numpy(q).view(b, h2d, w2d, num_heads * d)
    qt = qt.permute(0, 3, 1, 2)
    kt = torch.from_numpy(k).view(b, h2d, w2d, num_heads * d).permute(0, 3, 1, 2)
    vt = torch.from_numpy(v).view(b, h2d, w2d, num_heads * dv).permute(0, 3, 1, 2)

    def unfold(x):
        x = F.pad(x, (max_dis,) * 4)
        return F.unfold(x, kernel_size=win)  # [b, C*win*win, hw]

    uk = unfold(kt).view(b, num_heads, d, win * win, hw)
    uv = unfold(vt).view(b, num_heads, dv, win * win, hw)
    ones = torch.ones(1, 1, h2d, w2d)
    valid = unfold(ones).view(1, 1, win * win, hw)

    qh = qt.view(b, num_heads, d, hw)
    qk = (qh.unsqueeze(3) * uk).sum(dim=2) * scale       # [b,h,win2,hw]
    relb = torch.from_numpy(rel).view(b, hw, num_heads, win * win)
    relb = relb.permute(0, 2, 3, 1)                       # [b,h,win2,hw]
    qk = qk + relb
    qk = qk - (1 - valid) * 1e8
    attn = torch.softmax(qk, dim=2)
    out = (attn.unsqueeze(2) * uv).sum(dim=3)             # [b,h,dv,hw]
    return out.reshape(b, num_heads * dv, hw).permute(0, 2, 1).numpy()


@pytest.mark.parametrize("heads", [1, 2])
def test_dense_local_attention_matches_unfold(heads):
    rng = np.random.RandomState(2)
    h2d = w2d = 9
    hw = h2d * w2d
    max_dis = 2
    win2 = (2 * max_dis + 1) ** 2
    d, dv, b = 8, 6, 1
    q = rng.randn(b, hw, heads * d).astype(np.float32)
    k = rng.randn(b, hw, heads * d).astype(np.float32)
    v = rng.randn(b, hw, heads * dv).astype(np.float32)
    rel = rng.randn(b, hw, heads * win2).astype(np.float32)
    scale = d ** -0.5

    ref = _torch_local_attention(q, k, v, rel, max_dis, heads, scale)
    got, _ = dense_local_attention(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v), jnp.asarray(rel),
                                   (h2d, w2d), heads, max_dis)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-3, rtol=1e-3)


def test_interleave_heads():
    x1 = jnp.arange(8, dtype=jnp.float32).reshape(1, 1, 8)
    x2 = -jnp.arange(8, dtype=jnp.float32).reshape(1, 1, 8)
    out = interleave_heads(x1, x2, num_heads=2)
    expect = np.concatenate([np.arange(4), -np.arange(4),
                             np.arange(4, 8), -np.arange(4, 8)])
    np.testing.assert_array_equal(np.asarray(out)[0, 0], expect)


@pytest.mark.parametrize("heads", [1, 2])
def test_windowed_matches_dense_local_attention(heads):
    from rmem_tpu.ops.attention import windowed_local_attention
    rng = np.random.RandomState(4)
    h2d, w2d, max_dis = 7, 9, 2
    hw = h2d * w2d
    win2 = (2 * max_dis + 1) ** 2
    d, dv, b = 8, 6, 2
    q = rng.randn(b, hw, heads * d).astype(np.float32)
    k = rng.randn(b, hw, heads * d).astype(np.float32)
    v = rng.randn(b, hw, heads * dv).astype(np.float32)
    rel = rng.randn(b, hw, heads * win2).astype(np.float32)
    ref, _ = dense_local_attention(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v), jnp.asarray(rel),
                                   (h2d, w2d), heads, max_dis)
    got = windowed_local_attention(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v), jnp.asarray(rel),
                                   (h2d, w2d), heads, max_dis)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("heads,h2d,w2d,max_dis", [
    (1, 7, 9, 2), (2, 9, 13, 2), (1, 16, 16, 2), (1, 11, 23, 3),
])
def test_tiled_matches_dense_local_attention(heads, h2d, w2d, max_dis):
    from rmem_tpu.ops.attention import tiled_local_attention
    rng = np.random.RandomState(4)
    hw = h2d * w2d
    win2 = (2 * max_dis + 1) ** 2
    d, dv, b = 8, 6, 2
    q = rng.randn(b, hw, heads * d).astype(np.float32)
    k = rng.randn(b, hw, heads * d).astype(np.float32)
    v = rng.randn(b, hw, heads * dv).astype(np.float32)
    rel = rng.randn(b, hw, heads * win2).astype(np.float32)
    ref, _ = dense_local_attention(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v), jnp.asarray(rel),
                                   (h2d, w2d), heads, max_dis)
    got = tiled_local_attention(jnp.asarray(q), jnp.asarray(k),
                                jnp.asarray(v), jnp.asarray(rel),
                                (h2d, w2d), heads, max_dis)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)


def test_slot_pe_logit_bias_matches_slab_add():
    """Factored slot-PE bias (dispatch slot_pe=...) must equal adding the
    PE to bank_k before attention, for multi-head + padded banks."""
    import numpy as np
    from rmem_tpu.ops.attention import bank_attention, bank_attention_dispatch

    rng = np.random.RandomState(0)
    s, b, lk, lq, h, dh = 4, 1, 40, 37, 2, 16
    ck = h * dh
    q = jnp.asarray(rng.randn(b, lq, ck), jnp.float32)
    bank_k = jnp.asarray(rng.randn(s, b, lk, ck), jnp.float32)
    bank_v = jnp.asarray(rng.randn(s, b, lk, ck), jnp.float32)
    slot_mask = jnp.asarray([True, True, True, False])
    pe = jnp.asarray(rng.randn(s, ck), jnp.float32)

    ref_out, ref_rec = bank_attention(
        q, bank_k + pe[:, None, None, :], bank_v, slot_mask, h,
        need_record=True, true_lk=33)
    out, rec = bank_attention_dispatch(
        q, bank_k, bank_v, slot_mask, h, need_record=True,
        true_lk=33, slot_pe=pe)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(ref_rec),
                               atol=1e-6)
