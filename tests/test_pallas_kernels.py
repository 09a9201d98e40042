"""Pallas kernel parity vs the XLA reference ops (interpret mode on CPU):
forward values, slot-mass record, edge cases (count=1/capacity, ragged Lk,
bf16), and gradient parity through the custom flash-style VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rmem_tpu.ops.attention import bank_attention

from jax.experimental.pallas import tpu as pltpu
from rmem_tpu.kernels.bank_attention import pallas_bank_attention


def _run_pallas(fn, *args, interpret=True):
    if interpret:
        with pltpu.force_tpu_interpret_mode():
            return fn(*args)
    return fn(*args)


def _rand(rng, *shape, dtype=np.float32):
    return jnp.asarray(rng.randn(*shape).astype(dtype))


@pytest.mark.parametrize("heads,dh,dv,lq,lk", [
    (1, 128, 256, 200, 150),
    (2, 32, 32, 130, 128),
])
@pytest.mark.parametrize("n_valid", [1, 3])
def test_pallas_bank_attention_matches_xla(heads, dh, dv, lq, lk, n_valid):
    rng = np.random.RandomState(0)
    s, b = 4, 1
    q = _rand(rng, b, lq, heads * dh)
    bk = _rand(rng, s, b, lk, heads * dh)
    bv = _rand(rng, s, b, lk, heads * dv)
    mask = jnp.arange(s) < n_valid

    ref_out, ref_rec = bank_attention(q, bk, bv, mask, heads,
                                      need_record=True)
    out, rec = _run_pallas(pallas_bank_attention, q, bk, bv,
                           jnp.int32(n_valid), heads)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(ref_rec),
                               atol=2e-5)
    # masses over valid slots sum to 1
    np.testing.assert_allclose(np.asarray(rec).sum(-1), 1.0, atol=1e-4)
    assert np.all(np.asarray(rec)[..., n_valid:] < 1e-6)


def test_pallas_bank_attention_full_capacity_and_ragged_lk():
    """count == S (every slot valid) with Lk not a multiple of the key tile
    and Lq not a multiple of the query tile."""
    rng = np.random.RandomState(1)
    s, b, heads, dh, dv = 9, 1, 2, 64, 64
    lq, lk = 310, 290  # ragged against the 128-aligned internal tiles
    q = _rand(rng, b, lq, heads * dh)
    bk = _rand(rng, s, b, lk, heads * dh)
    bv = _rand(rng, s, b, lk, heads * dv)
    mask = jnp.ones((s,), bool)
    ref_out, ref_rec = bank_attention(q, bk, bv, mask, heads,
                                      need_record=True)
    out, rec = _run_pallas(pallas_bank_attention, q, bk, bv, jnp.int32(s),
                           heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(ref_rec),
                               atol=2e-5)


def test_pallas_bank_attention_bf16_record_accuracy():
    """bf16 storage: output within bf16 rounding of the fp32 reference; the
    slot-mass record accumulates in fp32 so it must stay much tighter."""
    rng = np.random.RandomState(2)
    s, b, heads, dh, dv, lq, lk = 4, 1, 1, 64, 64, 128, 128
    qf = _rand(rng, b, lq, heads * dh)
    bkf = _rand(rng, s, b, lk, heads * dh)
    bvf = _rand(rng, s, b, lk, heads * dv)
    mask = jnp.arange(s) < 3
    ref_out, ref_rec = bank_attention(qf, bkf, bvf, mask, heads,
                                      need_record=True)
    out, rec = _run_pallas(
        pallas_bank_attention, qf.astype(jnp.bfloat16),
        bkf.astype(jnp.bfloat16), bvf.astype(jnp.bfloat16),
        jnp.int32(3), heads)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref_out), atol=0.05, rtol=0.05)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(ref_rec),
                               atol=5e-3)


@pytest.mark.parametrize("heads,n_valid,lq,lk", [
    (1, 3, 130, 120),
    (2, 1, 128, 128),
    (2, 4, 150, 97),
])
def test_pallas_bank_attention_grad_matches_xla(heads, n_valid, lq, lk):
    """Gradient parity of the custom VJP vs jax.grad through the XLA einsum
    path, including gradient flow through the slot-mass record output."""
    rng = np.random.RandomState(3)
    s, b, dh, dv = 4, 1, 32, 32
    q = _rand(rng, b, lq, heads * dh)
    bk = _rand(rng, s, b, lk, heads * dh)
    bv = _rand(rng, s, b, lk, heads * dv)
    mask = jnp.arange(s) < n_valid
    w_out = _rand(rng, b, lq, heads * dv)
    w_rec = _rand(rng, b, lq, s)

    def loss_ref(q, bk, bv):
        out, rec = bank_attention(q, bk, bv, mask, heads, need_record=True)
        return jnp.sum(out * w_out) + jnp.sum(rec * w_rec)

    def loss_pl(q, bk, bv):
        out, rec = pallas_bank_attention(q, bk, bv, jnp.int32(n_valid),
                                         heads)
        return jnp.sum(out * w_out) + jnp.sum(rec * w_rec)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, bk, bv)
    with pltpu.force_tpu_interpret_mode():
        g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(q, bk, bv)

    for name, a, r in zip(("dq", "dk", "dv"), g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=3e-4, rtol=3e-4, err_msg=name)
    # gradients into invalid slots are exactly zero on both paths
    assert np.all(np.asarray(g_pl[1])[n_valid:] == 0)
    assert np.all(np.asarray(g_pl[2])[n_valid:] == 0)


def test_pallas_bank_attention_grad_out_only():
    """drec == 0 (training uses FIFO eviction, the record is unused):
    gradients must still match the XLA path."""
    rng = np.random.RandomState(4)
    s, b, heads, dh, dv, lq, lk = 3, 2, 2, 32, 32, 140, 130
    q = _rand(rng, b, lq, heads * dh)
    bk = _rand(rng, s, b, lk, heads * dh)
    bv = _rand(rng, s, b, lk, heads * dv)
    mask = jnp.ones((s,), bool)
    w_out = _rand(rng, b, lq, heads * dv)

    def loss_ref(q, bk, bv):
        out, _ = bank_attention(q, bk, bv, mask, heads, need_record=False)
        return jnp.sum(out * w_out)

    def loss_pl(q, bk, bv):
        out, _ = pallas_bank_attention(q, bk, bv, jnp.int32(s), heads)
        return jnp.sum(out * w_out)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, bk, bv)
    with pltpu.force_tpu_interpret_mode():
        g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(q, bk, bv)
    for name, a, r in zip(("dq", "dk", "dv"), g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=3e-4, rtol=3e-4, err_msg=name)


# ---------------------------------------------------------------------------
# tile-halo local attention kernel
# ---------------------------------------------------------------------------

from rmem_tpu.kernels.local_attention import pallas_local_attention
from rmem_tpu.ops.attention import tiled_local_attention


@pytest.mark.parametrize("h2d,w2d,heads,dh,dv,max_dis", [
    (17, 23, 1, 128, 256, 7),    # VOS-like odd grid, single head
    (12, 12, 2, 128, 128, 5),    # multi-head
    (9, 9, 1, 128, 128, 7),      # window clamped by grid (m < max_dis)
])
def test_pallas_local_attention_matches_tiled(h2d, w2d, heads, dh, dv,
                                              max_dis):
    rng = np.random.RandomState(3)
    b, hw = 1, h2d * w2d
    win2 = (2 * max_dis + 1) ** 2
    q = _rand(rng, b, hw, heads * dh)
    k = _rand(rng, b, hw, heads * dh)
    v = _rand(rng, b, hw, heads * dv)
    rel = _rand(rng, b, hw, heads * win2) * 0.3

    ref = tiled_local_attention(q, k, v, rel, (h2d, w2d), heads,
                                max_dis=max_dis)
    out = pallas_local_attention(q, k, v, rel, (h2d, w2d), heads,
                                 max_dis=max_dis, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_pallas_local_attention_bf16():
    rng = np.random.RandomState(4)
    h2d, w2d, heads, dh, dv, m = 16, 16, 1, 128, 128, 7
    b, hw = 1, h2d * w2d
    win2 = (2 * m + 1) ** 2
    q = _rand(rng, b, hw, dh, dtype=np.float32).astype(jnp.bfloat16)
    k = _rand(rng, b, hw, dh, dtype=np.float32).astype(jnp.bfloat16)
    v = _rand(rng, b, hw, dv, dtype=np.float32).astype(jnp.bfloat16)
    rel = (_rand(rng, b, hw, win2) * 0.3).astype(jnp.bfloat16)
    ref = tiled_local_attention(q, k, v, rel, (h2d, w2d), heads, max_dis=m)
    out = pallas_local_attention(q, k, v, rel, (h2d, w2d), heads, max_dis=m,
                                 interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=5e-2, rtol=5e-2)


def test_pallas_local_attention_trainable_grad_matches_xla():
    """The train-path wrapper (Pallas fwd, XLA-VJP bwd): value matches the
    kernel, gradients match differentiating the XLA tile-halo form."""
    from rmem_tpu.kernels.local_attention import \
        pallas_local_attention_trainable
    rng = np.random.RandomState(7)
    h2d, w2d, heads, dh, dv, m = 12, 12, 1, 128, 128, 5
    b, hw = 1, h2d * w2d
    win2 = (2 * m + 1) ** 2
    q = _rand(rng, b, hw, heads * dh)
    k = _rand(rng, b, hw, heads * dh)
    v = _rand(rng, b, hw, heads * dv)
    rel = _rand(rng, b, hw, heads * win2) * 0.3

    def loss_pallas(q_, k_, v_, r_):
        out = pallas_local_attention_trainable(q_, k_, v_, r_, (h2d, w2d),
                                               heads, m, None, True)
        return jnp.sum(jnp.sin(out))

    def loss_xla(q_, k_, v_, r_):
        out = tiled_local_attention(q_, k_, v_, r_, (h2d, w2d), heads,
                                    max_dis=m)
        return jnp.sum(jnp.sin(out))

    val_p, grads_p = jax.value_and_grad(loss_pallas, (0, 1, 2, 3))(
        q, k, v, rel)
    val_x, grads_x = jax.value_and_grad(loss_xla, (0, 1, 2, 3))(q, k, v, rel)
    np.testing.assert_allclose(float(val_p), float(val_x), rtol=2e-4)
    for gp, gx, name in zip(grads_p, grads_x, "qkvr"):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   atol=3e-4, rtol=3e-4, err_msg=name)


def test_pallas_gated_dwconv_matches_unrolled():
    from rmem_tpu.kernels.dwconv import pallas_gated_dwconv

    rng = np.random.RandomState(6)
    b, h, w, c = 1, 13, 21, 256
    x = _rand(rng, b, h, w, c)
    g = _rand(rng, b, h, w, c)
    kernel = _rand(rng, 5, 5, 1, c) * 0.2

    # reference: 25 shifted multiply-adds of the gated product
    xp = np.pad(np.asarray(x * g), ((0, 0), (2, 2), (2, 2), (0, 0)))
    ref = np.zeros((b, h, w, c), np.float32)
    kn = np.asarray(kernel)
    for dy in range(5):
        for dx in range(5):
            ref += xp[:, dy:dy + h, dx:dx + w, :] * kn[dy, dx, 0]

    out = pallas_gated_dwconv(x, g, kernel, interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)


def test_pallas_gated_dwconv_bf16():
    from rmem_tpu.kernels.dwconv import pallas_gated_dwconv

    rng = np.random.RandomState(7)
    b, h, w, c = 2, 8, 16, 128
    x = _rand(rng, b, h, w, c).astype(jnp.bfloat16)
    g = _rand(rng, b, h, w, c).astype(jnp.bfloat16)
    kernel = (_rand(rng, 5, 5, 1, c) * 0.2).astype(jnp.bfloat16)
    out = pallas_gated_dwconv(x, g, kernel, interpret=True)
    assert out.dtype == jnp.bfloat16
    assert out.shape == (b, h, w, c)
    xp = np.pad(np.asarray((x * g), np.float32),
                ((0, 0), (2, 2), (2, 2), (0, 0)))
    ref = np.zeros((b, h, w, c), np.float32)
    kn = np.asarray(kernel, np.float32)
    for dy in range(5):
        for dx in range(5):
            ref += xp[:, dy:dy + h, dx:dx + w, :] * kn[dy, dx, 0]
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               atol=5e-2, rtol=5e-2)


@pytest.mark.parametrize("n_valid", [1, 3, 4])
def test_pallas_bank_attention_qminor_matches_xla(n_valid):
    from rmem_tpu.kernels.bank_attention import pallas_bank_attention_qminor

    rng = np.random.RandomState(9)
    s, b, heads, dh, dv = 4, 1, 1, 128, 256
    lq, lk = 300, 270  # ragged vs both tile sizes
    q = _rand(rng, b, lq, heads * dh)
    bk = _rand(rng, s, b, lk, heads * dh)
    bv = _rand(rng, s, b, lk, heads * dv)
    mask = jnp.arange(s) < n_valid

    ref_out, ref_rec = bank_attention(q, bk, bv, mask, heads,
                                      need_record=True)
    out, rec = _run_pallas(pallas_bank_attention_qminor, q, bk, bv,
                           jnp.int32(n_valid), heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(ref_rec),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(rec).sum(-1), 1.0, atol=1e-4)


def test_pallas_bank_attention_padded_state_zero_copy_v():
    """The engine's padded-bank layout: slots stored at a 128-multiple
    token count (pad masked via true_lk) with the value operand taken from
    the FULL multi-layer bank at a static slot offset (v_slot_base) — must
    match the unpadded einsum reference layer by layer."""
    from rmem_tpu.kernels.bank_attention import pallas_bank_attention_infer

    rng = np.random.RandomState(3)
    l_layers, s, b, heads, dh, dv = 3, 4, 1, 1, 64, 128
    lq, lk, lk_pad = 150, 150, 256
    n_valid = 3

    q = _rand(rng, b, lq, dh)
    bank_k = np.zeros((l_layers, s, b, lk_pad, dh), np.float32)
    bank_v = np.zeros((l_layers, s, b, lk_pad, dv), np.float32)
    bank_k[:, :, :, :lk] = rng.randn(l_layers, s, b, lk, dh)
    bank_v[:, :, :, :lk] = rng.randn(l_layers, s, b, lk, dv)
    bank_k, bank_v = jnp.asarray(bank_k), jnp.asarray(bank_v)
    v_full = bank_v.reshape((-1,) + bank_v.shape[2:])
    mask = jnp.arange(s) < n_valid

    for layer in range(l_layers):
        ref_out, ref_rec = bank_attention(
            q, bank_k[layer, :, :, :lk], bank_v[layer, :, :, :lk],
            mask, heads, need_record=True)
        out, rec = _run_pallas(
            lambda: pallas_bank_attention_infer(
                q, bank_k[layer], v_full, jnp.int32(n_valid), heads,
                true_lk=lk, v_slot_base=layer * s))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                                   atol=2e-4, rtol=2e-4)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(ref_rec),
                                   atol=2e-5)

    # padded-but-per-layer V (the einsum true_lk mask itself): padded ref
    # equals unpadded ref bit-for-bit
    out_pad, rec_pad = bank_attention(
        q, bank_k[0], bank_v[0], mask, heads, need_record=True, true_lk=lk)
    ref_out, ref_rec = bank_attention(
        q, bank_k[0, :, :, :lk], bank_v[0, :, :, :lk], mask, heads,
        need_record=True)
    np.testing.assert_allclose(np.asarray(out_pad), np.asarray(ref_out),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(rec_pad), np.asarray(ref_rec),
                               atol=2e-7)


@pytest.mark.parametrize("use_pallas", [True, "all"])
def test_dispatch_routes_padded_bank_to_pad_aware_kernel(use_pallas):
    """Any truthy use_pallas flavor (incl. the AOT engine's plain True)
    with a pre-padded bank must hit the pad-aware inference kernel — the
    plain kernel would attend over the zero padding and corrupt outputs."""
    from rmem_tpu.ops.attention import bank_attention_dispatch

    rng = np.random.RandomState(7)
    s, b, heads, dh, dv, lq, lk, lk_pad = 3, 1, 2, 32, 32, 130, 100, 128
    q = _rand(rng, b, lq, heads * dh)
    bk = np.zeros((s, b, lk_pad, heads * dh), np.float32)
    bv = np.zeros((s, b, lk_pad, heads * dv), np.float32)
    bk[:, :, :lk] = rng.randn(s, b, lk, heads * dh)
    bv[:, :, :lk] = rng.randn(s, b, lk, heads * dv)
    bk, bv = jnp.asarray(bk), jnp.asarray(bv)
    mask = jnp.arange(s) < 2

    ref_out, ref_rec = bank_attention(q, bk[:, :, :lk], bv[:, :, :lk],
                                      mask, heads, need_record=True)
    out, rec = _run_pallas(
        lambda: bank_attention_dispatch(q, bk, bv, mask, heads,
                                        need_record=True,
                                        use_pallas=use_pallas, true_lk=lk))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(ref_rec),
                               atol=2e-5)


def test_preferred_token_pad():
    """Pad/tile co-design: smallest 128-multiple admitting a wide divisor
    tile. 480p's hw=6527 must pad to 6528 (tile 2176 = 128*17), not 8192."""
    from rmem_tpu.kernels.bank_attention import (_divisor_tile,
                                                 preferred_token_pad)

    assert preferred_token_pad(6527) == 6528
    assert _divisor_tile(6528, 2304) == 2176
    assert preferred_token_pad(6528) == 6528
    assert preferred_token_pad(100) == 128      # single chunk below a tile
    assert preferred_token_pad(3481) == 3584    # 59x59 train grid, tile 1792
    assert _divisor_tile(3584, 2304) == 1792
    # 2944 = 128*23 (prime 23 > 18) admits only a 128 tile -> bump to 3072
    assert preferred_token_pad(2944) == 3072
    assert _divisor_tile(3072, 2304) == 1536
    for hw in range(1, 9000, 37):               # terminates, sane bounds
        p = preferred_token_pad(hw)
        assert p >= hw and p % 128 == 0 and p - hw < 4096
        t = _divisor_tile(p, 2304)
        assert p % t == 0 and (t >= 1024 or t == p)


def test_pallas_infer_kernel_qbias_matches_slab_add():
    """Factored slot-PE logit bias through the pad-aware kernel must match
    the einsum reference with the PE added to bank_k."""
    from rmem_tpu.kernels.bank_attention import pallas_bank_attention_infer

    rng = np.random.RandomState(11)
    s, b, heads, dh, dv = 4, 1, 1, 64, 128
    lq, lk, lk_pad = 150, 150, 256
    n_valid = 3
    q = _rand(rng, b, lq, dh)
    bank_k = np.zeros((s, b, lk_pad, dh), np.float32)
    bank_v = np.zeros((s, b, lk_pad, dv), np.float32)
    bank_k[:, :, :lk] = rng.randn(s, b, lk, dh)
    bank_v[:, :, :lk] = rng.randn(s, b, lk, dv)
    bank_k, bank_v = jnp.asarray(bank_k), jnp.asarray(bank_v)
    pe = jnp.asarray(rng.randn(s, dh), np.float32)
    mask = jnp.arange(s) < n_valid
    scale = dh ** -0.5

    ref_out, ref_rec = bank_attention(
        q, bank_k[:, :, :lk] + pe[:, None, None, :], bank_v[:, :, :lk],
        mask, heads, need_record=True)
    qbias = (jnp.einsum("bqd,sd->bqs", q, pe) * scale)
    out, rec = _run_pallas(
        lambda: pallas_bank_attention_infer(
            q, bank_k, bank_v, jnp.int32(n_valid), heads,
            true_lk=lk, qbias=qbias))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(ref_rec),
                               atol=2e-5)


def _xla_stem_bf16(x, k, scale, bias):
    """The ResNet stem chain exactly as the plain bf16 path computes it:
    conv7x7/s2 (bf16 in, f32 accum, bf16 out) -> FoldedBN affine in bf16 ->
    relu -> torch-style maxpool 3x3/s2 pad 1."""
    import flax.linen as nn
    dt = jnp.bfloat16
    y = jax.lax.conv_general_dilated(
        x.astype(dt), k.astype(dt), (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = nn.relu(y * scale.astype(dt) + bias.astype(dt))
    return nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


@pytest.mark.parametrize("hw", [(121, 213), (65, 129), (120, 200)])
def test_pallas_stem_matches_xla_chain(hw):
    """Fused conv+BN+relu+maxpool stem kernel (kernels/stem.py) vs the
    plain XLA chain, bf16: differences are bf16 accumulation-order noise
    only (measured max rel ~0.9% at 481x849 in f32-vs-f32 terms; here the
    bound is one bf16 ulp of headroom)."""
    from rmem_tpu.kernels.stem import pallas_stem

    rng = np.random.RandomState(0)
    H, W = hw
    x = _rand(rng, 1, H, W, 3)
    k = _rand(rng, 7, 7, 3, 64) * 0.1
    s = jnp.asarray(rng.rand(64).astype(np.float32) + 0.5)
    b = _rand(rng, 64) * 0.1
    ref = np.asarray(_xla_stem_bf16(x, k, s, b), np.float32)
    got = np.asarray(pallas_stem(x, k, s, b, interpret=True), np.float32)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.02)


def test_resnet_pallas_stem_variant_matches_conv():
    """ResNet with stem='pallas' shares the exact param tree with the plain
    stem and produces the same pyramid within bf16 tolerance (the fused
    kernel is an opt-in inference formulation, cfg.use_pallas_stem)."""
    from jax.experimental.pallas import tpu as pltpu

    from rmem_tpu.models.encoders.resnet import ResNet

    rng = np.random.RandomState(1)
    x = _rand(rng, 1, 65, 97, 3)
    plain = ResNet(layers=(1, 1, 1), dtype=jnp.bfloat16, stem="conv")
    fused = ResNet(layers=(1, 1, 1), dtype=jnp.bfloat16, stem="pallas")
    params = plain.init(jax.random.PRNGKey(0), x)["params"]
    with pltpu.force_tpu_interpret_mode():
        params2 = fused.init(jax.random.PRNGKey(0), x)["params"]
        got = fused.apply({"params": params}, x)
    assert (jax.tree.structure(jax.tree.map(jnp.shape, params))
            == jax.tree.structure(jax.tree.map(jnp.shape, params2)))
    ref = plain.apply({"params": params}, x)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(r, np.float32),
                                   rtol=0.12, atol=0.05)


def test_pallas_stem_batched_and_grad():
    """Batched stem (the train graph encodes B*T frames at once) matches
    the XLA chain per image, and pallas_stem_trainable's custom VJP equals
    the plain chain's gradients at the same inputs (same transposition
    pattern as pallas_local_attention_trainable)."""
    from rmem_tpu.kernels.stem import (pallas_stem, pallas_stem_trainable,
                                       xla_stem_chain)

    rng = np.random.RandomState(2)
    x = _rand(rng, 3, 41, 57, 3)
    k = _rand(rng, 7, 7, 3, 64) * 0.1
    s = jnp.asarray(rng.rand(64).astype(np.float32) + 0.5)
    b = _rand(rng, 64) * 0.1
    ref = np.asarray(xla_stem_chain(x, k, s, b), np.float32)
    got = np.asarray(pallas_stem(x, k, s, b, interpret=True), np.float32)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.02)

    def loss_pallas(x_, k_, s_, b_):
        return jnp.sum(pallas_stem_trainable(x_, k_, s_, b_, True) ** 2)

    def loss_xla(x_, k_, s_, b_):
        return jnp.sum(xla_stem_chain(x_, k_, s_, b_) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(x, k, s, b)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(x, k, s, b)
    for a_, b_, name in zip(gp, gx, ("dx", "dk", "dscale", "dbias")):
        a_, b_ = np.asarray(a_, np.float32), np.asarray(b_, np.float32)
        # fwd values differ by bf16 accumulation noise; the cotangent g
        # (2*out) inherits it, so compare with bf16-scale tolerance
        np.testing.assert_allclose(
            a_, b_, rtol=0.08, atol=0.05 * (np.abs(b_).max() + 1e-6),
            err_msg=name)
