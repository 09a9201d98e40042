"""Torch-parity tests for the pure ops (resize, temporal PE, losses, masks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from rmem_tpu.ops.losses import cross_entropy_topk, segmentation_loss, soft_jaccard
from rmem_tpu.ops.masks import apply_ignore_token, mask_unused_ids, one_hot_mask
from rmem_tpu.ops.resize import resize_bilinear, resize_nearest
from rmem_tpu.ops.temporal_pe import interpolate_temporal_pe


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("shape", [((7, 9), (13, 17)), ((30, 30), (59, 59)),
                                   ((31, 54), (481, 857)), ((16, 16), (5, 3))])
def test_resize_bilinear_matches_torch(shape, align):
    (h, w), (H, W) = shape
    x = np.random.RandomState(0).rand(2, 3, h, w).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), size=(H, W), mode="bilinear",
                        align_corners=align).numpy()
    got = resize_bilinear(jnp.asarray(x), (H, W), align_corners=align,
                          channel_last=False)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)


@pytest.mark.parametrize("shape", [((13, 17), (7, 9)), ((465, 465), (30, 30))])
def test_resize_nearest_matches_torch(shape):
    (h, w), (H, W) = shape
    x = np.random.RandomState(1).rand(1, 2, h, w).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), size=(H, W), mode="nearest").numpy()
    got = resize_nearest(jnp.asarray(x), (H, W), channel_last=False)
    np.testing.assert_array_equal(np.asarray(got), ref)


def _torch_temporal_pe(mem_pos_emb: np.ndarray, T: int) -> np.ndarray:
    """Reference semantics (transformer.py:594-629), independent re-impl."""
    P, C = mem_pos_emb.shape
    pe = torch.from_numpy(mem_pos_emb)
    if T <= P:
        pe = pe[:T]  # reference truncates BEFORE interpolating (transformer.py:601-602)
    if T == 1:
        return mem_pos_emb[0:1]
    x = pe.permute(1, 0).view(1, C, -1)
    if T <= P:
        # T -> T linear interpolation is an identity
        x = F.interpolate(x, size=T, mode="linear", align_corners=True)
    else:
        x = F.interpolate(x, size=P, mode="linear", align_corners=True)
        x = torch.flip(x, dims=(-1,))
        x = F.interpolate(x, size=T, mode="nearest")
        x = torch.flip(x, dims=(-1,))
    return x.view(C, T).permute(1, 0).numpy()


@pytest.mark.parametrize("t", [1, 2, 3, 4, 5, 7, 9, 10, 16])
def test_temporal_pe_matches_torch(t):
    pe = np.random.RandomState(2).randn(4, 8).astype(np.float32)
    ref = _torch_temporal_pe(pe, t)
    got = np.asarray(interpolate_temporal_pe(jnp.asarray(pe), jnp.int32(t),
                                             capacity=20))[:t]
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_temporal_pe_traced_t():
    """t may be a traced value — no recompile per bank size."""
    pe = jnp.asarray(np.random.RandomState(3).randn(4, 8).astype(np.float32))
    f = jax.jit(lambda t: interpolate_temporal_pe(pe, t, capacity=12))
    for t in (1, 4, 9):
        ref = _torch_temporal_pe(np.asarray(pe), t)
        np.testing.assert_allclose(np.asarray(f(jnp.int32(t)))[:t], ref,
                                   atol=1e-5)


def _torch_topk_ce(logits, label, obj_num, step, topk=0.15, mining=10_000.0):
    lg = torch.from_numpy(logits)[None, : obj_num + 1]  # [1,C,H,W]
    gt = torch.from_numpy(label)[None]
    num_pixels = float(lg.size(2) * lg.size(3))
    lg = lg.view(-1, lg.size(1), lg.size(2) * lg.size(3))
    gt2 = gt.reshape(-1, gt.size(1) * gt.size(2))
    pix = F.cross_entropy(lg, gt2.long(), ignore_index=255, reduction="none")
    ratio = min(1.0, step / mining)
    k = int((ratio * topk + (1.0 - ratio)) * num_pixels)
    top, _ = torch.topk(pix, k=k, dim=1)
    return top.mean().item()


@pytest.mark.parametrize("step", [0, 5000, 20000])
def test_cross_entropy_topk_matches_torch(step):
    rng = np.random.RandomState(4)
    logits = rng.randn(11, 12, 13).astype(np.float32)  # C,H,W
    label = rng.randint(0, 3, size=(12, 13)).astype(np.int64)
    label[0, :5] = 255
    ref = _torch_topk_ce(logits, label, obj_num=2, step=step)
    got = cross_entropy_topk(
        jnp.asarray(logits.transpose(1, 2, 0)), jnp.asarray(label),
        jnp.int32(2), jnp.float32(step), 0.15, 10_000.0)
    np.testing.assert_allclose(float(got), ref, rtol=1e-5)


def _torch_soft_jaccard(logits, label, obj_num, eps=1e-6):
    lg = torch.from_numpy(logits)[None, : obj_num + 1]
    pred = F.softmax(lg, dim=1)
    lbl = torch.from_numpy(label).view(-1)
    B, C, H, W = pred.size()
    probas = pred.permute(0, 2, 3, 1).reshape(-1, C)
    valid = lbl != 255
    probas, lbl = probas[valid], lbl[valid]
    losses = []
    for c in range(C):
        fg = (lbl == c).float()
        if fg.sum() == 0:
            continue
        p0 = probas[:, c]
        num = torch.sum(p0 * fg)
        den = num + torch.sum(p0 * (1 - fg)) + torch.sum((1 - p0) * fg)
        losses.append(1 - num / (den + eps))
    return torch.stack(losses).mean().item()


def test_soft_jaccard_matches_torch():
    rng = np.random.RandomState(5)
    logits = rng.randn(11, 9, 10).astype(np.float32)
    label = rng.randint(0, 4, size=(9, 10)).astype(np.int64)
    label[3, :] = 255
    ref = _torch_soft_jaccard(logits, label, obj_num=3)
    got = soft_jaccard(jnp.asarray(logits.transpose(1, 2, 0)),
                       jnp.asarray(label), jnp.int32(3))
    np.testing.assert_allclose(float(got), ref, rtol=1e-4)


def test_segmentation_loss_batched():
    rng = np.random.RandomState(6)
    logits = jnp.asarray(rng.randn(2, 8, 8, 11).astype(np.float32))
    label = jnp.asarray(rng.randint(0, 2, size=(2, 8, 8)))
    out = segmentation_loss(logits, label, jnp.array([1, 1]), jnp.float32(0))
    assert out.shape == (2,)
    assert np.all(np.isfinite(np.asarray(out)))


def test_one_hot_and_ignore():
    mask = jnp.asarray([[[0, 1], [255, 2]]])
    oh, ig = one_hot_mask(mask, 10)
    assert oh.shape == (1, 2, 2, 11) and ig.shape == (1, 2, 2, 1)
    assert float(oh[0, 0, 1, 1]) == 1.0
    assert float(ig[0, 1, 0, 0]) == 1.0
    assert float(oh[0, 1, 0].sum()) == 0.0  # 255 is not a class
    full = apply_ignore_token(oh, ig)
    assert full.shape == (1, 2, 2, 12)
    # ignored pixel: background zeroed, ignore channel set
    assert float(full[0, 1, 0, 0]) == 0.0 and float(full[0, 1, 0, 11]) == 1.0


def test_mask_unused_ids():
    logits = jnp.zeros((2, 1, 1, 11))
    out = mask_unused_ids(logits, jnp.array([2, 10]))
    assert float(out[0, 0, 0, 2]) == 0.0
    assert float(out[0, 0, 0, 3]) == -1e10
    assert float(out[1, 0, 0, 10]) == 0.0


def test_resize_cubic_matches_cv2():
    """Device-side cubic resize == cv2.resize INTER_CUBIC float path
    (A=-0.75, replicate border, (i+0.5)*scale-0.5 grid)."""
    import cv2
    from rmem_tpu.ops.resize import resize_cubic

    rng = np.random.RandomState(0)
    for (h0, w0), (h1, w1) in (((480, 854), (481, 849)),
                               ((100, 80), (50, 40)),
                               ((50, 40), (100, 81)),
                               ((33, 33), (33, 33))):
        img = rng.rand(h0, w0, 3).astype(np.float32) * 255
        want = cv2.resize(img, (w1, h1), interpolation=cv2.INTER_CUBIC)
        got = np.asarray(resize_cubic(jnp.asarray(img[None]), (h1, w1))[0])
        np.testing.assert_allclose(got, want, atol=5e-4)


def test_cross_entropy_topk_gradient_matches_torch():
    """The stop-gradient mask formulation must reproduce torch.topk's
    backward: 1/k flows to exactly the selected pixels (value equality is
    covered above; this pins the gradient path)."""
    import torch

    from rmem_tpu.ops.losses import cross_entropy_topk

    rng = np.random.RandomState(5)
    h, w, c = 9, 11, 4
    logits_np = rng.randn(h, w, c).astype(np.float32)
    label_np = rng.randint(0, 3, (h, w)).astype(np.int32)
    label_np[0, :3] = 255  # some ignored pixels
    step = 9999.0  # fully annealed -> top 15%

    def loss_fn(lg):
        return cross_entropy_topk(lg, jnp.asarray(label_np),
                                  jnp.asarray(2), jnp.float32(step),
                                  top_k_percent=0.15,
                                  hard_mining_steps=10_000.0)

    g = np.asarray(jax.grad(loss_fn)(jnp.asarray(logits_np)))

    # torch reference: reduction='none' CE, topk, mean -> autograd
    t_logits = torch.tensor(logits_np, requires_grad=True)
    t_label = torch.tensor(label_np.astype(np.int64))
    lg = t_logits.clone()
    lg[..., 3] = -1e30  # mask class beyond obj_num=2 like _valid_class_logits
    ce = torch.nn.functional.cross_entropy(
        lg.reshape(-1, c), t_label.reshape(-1), ignore_index=255,
        reduction="none")
    k = int(np.floor(0.15 * h * w))
    top, _ = torch.topk(ce, k)
    top.mean().backward()
    ref = t_logits.grad.numpy()
    np.testing.assert_allclose(g, ref, atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("k,h,w", [
    (17, 33, 49),    # align_corners grid (16n+1)
    (17, 16, 31),    # height smaller than one padded patch span
    (16, 32, 48),    # align_corners=False: stride == kernel
    (16, 33, 50),    # non-multiple-of-16 -> VALID crop
])
def test_patch_wise_id_bank_matches_conv(k, h, w):
    """_PatchWiseIdBank (patch extraction + one matmul) must equal the
    nn.Conv it replaces, sharing the exact same param tree."""
    import flax.linen as nn

    from rmem_tpu.models.aot import _PatchWiseIdBank

    rng = np.random.RandomState(11)
    c_in, c_out = 12, 32
    x = jnp.asarray(rng.rand(2, h, w, c_in).astype(np.float32))

    pad = 8 if k == 17 else 0
    conv = nn.Conv(c_out, (k, k), strides=(16, 16),
                   padding=((pad, pad), (pad, pad)))
    mine = _PatchWiseIdBank(features=c_out, kernel_size=k)

    params = mine.init(jax.random.PRNGKey(0), x)["params"]
    params = jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.randn(*p.shape).astype(np.float32)) * 0.1,
        params)
    ref = conv.apply({"params": params}, x)
    out = mine.apply({"params": params}, x)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("ignore_token", [True, False])
def test_patch_wise_id_bank_label_path(ignore_token):
    """The int-label fast path (one-hot built in patch space) must equal
    the float path fed the engine's one_hot_mask(+apply_ignore_token)
    output — including 255-ignore pixels and conv zero padding."""
    from rmem_tpu.models.aot import _PatchWiseIdBank
    from rmem_tpu.ops.masks import apply_ignore_token, one_hot_mask

    rng = np.random.RandomState(13)
    h, w, max_obj = 33, 49, 3
    in_c = max_obj + 1 + int(ignore_token)
    labels = rng.randint(0, max_obj + 1, (2, h, w)).astype(np.int32)
    labels[0, :5, :7] = 255                      # ignore patch
    label = jnp.asarray(labels)

    mine = _PatchWiseIdBank(features=32, kernel_size=17, in_channels=in_c)
    oh_f, ig = one_hot_mask(label, max_obj)
    full = apply_ignore_token(oh_f, ig) if ignore_token else oh_f
    params = mine.init(jax.random.PRNGKey(1), full)["params"]
    params = jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.randn(*p.shape).astype(np.float32)) * 0.1,
        params)

    ref = mine.apply({"params": params}, full)
    lbl = jnp.where(label == 255, max_obj + 1, label).astype(jnp.int32)
    out = mine.apply({"params": params}, lbl)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_yuv420_roundtrip_matches_cv2():
    """Device-side I420 decode (ops/color.py) matches cv2.COLOR_YUV2RGB_I420
    within 1 LSB, so host-pack(cv2) + device-unpack is a controlled pair;
    the vs-original error is the inherent chroma-subsampling loss."""
    import cv2
    from rmem_tpu.ops.color import rgb_to_yuv420, yuv420_to_rgb

    rng = np.random.RandomState(0)
    for shape in ((240, 432), (96, 160)):
        small = rng.randint(0, 255, (shape[0] // 8, shape[1] // 8, 3),
                            np.uint8)
        img = cv2.resize(small, (shape[1], shape[0]),
                         interpolation=cv2.INTER_CUBIC)
        yuv = rgb_to_yuv420(img)
        assert yuv.shape == (shape[0] * 3 // 2, shape[1])
        assert yuv.nbytes * 2 == img.nbytes * 1  # 1.5 B/px vs 3 B/px
        ours = np.asarray(yuv420_to_rgb(jnp.asarray(yuv[None]))[0])
        ref = cv2.cvtColor(yuv, cv2.COLOR_YUV2RGB_I420).astype(np.float32)
        assert np.abs(ours - ref).max() <= 1.0
        # smooth content reconstructs closely (lossy but bounded)
        assert np.abs(ours - img.astype(np.float32)).mean() < 10.0


@pytest.mark.parametrize("ignore_token", [True, False])
def test_patch_wise_id_bank_label_path_shuffled(ignore_token):
    """The train engine's int-label remap (channel = perm[label], 255 ->
    obj+1; engine/training.map_id_label) must equal the reference float
    chain one_hot -> apply_ignore_token(shuffle) through the id bank —
    the id-shuffle augmentation collapsing to an integer permutation."""
    from rmem_tpu.models.aot import _PatchWiseIdBank
    from rmem_tpu.ops.masks import (apply_ignore_token, host_id_shuffle_matrix,
                                    one_hot_mask)

    rng = np.random.RandomState(17)
    h, w, max_obj = 33, 49, 3
    in_c = max_obj + 1 + int(ignore_token)
    labels = rng.randint(0, max_obj + 1, (2, h, w)).astype(np.int32)
    labels[0, :5, :7] = 255
    label = jnp.asarray(labels)
    shuffle = jnp.asarray(host_id_shuffle_matrix(rng, max_obj + 1, 2))

    mine = _PatchWiseIdBank(features=32, kernel_size=17, in_channels=in_c)
    oh_f, ig = one_hot_mask(label, max_obj)
    if ignore_token:
        full = apply_ignore_token(oh_f, ig, shuffle)
    else:
        full = jnp.einsum("bhwo,bot->bhwt", oh_f, shuffle)
    params = mine.init(jax.random.PRNGKey(1), full)["params"]
    params = jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.randn(*p.shape).astype(np.float32)) * 0.1,
        params)
    ref = mine.apply({"params": params}, full)

    perm = jnp.argmax(shuffle, axis=-1).astype(jnp.int32)   # [B, obj+1]
    safe = jnp.clip(label, 0, max_obj).astype(jnp.int32)
    mapped = jax.vmap(lambda p, l: p[l])(perm, safe)
    mapped = jnp.where(label == 255, max_obj + 1, mapped)
    out = mine.apply({"params": params}, mapped)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
