"""Encoder pyramid shape/sanity tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rmem_tpu.models.encoders import build_encoder
from rmem_tpu.models.encoders.swin import SwinTransformer


@pytest.mark.parametrize("name,dims", [
    ("resnet50", (256, 512, 1024, 1024)),
    ("mobilenetv2", (24, 32, 96, 1280)),
    ("tiny", (32, 48, 64, 64)),
])
def test_encoder_pyramid_shapes(name, dims):
    enc = build_encoder(name)
    x = jnp.zeros((1, 65, 65, 3))
    params = jax.jit(lambda: enc.init(jax.random.PRNGKey(0), x))()
    xs = enc.apply(params, x)
    assert len(xs) == 4
    # strides 4 / 8 / 16 / 16 with ceil division for odd inputs
    assert xs[0].shape[1:] == (17, 17, dims[0])
    assert xs[1].shape[1:] == (9, 9, dims[1])
    assert xs[2].shape[1:] == (5, 5, dims[2])
    assert xs[3].shape[1:] == (5, 5, dims[3])


def test_swin_pyramid_shapes():
    # small swin variant (full Swin-B is too slow for CI on this host)
    enc = SwinTransformer(embed_dim=32, depths=(2, 2, 2), num_heads=(2, 4, 8),
                          window_size=4)
    x = jnp.zeros((1, 64, 48, 3))
    params = jax.jit(lambda: enc.init(jax.random.PRNGKey(0), x))()
    xs = enc.apply(params, x)
    assert len(xs) == 4
    assert xs[0].shape == (1, 16, 12, 32)
    assert xs[1].shape == (1, 8, 6, 64)
    assert xs[2].shape == (1, 4, 3, 128)
    assert xs[3].shape == (1, 4, 3, 128)
    for t in xs:
        assert np.all(np.isfinite(np.asarray(t)))


def test_swin_shifted_window_mask_effect():
    """Shifted blocks must not attend across the roll boundary: compare a
    feature map with a corner perturbation — effects stay local-ish."""
    enc = SwinTransformer(embed_dim=16, depths=(2,), num_heads=(2,),
                          window_size=4)
    x0 = jnp.zeros((1, 32, 32, 3))
    params = jax.jit(lambda: enc.init(jax.random.PRNGKey(0), x0))()
    x1 = x0.at[0, 0, 0, :].set(10.0)
    y0 = np.asarray(enc.apply(params, x0)[0])
    y1 = np.asarray(enc.apply(params, x1)[0])
    diff = np.abs(y1 - y0).sum(-1)[0]
    assert diff[0, 0] > 0  # perturbation visible at source
    assert diff[-1, -1] < diff[0, 0]  # far corner much less affected


def test_resnest_pyramid_shapes():
    enc = build_encoder("resnest50")
    x = jnp.zeros((1, 65, 65, 3))
    params = jax.jit(lambda: enc.init(jax.random.PRNGKey(0), x))()
    xs = enc.apply(params, x)
    assert [t.shape for t in xs] == [(1, 17, 17, 256), (1, 9, 9, 512),
                                     (1, 5, 5, 1024), (1, 5, 5, 1024)]


def test_topdown_encoder_modes():
    from rmem_tpu.models.encoders.topdown import ResNet50TopDown
    x = jnp.ones((1, 65, 65, 3)) * 0.1
    m = jnp.zeros((1, 65, 65)).at[:, 20:40, 20:40].set(1.0)
    for use_mask in (True, False):
        enc = ResNet50TopDown(use_mask=use_mask)
        params = jax.jit(lambda e=enc: e.init(jax.random.PRNGKey(0), x, m))()
        pyr, vloss = enc.apply(params, x, m)
        assert pyr[-1].shape == (1, 5, 5, 1024)
        assert np.isfinite(float(vloss)) and float(vloss) > 0


def test_stem_im2col_matches_plain_conv():
    """The im2col+matmul stem (the eval default) performs the same
    multiply-adds as the plain 7x7/s2/pad3 conv (same `conv1/kernel`
    param) at odd AND even sizes."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from rmem_tpu.models.encoders.resnet import _StemConvIm2col
    from rmem_tpu.ops.layers import conv

    rng = np.random.RandomState(1)
    for h, w in ((33, 49), (32, 48), (31, 54)):
        x = jnp.asarray(rng.randn(1, h, w, 3).astype(np.float32))
        k = jnp.asarray(rng.randn(7, 7, 3, 64).astype(np.float32) * 0.1)
        ref = conv(64, 7, stride=2, bias=False).apply(
            {"params": {"kernel": k}}, x)
        out = _StemConvIm2col().apply({"params": {"kernel": k}}, x)
        assert out.shape == ref.shape, (h, w, out.shape, ref.shape)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


def test_stem_s2d_matches_plain_conv():
    """The space-to-depth stem performs the same multiply-adds as the plain
    7x7/s2/pad3 conv (same `conv1/kernel` param) at odd AND even sizes."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from rmem_tpu.models.encoders.resnet import _StemConvS2D
    from rmem_tpu.ops.layers import conv

    rng = np.random.RandomState(0)
    for h, w in ((33, 49), (32, 48), (31, 54)):
        x = jnp.asarray(rng.randn(1, h, w, 3).astype(np.float32))
        k = jnp.asarray(rng.randn(7, 7, 3, 64).astype(np.float32) * 0.1)
        ref = conv(64, 7, stride=2, bias=False).apply(
            {"params": {"kernel": k}}, x)
        out = _StemConvS2D().apply({"params": {"kernel": k}}, x)
        assert out.shape == ref.shape, (h, w, out.shape, ref.shape)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("name", ["resnet50", "mobilenetv2", "mobilenetv3",
                                  "resnest50"])
def test_fold_bn_params_exact(name):
    """fold_bn_params (BN scale premultiplied into conv kernels at load)
    leaves every pyramid level numerically unchanged in f32 — validates
    the name-based conv/bn pairing rule per encoder family."""
    from rmem_tpu.models.encoders import fold_bn_params

    enc = build_encoder(name)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 65, 65, 3)
                    .astype(np.float32))
    params = jax.jit(lambda: enc.init(jax.random.PRNGKey(0), x))()
    # randomize the BN affines so folding errors are visible (init is
    # scale=1/bias=0, which would make folding a no-op)
    rng = np.random.RandomState(1)

    def rand_bn(node):
        if isinstance(node, dict):
            if set(node) == {"scale", "bias"}:
                return {
                    "scale": jnp.asarray(
                        rng.rand(*node["scale"].shape).astype(np.float32)
                        + 0.5),
                    "bias": jnp.asarray(
                        rng.randn(*node["bias"].shape).astype(np.float32)),
                }
            return {k: rand_bn(v) for k, v in node.items()}
        return node

    p = rand_bn(params["params"])
    folded = fold_bn_params({"encoder": p})["encoder"]

    # the fold must actually fire: at least one bn scale became ones
    def count_unit_scales(node):
        if isinstance(node, dict):
            if set(node) == {"scale", "bias"}:
                return int(np.allclose(np.asarray(node["scale"]), 1.0))
            return sum(count_unit_scales(v) for v in node.values())
        return 0

    assert count_unit_scales(folded) > 0, "no conv/bn pair was folded"

    outs_ref = enc.apply({"params": p}, x)
    outs_fold = enc.apply({"params": folded}, x)
    if isinstance(outs_ref, dict):  # topdown returns dict
        outs_ref, outs_fold = list(outs_ref.values()), list(outs_fold.values())
    for a, b in zip(jax.tree_util.tree_leaves(outs_ref),
                    jax.tree_util.tree_leaves(outs_fold)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=2e-5)


def test_fold_bn_params_noop_without_bn():
    """Encoders without FoldedBN (tiny family) pass through unchanged."""
    from rmem_tpu.models.encoders import fold_bn_params

    enc = build_encoder("tiny")
    x = jnp.zeros((1, 65, 65, 3))
    params = jax.jit(lambda: enc.init(jax.random.PRNGKey(0), x))()
    folded = fold_bn_params({"encoder": params["params"]})["encoder"]
    for a, b in zip(jax.tree_util.tree_leaves(params["params"]),
                    jax.tree_util.tree_leaves(folded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
