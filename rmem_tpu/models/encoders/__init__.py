"""Encoder registry (aot_plus/networks/encoders/__init__.py:10-37)."""

from __future__ import annotations

from rmem_tpu.models.encoders.resnet import ResNet50, ResNet101  # noqa: F401
from rmem_tpu.models.encoders.mobilenet import MobileNetV2  # noqa: F401
from rmem_tpu.models.encoders.tiny import (TinyEncoder,  # noqa: F401
                                           TinyTopDownEncoder)
from rmem_tpu.models.encoders.swin import SwinB  # noqa: F401
from rmem_tpu.models.encoders.mobilenetv3 import MobileNetV3Large  # noqa: F401,E501
from rmem_tpu.models.encoders.resnest import ResNeSt50, ResNeSt101  # noqa: F401,E501
from rmem_tpu.models.encoders.topdown import ResNet50TopDown  # noqa: F401,E501


def build_encoder(name: str, dtype=None, stem: str = "conv"):
    """`stem` selects the ResNet stem formulation ("conv" | "s2d" |
    "im2col" | "pallas", see resnet.ResNet.stem); other encoder families
    ignore it (their stems are not the 7x7/s2 shape the variants target).
    """
    if name == "resnet50":
        return ResNet50(dtype=dtype, stem=stem)
    if name == "resnet101":
        return ResNet101(dtype=dtype, stem=stem)
    if name == "mobilenetv2":
        return MobileNetV2(dtype=dtype)
    if name == "tiny":
        return TinyEncoder(dtype=dtype)
    if name == "tiny_topdown":
        return TinyTopDownEncoder(dtype=dtype)
    if name in ("swin_base", "swinb"):
        return SwinB(dtype=dtype)
    if name == "mobilenetv3":
        return MobileNetV3Large(dtype=dtype)
    if name == "resnest50":
        return ResNeSt50(dtype=dtype)
    if name == "resnest101":
        return ResNeSt101(dtype=dtype)
    if name == "resnet50_topdown":
        return ResNet50TopDown(dtype=dtype)
    raise NotImplementedError(f"encoder {name!r} not implemented "
                              "(have: resnet50, resnet101, mobilenetv2, "
                              "tiny)")


def fold_bn_params(params):
    """Fold FoldedBN scales into their preceding conv kernels (inference
    param transform; VERDICT r3 Next #3). conv(x, W)*s + b == conv(x, W*s)
    + b, so premultiplying the kernel by the (frozen) BN scale at load time
    removes the per-channel multiply from every encoder conv epilogue at
    zero runtime cost; FoldedBN keeps applying scale=1 (folded) and bias.

    Pairing is by NAME within each module's parameter dict (flax dicts are
    alphabetically ordered, so adjacency is meaningless): each FoldedBN key
    maps to an ordered list of conv-sibling candidates per the encoder
    sources (resnet/resnest/mobilenet*/topdown); the first present sibling
    with a matching output width is the conv that bn normalizes. Applied
    to the 'encoder' subtree only; exactness per-family is pinned by
    tests/test_encoders.py::test_fold_bn_params_exact."""
    import jax.numpy as jnp

    # bn-name -> conv-sibling candidates (first match wins). "bn1" is
    # context-dependent: resnet Bottleneck/stem (conv1), resnest
    # SplitAttention (fc1), resnest stem (stem2).
    pairs = {
        "bn": ["conv"],
        "bn0": ["conv"],
        "bn1": ["conv1", "fc1", "stem2"],
        "bn2": ["conv2"],
        "bn3": ["conv3"],
        "downsample_bn": ["downsample_conv"],
        "bn_out": ["pw_linear"],
        "out_bn": ["pw_linear"],
        "pw_bn": ["pw"],
        "dw_bn": ["dw"],
        "stem_bn": ["stem"],
        "stem0_bn": ["stem0"],
        "stem1_bn": ["stem1"],
        "head_bn": ["head"],
    }

    def fold(node):
        if not isinstance(node, dict):
            return node
        out = {k: fold(v) for k, v in node.items()}
        for k, bn in list(out.items()):
            if not (isinstance(bn, dict) and set(bn) == {"scale", "bias"}):
                continue
            for cand in pairs.get(k, ()):
                cv = out.get(cand)
                if (isinstance(cv, dict) and "kernel" in cv
                        and getattr(cv["kernel"], "ndim", 0) >= 2
                        and cv["kernel"].shape[-1] == bn["scale"].shape[0]):
                    scale = bn["scale"].astype(jnp.float32)
                    out[cand] = dict(cv)
                    out[cand]["kernel"] = (
                        cv["kernel"].astype(jnp.float32) * scale
                    ).astype(cv["kernel"].dtype)
                    out[k] = dict(bn)
                    out[k]["scale"] = jnp.ones_like(bn["scale"])
                    break
        return out

    if "encoder" not in params:
        return params
    new = dict(params)
    new["encoder"] = fold(params["encoder"])
    return new
