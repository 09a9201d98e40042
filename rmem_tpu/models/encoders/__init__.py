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


def build_encoder(name: str, dtype=None):
    if name == "resnet50":
        return ResNet50(dtype=dtype)
    if name == "resnet101":
        return ResNet101(dtype=dtype)
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
