"""Encoder registry (aot_plus/networks/encoders/__init__.py:10-37)."""

from __future__ import annotations

from rmem_tpu.models.encoders.resnet import ResNet50, ResNet101  # noqa: F401
from rmem_tpu.models.encoders.mobilenet import MobileNetV2  # noqa: F401


def build_encoder(name: str):
    if name == "resnet50":
        return ResNet50()
    if name == "resnet101":
        return ResNet101()
    if name == "mobilenetv2":
        return MobileNetV2()
    raise NotImplementedError(f"encoder {name!r} not implemented "
                              "(have: resnet50, resnet101, mobilenetv2)")
