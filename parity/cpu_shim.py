"""Run the reference PyTorch code on a CPU-only host by stubbing torch.cuda.

The reference evaluator is hard-wired to CUDA (managers/evaluator.py:50-53,
372-404,525-587). These shims make `.cuda()` a no-op and fake the CUDA event
timers so the UNMODIFIED reference code executes on CPU.
"""

from __future__ import annotations

import time

import torch


class _FakeEvent:
    def __init__(self, enable_timing: bool = False):
        self.t = 0.0

    def record(self, *a, **k):
        self.t = time.perf_counter()

    def synchronize(self):
        pass

    def elapsed_time(self, other: "_FakeEvent") -> float:
        return (other.t - self.t) * 1000.0


def _install_fake_torchvision() -> None:
    """torchvision is not installed; the reference eval path only needs
    transforms.Compose (managers/evaluator.py:115-121) plus the import-time
    names in encoders/resnet.py (TopDown-only, unused here)."""
    import sys
    import types

    if "torchvision" in sys.modules:
        return

    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")
    fn = types.ModuleType("torchvision.transforms.functional")

    class Compose:
        def __init__(self, ts):
            self.transforms = ts

        def __call__(self, x):
            for t in self.transforms:
                x = t(x)
            return x

    class InterpolationMode:
        NEAREST = "nearest"
        BILINEAR = "bilinear"
        BICUBIC = "bicubic"

    def resize(img, size, interpolation="bilinear", antialias=None):
        import torch.nn.functional as F
        mode = getattr(interpolation, "value", interpolation)
        if isinstance(size, int):
            size = (size, size)
        return F.interpolate(img[None] if img.dim() == 3 else img,
                             size=tuple(size), mode=mode)[0 if img.dim() == 3
                                                          else slice(None)]

    fn.resize = resize
    tr.Compose = Compose
    tr.InterpolationMode = InterpolationMode
    tr.functional = fn
    tv.transforms = tr
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tr
    sys.modules["torchvision.transforms.functional"] = fn

    # timm is only imported for trunc_normal_ (models/aot.py:9, deaot.py:7)
    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        tm = types.ModuleType("timm.models")
        tl = types.ModuleType("timm.models.layers")
        # timm.trunc_normal_ has the same defaults as torch.nn.init's
        # (mean 0, std 1, absolute bounds a=-2, b=2)
        tl.trunc_normal_ = torch.nn.init.trunc_normal_
        tm.layers = tl
        timm.models = tm
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = tm
        sys.modules["timm.models.layers"] = tl


def install() -> None:
    _install_fake_torchvision()
    torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore
    torch.nn.Module.cuda = lambda self, *a, **k: self  # type: ignore
    torch.cuda.set_device = lambda *a, **k: None
    torch.cuda.empty_cache = lambda: None
    torch.cuda.synchronize = lambda *a, **k: None
    torch.cuda.max_memory_allocated = lambda *a, **k: 0
    torch.cuda.Event = _FakeEvent  # type: ignore

    _load = torch.load
    torch.load = lambda f, map_location=None, **k: _load(
        f, map_location="cpu", **k)

    # two call sites construct tensors with an explicit cuda device
    # (engines/aot_engine.py:212, utils/math.py:7): remap to cpu in the
    # factory functions rather than replacing the torch.device type
    def _cpu_factory(fn):
        def wrapped(*a, **k):
            d = k.get("device")
            if d is not None and "cuda" in str(d):
                k["device"] = "cpu"
            return fn(*a, **k)
        return wrapped

    torch.zeros = _cpu_factory(torch.zeros)
    torch.ones = _cpu_factory(torch.ones)
    torch.eye = _cpu_factory(torch.eye)
    torch.empty = _cpu_factory(torch.empty)
