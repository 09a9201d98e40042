"""Native C++ data-plane parity: PNG encoder vs PIL decode roundtrip, fused
normalize vs numpy."""

import io

import numpy as np
import pytest
from PIL import Image

from rmem_tpu.native import encode_png_pal8, load_native, normalize_u8
from rmem_tpu.utils.image import label_colormap


@pytest.fixture(scope="module")
def native():
    lib = load_native()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_png_roundtrip(native):
    rng = np.random.RandomState(0)
    mask = rng.randint(0, 12, size=(123, 217)).astype(np.uint8)
    mask[0, :5] = 255
    data = encode_png_pal8(mask, label_colormap())
    img = Image.open(io.BytesIO(data))
    assert img.mode == "P"
    np.testing.assert_array_equal(np.asarray(img), mask)
    pal = np.asarray(img.getpalette(), np.uint8).reshape(-1, 3)
    np.testing.assert_array_equal(pal, label_colormap())


def test_normalize_matches_numpy(native):
    from rmem_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, size=(37, 53, 3)).astype(np.uint8)
    got = normalize_u8(img, IMAGENET_MEAN, IMAGENET_STD)
    ref = (img.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_png_speed_sane(native):
    import time
    mask = np.zeros((480, 854), np.uint8)
    mask[100:300, 100:500] = 3
    t0 = time.perf_counter()
    for _ in range(20):
        encode_png_pal8(mask, label_colormap())
    dt = (time.perf_counter() - t0) / 20
    assert dt < 0.1  # well under a frame budget
