"""Static-pretrain augmentation pipeline (data/image_transforms.py) vs
reference semantics (aot_plus/dataloaders/image_transforms.py:57-448):
affine-matrix geometry cross-checked against an independent cv2.warpAffine
formulation, resized-crop against plain PIL crop+resize, ColorJitter
determinism, and the StaticTrainDataset clip contract."""

import math
import os

import numpy as np
import pytest
from PIL import Image

from rmem_tpu.data import image_transforms as it


def _checker(w=64, h=48):
    rng = np.random.RandomState(0)
    return Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8))


def test_affine_identity():
    img = _checker()
    out = it.affine(img, 0.0, (0, 0), 1.0, (0.0, 0.0), resample=it.NEAREST)
    np.testing.assert_array_equal(np.array(out), np.array(img))


def test_affine_pure_translation():
    img = _checker()
    out = it.affine(img, 0.0, (5, 3), 1.0, (0.0, 0.0), resample=it.NEAREST,
                    fillcolor=(0, 0, 0))
    a, b = np.array(img), np.array(out)
    # content moves +5 in x, +3 in y
    np.testing.assert_array_equal(b[3:, 5:], a[:-3, :-5])
    assert np.all(b[:3] == 0) and np.all(b[:, :5] == 0)


def test_affine_rotation_90_center_invariant():
    """90-degree rotation about the center: compare against np.rot90 on a
    square image (torchvision dropped the 0.5-px center offset precisely so
    this holds)."""
    rng = np.random.RandomState(1)
    a = rng.randint(0, 255, (33, 33, 3), np.uint8)
    img = Image.fromarray(a)
    out = np.array(it.affine(img, 90.0, (0, 0), 1.0, (0.0, 0.0),
                             resample=it.NEAREST))
    # the affine-matrix convention rotates one way or the other; accept the
    # matching rot90 orientation but require an exact pixel permutation
    assert (out == np.rot90(a)).all() or (out == np.rot90(a, -1)).all()


def test_affine_matches_numpy_gather():
    """Exact cross-check of the matrix + PIL NEAREST semantics: PIL samples
    input at floor(M_inv @ (out + 0.5)) — reimplement that directly in
    numpy and require bit-identical output."""
    rng = np.random.RandomState(2)
    lab = rng.randint(0, 5, (40, 56), np.uint8)
    img = Image.fromarray(lab, mode="L")
    angle, translate, scale, shear = 17.0, (4.0, -3.0), 1.07, (8.0, 0.0)
    center = (img.size[0] * 0.5, img.size[1] * 0.5)
    m = it.inverse_affine_matrix(center, angle, translate, scale, shear)
    out_pil = np.array(it.affine(img, angle, translate, scale, shear,
                                 resample=it.NEAREST, fillcolor=255))

    h, w = lab.shape
    ys, xs = np.mgrid[0:h, 0:w]
    xin = np.floor(m[0] * (xs + 0.5) + m[1] * (ys + 0.5) + m[2]).astype(int)
    yin = np.floor(m[3] * (xs + 0.5) + m[4] * (ys + 0.5) + m[5]).astype(int)
    inside = (xin >= 0) & (xin < w) & (yin >= 0) & (yin < h)
    want = np.full_like(lab, 255)
    want[inside] = lab[yin[inside], xin[inside]]
    np.testing.assert_array_equal(out_pil, want)


def test_resized_crop_equals_pil_crop_resize():
    img = _checker(80, 60)
    got = it.resized_crop(img, 7, 11, 40, 50, (30, 30),
                          interpolation=it.BICUBIC)
    want = img.crop((11, 7, 11 + 50, 7 + 40)).resize((30, 30), it.BICUBIC)
    np.testing.assert_array_equal(np.array(got), np.array(want))


def test_random_resized_crop_params_in_range():
    rrc = it.RandomResizedCrop((465, 465), scale=(0.8, 1.0))
    rng = np.random.RandomState(3)
    for _ in range(50):
        i, j, h, w = rrc.get_params(rng, (640, 480))
        assert 0 <= i and 0 <= j and i + h <= 480 and j + w <= 640
        area_frac = (h * w) / (640 * 480)
        assert 0.6 <= area_frac <= 1.01  # 0.8 area +- aspect rounding
        assert math.isclose(w / h, 1.0, rel_tol=0.45)  # ratio in 3/4..4/3


def test_color_jitter_deterministic_and_bounded():
    img = _checker()
    a = it.ColorJitter()(np.random.RandomState(5), img)
    b = it.ColorJitter()(np.random.RandomState(5), img)
    np.testing.assert_array_equal(np.array(a), np.array(b))
    # small jitter: mean shift bounded
    d = np.abs(np.array(a, np.float32) - np.array(img, np.float32)).mean()
    assert d < 40


def test_adjust_hue_wraps_uint8():
    img = _checker()
    out = it.adjust_hue(img, 0.5)
    assert out.size == img.size
    back = it.adjust_hue(out, -0.5)
    # hue shift is invertible up to HSV<->RGB rounding
    d = np.abs(np.array(back, np.int16) - np.array(img, np.int16))
    assert np.median(d) <= 2


def test_compact_relabel_shuffles_and_persists():
    rng = np.random.RandomState(7)
    m0 = np.zeros((10, 10), np.uint8)
    m0[:3, :3] = 4
    m0[5:, 5:] = 9
    lab0, obj_list = it.compact_relabel(m0, None, rng, max_obj_n=10)
    assert sorted(obj_list) == [4, 9]
    assert set(np.unique(lab0)) == {0, 1, 2}
    # later frame reuses the same mapping even if an object vanished
    m1 = np.where(m0 == 4, 0, m0)
    lab1, _ = it.compact_relabel(m1, obj_list, rng, max_obj_n=10)
    pos9 = obj_list.index(9) + 1
    assert set(np.unique(lab1)) == {0, pos9}
    # 255 void and out-of-list ids fall to background (ToOnehot argmax)
    m2 = m0.copy()
    m2[0, 9] = 255
    lab2, _ = it.compact_relabel(m2, obj_list, rng, max_obj_n=10)
    assert lab2[0, 9] == 0


def test_static_train_dataset_clip(tmp_path):
    from rmem_tpu.data.train_datasets import StaticTrainDataset

    imgd, labd = tmp_path / "JPEGImages", tmp_path / "Annotations"
    os.makedirs(imgd), os.makedirs(labd)
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (120, 160, 3), np.uint8)
    lab = np.zeros((120, 160), np.uint8)
    lab[30:80, 40:100] = 1
    lab[90:110, 120:150] = 2
    Image.fromarray(img).save(imgd / "a.jpg")
    Image.fromarray(lab, mode="P").save(labd / "a.png")

    ds = StaticTrainDataset(str(imgd), str(labd), ["a.jpg"], seq_len=4,
                            crop_hw=(65, 65), merge_prob=0.0,
                            dynamic_merge=False)
    imgs, labels, obj_num = ds.sample_clip(np.random.RandomState(11))
    assert imgs.shape == (4, 65, 65, 3) and imgs.dtype == np.float32
    assert labels.shape == (4, 65, 65) and labels.dtype == np.int32
    assert obj_num >= 1 and labels.max() <= obj_num
    # frames differ (affine jitter applied to i>0)
    assert np.abs(imgs[0] - imgs[1]).max() > 1e-3
    # determinism given the same rng
    imgs2, labels2, _ = ds.sample_clip(np.random.RandomState(11))
    np.testing.assert_array_equal(labels, labels2)
    np.testing.assert_allclose(imgs, imgs2)


def test_static_train_dataset_dynamic_merge(tmp_path):
    from rmem_tpu.data.train_datasets import StaticTrainDataset

    imgd, labd = tmp_path / "JPEGImages", tmp_path / "Annotations"
    os.makedirs(imgd), os.makedirs(labd)
    rng = np.random.RandomState(0)
    for name, oid in (("a", 1), ("b", 1)):
        img = rng.randint(0, 255, (100, 100, 3), np.uint8)
        lab = np.zeros((100, 100), np.uint8)
        lab[20:80, 20:80] = oid
        Image.fromarray(img).save(imgd / f"{name}.jpg")
        Image.fromarray(lab, mode="P").save(labd / f"{name}.png")

    ds = StaticTrainDataset(str(imgd), str(labd), ["a.jpg", "b.jpg"],
                            seq_len=3, crop_hw=(65, 65), merge_prob=1.0)
    imgs, labels, obj_num = ds.sample_clip(np.random.RandomState(1))
    assert obj_num == 2  # one object from each source clip
    assert labels.max() == 2
