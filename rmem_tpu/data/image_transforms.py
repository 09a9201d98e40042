"""Static-image pretrain augmentations: the reference's per-frame jitter
chain (aot_plus/dataloaders/image_transforms.py:57-448 +
train_datasets.py:141-198) re-implemented on PIL without torchvision.

The reference builds a fake clip from ONE image: frame 0 is the (maybe
pre-flipped) source; every later frame independently applies
hflip(p=0.3) -> ColorJitter(0.1,0.1,0.1,0.03) -> RandomAffine(degrees=20,
translate=(0.1,0.1), scale=(0.9,1.1), shear=10, BICUBIC,
fill=(124,116,104)); then ALL frames go through
RandomResizedCrop(output, scale=(0.8,1), ratio=base*(3/4,4/3), BICUBIC).

The affine matrix follows torchvision's PIL branch
(`_get_inverse_affine_matrix`, center-invariant rotation+shear+scale then
translation); masks resample NEAREST with fill 0. All randomness is drawn
from an explicit np.random.RandomState so clips are reproducible.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageEnhance

BICUBIC = Image.BICUBIC
NEAREST = Image.NEAREST


# ---------------------------------------------------------------------------
# affine (torchvision functional.affine PIL-branch semantics)
# ---------------------------------------------------------------------------

def inverse_affine_matrix(center: Tuple[float, float], angle: float,
                          translate: Tuple[float, float], scale: float,
                          shear: Tuple[float, float]) -> List[float]:
    """Inverse of T(translate) * C(center) * R(angle)S(scale)Sh(shear) *
    C^-1, as a PIL Image.AFFINE 6-tuple (maps output coords -> input
    coords). Mirrors torchvision's `_get_inverse_affine_matrix`."""
    rot = math.radians(angle)
    sx = math.radians(shear[0])
    sy = math.radians(shear[1])
    cx, cy = center
    tx, ty = translate

    # rotation+shear block (no scale)
    a = math.cos(rot - sy) / math.cos(sy)
    b = -math.cos(rot - sy) * math.tan(sx) / math.cos(sy) - math.sin(rot)
    c = math.sin(rot - sy) / math.cos(sy)
    d = -math.sin(rot - sy) * math.tan(sx) / math.cos(sy) + math.cos(rot)

    # inverted, with scale: det(RSS) = scale^2 * (ad - bc) and the cos/tan
    # construction keeps ad - bc == 1, so the inverse is adj / scale
    matrix = [d, -b, 0.0, -c, a, 0.0]
    matrix = [m / scale for m in matrix]
    # RSS^-1 * C^-1 * T^-1
    matrix[2] += matrix[0] * (-cx - tx) + matrix[1] * (-cy - ty)
    matrix[5] += matrix[3] * (-cx - tx) + matrix[4] * (-cy - ty)
    # C * ...
    matrix[2] += cx
    matrix[5] += cy
    return matrix


def affine(img: Image.Image, angle: float, translate: Tuple[float, float],
           scale: float, shear: Tuple[float, float],
           resample=NEAREST, fillcolor=0) -> Image.Image:
    """torchvision TF.affine on PIL: same output size, center-invariant."""
    center = (img.size[0] * 0.5, img.size[1] * 0.5)
    matrix = inverse_affine_matrix(center, angle, translate, scale, shear)
    return img.transform(img.size, Image.AFFINE, matrix, resample,
                         fillcolor=fillcolor)


class RandomAffine:
    """Reference IT.RandomAffine (image_transforms.py:57-206): uniform
    angle/translate/scale/shear; translations are rounded to whole pixels;
    the mask gets the SAME params with NEAREST + fill 0."""

    def __init__(self, degrees: float = 20.0,
                 translate: Tuple[float, float] = (0.1, 0.1),
                 scale: Tuple[float, float] = (0.9, 1.1),
                 shear: float = 10.0, resample=BICUBIC,
                 fillcolor=(124, 116, 104)):
        self.degrees = (-degrees, degrees)
        self.translate = translate
        self.scale = scale
        self.shear = (-shear, shear)  # x-axis only, like the reference
        self.resample = resample
        self.fillcolor = fillcolor

    def get_params(self, rng: np.random.RandomState,
                   img_size: Tuple[int, int]):
        angle = float(rng.uniform(*self.degrees))
        max_dx = self.translate[0] * img_size[0]
        max_dy = self.translate[1] * img_size[1]
        translations = (float(np.round(rng.uniform(-max_dx, max_dx))),
                        float(np.round(rng.uniform(-max_dy, max_dy))))
        scale = float(rng.uniform(*self.scale))
        shear = (float(rng.uniform(*self.shear)), 0.0)
        return angle, translations, scale, shear

    def __call__(self, rng, img: Image.Image, mask: Image.Image):
        params = self.get_params(rng, img.size)
        img = affine(img, *params, resample=self.resample,
                     fillcolor=self.fillcolor)
        mask = affine(mask, *params, resample=NEAREST, fillcolor=0)
        return img, mask


# ---------------------------------------------------------------------------
# resized crop (torchvision RandomResizedCrop PIL-branch semantics)
# ---------------------------------------------------------------------------

def resized_crop(img: Image.Image, i: int, j: int, h: int, w: int,
                 size: Tuple[int, int], interpolation=BICUBIC
                 ) -> Image.Image:
    """crop box (top i, left j, h, w) then resize to (h_out, w_out)."""
    img = img.crop((j, i, j + w, i + h))
    return img.resize((size[1], size[0]), interpolation)


class RandomResizedCrop:
    """Reference IT.RandomResizedCrop (image_transforms.py:307-404): 10
    tries of (area in scale range, log-uniform aspect), else the centered
    fallback crop."""

    def __init__(self, size: Tuple[int, int],
                 scale: Tuple[float, float] = (0.8, 1.0),
                 ratio: Optional[Tuple[float, float]] = None,
                 interpolation=BICUBIC):
        self.size = size
        self.scale = scale
        if ratio is None:
            base = float(size[1]) / size[0]
            ratio = (base * 3.0 / 4.0, base * 4.0 / 3.0)
        self.ratio = ratio
        self.interpolation = interpolation

    def get_params(self, rng: np.random.RandomState,
                   img_size: Tuple[int, int]):
        width, height = img_size
        area = height * width
        log_ratio = (math.log(self.ratio[0]), math.log(self.ratio[1]))
        for _ in range(10):
            target_area = rng.uniform(*self.scale) * area
            aspect_ratio = math.exp(rng.uniform(*log_ratio))
            w = int(round(math.sqrt(target_area * aspect_ratio)))
            h = int(round(math.sqrt(target_area / aspect_ratio)))
            if 0 < w <= width and 0 < h <= height:
                i = int(rng.randint(0, height - h + 1))
                j = int(rng.randint(0, width - w + 1))
                return i, j, h, w
        # central fallback
        in_ratio = float(width) / float(height)
        if in_ratio < min(self.ratio):
            w = width
            h = int(round(w / min(self.ratio)))
        elif in_ratio > max(self.ratio):
            h = height
            w = int(round(h * max(self.ratio)))
        else:
            w, h = width, height
        i = (height - h) // 2
        j = (width - w) // 2
        return i, j, h, w

    def __call__(self, rng, img: Image.Image, mask: Image.Image):
        i, j, h, w = self.get_params(rng, img.size)
        img = resized_crop(img, i, j, h, w, self.size, self.interpolation)
        mask = resized_crop(mask, i, j, h, w, self.size, NEAREST)
        return img, mask


# ---------------------------------------------------------------------------
# color jitter (torchvision ColorJitter PIL-branch semantics)
# ---------------------------------------------------------------------------

def adjust_brightness(img: Image.Image, factor: float) -> Image.Image:
    return ImageEnhance.Brightness(img).enhance(factor)


def adjust_contrast(img: Image.Image, factor: float) -> Image.Image:
    return ImageEnhance.Contrast(img).enhance(factor)


def adjust_saturation(img: Image.Image, factor: float) -> Image.Image:
    return ImageEnhance.Color(img).enhance(factor)


def adjust_hue(img: Image.Image, hue_factor: float) -> Image.Image:
    """Shift hue by hue_factor (in [-0.5, 0.5]) via the HSV channel, exactly
    torchvision's PIL implementation (uint8 wraparound add)."""
    if not -0.5 <= hue_factor <= 0.5:
        raise ValueError(f"hue_factor {hue_factor} not in [-0.5, 0.5]")
    h, s, v = img.convert("HSV").split()
    np_h = np.array(h, dtype=np.uint8)
    # torchvision adds np.uint8(hue_factor*255) relying on uint8 wraparound;
    # numpy 2.x forbids the negative cast, so wrap explicitly (same result)
    shift = int(hue_factor * 255) % 256
    np_h = ((np_h.astype(np.int16) + shift) % 256).astype(np.uint8)
    h = Image.fromarray(np_h, "L")
    return Image.merge("HSV", (h, s, v)).convert(img.mode)


class ColorJitter:
    """Brightness/contrast/saturation factors in [max(0,1-v), 1+v]; hue in
    [-h, h]; all four applied in a random order each call."""

    def __init__(self, brightness=0.1, contrast=0.1, saturation=0.1,
                 hue=0.03):
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue

    def __call__(self, rng: np.random.RandomState,
                 img: Image.Image) -> Image.Image:
        ops = []
        for v, fn in ((self.brightness, adjust_brightness),
                      (self.contrast, adjust_contrast),
                      (self.saturation, adjust_saturation)):
            factor = float(rng.uniform(max(0.0, 1.0 - v), 1.0 + v))
            ops.append(lambda im, f=factor, fn=fn: fn(im, f))
        hue = float(rng.uniform(-self.hue, self.hue))
        ops.append(lambda im, f=hue: adjust_hue(im, f))
        for k in rng.permutation(len(ops)):
            img = ops[k](img)
        return img


# ---------------------------------------------------------------------------
# one-hot relabel (reference IT.ToOnehot, image_transforms.py:407-448)
# ---------------------------------------------------------------------------

def compact_relabel(mask: np.ndarray, obj_list: Optional[List[int]],
                    rng: np.random.RandomState, max_obj_n: int,
                    shuffle: bool = True
                    ) -> Tuple[np.ndarray, List[int]]:
    """Map raw mask ids to 1..len(obj_list) (frame 0 defines + optionally
    shuffles the id order; later frames reuse it). Ids outside obj_list
    (including 255) become background, matching ToOnehot's argmax."""
    if obj_list is None:
        ids = [i for i in range(1, int(mask.max()) + 1) if (mask == i).any()]
        if shuffle and len(ids) > 1:
            ids = [ids[k] for k in rng.permutation(len(ids))]
        obj_list = ids[:max_obj_n]
    out = np.zeros_like(mask, dtype=np.int32)
    for pos, oid in enumerate(obj_list):
        out[mask == oid] = pos + 1
    return out, obj_list


def hflip(img: Image.Image) -> Image.Image:
    return img.transpose(Image.FLIP_LEFT_RIGHT)
