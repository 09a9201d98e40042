"""Host-side image transforms (numpy/cv2), exact reference semantics.

Eval: MultiRestrictSize (aot_plus/dataloaders/video_transforms.py:559-657) —
long edge capped at test_max_size, then snapped to the stride-16 grid (+1
when align_corners), cv2 INTER_CUBIC for images, labels left at original
resolution. Normalization: ImageNet mean/std after /255
(video_transforms.py:660-682).

Train: random scale + balanced random crop + flip
(video_transforms.py:118-235). The balanced crop retries until a foreground
object survives in the crop and the ignore-pixel ratio is acceptable.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import cv2
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def snap_stride(n: int, stride: int = 16, align_corners: bool = True) -> int:
    """Stride-grid snapping (video_transforms.py:605-621)."""
    if align_corners:
        if (n - 1) % stride != 0:
            n = int(np.around((n - 1) / stride) * stride + 1)
    else:
        if n % stride != 0:
            n = int(np.around(n / stride) * stride)
    return n


def restrict_size(h: int, w: int, max_size: Optional[float] = 800 * 1.3,
                  min_size: Optional[float] = None, scale: float = 1.0,
                  align_corners: bool = True, stride: int = 16
                  ) -> Tuple[int, int]:
    """Target (H, W) per MultiRestrictSize (video_transforms.py:576-621)."""
    sc = None
    if min_size is not None:
        short = min(h, w)
        if short > min_size:
            sc = float(min_size) / short
    else:
        long_edge = max(h, w)
        if max_size is not None and long_edge > max_size:
            sc = float(max_size) / long_edge
    nh, nw = (h, w) if sc is None else (sc * h, sc * w)
    nh, nw = int(nh * scale), int(nw * scale)
    return snap_stride(nh, stride, align_corners), \
        snap_stride(nw, stride, align_corners)


def resize_image(img: np.ndarray, hw: Tuple[int, int]) -> np.ndarray:
    """cv2 INTER_CUBIC resize (video_transforms.py:635-639)."""
    if img.shape[:2] == tuple(hw):
        return img
    return cv2.resize(img, dsize=(hw[1], hw[0]),
                      interpolation=cv2.INTER_CUBIC)


def resize_label(label: np.ndarray, hw: Tuple[int, int]) -> np.ndarray:
    """Nearest resize with torch `F.interpolate(mode='nearest')` index
    semantics (src = floor(dst * in/out)) — the reference resizes masks with
    torch, not cv2, and the two round differently
    (managers/evaluator.py:386-397,509-523)."""
    if label.shape[:2] == tuple(hw):
        return label
    h_in, w_in = label.shape[:2]
    rows = (np.arange(hw[0]) * h_in // hw[0]).astype(np.int64)
    cols = (np.arange(hw[1]) * w_in // hw[1]).astype(np.int64)
    return label[rows][:, cols]


def prep_eval_frame(image: np.ndarray, hw: Tuple[int, int],
                    flip: bool = False) -> np.ndarray:
    """The eval-path frame prep, shared by Evaluator and demo: cubic-resize
    FLOAT32 pixels (the reference resizes float before normalizing,
    video_transforms.py:635-639 — resizing uint8 rounds + clips the cubic
    overshoot), then normalize, then flip. Returns HWC float32 numpy."""
    img = resize_image(np.asarray(image, np.float32), hw)
    img = normalize_image(img)
    if flip:
        img = img[:, ::-1].copy()
    return img


def normalize_image(img: np.ndarray) -> np.ndarray:
    """uint8 HWC -> float32 normalized (video_transforms.py:676-680).
    Fused native path when available."""
    if img.dtype == np.uint8:
        try:
            from rmem_tpu.native import normalize_u8
            out = normalize_u8(img, IMAGENET_MEAN, IMAGENET_STD)
            if out is not None:
                return out
        except Exception:
            pass
    x = img.astype(np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


# ---------------------------------------------------------------------------
# training-time augmentation (video_transforms.py:55-235, exact spirit)
# ---------------------------------------------------------------------------

def random_scale(imgs: List[np.ndarray], labels: List[np.ndarray],
                 rng: np.random.RandomState, short_edge: int = 480,
                 min_factor: float = 0.7, max_factor: float = 1.3):
    h, w = imgs[0].shape[:2]
    factor = rng.uniform(min_factor, max_factor)
    short = min(h, w)
    sc = short_edge * factor / short
    nh, nw = int(round(h * sc)), int(round(w * sc))
    imgs = [resize_image(im, (nh, nw)) for im in imgs]
    labels = [resize_label(lb, (nh, nw)) for lb in labels]
    return imgs, labels


def balanced_random_crop(imgs: List[np.ndarray], labels: List[np.ndarray],
                         rng: np.random.RandomState,
                         crop_hw: Tuple[int, int] = (465, 465),
                         max_steps: int = 10,
                         ignore_thresh: float = 0.2):
    """Retry crops until an object survives (video_transforms.py:118-235).
    Also relabels to a compact contiguous id space based on the first frame.
    """
    ch, cw = crop_hw
    h, w = imgs[0].shape[:2]
    pad_h, pad_w = max(ch - h, 0), max(cw - w, 0)
    if pad_h or pad_w:
        imgs = [cv2.copyMakeBorder(im, 0, pad_h, 0, pad_w,
                                   cv2.BORDER_CONSTANT, value=0)
                for im in imgs]
        labels = [cv2.copyMakeBorder(lb, 0, pad_h, 0, pad_w,
                                     cv2.BORDER_CONSTANT, value=0)
                  for lb in labels]
        h, w = imgs[0].shape[:2]

    best = None
    for _ in range(max_steps):
        y = rng.randint(0, h - ch + 1)
        x = rng.randint(0, w - cw + 1)
        ref_crop = labels[0][y:y + ch, x:x + cw]
        fg = ref_crop[(ref_crop > 0) & (ref_crop != 255)]
        n_ignore = float((ref_crop == 255).sum())
        ok_ignore = n_ignore / ref_crop.size <= ignore_thresh
        if fg.size > 0 and ok_ignore:
            best = (y, x)
            break
        if best is None:
            best = (y, x)
    y, x = best
    imgs = [im[y:y + ch, x:x + cw] for im in imgs]
    labels = [lb[y:y + ch, x:x + cw] for lb in labels]

    # compact relabel from the reference frame (video_transforms.py:200-230)
    ref = labels[0]
    obj_ids = sorted(int(i) for i in np.unique(ref) if i not in (0, 255))
    lut = np.zeros(256, np.uint8)
    lut[255] = 255
    for new_id, old_id in enumerate(obj_ids, start=1):
        lut[old_id] = new_id
    labels = [lut[lb.astype(np.uint8)] for lb in labels]
    return imgs, labels, len(obj_ids)


def random_hflip(imgs, labels, rng, prob: float = 0.5):
    if rng.rand() < prob:
        imgs = [im[:, ::-1].copy() for im in imgs]
        labels = [lb[:, ::-1].copy() for lb in labels]
    return imgs, labels
