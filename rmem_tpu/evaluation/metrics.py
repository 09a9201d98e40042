"""Offline mask metrics: region similarity (J) and boundary (F) statistics.

Reference: evaluation/source/metrics.py:6-37 (db_eval_iou with void
exclusion), metrics.py:40-119 (db_eval_boundary / f_measure, the DAVIS
boundary F used for the Long Videos J&F tables), and
evaluation/source/utils.py:125-155 (mean/recall/decay). These are the
standard DAVIS-toolkit metric definitions — the math must match
numerically for scores to be comparable. Pure numpy/cv2.
"""

from __future__ import annotations

import warnings

import numpy as np


def db_eval_iou(annotation: np.ndarray, segmentation: np.ndarray,
                void_pixels: np.ndarray | None = None) -> np.ndarray:
    """Jaccard index per frame. annotation/segmentation: bool [...,H,W]."""
    assert annotation.shape == segmentation.shape
    annotation = annotation.astype(bool)
    segmentation = segmentation.astype(bool)
    if void_pixels is None:
        void_pixels = np.zeros_like(segmentation)
    else:
        assert annotation.shape == void_pixels.shape
        void_pixels = void_pixels.astype(bool)

    inters = np.sum((segmentation & annotation) & ~void_pixels, axis=(-2, -1))
    union = np.sum((segmentation | annotation) & ~void_pixels, axis=(-2, -1))
    j = inters / union
    if j.ndim == 0:
        j = 1 if np.isclose(union, 0) else j
    else:
        j[np.isclose(union, 0)] = 1
    return j


def _disk(radius: float) -> np.ndarray:
    """Disk structuring element (skimage.morphology.disk semantics:
    x^2 + y^2 <= radius^2 on a (2r+1)^2 grid)."""
    r = int(radius)
    y, x = np.ogrid[-r:r + 1, -r:r + 1]
    return (x * x + y * y <= radius * radius).astype(np.uint8)


def _seg2bmap(seg: np.ndarray) -> np.ndarray:
    """1-pixel-wide boundary map of a binary segmentation, boundary pixels
    offset half a pixel toward the origin (metrics.py:123-180, the standard
    Martin-2003 formulation; the resize branch for width != w is dead code
    in the reference and omitted here)."""
    seg = seg.astype(bool)
    e = np.zeros_like(seg)
    s = np.zeros_like(seg)
    se = np.zeros_like(seg)
    e[:, :-1] = seg[:, 1:]
    s[:-1, :] = seg[1:, :]
    se[:-1, :-1] = seg[1:, 1:]
    b = (seg ^ e) | (seg ^ s) | (seg ^ se)
    b[-1, :] = seg[-1, :] ^ e[-1, :]
    b[:, -1] = seg[:, -1] ^ s[:, -1]
    b[-1, -1] = False
    return b


def f_measure(foreground_mask: np.ndarray, gt_mask: np.ndarray,
              void_pixels: np.ndarray | None = None,
              bound_th: float = 0.008) -> float:
    """Boundary F: disk-dilated boundary precision/recall
    (metrics.py:57-119)."""
    import cv2

    if void_pixels is None:
        void_pixels = np.zeros_like(foreground_mask, dtype=bool)
    else:
        void_pixels = void_pixels.astype(bool)

    bound_pix = bound_th if bound_th >= 1 else \
        np.ceil(bound_th * np.linalg.norm(foreground_mask.shape))

    fg_boundary = _seg2bmap(foreground_mask * ~void_pixels)
    gt_boundary = _seg2bmap(gt_mask * ~void_pixels)

    selem = _disk(bound_pix)
    fg_dil = cv2.dilate(fg_boundary.astype(np.uint8), selem)
    gt_dil = cv2.dilate(gt_boundary.astype(np.uint8), selem)

    gt_match = gt_boundary * fg_dil
    fg_match = fg_boundary * gt_dil
    n_fg = np.sum(fg_boundary)
    n_gt = np.sum(gt_boundary)

    if n_fg == 0 and n_gt > 0:
        precision, recall = 1.0, 0.0
    elif n_fg > 0 and n_gt == 0:
        precision, recall = 0.0, 1.0
    elif n_fg == 0 and n_gt == 0:
        precision, recall = 1.0, 1.0
    else:
        precision = np.sum(fg_match) / float(n_fg)
        recall = np.sum(gt_match) / float(n_gt)
    if precision + recall == 0:
        return 0.0
    return 2.0 * precision * recall / (precision + recall)


def db_eval_boundary(annotation: np.ndarray, segmentation: np.ndarray,
                     void_pixels: np.ndarray | None = None,
                     bound_th: float = 0.008):
    """Per-frame boundary F over [T,H,W] or a single [H,W] pair
    (metrics.py:40-55). NOTE the reference's argument order: the first
    positional arg is the ANNOTATION, the second the SEGMENTATION, and
    f_measure receives (segmentation, annotation)."""
    assert annotation.shape == segmentation.shape
    if annotation.ndim == 3:
        return np.array([
            f_measure(segmentation[t], annotation[t],
                      None if void_pixels is None else void_pixels[t],
                      bound_th=bound_th)
            for t in range(annotation.shape[0])])
    return f_measure(segmentation, annotation, void_pixels,
                     bound_th=bound_th)


def db_statistics(per_frame_values: np.ndarray):
    """(mean, recall, decay) of per-frame values (source/utils.py:125-155)."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", category=RuntimeWarning)
        m = np.nanmean(per_frame_values)
        o = np.nanmean(per_frame_values > 0.5)

    n_bins = 4
    ids = np.round(np.linspace(1, len(per_frame_values), n_bins + 1)
                   + 1e-10) - 1
    # Intentional deviation from the reference (source/utils.py:146), which
    # casts to uint8 and silently wraps for sequences longer than 255 frames
    # (VOST sequences can exceed that), corrupting the decay statistic.
    ids = ids.astype(int)
    d_bins = [per_frame_values[ids[i]: ids[i + 1] + 1] for i in range(4)]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", category=RuntimeWarning)
        d = np.nanmean(d_bins[0]) - np.nanmean(d_bins[3])
    return m, o, d
