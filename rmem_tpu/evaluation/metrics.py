"""Offline mask metrics: region similarity (J) statistics.

Reference: evaluation/source/metrics.py:6-37 (db_eval_iou with void
exclusion) and evaluation/source/utils.py:125-155 (mean/recall/decay).
Pure numpy, no framework dependencies.
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
