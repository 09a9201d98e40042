"""Mask image I/O: palettized PNG save (async), label colormap.

Reference: aot_plus/utils/image.py:56-105. The 256-entry DAVIS palette is
generated from the standard bit-shuffle colormap rather than hard-coded.
"""

from __future__ import annotations

import os
import threading
from typing import List, Optional

import numpy as np
from PIL import Image


def label_colormap(n: int = 256) -> np.ndarray:
    """Standard VOC/DAVIS colormap (bit-shuffled), [n, 3] uint8."""
    cmap = np.zeros((n, 3), np.uint8)
    for i in range(n):
        r = g = b = 0
        c = i
        for j in range(8):
            r |= ((c >> 0) & 1) << (7 - j)
            g |= ((c >> 1) & 1) << (7 - j)
            b |= ((c >> 2) & 1) << (7 - j)
            c >>= 3
        cmap[i] = (r, g, b)
    return cmap


_PALETTE = label_colormap().reshape(-1).tolist()


def _save_mask(mask: np.ndarray, path: str,
               squeeze_idx: Optional[List[int]] = None):
    """Write a palettized PNG; un-squeeze compacted ids back to the original
    id space (utils/image.py:90-101). Uses the native C++ encoder when
    available (rmem_tpu/native), PIL otherwise."""
    if squeeze_idx is not None:
        out = np.zeros_like(mask)
        for idx in range(1, len(squeeze_idx)):
            out += ((mask == idx) * squeeze_idx[idx]).astype(np.uint8)
        mask = out
    mask = mask.astype(np.uint8)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    try:
        from rmem_tpu.native import encode_png_pal8
        data = encode_png_pal8(mask, label_colormap())
    except Exception:
        data = None
    if data is not None:
        with open(path, "wb") as f:
            f.write(data)
        return
    img = Image.fromarray(mask).convert("P")
    img.putpalette(_PALETTE)
    img.save(path)


class AsyncMaskWriter:
    """Background-thread PNG writer (utils/image.py:103-105), with a join()
    so FPS accounting can exclude (or wait on) I/O."""

    def __init__(self):
        self._threads: List[threading.Thread] = []

    def save(self, mask: np.ndarray, path: str,
             squeeze_idx: Optional[List[int]] = None):
        t = threading.Thread(target=_save_mask, args=(mask, path, squeeze_idx),
                             daemon=True)
        t.start()
        self._threads.append(t)

    def join(self):
        for t in self._threads:
            t.join()
        self._threads.clear()


def overlay_mask(image: np.ndarray, mask: np.ndarray,
                 alpha: float = 0.7) -> np.ndarray:
    """Blend a colored mask over an RGB image (utils/image.py:77-82)."""
    cmap = label_colormap()
    colored = cmap[mask.astype(np.uint8)]
    m = (mask > 0)[..., None]
    out = np.where(m, image * alpha + colored * (1 - alpha), image)
    return out.astype(np.uint8)
