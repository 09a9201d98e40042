"""Generate a tiny fake-VOST dataset on disk for reference-vs-ours parity.

Layout mirrors real VOST (reference dataloaders/eval_datasets.py:274-344):
    <root>/JPEGImages_10fps/<seq>/<frame>.jpg
    <root>/Annotations/<seq>/<first-frame>.png   (palette PNG)
    <root>/ImageSets/val.txt

Both pipelines read the SAME files with the same decoders (cv2 BGR JPEG +
PIL palette PNG), so any probe difference is model math, not data.

Frames are deterministic smooth noise with two moving bright blobs so the
features vary spatially and temporally; 50 frames with eval gap 5 produces
10 long-memory writes, which with --latter_mem_len 4 exercises the scored
eviction rule repeatedly.
"""

from __future__ import annotations

import argparse
import os

import cv2
import numpy as np
from PIL import Image

# the standard VOS palette (matches reference utils/image.py _palette head)
_PALETTE_HEAD = [0, 0, 0, 128, 0, 0, 0, 128, 0, 128, 128, 0, 0, 0, 128]


def _frame(seed: int, t: int, h: int, w: int) -> np.ndarray:
    rng = np.random.RandomState(seed * 10_000 + t)
    low = rng.rand(h // 8, w // 8, 3).astype(np.float32)
    img = cv2.resize(low, (w, h), interpolation=cv2.INTER_CUBIC)
    # two moving gaussian-ish blobs
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    cy1, cx1 = h * (0.3 + 0.005 * t), w * (0.25 + 0.008 * t)
    cy2, cx2 = h * (0.65 - 0.004 * t), w * (0.7 - 0.006 * t)
    b1 = np.exp(-(((yy - cy1) / (0.12 * h)) ** 2
                  + ((xx - cx1) / (0.12 * w)) ** 2))
    b2 = np.exp(-(((yy - cy2) / (0.15 * h)) ** 2
                  + ((xx - cx2) / (0.1 * w)) ** 2))
    img = img * 0.5 + 0.35 * b1[..., None] + 0.3 * b2[..., None]
    return np.clip(img * 255.0, 0, 255).astype(np.uint8)


def _first_label(h: int, w: int) -> np.ndarray:
    lab = np.zeros((h, w), np.uint8)
    lab[int(0.2 * h): int(0.45 * h), int(0.15 * w): int(0.4 * w)] = 1
    yy, xx = np.mgrid[0:h, 0:w]
    ell = (((yy - 0.65 * h) / (0.18 * h)) ** 2
           + ((xx - 0.7 * w) / (0.14 * w)) ** 2) < 1.0
    lab[ell] = 2
    return lab


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/parity/vost_mini")
    ap.add_argument("--seqs", type=int, default=2)
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--height", type=int, default=208)
    ap.add_argument("--width", type=int, default=304)
    ap.add_argument("--gt_all", action="store_true",
                    help="write a GT annotation for EVERY frame (blob "
                         "coverage masks), enabling the offline J/J_tr "
                         "scorer on the fake data — the acceptance-drill "
                         "mode (parity/acceptance.py). Default writes only "
                         "the first-frame annotation like real VOST eval "
                         "input.")
    args = ap.parse_args()

    names = [f"seq{i}" for i in range(args.seqs)]
    os.makedirs(os.path.join(args.root, "ImageSets"), exist_ok=True)
    with open(os.path.join(args.root, "ImageSets", "val.txt"), "w") as f:
        f.write("\n".join(names) + "\n")

    for si, name in enumerate(names):
        img_dir = os.path.join(args.root, "JPEGImages_10fps", name)
        ann_dir = os.path.join(args.root, "Annotations", name)
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(ann_dir, exist_ok=True)
        for t in range(args.frames):
            img = _frame(si, t, args.height, args.width)
            cv2.imwrite(os.path.join(img_dir, f"{t:05d}.jpg"),
                        img[:, :, ::-1])  # RGB -> BGR for cv2
        if args.gt_all:
            h, w = args.height, args.width
            yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
            for t in range(args.frames):
                # GT = the frame generator's own blob fields, thresholded:
                # deterministic moving masks consistent with the images
                cy1, cx1 = h * (0.3 + 0.005 * t), w * (0.25 + 0.008 * t)
                cy2, cx2 = h * (0.65 - 0.004 * t), w * (0.7 - 0.006 * t)
                b1 = np.exp(-(((yy - cy1) / (0.12 * h)) ** 2
                              + ((xx - cx1) / (0.12 * w)) ** 2))
                b2 = np.exp(-(((yy - cy2) / (0.15 * h)) ** 2
                              + ((xx - cx2) / (0.1 * w)) ** 2))
                lab = np.zeros((h, w), np.uint8)
                lab[b1 > 0.55] = 1
                lab[b2 > 0.55] = 2
                pil = Image.fromarray(lab, mode="P")
                pil.putpalette(_PALETTE_HEAD
                               + [0] * (768 - len(_PALETTE_HEAD)))
                pil.save(os.path.join(ann_dir, f"{t:05d}.png"))
        else:
            lab = _first_label(args.height, args.width)
            pil = Image.fromarray(lab, mode="P")
            pil.putpalette(_PALETTE_HEAD + [0] * (768 - len(_PALETTE_HEAD)))
            pil.save(os.path.join(ann_dir, "00000.png"))
    print(f"wrote {args.seqs} seqs x {args.frames} frames to {args.root}"
          + (" (GT for all frames)" if args.gt_all else ""))


if __name__ == "__main__":
    main()
