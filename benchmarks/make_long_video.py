"""Generate a synthetic Long-Videos dataset (1000+ frames) on disk for the
evaluator-level Table 2 demonstration (VERDICT r4 Next #4).

Layout mirrors the real Long Videos set the reference evaluates
(aot_plus/dataloaders/eval_datasets.py:426-454: JPEGImages/<seq>/*.jpg,
Annotations/<seq>/*.png palette, ImageSets/val.txt; single object). One
bright disk orbits over a drifting smooth-noise background; GT is written
for EVERY frame so the offline J&F scorer (`tools/eval.py --score
--metrics J F`) runs on the result.

Usage: python benchmarks/make_long_video.py --root /tmp/longvid \
           [--frames 1100] [--height 480] [--width 854]
"""

from __future__ import annotations

import argparse
import os

import cv2
import numpy as np
from PIL import Image

_PALETTE_HEAD = [0, 0, 0, 128, 0, 0, 0, 128, 0]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/longvid")
    ap.add_argument("--frames", type=int, default=1100)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=854)
    ap.add_argument("--seqs", type=int, default=1)
    args = ap.parse_args()

    h, w = args.height, args.width
    base_dir = os.path.join(args.root, "long_videos")
    os.makedirs(os.path.join(base_dir, "ImageSets"), exist_ok=True)
    names = [f"synth{i}" for i in range(args.seqs)]
    with open(os.path.join(base_dir, "ImageSets", "val.txt"), "w") as f:
        f.write("\n".join(names) + "\n")

    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    for si, name in enumerate(names):
        img_dir = os.path.join(base_dir, "JPEGImages", name)
        ann_dir = os.path.join(base_dir, "Annotations", name)
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(ann_dir, exist_ok=True)
        rng = np.random.RandomState(si)
        low = rng.rand(h // 16, w // 16, 3).astype(np.float32)
        drift = rng.rand(h // 16, w // 16, 3).astype(np.float32)
        for t in range(args.frames):
            # slow background drift keeps features non-constant over 1000+
            # frames without host-side cost blowup
            mix = 0.5 + 0.5 * np.sin(2 * np.pi * t / 500.0)
            bg = cv2.resize(low * mix + drift * (1 - mix), (w, h),
                            interpolation=cv2.INTER_CUBIC)
            # one orbiting disk (single object, like the real set)
            ang = 2 * np.pi * t / 311.0
            cy = h * (0.5 + 0.3 * np.sin(ang))
            cx = w * (0.5 + 0.35 * np.cos(ang))
            r = h * (0.12 + 0.03 * np.sin(2 * np.pi * t / 97.0))
            m = ((yy - cy) ** 2 + (xx - cx) ** 2) < r * r
            img = np.clip(bg * 255.0, 0, 255).astype(np.uint8)
            img[m] = (60, 220, 140)
            cv2.imwrite(os.path.join(img_dir, f"{t:05d}.jpg"),
                        img[:, :, ::-1])
            lab = np.zeros((h, w), np.uint8)
            lab[m] = 1
            pil = Image.fromarray(lab, mode="P")
            pil.putpalette(_PALETTE_HEAD + [0] * (768 - len(_PALETTE_HEAD)))
            pil.save(os.path.join(ann_dir, f"{t:05d}.png"))
        print(f"{name}: {args.frames} frames at {h}x{w}")
    print(f"wrote {base_dir}")


if __name__ == "__main__":
    main()
