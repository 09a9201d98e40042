"""Side-by-side comparison video renderer (aot_plus/tools/video.py):
overlays two result dirs' masks on the frames and writes a stacked mp4."""

from __future__ import annotations

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames_dir", required=True)
    p.add_argument("--masks_a", required=True, help="result dir A (PNG masks)")
    p.add_argument("--masks_b", default=None, help="optional result dir B")
    p.add_argument("--output", default="comparison.mp4")
    p.add_argument("--fps", type=float, default=10.0)
    args = p.parse_args()

    import cv2
    import numpy as np
    from PIL import Image

    from rmem_tpu.utils.image import overlay_mask

    frames = sorted(f for f in os.listdir(args.frames_dir)
                    if f.lower().endswith((".jpg", ".png")))
    writer = None
    for fname in frames:
        img = cv2.imread(os.path.join(args.frames_dir, fname))[:, :, ::-1]
        stem = os.path.splitext(fname)[0]
        panels = [img]
        for mdir in (args.masks_a, args.masks_b):
            if mdir is None:
                continue
            mpath = os.path.join(mdir, stem + ".png")
            if os.path.exists(mpath):
                mask = np.asarray(Image.open(mpath), np.uint8)
                panels.append(overlay_mask(img, mask))
            else:
                panels.append(img)
        frame = np.concatenate(panels, axis=1)
        if writer is None:
            writer = cv2.VideoWriter(
                args.output, cv2.VideoWriter_fourcc(*"mp4v"), args.fps,
                (frame.shape[1], frame.shape[0]))
        writer.write(frame[:, :, ::-1])
    if writer is not None:
        writer.release()
    print(f"wrote {args.output} ({len(frames)} frames)")


if __name__ == "__main__":
    main()
