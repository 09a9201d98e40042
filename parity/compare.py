"""Diff the reference-run and our-run probes + output masks; emit a report.

Probes: per-frame logits at one pixel. Channels above obj_num are masked to
-1e10 by both sides (aot_engine.py:451-454); compare the live channels
[0..obj_num] numerically and assert the masked ones are huge-negative on
both sides.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image


def compare_masks(ref_root: str, ours_root: str):
    rows = []
    for seq in sorted(os.listdir(ref_root)):
        rd = os.path.join(ref_root, seq)
        od = os.path.join(ours_root, seq)
        if not os.path.isdir(rd):
            continue
        for png in sorted(os.listdir(rd)):
            r = np.asarray(Image.open(os.path.join(rd, png)))
            o = np.asarray(Image.open(os.path.join(od, png)))
            agree = float((r == o).mean())
            inter = float(((r > 0) & (o > 0) & (r == o)).sum())
            union = float(((r > 0) | (o > 0)).sum())
            rows.append((seq, png, agree, inter / max(union, 1.0)))
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/tmp/parity/ref_probes.npz")
    ap.add_argument("--ours", default="/tmp/parity/ours_probes.npz")
    ap.add_argument("--ref_masks", default=None)
    ap.add_argument("--ours_masks", default=None)
    ap.add_argument("--obj_num", type=int, default=2)
    ap.add_argument("--report", default=None,
                    help="append a markdown section to this file")
    ap.add_argument("--tag", default="run")
    args = ap.parse_args()

    # mask-only comparisons (e.g. the fused multi-aug production path emits
    # no probes) may run without npz files — but make the degradation LOUD
    # so a typo'd path can't masquerade as a perfect probe pass
    have_probes = os.path.isfile(args.ref) and os.path.isfile(args.ours)
    if not have_probes:
        missing = [p for p in (args.ref, args.ours)
                   if not os.path.isfile(p)]
        print(f"NOTE: probe npz missing ({missing}); MASK-ONLY comparison "
              "— no logit diff was computed")
    ref = np.load(args.ref) if have_probes else None
    ours = np.load(args.ours) if have_probes else None
    c = args.obj_num + 1

    lines = [f"### {args.tag}", ""]
    worst = 0.0
    for k in sorted(ref.files if have_probes else []):
        r, o = ref[k], ours[k]
        n = min(len(r), len(o))
        cm = min(r.shape[1], o.shape[1], c)
        d = np.abs(r[:n, :cm] - o[:n, :cm])
        rel = d / np.maximum(np.abs(r[:n, :cm]), 1.0)
        masked_ok = True
        if r.shape[1] > c and o.shape[1] > c:
            masked_ok = bool((r[:n, c:min(r.shape[1], o.shape[1])] < -1e8).all()
                             and (o[:n, c:min(r.shape[1], o.shape[1])] < -1e8).all())
        worst = max(worst, float(d.max()))
        lines.append(
            f"- `{k}`: {n} frames, max|Δlogit| = {d.max():.4g} "
            f"(frame {int(d.max(axis=1).argmax())}), "
            f"mean|Δ| = {d.mean():.4g}, max rel = {rel.max():.4g}, "
            f"masked-channels-ok = {masked_ok}")

    if args.ref_masks and args.ours_masks:
        rows = compare_masks(args.ref_masks, args.ours_masks)
        agree = np.array([x[2] for x in rows])
        iou = np.array([x[3] for x in rows])
        nperf = int((agree == 1.0).sum())
        lines.append(
            f"- masks: {len(rows)} PNGs, {nperf} bit-identical, "
            f"pixel agreement mean {agree.mean():.6f} min {agree.min():.6f}, "
            f"fg-IoU(ref,ours) mean {iou.mean():.6f} min {iou.min():.6f}")
        worst_rows = sorted(rows, key=lambda x: x[2])[:3]
        for seq, png, a, i in worst_rows:
            lines.append(f"  - worst: {seq}/{png} agree={a:.6f} iou={i:.6f}")

    text = "\n".join(lines) + "\n"
    print(text)
    if args.report:
        with open(args.report, "a") as f:
            f.write(text + "\n")
    if have_probes:
        print(f"WORST max|dlogit| = {worst:.6g}")
    else:
        print("WORST max|dlogit| = n/a (mask-only run)")


if __name__ == "__main__":
    main()
