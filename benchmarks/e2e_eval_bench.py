"""Benchmark: honest END-TO-END eval FPS through the real Evaluator.

bench.py times the device-only fused step (synthetic device-resident
frames). This one runs the full `tools/eval.py` path on a synthetic 480p
sequence: host preprocessing (float32 cubic resize to the stride-snapped
eval size + normalization), H2D transfer, the fused propagate+update step,
logit upsample/argmax, D2H, and palettized PNG writeback via the async
writer (native encoder when built). The gap between this number and
bench.py quantifies host-pipeline overhead on the 1-core host
(VERDICT r1 #8).

Usage: python benchmarks/e2e_eval_bench.py [--frames 90] [--hw 480 854]
       [--objects 2] [--ms 1.0 ...] [--flip]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=90)
    ap.add_argument("--hw", type=int, nargs=2, default=(480, 854))
    ap.add_argument("--model", default="r50_deaotl")
    ap.add_argument("--ms", type=float, nargs="*", default=[1.0])
    ap.add_argument("--flip", action="store_true")
    args = ap.parse_args()

    from rmem_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from rmem_tpu.config import get_config
    from rmem_tpu.data import eval_datasets as ed
    from rmem_tpu.managers.evaluator import Evaluator

    cfg = get_config("pre_vost_2", model=args.model, test_dataset="test",
                     test_multiscale=tuple(args.ms), test_flip=args.flip)
    out = tempfile.mkdtemp(prefix="e2e_eval_")
    try:
        ev = Evaluator(cfg, output_root=out, log=lambda *a: None)
        # swap in a 480p synthetic dataset so host decode/resize runs at
        # eval_vost.sh scale
        ev.dataset = ed.SyntheticEvalDataset(
            num_seqs=1, num_frames=args.frames, hw=tuple(args.hw))
        stats = ev.evaluate()
        n_png = sum(len(files) for _, _, files in os.walk(out))
        print(json.dumps({
            "metric": "e2e_eval_fps", "value": round(
                stats["all_frame_fps"], 2),
            "unit": "frames/s", "frames": args.frames,
            "hw": list(args.hw), "augs": len(ev.augs),
            "pngs_written": n_png,
            "per_seq_fps": stats["per_seq_fps"],
        }))
    finally:
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
