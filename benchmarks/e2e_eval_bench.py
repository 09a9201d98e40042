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


class _JpegBackedDataset:
    """Wraps a synthetic eval dataset: every frame is JPEG-encoded up front
    and decoded (cv2.imdecode) on read, mirroring a real disk dataset's host
    cost without the noise generator's in the timed loop."""

    def __init__(self, base):
        import cv2
        import numpy as np
        self._seqs = []
        for i in range(len(base)):
            seq = base.sequence(i)
            blobs, label = [], None
            for j, frame in enumerate(seq):
                # smooth frames (low-res noise upsampled): white noise is a
                # JPEG worst case (~5x slower decode than natural video)
                h, w = frame.image.shape[:2]
                rng = np.random.RandomState(1000 * i + j)
                small = rng.randint(0, 255, (h // 16, w // 16, 3), np.uint8)
                u8 = cv2.resize(small, (w, h), interpolation=cv2.INTER_CUBIC)
                ok, buf = cv2.imencode(".jpg", u8[:, :, ::-1])
                assert ok
                blobs.append((frame.name, buf))
                if j == 0:
                    label = frame.label
            self._seqs.append((seq, blobs, label))

    def __len__(self):
        return len(self._seqs)

    def sequence(self, idx):
        import cv2
        import numpy as np
        seq, blobs, label0 = self._seqs[idx]

        class _Seq:
            name = seq.name
            labels = seq.labels
            obj_num = 2

            def __len__(self):
                return len(blobs)

            def __iter__(self):
                for j, (name, buf) in enumerate(blobs):
                    img = cv2.imdecode(buf, cv2.IMREAD_COLOR)[:, :, ::-1]
                    yield type("F", (), {
                        "name": name,
                        "image": np.ascontiguousarray(img),
                        "label": label0 if j == 0 else None,
                        "obj_num": 2, "obj_idx": None})()

        return _Seq()


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
        # eval_vost.sh scale; two sequences so seq 0 absorbs the jit
        # compiles and seq 1 is the warm steady-state number (real eval
        # runs amortize the compile over the whole dataset). Frames are
        # JPEG-encoded once and decoded per read, so the host pipeline pays
        # the true decode cost instead of the (pricier) noise generator.
        ev.dataset = _JpegBackedDataset(ed.SyntheticEvalDataset(
            num_seqs=2, num_frames=args.frames, hw=tuple(args.hw)))
        stats = ev.evaluate()
        n_png = sum(len(files) for _, _, files in os.walk(out))
        warm = stats["per_seq_fps"].get("test1", 0.0)
        print(json.dumps({
            "metric": "e2e_eval_fps_warm", "value": round(warm, 2),
            "unit": "frames/s", "frames": args.frames,
            "hw": list(args.hw), "augs": len(ev.augs),
            "pngs_written": n_png,
            "per_seq_fps": stats["per_seq_fps"],
        }))
    finally:
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
