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


def _measure_h2d_mbps(payload=None, nbytes=12 << 20, reps=3):
    """In-run H2D bandwidth probe. block_until_ready is unreliable on the
    tunneled backend (ROUND_NOTES), so each upload is forced end-to-end by
    a device reduction fetched back to host; the dispatch round-trip is
    calibrated out with a 1 KB payload. Without `payload` uses
    incompressible random bytes (the tunnel compresses, so random is the
    floor); with `payload` (e.g. real packed frames) measures the
    effective rate for that content."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    if payload is None:
        rng = np.random.RandomState(0)
        payload = rng.randint(0, 256, nbytes, dtype=np.uint8)
    else:
        payload = np.ascontiguousarray(payload.reshape(-1).view(np.uint8))
        while payload.nbytes < nbytes:
            payload = np.concatenate([payload, payload])

    reduce = jax.jit(lambda x: jnp.max(x))

    def roundtrip(arr):
        t0 = time.perf_counter()
        np.asarray(reduce(jax.device_put(arr)))  # forces the full chain
        return time.perf_counter() - t0

    tiny = np.zeros(1024, np.uint8)
    roundtrip(tiny)  # warm the jit for both shapes... (recompiles per shape)
    roundtrip(payload)
    rtt = min(roundtrip(tiny) for _ in range(reps))
    best = min(roundtrip(payload) for _ in range(reps))
    return payload.nbytes / max(best - rtt, 1e-9) / 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=90)
    ap.add_argument("--hw", type=int, nargs=2, default=(480, 854))
    ap.add_argument("--model", default="r50_deaotl")
    ap.add_argument("--ms", type=float, nargs="*", default=[1.0])
    ap.add_argument("--flip", action="store_true")
    ap.add_argument("--mode", default="both",
                    choices=("rgb", "yuv", "both"),
                    help="rgb = parity upload (3 B/px); yuv = reduced-bytes"
                         " planar YUV 4:2:0 host pack + device-side decode"
                         " (lossy; config.eval_yuv420_upload); both = run"
                         " the two back-to-back and emit one JSON line per"
                         " mode")
    args = ap.parse_args()

    from rmem_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from rmem_tpu.config import get_config
    from rmem_tpu.data import eval_datasets as ed
    from rmem_tpu.managers.evaluator import Evaluator

    # dataset built once: frames are JPEG-encoded up front and decoded per
    # read, so the host pipeline pays the true decode cost instead of the
    # (pricier) noise generator's; 480p so decode/resize runs at
    # eval_vost.sh scale. Two sequences: seq 0 absorbs the jit compiles,
    # seq 1 is the warm steady-state number (real eval runs amortize the
    # compile over the whole dataset).
    dataset = _JpegBackedDataset(ed.SyntheticEvalDataset(
        num_seqs=2, num_frames=args.frames, hw=tuple(args.hw)))

    for yuv in {"rgb": (False,), "yuv": (True,),
                "both": (False, True)}[args.mode]:
        cfg = get_config("pre_vost_2", model=args.model, test_dataset="test",
                         test_multiscale=tuple(args.ms), test_flip=args.flip,
                         eval_yuv420_upload=yuv)
        out = tempfile.mkdtemp(prefix="e2e_eval_")
        try:
            ev = Evaluator(cfg, output_root=out, log=lambda *a: None)
            ev.dataset = dataset

            # self-calibration (VERDICT r3 Next #1): measure the tunnel's
            # raw H2D rate in-run so the FPS number is attributable —
            # 28-vs-35 FPS readings on this rig track the hour's
            # bandwidth, not the code.
            h2d_random = _measure_h2d_mbps()
            # effective rate for the real payload (compressible content):
            sample = next(iter(dataset.sequence(0))).image
            if yuv:
                from rmem_tpu.ops.color import rgb_to_yuv420
                sample = rgb_to_yuv420(sample)
            h2d_payload = _measure_h2d_mbps(payload=sample)

            stats = ev.evaluate()
            n_png = sum(len(files) for _, _, files in os.walk(out))
            warm = stats["per_seq_fps"].get("test1", 0.0)
            # uploaded payload per PROCESSED frame (both sequences;
            # excludes the two reference frames, which upload via
            # add_reference)
            n_up = 2 * (args.frames - 1)
            bytes_per_frame = ev.h2d_bytes / max(n_up, 1)
            print(json.dumps({
                "metric": "e2e_eval_fps_warm", "value": round(warm, 2),
                "unit": "frames/s", "frames": args.frames,
                "hw": list(args.hw), "augs": len(ev.augs),
                "yuv420": bool(yuv),
                "pngs_written": n_png,
                "h2d_mbps": round(h2d_random, 1),
                "h2d_mbps_payload": round(h2d_payload, 1),
                "bytes_per_frame": int(bytes_per_frame),
                "ceiling_fps": round(h2d_random * 1e6 / bytes_per_frame, 1),
                "ceiling_fps_payload": round(
                    h2d_payload * 1e6 / bytes_per_frame, 1),
                "per_seq_fps": stats["per_seq_fps"],
            }), flush=True)
        finally:
            shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
