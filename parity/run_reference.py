"""Run the ACTUAL reference evaluator (CPU-shimmed) on the fake-VOST data.

Executes `/root/reference/aot_plus`'s Evaluator class unmodified — same
transforms, engines, eviction, PNG writeback — capturing per-frame logit
probes at pixel (100,100) of the full-resolution output (the reference's own
determinism harness, managers/evaluator.py:424-425) by wrapping
AOTInferEngine.match_propogate_one_frame. Output: probes npz + the result
PNG tree.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from cpu_shim import install  # noqa: E402

install()
sys.path.insert(0, "/root/reference/aot_plus")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="r50_deaotl")
    ap.add_argument("--stage", default="pre_vost")
    ap.add_argument("--ckpt", default="/tmp/parity/ref_weights.pth")
    ap.add_argument("--data", default="/tmp/parity/vost_mini")
    ap.add_argument("--workdir", default="/tmp/parity/ref_run")
    ap.add_argument("--former", type=int, default=1)
    ap.add_argument("--latter", type=int, default=4)
    ap.add_argument("--out", default="/tmp/parity/ref_probes.npz")
    ap.add_argument("--ms", nargs="+", type=float, default=[1.0],
                    help="multi-scale factors (reference TEST_MULTISCALE)")
    ap.add_argument("--flip", action="store_true",
                    help="add flip augmentation (reference TEST_FLIP)")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    os.chdir(args.workdir)  # DIR_ROOT='./results' stays inside the workdir

    import torch
    from tools.get_config import get_config
    from networks.engines import aot_engine

    cfg = get_config(args.stage, "parity", args.model)
    cfg.TEST_GPU_ID = 0
    cfg.TEST_GPU_NUM = 1
    cfg.TEST_DATASET = "vost"
    cfg.TEST_DATASET_SPLIT = "val"
    cfg.DIR_VOST = args.data
    cfg.TEST_CKPT_PATH = args.ckpt
    cfg.TEST_WORKERS = 0
    cfg.TEST_MULTISCALE = list(args.ms)
    cfg.TEST_FLIP = bool(args.flip)
    cfg.TEST_EMA = False
    cfg.FORMER_MEM_LEN = args.former
    cfg.LATTER_MEM_LEN = args.latter
    cfg.EVAL_NAME = "parity"
    cfg.DEBUG_FIX_RANDOM = False
    cfg.FIX_RANDOM = True

    torch.manual_seed(1)
    np.random.seed(1)

    # ---- probe capture --------------------------------------------------
    probes: list[list[np.ndarray]] = []
    orig_add = aot_engine.AOTInferEngine.add_reference_frame
    orig_prop = aot_engine.AOTInferEngine.match_propogate_one_frame

    def add_ref(self, img, mask, obj_nums, frame_step=-1):
        if frame_step == 0:
            probes.append([])
        return orig_add(self, img, mask, obj_nums, frame_step=frame_step)

    def prop(self, img=None, mask=None, output_size=None):
        out = orig_prop(self, img, mask=mask, output_size=output_size)
        h, w = out.shape[-2:]
        probes[-1].append(
            out[0, :, min(100, h - 1), min(100, w - 1)]
            .detach().cpu().numpy().astype(np.float32))
        return out

    aot_engine.AOTInferEngine.add_reference_frame = add_ref
    aot_engine.AOTInferEngine.match_propogate_one_frame = prop
    # DeAOTInferEngine overrides add_reference_frame; wrap it the same way
    from networks.engines import deaot_engine
    orig_add_de = deaot_engine.DeAOTInferEngine.add_reference_frame

    def add_ref_de(self, img, mask, obj_nums, frame_step=-1):
        if frame_step == 0:
            probes.append([])
        return orig_add_de(self, img, mask, obj_nums, frame_step=frame_step)

    deaot_engine.DeAOTInferEngine.add_reference_frame = add_ref_de

    from networks.managers.evaluator import Evaluator

    evaluator = Evaluator(cfg, rank=0)
    evaluator.evaluating()

    arrs = {f"seq{i}": np.stack(p) for i, p in enumerate(probes) if p}
    np.savez(args.out, **arrs)
    print(f"result_root: {evaluator.result_root}")
    print(f"saved probes for {len(arrs)} sequences to {args.out}")
    for k, v in arrs.items():
        print(f"  {k}: {v.shape}")


if __name__ == "__main__":
    main()
