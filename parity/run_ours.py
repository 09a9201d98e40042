"""Run OUR evaluator on the same fake-VOST data with the converted weights.

Runs on CPU (fp32) so numeric differences vs the torch reference are model
math only. Probes match the reference harness: per-frame logits at pixel
(100,100) of the full-resolution output, aug 0, group 0.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="r50_deaotl")
    ap.add_argument("--stage", default="pre_vost")
    ap.add_argument("--ckpt", default="/tmp/parity/ref_weights.pth")
    ap.add_argument("--data", default="/tmp/parity")
    ap.add_argument("--output", default="/tmp/parity/ours_run")
    ap.add_argument("--former", type=int, default=1)
    ap.add_argument("--latter", type=int, default=4)
    ap.add_argument("--out", default="/tmp/parity/ours_probes.npz")
    ap.add_argument("--no_probe", action="store_true",
                    help="run the PRODUCTION fused path (chunked scan + "
                         "device-side prep) instead of the probe harness; "
                         "emits PNGs only")
    ap.add_argument("--ms", nargs="+", type=float, default=[1.0],
                    help="multi-scale factors (test_multiscale)")
    ap.add_argument("--flip", action="store_true",
                    help="add flip augmentation (test_flip)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    from rmem_tpu.config import get_config
    from rmem_tpu.managers.evaluator import Evaluator
    from rmem_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    # fp32 activations: the torch reference runs fp32 on CPU; bf16 would put
    # a ~4e-3 relative floor under every probe diff
    cfg = get_config(args.stage, "parity", args.model,
                     former_mem_len=args.former, latter_mem_len=args.latter,
                     test_dataset="vost", test_dataset_split="val",
                     test_ckpt_path=args.ckpt, compute_dtype="float32",
                     test_multiscale=tuple(args.ms), test_flip=args.flip)

    # our VOSTestDataset roots at <data_root>/VOST
    os.makedirs(os.path.join(args.data, "VOST"), exist_ok=True)
    if not os.path.exists(os.path.join(args.data, "VOST", "ImageSets")):
        for d in ("ImageSets", "JPEGImages_10fps", "Annotations"):
            src = os.path.join(args.data, "vost_mini", d)
            dst = os.path.join(args.data, "VOST", d)
            if not os.path.exists(dst):
                os.symlink(src, dst)

    evaluator = Evaluator(cfg, data_root=args.data, output_root=args.output,
                          probe=not args.no_probe)
    stats = evaluator.evaluate(shard_across_hosts=False)
    print(stats)
    if args.no_probe:
        print(f"production-path PNGs written to {args.output}")
        return

    # split the flat probe list back into per-sequence stacks
    n_seqs = len(evaluator.dataset)
    seq_lens = [len(evaluator.dataset.sequence(i)) - 1 for i in range(n_seqs)]
    arrs = {}
    pos = 0
    for i, n in enumerate(seq_lens):
        arrs[f"seq{i}"] = np.stack(evaluator.probes[pos: pos + n])
        pos += n
    assert pos == len(evaluator.probes), (pos, len(evaluator.probes))
    np.savez(args.out, **arrs)
    print(f"saved probes for {len(arrs)} sequences to {args.out}")
    for k, v in arrs.items():
        print(f"  {k}: {v.shape}")


if __name__ == "__main__":
    main()
