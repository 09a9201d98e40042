"""Build the REFERENCE model with seeded random weights and save a .pth.

The exported checkpoint is loaded by BOTH the reference evaluator (via its
own load_network) and our converter, so the two pipelines run identical
parameters. Frozen-BN running stats are randomized (they default to 0/1,
which would make BN folding errors invisible to the probe).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from cpu_shim import install  # noqa: E402

install()
sys.path.insert(0, "/root/reference/aot_plus")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="r50_deaotl")
    ap.add_argument("--stage", default="pre_vost")
    ap.add_argument("--out", default="/tmp/parity/ref_weights.pth")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--fg_bias", action="store_true",
                    help="nudge the decoder conv_out bias (bg -2.5, "
                         "obj1/obj2 +1.0) so a random-init model carries "
                         "foreground through the closed loop — needed for "
                         "non-vacuous multi-aug parity (PARITY_RUN.md r3)")
    args = ap.parse_args()

    from tools.get_config import get_config  # reference config system
    from networks.models import build_vos_model  # reference models

    cfg = get_config(args.stage, "parity", args.model)
    torch.manual_seed(args.seed)
    model = build_vos_model(cfg.MODEL_VOS, cfg)
    model.eval()

    sd = model.state_dict()
    rng = np.random.RandomState(args.seed)
    n_bn = 0
    for k, v in sd.items():
        if k.endswith("running_mean"):
            v.copy_(torch.from_numpy(
                rng.randn(*v.shape).astype(np.float32) * 0.2))
            n_bn += 1
        elif k.endswith("running_var"):
            v.copy_(torch.from_numpy(
                (0.5 + rng.rand(*v.shape)).astype(np.float32)))
            n_bn += 1

    if args.fg_bias:
        # find the decoder's final conv bias (11 logit channels)
        cands = [k for k in sd if k.endswith("bias")
                 and sd[k].ndim == 1 and sd[k].shape[0] == 11
                 and "conv_out" in k]
        assert len(cands) == 1, cands
        b = sd[cands[0]]
        b[0] -= 2.5
        b[1] += 1.0
        b[2] += 1.0
        print(f"fg_bias applied to {cands[0]}")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    torch.save({"state_dict": sd}, args.out)
    print(f"saved {len(sd)} tensors ({n_bn} BN buffers randomized) "
          f"to {args.out}")


if __name__ == "__main__":
    main()
