"""One-command acceptance drill for the environment-blocked gate (VERDICT r4
Next #6): given a released reference checkpoint and a VOST root, run
convert -> eval -> score -> diff vs BASELINE.md and print pass/fail against
the 0.3 margin.

The real gate (BASELINE.md: "J and J_tr within 0.3 of the released PyTorch
checkpoints") needs `.pth` weights and VOST data that cannot be downloaded
on this egress-less rig. This script is the standing order made executable:
the moment both exist, one command closes the gate. Until then, `--vost
fake --ckpt random` drills the identical pipeline end-to-end on generated
fake-VOST data (parity/make_dataset.py --gt_all) with random weights —
exercising conversion plumbing, the production fused evaluator, PNG
writeback, the offline scorer, and the reference-format CSVs.

Usage:
  # the real gate, when weights + data exist:
  python parity/acceptance.py --ckpt /path/R50_DeAOTL_VOST.pth \
      --vost /path/to/VOST_parent   # dir containing VOST/
  # the drill (no external assets):
  python parity/acceptance.py --ckpt random --vost fake
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# README.md:50-53 (BASELINE.md table): model -> (J, J_tr) of the released
# RMem checkpoints on VOST val
BASELINES = {
    "r50_deaotl": (51.8, 40.4),
    "r50_aotl": (50.5, 39.8),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help=".pth released checkpoint, a native .msgpack, or "
                         "'random' (drill mode)")
    ap.add_argument("--vost", required=True,
                    help="dir containing VOST/, or 'fake' (drill mode)")
    ap.add_argument("--model", default="r50_deaotl")
    ap.add_argument("--stage", default="pre_vost")
    ap.add_argument("--split", default="val")
    ap.add_argument("--margin", type=float, default=0.3)
    ap.add_argument("--work", default="/tmp/acceptance")
    ap.add_argument("--former", type=int, default=1)
    ap.add_argument("--latter", type=int, default=8,
                    help="reference eval bank config (eval_vost.sh:28)")
    args = ap.parse_args()

    drill = args.vost == "fake"
    os.makedirs(args.work, exist_ok=True)
    if drill:
        root = args.work
        vost_dir = os.path.join(root, "VOST")
        subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(__file__), "make_dataset.py"),
             "--root", vost_dir, "--gt_all", "--seqs", "2",
             "--frames", "12", "--height", "208", "--width", "304"],
            check=True)
    else:
        root = args.vost
        vost_dir = os.path.join(root, "VOST")
        assert os.path.isdir(vost_dir), f"no VOST/ under {root}"

    from rmem_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from rmem_tpu.config import get_config
    from rmem_tpu.managers.evaluator import Evaluator

    ckpt = "test" if args.ckpt == "random" else args.ckpt
    cfg = get_config(args.stage, "acceptance", args.model,
                     test_dataset="vost", test_dataset_split=args.split,
                     test_ckpt_path=ckpt, former_mem_len=args.former,
                     latter_mem_len=args.latter)
    out_root = os.path.join(args.work, "masks")
    ev = Evaluator(cfg, data_root=root, output_root=out_root)
    stats = ev.evaluate()
    print(f"eval done: {stats['all_frame_fps']:.2f} all-frame FPS")

    from rmem_tpu.evaluation import Evaluation
    from rmem_tpu.evaluation.evaluation import summarize
    from rmem_tpu.evaluation.evaluation_method import G_MEASURES, write_csvs

    metric = ("J", "J_last")
    e = Evaluation(vost_dir, args.split)
    metrics = e.evaluate(out_root, metric=metric)
    g = summarize(metrics)
    csv_g, csv_seq = write_csvs(out_root, metrics, metric, args.split)
    print(f"J = {g['J']:.2f}  J_tr = {g['J_tr']:.2f}")
    print(f"wrote {csv_g}\nwrote {csv_seq}")

    # CSV header must byte-match the reference scorer's
    # (/root/reference/evaluation/evaluation_method.py:51)
    with open(csv_g) as f:
        head = f.readline().rstrip("\n")
    assert head == ",".join(G_MEASURES), (head, G_MEASURES)
    print("CSV header byte-matches the reference scorer")

    if drill or args.ckpt == "random":
        print("DRILL PASS: pipeline ran end-to-end (convert -> eval -> "
              "score -> reference-format CSVs). Baseline diff skipped: "
              "random weights / fake data carry no score meaning.")
        return 0

    base = BASELINES.get(args.model)
    if base is None:
        print(f"no baseline recorded for {args.model}; scores above")
        return 0
    bj, bjtr = base
    dj, djtr = g["J"] - bj, g["J_tr"] - bjtr
    ok = abs(dj) <= args.margin and abs(djtr) <= args.margin
    print(f"baseline {args.model}: J {bj} (diff {dj:+.2f}), "
          f"J_tr {bjtr} (diff {djtr:+.2f}), margin {args.margin}")
    print("ACCEPTANCE PASS" if ok else "ACCEPTANCE FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
