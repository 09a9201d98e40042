"""Offline evaluation CLI (reference: evaluation/evaluation_method.py).

Scores saved PNG masks against ground truth and writes global/per-sequence
CSVs next to the results.
"""

from __future__ import annotations

import argparse
import csv
import os

import numpy as np

from rmem_tpu.evaluation.evaluation import Evaluation, summarize


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--results_path", required=True,
                   help="dir with per-sequence PNG masks")
    p.add_argument("--dataset_path", required=True,
                   help="dataset root (Annotations/, ImageSets/)")
    p.add_argument("--set", default="val")
    p.add_argument("--re", action="store_true", help="recompute CSVs")
    args = p.parse_args()

    csv_g = os.path.join(args.results_path, "global_results.csv")
    csv_seq = os.path.join(args.results_path, "per-sequence_results.csv")
    if os.path.exists(csv_g) and not args.re:
        print(f"already computed: {csv_g}")
        with open(csv_g) as f:
            print(f.read())
        return

    ev = Evaluation(args.dataset_path, args.set)
    metrics = ev.evaluate(args.results_path)
    g = summarize(metrics)

    with open(csv_g, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["J-Mean", "J-Recall", "J-Decay", "J_last-Mean"])
        w.writerow([g["J"] / 100, g["J_recall"] / 100, g["J_decay"] / 100,
                    g["J_tr"] / 100])
    with open(csv_seq, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["Sequence", "J-Mean", "J_last-Mean"])
        for name in metrics["J"]["M_per_object"]:
            w.writerow([name, metrics["J"]["M_per_object"][name],
                        metrics["J_last"]["M_per_object"][name]])
    print(f"J: {g['J']:.1f}  J_tr: {g['J_tr']:.1f}  "
          f"(recall {g['J_recall']:.1f}, decay {g['J_decay']:.1f})")
    print(f"wrote {csv_g}")


if __name__ == "__main__":
    main()
