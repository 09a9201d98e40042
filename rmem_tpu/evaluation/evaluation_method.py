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
    p.add_argument("--metrics", nargs="*", default=["J", "J_last"],
                   help="J, J_last, F (add F for Long Videos J&F)")
    args = p.parse_args()

    csv_g = os.path.join(args.results_path, "global_results.csv")
    csv_seq = os.path.join(args.results_path, "per-sequence_results.csv")
    if os.path.exists(csv_g) and not args.re:
        print(f"already computed: {csv_g}")
        with open(csv_g) as f:
            print(f.read())
        return

    ev = Evaluation(args.dataset_path, args.set)
    metric = tuple(args.metrics)
    metrics = ev.evaluate(args.results_path, metric=metric)
    g = summarize(metrics)

    with open(csv_g, "w", newline="") as f:
        w = csv.writer(f)
        head = ["J-Mean", "J-Recall", "J-Decay"]
        row = [g["J"] / 100, g["J_recall"] / 100, g["J_decay"] / 100]
        if "J_last" in metric:
            head.append("J_last-Mean")
            row.append(g["J_tr"] / 100)
        if "F" in metric:
            head += ["F-Mean", "F-Recall", "J&F-Mean"]
            row += [g["F"] / 100, g["F_recall"] / 100, g["J&F"] / 100]
        w.writerow(head)
        w.writerow(row)
    with open(csv_seq, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["Sequence"] + [f"{k}-Mean" for k in metric])
        for name in metrics[metric[0]]["M_per_object"]:
            w.writerow([name] + [metrics[k]["M_per_object"][name]
                                 for k in metric])
    print("  ".join(f"{k}: {v:.1f}" for k, v in g.items()))
    print(f"wrote {csv_g}")


if __name__ == "__main__":
    main()
