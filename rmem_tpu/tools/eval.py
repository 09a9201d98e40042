"""Evaluation CLI (aot_plus/tools/eval.py): run inference over an eval
dataset, write palettized PNG masks + FPS stats, optionally score J/J_tr."""

from __future__ import annotations

import argparse
import json
import os


def main():
    p = argparse.ArgumentParser(description="rmem_tpu evaluation")
    p.add_argument("--exp_name", default="rmem")
    p.add_argument("--stage", default="pre_vost_2")
    p.add_argument("--model", default="r50_deaotl")
    p.add_argument("--dataset", default="vost")
    p.add_argument("--split", default="val")
    p.add_argument("--ckpt_path", default="test",
                   help="'test' runs random weights (synthetic smoke)")
    p.add_argument("--data_root", default=None)
    p.add_argument("--output_root", default=None)
    p.add_argument("--former_mem_len", type=int, default=1)
    p.add_argument("--latter_mem_len", type=int, default=8)
    p.add_argument("--flip", action="store_true")
    p.add_argument("--ms", type=float, nargs="*", default=[1.0])
    p.add_argument("--max_seqs", type=int, default=None)
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--score", action="store_true",
                   help="run offline J/J_tr scoring afterwards")
    p.add_argument("--metrics", nargs="*", default=["J", "J_last"],
                   help="offline metrics: J, J_last, F (F gives the Long "
                        "Videos J&F)")
    p.add_argument("--probe", action="store_true",
                   help="print per-frame logit probes (determinism harness, "
                        "reference --debug_fix_random)")
    p.add_argument("--zip", action="store_true",
                   help="zip the result tree afterwards (benchmark "
                        "submission format, reference utils/eval.py)")
    p.add_argument("--opt", nargs="*", default=[], metavar="KEY=VALUE",
                   help="generic config overrides")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler device trace of the eval "
                        "loop into DIR (view with TensorBoard/xprof; the "
                        "TPU-native replacement for the reference's "
                        "CUDA-event timing, evaluator.py:399-404)")
    args = p.parse_args()

    from rmem_tpu.config import Config, get_config
    from rmem_tpu.tools.train import _parse_opts
    test_over = dict(
        test_dataset=args.dataset, test_dataset_split=args.split,
        test_ckpt_path=args.ckpt_path,
        former_mem_len=args.former_mem_len,
        latter_mem_len=args.latter_mem_len,
        test_flip=args.flip, test_multiscale=tuple(args.ms),
        **_parse_opts(args.opt))
    cfg = get_config(args.stage, args.exp_name, args.model, **test_over)
    # prefer the config saved at training time, re-applying the test-time
    # flags on top (reference tools/eval.py:97-102)
    saved = os.path.join(cfg.dir_result, "config.json")
    if os.path.isfile(saved):
        print(f"reloading saved training config: {saved}")
        cfg = Config.load(saved).replace(**test_over)

    from rmem_tpu.managers.evaluator import Evaluator
    from rmem_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    ev = Evaluator(cfg, data_root=args.data_root,
                   output_root=args.output_root, probe=args.probe)
    import contextlib
    if args.profile:
        import jax
        trace_cm = jax.profiler.trace(args.profile)
    else:
        trace_cm = contextlib.nullcontext()
    with trace_cm:
        stats = ev.evaluate(max_seqs=args.max_seqs,
                            max_frames=args.max_frames)
    if args.probe:
        for i, pr in enumerate(ev.probes):
            print(f"probe[{i}]: {pr.tolist()}")
    print(json.dumps({k: v for k, v in stats.items()
                      if k != "per_seq_fps"}, indent=2))

    if args.zip:
        from rmem_tpu.utils.eval import zip_folder
        zpath = ev.output_root.rstrip("/") + ".zip"
        print(f"zipped results: {zip_folder(ev.output_root, zpath)}")

    if args.score and args.dataset not in ("test",):
        from rmem_tpu.evaluation import Evaluation
        from rmem_tpu.evaluation.evaluation import summarize
        from rmem_tpu.evaluation.evaluation_method import write_csvs
        root = args.data_root or cfg.dir_data
        sub = {"vost": "VOST", "davis2017": "DAVIS",
               "long_videos": "long_videos"}[args.dataset]
        e = Evaluation(os.path.join(root, sub), args.split)
        # Long Videos reports J&F (RMem.pdf Table 2): include F there
        metric = tuple(args.metrics)
        if args.dataset == "long_videos" and "F" not in metric:
            metric = metric + ("F",)
        metrics = e.evaluate(ev.output_root, metric=metric)
        print(json.dumps(summarize(metrics), indent=2))
        csv_g, csv_seq = write_csvs(ev.output_root, metrics, metric,
                                    args.split)
        print(f"wrote {csv_g}\nwrote {csv_seq}")


if __name__ == "__main__":
    main()
