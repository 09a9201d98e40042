"""Training CLI (aot_plus/tools/train.py): compose config, save it into the
result dir, run the Trainer. One process drives the whole device mesh."""

from __future__ import annotations

import argparse
import ast


def _parse_opts(pairs):
    """KEY=VALUE config overrides; values parsed as Python literals when
    possible (ints/floats/bools/tuples), kept as strings otherwise."""
    over = {}
    for kv in pairs:
        if "=" not in kv:
            raise SystemExit(f"--opt expects KEY=VALUE, got {kv!r}")
        k, v = kv.split("=", 1)
        try:
            over[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            over[k] = v
    return over


def main():
    p = argparse.ArgumentParser(description="rmem_tpu training")
    p.add_argument("--exp_name", default="rmem")
    p.add_argument("--stage", default="pre_vost_2")
    p.add_argument("--model", default="r50_deaotl")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--total_steps", type=int, default=None)
    p.add_argument("--pretrained_path", default=None)
    p.add_argument("--data_root", default=None)
    p.add_argument("--mesh", type=int, nargs="*", default=None,
                   help="data-parallel mesh shape, e.g. --mesh 4")
    p.add_argument("--max_steps", type=int, default=None,
                   help="stop early (smoke runs)")
    p.add_argument("--fix_random", action="store_true")
    p.add_argument("--opt", nargs="*", default=[], metavar="KEY=VALUE",
                   help="generic config overrides, e.g. "
                        "--opt var_loss_weight=0.01 model_encoder=tiny")
    args = p.parse_args()

    from rmem_tpu.config import get_config
    over = _parse_opts(args.opt)
    if args.batch_size:
        over["train_batch_size"] = args.batch_size
    if args.total_steps:
        over["train_total_steps"] = args.total_steps
    if args.pretrained_path:
        over["pretrain_model"] = args.pretrained_path
        over["pretrain_full"] = True
    if args.mesh:
        over["mesh_shape"] = tuple(args.mesh)
    cfg = get_config(args.stage, args.exp_name, args.model, **over)
    cfg.save()

    # tee stdout into the result dir + snapshot the source tree
    # (reference tools/train.py:30-38, utils/utils.py:44-96)
    import os

    from rmem_tpu.utils.logging import Tee, copy_codes
    Tee(os.path.join(cfg.dir_result, "logs"), "train").install()
    copy_codes(cfg.dir_result)

    if args.fix_random:
        import numpy as np
        np.random.seed(1)

    from rmem_tpu.managers.trainer import Trainer
    from rmem_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    trainer = Trainer(cfg, data_root=args.data_root)
    metrics = trainer.train(max_steps=args.max_steps)
    print("final metrics:", metrics)


if __name__ == "__main__":
    main()
