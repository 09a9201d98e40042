"""Profile-based component attribution for the train/eval step.

Graph ablation is valid for the inference scan but INVALID for the train
step: stubbing a component out changes XLA's remat schedule enough to swamp
the component itself (measured: removing local attention made the step
1.8x SLOWER — ROUND_NOTES r3). This tool attributes time the right way:
capture a `jax.profiler` device trace of real steps, convert the xplane
with xprof's hlo_stats (per-HLO-op totals with framework op names, i.e.
full JAX module paths), and aggregate by component.

Usage:
  python benchmarks/profile_step.py --mode train [--steps 2] [--batch 1]
  python benchmarks/profile_step.py --mode eval  [--frames 30]
Prints a JSON component table + the top single HLO ops.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

HW = (465, 465)
EVAL_HW = (481, 849)

# ordered: first match wins
COMPONENT_PATTERNS = [
    ("encoder", r"/encoder/"),
    ("bank_attention", r"bank_attention|pallas_bank|pallas_call"),
    ("local_attention", r"local_attention|tiled_local|halo"),
    ("self_attention", r"self_attn"),
    ("gated_tails", r"long_tail|short_tail|/tail/|dw_conv"),
    ("decoder_fpn", r"/decoder/|fpn"),
    ("id_bank", r"patch_wise_id_bank|id_emb"),
    ("losses", r"loss|jaccard|cross_entropy|top_k"),
    # word-ish boundaries: a bare 'ema' matches 'r-EMA-tted_computation'
    ("optimizer", r"adam|optimizer|/ema_|ema_update|weight_decay"
                  r"|clip_by_global_norm|global_norm"),
    ("resize_argmax", r"resize|interp|argmax|one_hot"),
    ("lstt_other", r"lstt|block\d"),
]


def _attribute(rows, cols):
    idx = {c["id"]: i for i, c in enumerate(cols)}
    by_comp = defaultdict(float)
    by_op = defaultdict(float)
    total = 0.0
    for r in rows:
        c = r["c"]
        t = float(c[idx["total_time"]]["v"] or 0)
        name = str(c[idx["tf_op_name"]]["v"] or "")
        cat = str(c[idx["category"]]["v"] or "")
        expr = str(c[idx["hlo_op_name"]]["v"] or "")
        total += t
        key = None
        for comp, pat in COMPONENT_PATTERNS:
            if re.search(pat, name, re.IGNORECASE) or \
               re.search(pat, expr, re.IGNORECASE):
                key = comp
                break
        by_comp[key or f"other:{cat}"] += t
        by_op[f"{cat} | {name.split('/')[-1] or expr}"] += t
    return by_comp, by_op, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("train", "eval"), default="train")
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--seq", type=int, default=17)
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--trace_dir", default=None)
    args = ap.parse_args()

    from rmem_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from rmem_tpu.config import get_config
    from rmem_tpu.models import build_vos_model, init_params

    tdir = args.trace_dir or tempfile.mkdtemp(prefix="profile_step_")

    if args.mode == "train":
        from rmem_tpu.engine.train_state import (TrainState, make_optimizer,
                                                 make_train_step)
        from rmem_tpu.ops.masks import host_id_shuffle_matrix
        cfg = get_config("pre_vost_2", model="r50_deaotl",
                         data_seq_len=args.seq,
                         train_batch_size=args.batch,
                         dwconv_unrolled=False)
        model = build_vos_model(cfg.model_vos, cfg)
        params = init_params(model, jax.random.PRNGKey(0), HW)
        tx = make_optimizer(params, cfg)
        state = TrainState.create(params, cfg)
        step = jax.jit(make_train_step(model, cfg, tx), donate_argnums=(0,))
        rng = np.random.RandomState(0)
        labels = np.zeros((args.batch, args.seq, *HW), np.int32)
        labels[:, :, 100:300, 100:300] = 1
        batch = {"imgs": jnp.asarray(
                     rng.rand(args.batch, args.seq, *HW, 3), jnp.float32),
                 "labels": jnp.asarray(labels),
                 "obj_nums": jnp.asarray([1] * args.batch)}
        shuffle = jnp.asarray(host_id_shuffle_matrix(rng, 11, args.batch))
        state, m = step(state, batch, shuffle)   # warmup/compile
        _ = float(m["loss"])
        with jax.profiler.trace(tdir):
            for _ in range(args.steps):
                state, m = step(state, batch, shuffle)
            _ = float(m["loss"])
    else:
        from rmem_tpu.engine import InferenceEngine
        cfg = get_config("pre_vost", model="r50_deaotl")
        model = build_vos_model(cfg.model_vos, cfg)
        params = init_params(model, jax.random.PRNGKey(0), EVAL_HW)
        engine = InferenceEngine(model, params, cfg, donate=True)
        rng = np.random.RandomState(0)
        img0 = jnp.asarray(rng.rand(1, *EVAL_HW, 3), jnp.float32)
        mask = np.zeros((1, *EVAL_HW), np.int32)
        mask[:, :, :200] = 1
        st, _ = engine.add_reference(img0, jnp.asarray(mask), [10], gap=5)
        chunk = jnp.asarray(rng.rand(args.frames, 1, *EVAL_HW, 3),
                            jnp.float32)
        st, labels = engine.scan_steps(st, chunk, EVAL_HW)
        _ = np.asarray(labels[-1])
        with jax.profiler.trace(tdir):
            st, labels = engine.scan_steps(st, chunk, EVAL_HW)
            _ = np.asarray(labels[-1])

    from xprof.convert import raw_to_tool_data as r2t
    planes = glob.glob(os.path.join(tdir, "plugins/profile/*/*.xplane.pb"))
    data, _ = r2t.xspace_to_tool_data(planes, "hlo_stats", {})
    stats = json.loads(data if isinstance(data, str) else data.decode())
    by_comp, by_op, total = _attribute(stats["rows"], stats["cols"])

    comp = sorted(by_comp.items(), key=lambda kv: -kv[1])
    ops = sorted(by_op.items(), key=lambda kv: -kv[1])[:15]
    print(json.dumps({
        "mode": args.mode,
        "device_total_ms": round(total / 1e3, 2),
        "components_ms": {k: round(v / 1e3, 2) for k, v in comp},
        "top_ops_ms": {k[:110]: round(v / 1e3, 2) for k, v in ops},
        "trace_dir": tdir,
    }, indent=1))


if __name__ == "__main__":
    main()
