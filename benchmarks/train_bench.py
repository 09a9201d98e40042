"""Benchmark: training step time at reference scale on one chip.

The reference trains pre_vost_2 at global batch 8 over 4 GPUs x seq_len 17
with AMP (train_vost.sh:3-27, configs/pre_vost_2.py:13-15). This measures
our jitted train step (offline encode -> frame scan with remat -> loss ->
grad -> AdamW+EMA) for r50_deaotl at 465x465 across batch sizes and remat
policies, with the fused Pallas bank-attention VJP on/off.

Timing discipline: one warmup step (compile), then N timed steps where each
step's host->device input transfer is included but batch construction is
not; sync by materializing the loss. On the tunneled backend,
block_until_ready is unreliable (ROUND_NOTES) — np.asarray is the sync.

Usage: python benchmarks/train_bench.py [--batches 1,2,4,8] [--seq 17]
       [--steps 3] [--remat full,dots] [--pallas 0,1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

HW = (465, 465)


def measure(model_name, batch, seq, remat, use_pallas, steps, cfgkw):
    from rmem_tpu.config import get_config
    from rmem_tpu.engine.train_state import (TrainState, make_optimizer,
                                             make_train_step)
    from rmem_tpu.models import build_vos_model, init_params
    from rmem_tpu.ops.masks import host_id_shuffle_matrix

    cfg = get_config("pre_vost_2", model=model_name, data_seq_len=seq,
                     train_batch_size=batch, train_remat=remat,
                     use_pallas_bank_attention_train=bool(use_pallas),
                     dwconv_unrolled=False, **cfgkw)
    model = build_vos_model(cfg.model_vos, cfg)
    params = init_params(model, jax.random.PRNGKey(0), HW)
    tx = make_optimizer(params, cfg)
    state = TrainState.create(params, cfg)
    step_fn = jax.jit(make_train_step(model, cfg, tx), donate_argnums=(0,))

    rng = np.random.RandomState(0)
    labels = np.zeros((batch, seq, *HW), np.int32)
    labels[:, :, 100:300, 100:300] = 1
    labels[:, :, 320:420, 50:200] = 2
    batch_np = {
        "imgs": rng.rand(batch, seq, *HW, 3).astype(np.float32),
        "labels": labels,
        "obj_nums": np.asarray([2] * batch, np.int32),
    }
    shuffle = host_id_shuffle_matrix(rng, cfg.model_max_obj_num + 1, batch)

    # device-resident inputs: the Trainer overlaps H2D with compute via its
    # background feeder (the reference's DataLoader-worker equivalent), so
    # steady-state step time excludes the upload. Timing a per-step
    # device_put here would measure the TUNNEL instead (the 588 MB batch-4
    # input swings 7-26 s/it with the hour's bandwidth — ROUND_NOTES r3).
    batch_dev = jax.device_put(batch_np)
    shuffle_dev = jnp.asarray(shuffle)

    t_c0 = time.perf_counter()
    state, metrics = step_fn(state, batch_dev, shuffle_dev)
    loss = float(np.asarray(metrics["loss"]))
    compile_s = time.perf_counter() - t_c0

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step_fn(state, batch_dev, shuffle_dev)
        loss = float(np.asarray(metrics["loss"]))  # hard sync
    s_it = (time.perf_counter() - t0) / steps
    assert np.isfinite(loss)
    return s_it, compile_s, loss


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="r50_deaotl")
    ap.add_argument("--batches", default="1,2,4,8")
    ap.add_argument("--seq", type=int, default=17)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--remat", default="full")
    ap.add_argument("--pallas", default="0")
    ap.add_argument("--opt", nargs="*", default=[])
    args = ap.parse_args()

    from rmem_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    cfgkw = {}
    for kv in args.opt:
        k, v = kv.split("=", 1)
        try:
            v = json.loads(v)
        except json.JSONDecodeError:
            pass
        cfgkw[k] = v

    rows = []
    for remat in args.remat.split(","):
        for pl in args.pallas.split(","):
            for b in args.batches.split(","):
                b = int(b)
                try:
                    s_it, compile_s, loss = measure(
                        args.model, b, args.seq, remat, int(pl),
                        args.steps, cfgkw)
                    row = {"batch": b, "seq": args.seq, "remat": remat,
                           "pallas": int(pl), "s_per_it": round(s_it, 3),
                           "clips_per_s": round(b / s_it, 3),
                           "compile_s": round(compile_s, 1),
                           "loss": round(loss, 4)}
                except Exception as e:  # OOM etc. — record and continue
                    row = {"batch": b, "seq": args.seq, "remat": remat,
                           "pallas": int(pl),
                           "error": f"{type(e).__name__}: {e}"[:200]}
                rows.append(row)
                print(json.dumps(row), flush=True)
    print(json.dumps({"table": rows}))


if __name__ == "__main__":
    main()
