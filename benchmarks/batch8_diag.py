"""Diagnose the single-chip batch-8 training compile failure (VERDICT r2
Weak #6 / Next #4).

The reference trains global batch 8 over 4 GPUs (train_vost.sh:13), i.e.
per-device batch 2. Round 2 found that compiling our train step at
single-chip batch 8 (r50_deaotl, 465x465, seq 17) fails in the remote
compile helper with an opaque HTTP 500. This script gathers the evidence:

1. StableHLO program size per batch size (program-size growth would point
   at a helper payload limit — it shouldn't grow with batch),
2. XLA memory analysis at the largest batch that compiles (argument +
   output + temp bytes vs the chip's HBM),
3. the verbatim failure for batch 8.

Usage: python benchmarks/batch8_diag.py [--batches 1,4,8] [--seq 17]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

HW = (465, 465)


def build(batch, seq, remat, pallas):
    from rmem_tpu.config import get_config
    from rmem_tpu.engine.train_state import (TrainState, make_optimizer,
                                             make_train_step)
    from rmem_tpu.models import build_vos_model, init_params

    cfg = get_config("pre_vost_2", model="r50_deaotl", data_seq_len=seq,
                     train_batch_size=batch, train_remat=remat,
                     use_pallas_bank_attention_train=pallas,
                     dwconv_unrolled=False)
    model = build_vos_model(cfg.model_vos, cfg)
    params = init_params(model, jax.random.PRNGKey(0), HW)
    tx = make_optimizer(params, cfg)
    state = TrainState.create(params, cfg)
    step_fn = jax.jit(make_train_step(model, cfg, tx), donate_argnums=(0,))

    # abstract inputs: lower/compile need only shapes+dtypes (batch-8 real
    # arrays would be ~7 GB of host RAM)
    sds = jax.ShapeDtypeStruct
    batch_abs = {
        "imgs": sds((batch, seq, *HW, 3), jnp.float32),
        "labels": sds((batch, seq, *HW), jnp.int32),
        "obj_nums": sds((batch,), jnp.int32),
    }
    shuffle = sds((batch, 11, 11), jnp.float32)
    return step_fn, state, batch_abs, shuffle


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,4,8")
    ap.add_argument("--seq", type=int, default=17)
    ap.add_argument("--remat", default="dots")
    ap.add_argument("--pallas", type=int, default=1)
    args = ap.parse_args()

    from rmem_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    out = {"device": jax.devices()[0].device_kind,
           "remat": args.remat, "seq": args.seq, "per_batch": {}}
    for b in [int(x) for x in args.batches.split(",")]:
        row = {}
        try:
            step_fn, state, batch_np, shuffle = build(
                b, args.seq, args.remat, bool(args.pallas))
            lowered = step_fn.lower(state, batch_np, shuffle)
            row["stablehlo_bytes"] = len(lowered.as_text())
            try:
                compiled = lowered.compile()
                row["compiled"] = True
                ma = compiled.memory_analysis()
                if ma is not None:
                    for k in ("argument_size_in_bytes",
                              "output_size_in_bytes",
                              "temp_size_in_bytes",
                              "generated_code_size_in_bytes"):
                        row[k] = getattr(ma, k, None)
            except Exception as e:
                row["compiled"] = False
                msg = "".join(
                    traceback.format_exception_only(type(e), e))
                # keep head (OOM headline) and tail (largest buffers)
                row["compile_error"] = (msg if len(msg) <= 4000
                                        else msg[:2400] + "..." + msg[-1600:])
        except Exception as e:
            row["trace_error"] = "".join(
                traceback.format_exception_only(type(e), e))[-2000:]
        out["per_batch"][b] = row
        print(json.dumps({b: row}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
