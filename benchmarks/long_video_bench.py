"""Benchmark: long-video steady state — RMem's core property.

The point of the restricted bank (SURVEY §5.7) is that per-frame cost and
memory stay CONSTANT for arbitrarily long videos: the bank is a fixed
former+latter+1 slot buffer updated in place (the reference's Long Videos
table, RMem.pdf Table 2, is the accuracy side of this; XMem-style growing
memories slow down and OOM instead).

This drives the flagship through a ~900-frame synthetic video in 30-frame
device-resident chunks and reports per-chunk FPS for the first and last
deciles plus their ratio. A growing-memory design would degrade
monotonically; the fixed-shape scan must hold FPS flat (ratio ~1.0) with
zero reallocation (the state buffers are donated in place).

Usage: python benchmarks/long_video_bench.py [--frames 900]
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

HW = (481, 849)
NUM_OBJECTS = 10
CHUNK = 30


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=900)
    args = ap.parse_args()

    from rmem_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from rmem_tpu.config import get_config
    from rmem_tpu.engine import InferenceEngine
    from rmem_tpu.models import build_vos_model, init_params

    cfg = get_config("pre_vost", model="r50_deaotl")
    model = build_vos_model(cfg.model_vos, cfg)
    params = init_params(model, jax.random.PRNGKey(0), HW)
    engine = InferenceEngine(model, params, cfg, donate=True)

    rng = np.random.RandomState(0)
    img0 = jnp.asarray(rng.rand(1, *HW, 3), jnp.float32)
    mask = np.zeros((1, *HW), np.int32)
    for i in range(NUM_OBJECTS):
        mask[:, :, i * 80:(i * 80 + 60)] = i + 1
    # adaptive gap as the evaluator would set it (evaluator.py:330-335)
    gap = max(int(round(args.frames / 30)), 5)
    state, _ = engine.add_reference(img0, jnp.asarray(mask), [NUM_OBJECTS],
                                    gap=gap)

    chunk = jnp.asarray(rng.rand(CHUNK, 1, *HW, 3), jnp.float32)
    n_chunks = max(args.frames // CHUNK, 4)

    # warmup/compile
    state, labels = engine.scan_steps(state, chunk, HW)
    _ = np.asarray(labels[-1])

    fps = []
    for i in range(n_chunks):
        t0 = time.perf_counter()
        state, labels = engine.scan_steps(state, chunk, HW)
        _ = np.asarray(labels[-1])  # hard sync per chunk
        fps.append(CHUNK / (time.perf_counter() - t0))
    k = max(n_chunks // 10, 2)
    first, last = float(np.mean(fps[:k])), float(np.mean(fps[-k:]))
    count = int(np.asarray(state.bank.count))
    print(json.dumps({
        "metric": "long_video_steady_state",
        "frames": n_chunks * CHUNK,
        "fps_first_decile": round(first, 2),
        "fps_last_decile": round(last, 2),
        "ratio_last_over_first": round(last / first, 4),
        "bank_slots_used": count,
        "bank_capacity": int(cfg.max_mem_slots),
    }))


if __name__ == "__main__":
    main()
