"""Benchmark: multi-object 480p VOS propagation FPS on one chip.

Measures the full per-frame inference step (encode -> GPM propagation over
the 9-slot restricted memory bank -> FPN decode -> memory update with scored
eviction) of R50-DeAOTL+RMem at DAVIS-480p eval resolution (481x849 after
stride-16+1 snapping, aot_plus/dataloaders/video_transforms.py:605-621) with
10 objects.

Baseline: the RMem paper reports 27.42 FPS for DeAOT+RMem on DAVIS-2017 480p
(RMem.pdf Table 6, unspecified GPU; BASELINE.md). vs_baseline = fps / 27.42.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_FPS = 27.42
HW = (481, 849)
NUM_OBJECTS = 10
WARMUP = 4
ITERS = 30


def main():
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
    for i in range(NUM_OBJECTS):  # 10 object stripes
        mask[:, :, i * 80:(i * 80 + 60)] = i + 1
    state, _ = engine.add_reference(img0, jnp.asarray(mask), [NUM_OBJECTS],
                                    gap=5)

    frames = [jnp.asarray(rng.rand(1, *HW, 3), jnp.float32)
              for _ in range(4)]

    def step(state, img):
        # fused single-dispatch propagate+argmax+update
        return engine.step(state, img, HW)

    for i in range(WARMUP):
        state, label = step(state, frames[i % len(frames)])
    jax.block_until_ready(label)

    # two timed passes; report the best (the TPU sits behind a network
    # tunnel, so a single pass can absorb a transient latency spike)
    best_dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for i in range(ITERS):
            state, label = step(state, frames[i % len(frames)])
        jax.block_until_ready(label)
        best_dt = min(best_dt, time.perf_counter() - t0)

    fps = ITERS / best_dt
    print(json.dumps({
        "metric": "480p_multiobj_deaotl_rmem_inference",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
