"""Multi-aug fused-eval benchmark: FPS of the ONE-dispatch multi-(scale,
flip) step vs the single-aug step (VERDICT round-1 item #2's done
criterion: multi-aug within ~#augs x of single-aug).

Same methodology as bench.py: chunked lax.scan, hard host sync via
materializing the final labels.
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
CHUNK = 15
N_CHUNKS = 2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", type=float, nargs="*", default=[1.0, 1.1])
    ap.add_argument("--flip", action="store_true", default=True)
    args = ap.parse_args()

    from rmem_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from rmem_tpu.config import get_config
    from rmem_tpu.data.transforms import restrict_size
    from rmem_tpu.engine import InferenceEngine
    from rmem_tpu.models import build_vos_model, init_params

    cfg = get_config("pre_vost", model="r50_deaotl")
    model = build_vos_model(cfg.model_vos, cfg)
    params = init_params(model, jax.random.PRNGKey(0), HW)
    engine = InferenceEngine(model, params, cfg, donate=True)

    augs = [(s, f) for s in args.scales
            for f in ((False, True) if args.flip else (False,))]
    flips = tuple(f for _, f in augs)
    hws = [restrict_size(*HW, cfg.test_max_size, cfg.test_min_size, s,
                         cfg.model_align_corners) for s, _ in augs]

    rng = np.random.RandomState(0)
    mask = np.zeros((1, *HW), np.int32)
    for i in range(NUM_OBJECTS):
        mask[:, :, i * 80:(i * 80 + 60)] = i + 1

    states, chunks = [], []
    for hw in hws:
        img0 = jnp.asarray(rng.rand(1, *hw, 3), jnp.float32)
        lab = jnp.asarray(np.resize(mask[0], hw), jnp.int32)
        st, _ = engine.add_reference(img0, lab[None], [NUM_OBJECTS], gap=5)
        states.append(st)
        chunks.append(jnp.asarray(rng.rand(CHUNK, 1, *hw, 3), jnp.float32))

    # ---- multi-aug fused ----
    states_t, labels = engine.scan_steps_multi(states, chunks, HW, flips)
    _ = np.asarray(labels[-1])  # warmup sync
    t0 = time.perf_counter()
    for _ in range(N_CHUNKS):
        states_t, labels = engine.scan_steps_multi(states_t, chunks, HW,
                                                   flips)
    _ = np.asarray(labels[-1])
    dt_multi = time.perf_counter() - t0
    fps_multi = CHUNK * N_CHUNKS / dt_multi

    # ---- single-aug reference point ----
    st, _ = engine.add_reference(
        jnp.asarray(rng.rand(1, *hws[0], 3), jnp.float32),
        jnp.asarray(np.resize(mask[0], hws[0]), jnp.int32)[None],
        [NUM_OBJECTS], gap=5)
    single_chunk = chunks[0]
    st, labels = engine.scan_steps(st, single_chunk, HW)
    _ = np.asarray(labels[-1])
    t0 = time.perf_counter()
    for _ in range(N_CHUNKS):
        st, labels = engine.scan_steps(st, single_chunk, HW)
    _ = np.asarray(labels[-1])
    dt_single = time.perf_counter() - t0
    fps_single = CHUNK * N_CHUNKS / dt_single

    print(json.dumps({
        "augs": len(augs),
        "fps_single_aug": round(fps_single, 2),
        "fps_multi_aug": round(fps_multi, 2),
        "slowdown_x": round(fps_single / fps_multi, 2),
        "ideal_slowdown_x": len(augs),
    }))


if __name__ == "__main__":
    main()
