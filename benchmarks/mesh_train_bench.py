"""Global-batch-8 data-parallel training step on a virtual device mesh.

The reference trains r50_deaotl at global batch 8 over 4 GPUs with seq_len
17 (train_vost.sh:3-27, pre_vost_2.py:13-15). Multi-chip hardware isn't
available on this rig, so this runs the REAL 8-way data-parallel graph
(params replicated, batch sharded, XLA gradient psum over the mesh — the
same `make_parallel_train_step` path a real v5e-8 slice would jit) on
8 virtual CPU devices.

What this measures: that the reference-scale global-batch-8 distributed
step compiles and executes with finite loss. CPU wall time is NOT a TPU
s/it — the honest per-chip number is train_bench.py's single-chip batch-1
measurement (the per-chip slice of this exact run); ICI gradient psum for
~58M params of fp32 grads adds ~2 ms/step on a v5e torus, so projected
global-batch-8 s/it ~= single-chip batch-1 s/it.

Usage: python benchmarks/mesh_train_bench.py [--devices 8] [--batch 8]
       [--seq 17] [--hw 129 129] [--steps 2]
(defaults keep the CPU run tractable on a 1-core host: reference seq/batch,
reduced crop; pass --hw 465 465 on a many-core host for full scale)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_flags = os.environ.get("XLA_FLAGS", "")
if "collective_call_terminate_timeout" not in _flags:
    _flags += (" --xla_cpu_collective_call_terminate_timeout_seconds=3600"
               " --xla_cpu_collective_call_warn_stuck_timeout_seconds=1800")
if "host_platform_device_count" not in _flags:
    _flags += " --xla_force_host_platform_device_count=8"
os.environ["XLA_FLAGS"] = _flags.strip()

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=17)
    ap.add_argument("--hw", type=int, nargs=2, default=(129, 129))
    ap.add_argument("--model", default="r50_deaotl")
    ap.add_argument("--stage", default="pre_vost_2")
    ap.add_argument("--steps", type=int, default=2)
    args = ap.parse_args()

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    from rmem_tpu.utils import enable_compilation_cache
    enable_compilation_cache("/tmp/rmem_tpu_jax_cache_cpu")

    from rmem_tpu.config import get_config
    from rmem_tpu.engine.train_state import (TrainState, make_optimizer,
                                             make_train_step)
    from rmem_tpu.models import build_vos_model, init_params
    from rmem_tpu.ops.masks import host_id_shuffle_matrix
    from rmem_tpu.parallel import (make_mesh, make_parallel_train_step,
                                   shard_batch)
    from rmem_tpu.parallel.mesh import batch_sharding

    devs = jax.devices()
    assert len(devs) >= args.devices, (len(devs), args.devices)
    hw = tuple(args.hw)
    cfg = get_config(args.stage, model=args.model, data_seq_len=args.seq,
                     train_batch_size=args.batch,
                     use_pallas_bank_attention_train=False)
    model = build_vos_model(cfg.model_vos, cfg)
    params = init_params(model, jax.random.PRNGKey(0), hw)
    tx = make_optimizer(params, cfg)
    state = TrainState.create(params, cfg)
    mesh = make_mesh((args.devices,), ("data",))
    pstep = make_parallel_train_step(make_train_step(model, cfg, tx), mesh)

    rng = np.random.RandomState(0)
    b, t = args.batch, args.seq
    labels = np.zeros((b, t, *hw), np.int32)
    labels[:, :, hw[0] // 4: 3 * hw[0] // 4, hw[1] // 4: 3 * hw[1] // 4] = 1
    batch = shard_batch(
        {"imgs": jnp.asarray(rng.rand(b, t, *hw, 3), jnp.float32),
         "labels": jnp.asarray(labels),
         "obj_nums": jnp.asarray([1] * b)}, mesh)
    shuffle = jax.device_put(
        host_id_shuffle_matrix(rng, cfg.model_max_obj_num + 1, b),
        batch_sharding(mesh))

    times = []
    loss = None
    for i in range(args.steps):
        t0 = time.perf_counter()
        state, metrics = pstep(state, batch, shuffle)
        loss = float(metrics["loss"])
        times.append(time.perf_counter() - t0)
        print(f"step {i}: loss={loss:.4f} wall={times[-1]:.1f}s", flush=True)
    assert np.isfinite(loss)
    print(json.dumps({
        "metric": "mesh_train_step", "model": args.model,
        "devices": args.devices, "global_batch": args.batch,
        "seq": args.seq, "hw": list(hw), "loss": round(loss, 4),
        "warm_wall_s": round(times[-1], 2),
        "note": "virtual CPU mesh functional validation; not a TPU s/it",
    }))


if __name__ == "__main__":
    main()
