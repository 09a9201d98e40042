"""Worker for test_multihost_train: one of two jax.distributed CPU processes
running the REAL data-parallel train step (make_parallel_train_step) at
global batch 2 — per-process 1 device — with the gradient all-reduce going
over the gloo cross-process backend (VERDICT r4 Next #8; the train-side twin
of _multihost_eval_worker, closing the last distributed surface exercised
only in-process).

Usage: python _multihost_train_worker.py PORT PID OUTDIR
"""

import json
import os
import sys


def main():
    port, pid, outdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    with open(os.path.join(outdir, f"ospid_{pid}"), "w") as f:
        f.write(str(os.getpid()))
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=1"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600")
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=pid)
    from rmem_tpu.utils import enable_compilation_cache

    enable_compilation_cache("/tmp/rmem_tpu_jax_cache_cpu")

    import jax.numpy as jnp
    import numpy as np

    from rmem_tpu.config import get_config
    from rmem_tpu.engine.train_state import (TrainState, make_optimizer,
                                             make_train_step)
    from rmem_tpu.models import build_vos_model, init_params
    from rmem_tpu.ops.masks import host_id_shuffle_matrix
    from rmem_tpu.parallel import (make_mesh, make_parallel_train_step,
                                   shard_batch)

    HW = (33, 33)
    cfg = get_config("test", model="tiny_deaotl", train_total_steps=100,
                     compute_dtype="float32")
    model = build_vos_model(cfg.model_vos, cfg)
    params = init_params(model, jax.random.PRNGKey(0), HW)
    tx = make_optimizer(params, cfg)
    state = TrainState.create(params, cfg)
    mesh = make_mesh((2,), ("data",))   # 2 global devices, 1 per process
    pstep = make_parallel_train_step(make_train_step(model, cfg, tx), mesh)

    rng = np.random.RandomState(0)
    imgs = rng.rand(2, 2, *HW, 3).astype(np.float32)
    labels = np.zeros((2, 2, *HW), np.int32)
    labels[:, :, 12:30, 12:30] = 1
    batch_np = {"imgs": imgs, "labels": labels,
                "obj_nums": np.asarray([1, 1], np.int32)}
    shuffle = jnp.asarray(host_id_shuffle_matrix(np.random.RandomState(0),
                                                 11, 2))

    # File barrier before the first collective (gloo's context handshake
    # has a fixed ~30 s deadline; startup on the loaded 1-core host skews
    # more than that) + prompt abort if the peer died during startup.
    import time
    open(os.path.join(outdir, f"ready_{pid}"), "w").close()
    other = os.path.join(outdir, f"ready_{1 - pid}")
    peer_ospid_file = os.path.join(outdir, f"ospid_{1 - pid}")
    deadline = time.time() + 900
    while not os.path.exists(other):
        if time.time() > deadline:
            raise TimeoutError("peer worker never became ready")
        if os.path.exists(peer_ospid_file):
            with open(peer_ospid_file) as f:
                peer_ospid = int(f.read() or 0)
            try:
                os.kill(peer_ospid, 0)
            except ProcessLookupError:
                if not os.path.exists(other):
                    raise RuntimeError(
                        f"peer worker (os pid {peer_ospid}) died before "
                        "reaching the startup barrier") from None
        time.sleep(0.25)

    losses = []
    for _ in range(3):
        batch = shard_batch(batch_np, mesh)
        state, metrics = pstep(state, batch, shuffle)
        losses.append(float(metrics["loss"]))

    # final params for leaf-wise comparison with the in-process reference
    flat = jax.tree_util.tree_leaves_with_path(state.params)
    arrs = {jax.tree_util.keystr(path):
            np.asarray(jax.device_get(leaf), np.float32)
            for path, leaf in flat}
    np.savez(os.path.join(outdir, f"params_p{pid}.npz"), **arrs)
    with open(os.path.join(outdir, f"p{pid}.json"), "w") as f:
        json.dump({"pid": pid, "process_count": jax.process_count(),
                   "n_devices": len(jax.devices()),
                   "losses": losses}, f)


if __name__ == "__main__":
    main()
