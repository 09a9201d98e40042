"""Worker for test_multihost_eval: one of two jax.distributed CPU processes
running the real Evaluator with length-aware host sharding + allreduce_stats.

Usage: python _multihost_eval_worker.py PORT PID OUTDIR [claim]

With the optional `claim` arg, runs the dynamic-tail mode: LPT bulk +
shared-FS claim directory (eval_sharding.split_bulk_tail/claim_next).
"""

import json
import os
import sys


def main():
    port, pid, outdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    claim_mode = len(sys.argv) > 4 and sys.argv[4] == "claim"
    # Written BEFORE the heavy imports so the peer's barrier loop can detect
    # this process dying during startup (model build, compiles) instead of
    # blocking out its full 900 s deadline (ADVICE r4).
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

    from rmem_tpu.config import get_config
    from rmem_tpu.data.eval_datasets import sequence_lengths
    from rmem_tpu.managers.evaluator import Evaluator
    from rmem_tpu.models import build_vos_model, init_params
    from rmem_tpu.parallel.eval_sharding import host_sequence_indices

    cfg = get_config("test", model="tiny_deaotl", test_dataset="test",
                     test_ckpt_path="test")
    model = build_vos_model(cfg.model_vos, cfg)
    params = init_params(model, jax.random.PRNGKey(0))
    ev = Evaluator(cfg, params=params,
                   output_root=os.path.join(outdir, f"masks_p{pid}"),
                   log=lambda *a: None)
    # File barrier: align both processes BEFORE the first collective.
    # gloo's context handshake has a fixed ~30 s deadline, and on a loaded
    # 1-core host the two workers' startup (imports + model build) can skew
    # by more than that — evaluate()'s warmup allreduce then times out
    # through no fault of the eval path. Test-scoped; production multi-host
    # launches start in lockstep via the cluster scheduler.
    import time
    open(os.path.join(outdir, f"ready_{pid}"), "w").close()
    other = os.path.join(outdir, f"ready_{1 - pid}")
    peer_ospid_file = os.path.join(outdir, f"ospid_{1 - pid}")
    deadline = time.time() + 900
    while not os.path.exists(other):
        if time.time() > deadline:
            raise TimeoutError("peer worker never became ready")
        if os.path.exists(peer_ospid_file):
            # Abort promptly if the peer died before reaching the barrier
            # (e.g. crashed during model build) instead of waiting 900 s.
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

    lengths = sequence_lengths(ev.dataset)
    indices = host_sequence_indices(len(ev.dataset), lengths=lengths)
    if claim_mode:
        # tail_frac 0.4: with 3 equal-length sequences the shortest one is
        # held back for runtime claiming; bulk LPT spreads the other two
        stats = ev.evaluate(max_frames=4,
                            claim_dir=os.path.join(outdir, "claims"),
                            tail_frac=0.4)
    else:
        stats = ev.evaluate(max_frames=4)

    with open(os.path.join(outdir, f"p{pid}.json"), "w") as f:
        json.dump({
            "pid": pid,
            "process_count": jax.process_count(),
            "indices": indices,
            "stats": {k: v for k, v in stats.items()
                      if k != "per_seq_fps"},
            "seq_names": sorted(stats["per_seq_fps"]),
        }, f)


if __name__ == "__main__":
    main()
