"""Worker for test_trainer_resume_continuity: run a tiny Trainer until the
parent SIGKILLs it mid-run (after the first checkpoint lands on disk).

Usage: python _trainer_kill_worker.py DIR_ROOT
"""

import os
import sys


def main():
    dir_root = sys.argv[1]
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=1"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from rmem_tpu.utils import enable_compilation_cache

    enable_compilation_cache("/tmp/rmem_tpu_jax_cache_cpu")

    from rmem_tpu.config import get_config
    from rmem_tpu.managers.trainer import Trainer

    cfg = get_config("test", model="tiny_deaotl", train_total_steps=100,
                     train_batch_size=1, data_seq_len=3, train_log_step=1,
                     train_save_step=2, train_max_keep_ckpt=2,
                     train_auto_resume=True, dir_root=dir_root)
    tr = Trainer(cfg, log=lambda *a: print(*a, flush=True))
    tr.train(max_steps=50)  # parent kills long before this


if __name__ == "__main__":
    main()
