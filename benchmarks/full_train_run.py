"""Full reference-scale training schedule on the real chip.

Runs the REAL Trainer (meters, checkpoint rotation with max-keep, separate
EMA stream, auto-resume) for the reference's VOST fine-tune budget — 20k
steps, r50_deaotl, seq_len 17, batch 1 (train_vost.sh:3-27,
configs/pre_vost_2.py:13-16) — as a single-chip schedule at the measured
~0.28 s/it (VERDICT r3 Next #2 / Missing #2).

Data is a device-resident pool of synthetic clips uploaded ONCE and cycled:
the tunneled H2D link (~34 MB/s) cannot stream the 44 MB/step a real
dataset would need, and what this run must prove is the trainer loop
(loss curve, rotation, EMA, resume over hours), not the data pipeline —
which has its own tests. The reference's DataLoader workers keep a
co-located GPU fed the same way (trainer.py:373-393).

Kill the process mid-run and rerun with the same --dir to exercise
auto-resume at scale; the log (appended, timestamped) records both halves.

Usage:
  python benchmarks/full_train_run.py --steps 20000 --dir /root/fullrun
  # ... SIGKILL around step 10k ...
  python benchmarks/full_train_run.py --steps 20000 --dir /root/fullrun
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _PoolLoader:
    """Cycles a fixed pool of pre-sharded (device-resident) batches. The
    feeder's shard_batch(device_put) sees already-committed arrays with the
    target sharding and forwards them without a transfer."""

    def __init__(self, pool):
        self.pool = pool
        self.i = 0

    def __next__(self):
        b = self.pool[self.i % len(self.pool)]
        self.i += 1
        return b

    def close(self):
        pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--dir", default="/root/fullrun")
    ap.add_argument("--pool", type=int, default=8)
    ap.add_argument("--model", default="r50_deaotl")
    ap.add_argument("--hw", type=int, nargs=2, default=(465, 465))
    ap.add_argument("--seq_len", type=int, default=17)
    ap.add_argument("--log_step", type=int, default=20)
    args = ap.parse_args()

    from rmem_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from rmem_tpu.config import get_config
    from rmem_tpu.managers.trainer import Trainer
    from rmem_tpu.parallel import shard_batch

    cfg = get_config(
        "pre_vost_2", "fullrun", args.model,
        datasets=("test",), pretrain=False, train_auto_resume=True,
        dir_root=args.dir, train_total_steps=args.steps,
        data_seq_len=args.seq_len, data_randomcrop=tuple(args.hw),
        train_batch_size=1, train_log_step=args.log_step,
        data_workers=0)

    log_path = os.path.join(args.dir, "train_log.txt")
    os.makedirs(args.dir, exist_ok=True)
    logf = open(log_path, "a", buffering=1)

    def log(*a):
        line = " ".join(str(x) for x in a)
        stamp = datetime.datetime.now().strftime("%H:%M:%S")
        print(f"[{stamp}] {line}", flush=True)
        logf.write(f"[{stamp}] {line}\n")

    log(f"=== launch: steps={args.steps} pool={args.pool} "
        f"hw={args.hw} seq={args.seq_len} pid={os.getpid()} ===")
    tr = Trainer(cfg, log=log)

    # build the device-resident pool from the real synthetic loader, then
    # swap it in (uploaded once; ~44 MB per batch at 465x465 seq-17)
    host_batches = [next(tr.loader) for _ in range(args.pool)]
    tr.loader.close()
    pool = [shard_batch(b, tr.mesh) for b in host_batches]
    import jax
    jax.block_until_ready(pool)
    tr.loader = _PoolLoader(pool)
    log(f"pool resident: {args.pool} batches x "
        f"{host_batches[0]['imgs'].nbytes / 1e6:.1f} MB")

    final = tr.train()
    log(f"=== done at step {int(tr.state.step)}: "
        f"{json.dumps({k: round(v, 4) for k, v in final.items()})} ===")


if __name__ == "__main__":
    main()
