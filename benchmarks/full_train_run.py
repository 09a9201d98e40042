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


def _blob_pool(n_batches, seq_len, hw, seed=0):
    """Varied synthetic clips: smooth noise background + moving bright
    blobs whose masks are the labels. The reference's TEST dataset
    (constant zero images / ones labels, train_datasets.py:821-854) is
    memorized within ~2k steps, flat-lining the loss curve this run is
    meant to record; these clips keep the optimization problem non-trivial
    for the full 20k-step schedule while remaining fully synthetic (no
    dataset download on the egress-less rig)."""
    import numpy as np

    from rmem_tpu.data.transforms import normalize_image

    h, w = hw
    rng = np.random.RandomState(seed)
    batches = []
    for b in range(n_batches):
        base = rng.rand(h // 8 + 2, w // 8 + 2, 3)
        imgs = np.empty((seq_len, h, w, 3), np.float32)
        labels = np.zeros((seq_len, h, w), np.int32)
        n_obj = int(rng.randint(2, 4))
        cy = rng.rand(n_obj) * h
        cx = rng.rand(n_obj) * w
        vy = rng.randn(n_obj) * 4
        vx = rng.randn(n_obj) * 4
        r = rng.randint(25, 60, size=n_obj)
        yy, xx = np.mgrid[0:h, 0:w]
        for t in range(seq_len):
            import cv2
            fr = cv2.resize((base * 255).astype(np.uint8), (w, h),
                            interpolation=cv2.INTER_LINEAR)
            lab = np.zeros((h, w), np.int32)
            for i in range(n_obj):
                py = (cy[i] + vy[i] * t) % h
                px = (cx[i] + vx[i] * t) % w
                m = ((yy - py) ** 2 + (xx - px) ** 2) < r[i] ** 2
                fr[m] = (40 * (i + 1), 255 - 60 * i, 128)
                lab[m] = i + 1
            imgs[t] = normalize_image(fr)
            labels[t] = lab
        batches.append({"imgs": imgs[None], "labels": labels[None],
                        "obj_nums": np.asarray([n_obj], np.int32)})
    return batches


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--dir", default="/root/fullrun")
    ap.add_argument("--pool", type=int, default=16)
    ap.add_argument("--data", choices=("blobs", "test", "devgen"),
                    default="blobs",
                    help="devgen = UNBOUNDED on-device procedural clips "
                         "(rmem_tpu.data.synthetic): a fresh clip every "
                         "step, zero H2D, non-memorizable (VERDICT r4 "
                         "Next #5a)")
    ap.add_argument("--model", default="r50_deaotl")
    ap.add_argument("--hw", type=int, nargs=2, default=(465, 465))
    ap.add_argument("--seq_len", type=int, default=17)
    ap.add_argument("--log_step", type=int, default=20)
    ap.add_argument("--batch", type=int, default=1,
                    help="GLOBAL batch size (sharded over the mesh)")
    ap.add_argument("--cpu_devices", type=int, default=0,
                    help="force the CPU platform with N virtual devices and "
                         "run the REAL Trainer loop (meters, EMA, ckpt "
                         "rotation) under an N-way data-parallel SPMD mesh "
                         "— the reference's 4-GPU global-batch-8 schedule "
                         "shape (train_vost.sh:3-27) on a rig with one chip "
                         "(VERDICT r4 Next #5b)")
    ap.add_argument("--save_step", type=int, default=0,
                    help="override train_save_step (0 = preset default)")
    args = ap.parse_args()

    if args.cpu_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            flags += (" --xla_force_host_platform_device_count="
                      f"{args.cpu_devices}")
        if "collective_call_terminate_timeout" not in flags:
            flags += (" --xla_cpu_collective_call_terminate_timeout_seconds"
                      "=3600"
                      " --xla_cpu_collective_call_warn_stuck_timeout_seconds"
                      "=1800")
        os.environ["XLA_FLAGS"] = flags.strip()
        import jax
        jax.config.update("jax_platforms", "cpu")

    from rmem_tpu.utils import enable_compilation_cache
    enable_compilation_cache("/tmp/rmem_tpu_jax_cache_cpu"
                             if args.cpu_devices
                             else "/tmp/rmem_tpu_jax_cache")
    from rmem_tpu.config import get_config
    from rmem_tpu.managers.trainer import Trainer
    from rmem_tpu.parallel import shard_batch

    cfgkw = {}
    if args.cpu_devices:
        cfgkw["mesh_shape"] = (args.cpu_devices,)
    if args.save_step:
        cfgkw["train_save_step"] = args.save_step
    cfg = get_config(
        "pre_vost_2", "fullrun", args.model,
        datasets=("test",), pretrain=False, train_auto_resume=True,
        dir_root=args.dir, train_total_steps=args.steps,
        data_seq_len=args.seq_len, data_randomcrop=tuple(args.hw),
        train_batch_size=args.batch, train_log_step=args.log_step,
        data_workers=0, **cfgkw)

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

    if args.data == "devgen":
        # unbounded on-device generation: batch i is a pure function of
        # (seed, i), so the resumed process regenerates the same stream
        from rmem_tpu.data.synthetic import DeviceGenLoader
        tr.loader.close()
        tr.loader = DeviceGenLoader(args.batch, args.seq_len, tuple(args.hw),
                                    start=int(tr.state.step))
        log(f"devgen loader: unbounded on-device clips from step "
            f"{int(tr.state.step)}")
    else:
        assert args.batch == 1, "--batch >1 requires --data devgen"
        # build the device-resident pool, then swap it in (uploaded once;
        # ~44 MB per batch at 465x465 seq-17)
        if args.data == "blobs":
            host_batches = _blob_pool(args.pool, args.seq_len,
                                      tuple(args.hw))
        else:
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
