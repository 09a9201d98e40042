"""Trainer: the process-level training loop.

Reference: aot_plus/networks/managers/trainer.py:31-739. Per step: pull a
clip batch, run the jitted data-parallel train step (LR schedule, grad clip,
AdamW, EMA all inside the step), log meters, checkpoint every
train_save_step with max-keep pruning and a separate EMA stream
(trainer.py:697-737). Auto-resume scans the checkpoint dir
(trainer.py:188-260).

One process drives the whole mesh (single-controller JAX) — no mp.spawn, no
DDP, no GradScaler (bf16 needs no loss scaling).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rmem_tpu.config import Config
from rmem_tpu.data.train_datasets import BatchLoader, build_train_dataset
from rmem_tpu.engine.train_state import (TrainState, make_optimizer,
                                         make_train_step)
from rmem_tpu.models import build_vos_model, init_params
from rmem_tpu.parallel import (make_mesh, make_parallel_train_step,
                               shard_batch)
from rmem_tpu.utils.checkpoint import (latest_checkpoint, load_pretrained,
                                       load_pytree, save_checkpoint)


class Trainer:
    def __init__(self, cfg: Config, data_root: Optional[str] = None,
                 log=print):
        self.cfg = cfg
        self.log = log
        self.model = build_vos_model(cfg.model_vos, cfg)
        params = init_params(self.model, jax.random.PRNGKey(1),
                             cfg.data_randomcrop)

        if cfg.pretrain and cfg.pretrain_model:
            if cfg.pretrain_model.endswith(".pth"):
                params, skipped, _ = load_pretrained(
                    params, cfg.pretrain_model, cfg.model_vos,
                    cfg.id_channels)
                self.log(f"loaded {cfg.pretrain_model}; "
                         f"skipped {len(skipped)}")
            else:
                params = load_pytree(params, cfg.pretrain_model)

        self.tx = make_optimizer(params, cfg)
        self.state = TrainState.create(params, cfg)
        self.mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axes)
        self.pstep = make_parallel_train_step(
            make_train_step(self.model, cfg, self.tx), self.mesh)

        self.ckpt_dir = os.path.join(cfg.dir_result, "ckpt")
        self.ema_dir = os.path.join(cfg.dir_result, "ema_ckpt")

        if cfg.train_auto_resume:
            found = latest_checkpoint(self.ckpt_dir)
            if found:
                path, step = found
                self.state = load_pytree(self.state, path)
                self.log(f"auto-resumed from {path} (step {step})")

        dataset = build_train_dataset(cfg, data_root)
        self.loader = BatchLoader(dataset, cfg.train_batch_size,
                                  max_obj=cfg.model_max_obj_num,
                                  num_threads=min(cfg.data_workers, 4))

    def train(self, max_steps: Optional[int] = None) -> Dict[str, float]:
        cfg = self.cfg
        total = max_steps or cfg.train_total_steps
        rng = np.random.RandomState(cfg.train_start_step + 7)
        t_last = time.perf_counter()
        metrics = {}
        from rmem_tpu.ops.masks import host_id_shuffle_matrix
        from rmem_tpu.parallel.mesh import batch_sharding
        bsh = batch_sharding(self.mesh)
        while int(self.state.step) < total:
            batch = shard_batch(next(self.loader), self.mesh)
            shuffle = jax.device_put(host_id_shuffle_matrix(
                rng, cfg.model_max_obj_num + 1, cfg.train_batch_size), bsh)
            self.state, metrics = self.pstep(self.state, batch, shuffle)
            step = int(self.state.step)
            if step % cfg.train_log_step == 0:
                m = {k: float(v) for k, v in metrics.items()}
                dt = time.perf_counter() - t_last
                t_last = time.perf_counter()
                eta_s = dt / cfg.train_log_step * (total - step)
                self.log(f"step {step}/{total} loss {m['loss']:.4f} "
                         f"(aux {m['aux_loss']:.4f} w={m['aux_weight']:.2f}) "
                         f"gnorm {m['grad_norm']:.2f} "
                         f"{dt / cfg.train_log_step:.2f}s/it "
                         f"ETA {eta_s / 3600:.1f}h")
            if step % cfg.train_save_step == 0:
                self.save(step)
        self.loader.close()
        return {k: float(v) for k, v in metrics.items()}

    def save(self, step: int):
        save_checkpoint(self.state, self.ckpt_dir, step,
                        self.cfg.train_max_keep_ckpt)
        # separate EMA weight stream (trainer.py:718-734)
        save_checkpoint(self.state.ema_params, self.ema_dir, step,
                        self.cfg.train_max_keep_ckpt, prefix="ema_step_")
        self.log(f"saved checkpoint at step {step}")
