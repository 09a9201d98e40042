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
from rmem_tpu.data.train_datasets import make_batch_loader, build_train_dataset
from rmem_tpu.engine.train_state import (TrainState, make_optimizer,
                                         make_train_step)
from rmem_tpu.models import build_vos_model, init_params
from rmem_tpu.parallel import (make_mesh, make_parallel_train_step,
                               shard_batch)
from rmem_tpu.utils.checkpoint import (load_latest_checkpoint,
                                       load_pretrained, load_pytree,
                                       save_checkpoint)


class Trainer:
    def __init__(self, cfg: Config, data_root: Optional[str] = None,
                 log=print):
        # grouped-conv DWConv for training (the unrolled inference form
        # bloats the backward graph; params are interchangeable)
        cfg = cfg.replace(dwconv_unrolled=False)
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
            found = load_latest_checkpoint(self.state, self.ckpt_dir,
                                           log=self.log)
            if found:
                self.state, step, path = found
                self.log(f"auto-resumed from {path} (step {step})")

        dataset = build_train_dataset(cfg, data_root)
        self.loader = make_batch_loader(
            dataset, cfg.train_batch_size, max_obj=cfg.model_max_obj_num,
            num_workers=min(cfg.data_workers, 4),
            use_processes=cfg.data_loader_processes)

    def _device_batches(self, rng):
        """Depth-1 background H2D feeder: batch i+1's host->device transfer
        (100+ MB at batch 4, reference scale) streams on this thread while
        step i computes — the step dispatch is async, so without this the
        synchronous device_put serializes with compute on slow transports.
        The shuffle matrices are drawn sequentially on this single thread,
        so their order stays deterministic."""
        import queue as q_mod
        import threading

        from rmem_tpu.ops.masks import host_id_shuffle_matrix
        from rmem_tpu.parallel.mesh import batch_sharding
        cfg = self.cfg
        bsh = batch_sharding(self.mesh)
        out: "q_mod.Queue" = q_mod.Queue(maxsize=1)
        stop = threading.Event()

        def feeder():
            while not stop.is_set():
                try:
                    batch = shard_batch(next(self.loader), self.mesh)
                    shuffle = jax.device_put(host_id_shuffle_matrix(
                        rng, cfg.model_max_obj_num + 1,
                        cfg.train_batch_size), bsh)
                    out.put((batch, shuffle))
                except BaseException as e:
                    out.put(e)
                    return

        threading.Thread(target=feeder, daemon=True).start()
        try:
            while True:
                item = out.get()
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            try:  # unblock a feeder stuck on put()
                out.get_nowait()
            except Exception:
                pass

    def train(self, max_steps: Optional[int] = None) -> Dict[str, float]:
        cfg = self.cfg
        total = max_steps or cfg.train_total_steps
        rng = np.random.RandomState(cfg.train_start_step + 7)
        t_last = time.perf_counter()
        metrics = {}
        batches = self._device_batches(rng)
        while int(self.state.step) < total:
            batch, shuffle = next(batches)
            self.state, metrics = self.pstep(self.state, batch, shuffle)
            step = int(self.state.step)
            if step % cfg.train_log_step == 0:
                m = {k: np.asarray(v) for k, v in metrics.items()}
                # per-frame-position loss/IoU meters (trainer.py:635-653);
                # sampled at log steps — a per-step device sync would pay
                # the dispatch round-trip every iteration
                self._update_meters(m)
                dt = time.perf_counter() - t_last
                t_last = time.perf_counter()
                eta_s = dt / cfg.train_log_step * (total - step)
                self.log(f"step {step}/{total} loss {m['loss']:.4f} "
                         f"(aux {m['aux_loss']:.4f} w={m['aux_weight']:.2f}) "
                         f"iou {float(m['iou']) * 100:.1f} "
                         f"gnorm {m['grad_norm']:.2f} "
                         f"{dt / cfg.train_log_step:.2f}s/it "
                         f"ETA {eta_s / 3600:.1f}h")
            if (cfg.train_tblog_step
                    and step % cfg.train_tblog_step == 0):
                self._dump_images(batch, metrics["pred_label_last"], step)
            if step % cfg.train_save_step == 0:
                self.save(step)
        batches.close()
        self.loader.close()
        return {k: float(v) for k, v in metrics.items()
                if np.ndim(v) == 0}

    def _update_meters(self, m: Dict[str, np.ndarray]):
        from rmem_tpu.utils.metric import AverageMeter
        lpf, ipf = m["loss_per_frame"], m["iou_per_frame"]
        if not hasattr(self, "loss_meters"):
            self.loss_meters = [AverageMeter() for _ in range(len(lpf))]
            self.iou_meters = [AverageMeter() for _ in range(len(ipf))]
        for meter, v in zip(self.loss_meters, lpf):
            meter.update(float(v))
        for meter, v in zip(self.iou_meters, ipf):
            meter.update(float(v) * 100.0)

    def frame_meter_summary(self) -> Dict[str, list]:
        """Per-frame-position running means (reference running_losses /
        running_ious, trainer.py:635-653)."""
        if not hasattr(self, "loss_meters"):
            return {"loss_per_frame": [], "iou_per_frame": []}
        return {"loss_per_frame": [mt.avg for mt in self.loss_meters],
                "iou_per_frame": [mt.avg for mt in self.iou_meters]}

    def _dump_images(self, batch, pred_label_last, step: int):
        """Overlay-image logging (reference TB image logs,
        trainer.py:745-862): last frame's input, GT, and prediction as
        palettized PNGs under <result>/img_logs/."""
        from rmem_tpu.utils.image import _save_mask as save_mask_png
        out = os.path.join(self.cfg.dir_result, "img_logs")
        os.makedirs(out, exist_ok=True)
        imgs = np.asarray(batch["imgs"][0, -1])  # [H,W,3] float
        gt = np.asarray(batch["labels"][0, -1]).astype(np.uint8)
        pred = np.asarray(pred_label_last[0]).astype(np.uint8)
        lo, hi = float(imgs.min()), float(imgs.max())
        u8 = ((imgs - lo) / max(hi - lo, 1e-6) * 255).astype(np.uint8)
        from PIL import Image
        Image.fromarray(u8).save(os.path.join(out, f"{step:08d}_img.png"))
        save_mask_png(np.where(gt == 255, 0, gt),
                      os.path.join(out, f"{step:08d}_gt.png"))
        save_mask_png(pred, os.path.join(out, f"{step:08d}_pred.png"))

    def save(self, step: int):
        save_checkpoint(self.state, self.ckpt_dir, step,
                        self.cfg.train_max_keep_ckpt)
        # separate EMA weight stream (trainer.py:718-734)
        save_checkpoint(self.state.ema_params, self.ema_dir, step,
                        self.cfg.train_max_keep_ckpt, prefix="ema_step_")
        self.log(f"saved checkpoint at step {step}")
