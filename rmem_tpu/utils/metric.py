"""Online training metrics (aot_plus/utils/metric.py:4-36, meters.py)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def pytorch_iou_batched(pred: jnp.ndarray, target: jnp.ndarray,
                        obj_nums: jnp.ndarray, max_obj: int,
                        epsilon: float = 1e-6) -> jnp.ndarray:
    """Jit-friendly train-time IoU with the reference's exact semantics
    (metric.py:4-36): per batch item, mean foreground IoU over that item's
    objects; items with zero objects are skipped; all-background batches
    return 1. pred/target [B,H,W] int; obj_nums [B]. Returns a scalar."""
    obj_ids = jnp.arange(1, max_obj + 1)
    p = pred[:, None] == obj_ids[None, :, None, None]     # [B,O,H,W]
    t = target[:, None] == obj_ids[None, :, None, None]
    inter = jnp.sum(p & t, axis=(-2, -1)).astype(jnp.float32)
    union = jnp.sum(p | t, axis=(-2, -1)).astype(jnp.float32)
    iou = (inter + epsilon) / (union + epsilon)           # [B,O]
    valid = (obj_ids[None, :] <= obj_nums[:, None])
    per_item = jnp.sum(iou * valid, -1) / jnp.maximum(
        jnp.sum(valid, -1), 1)
    has = (obj_nums > 0).astype(jnp.float32)
    mean = jnp.sum(per_item * has) / jnp.maximum(jnp.sum(has), 1.0)
    return jnp.where(jnp.sum(has) > 0, mean, 1.0)


def pytorch_iou(pred: jnp.ndarray, target: jnp.ndarray, obj_num: int,
                epsilon: float = 1e-6) -> jnp.ndarray:
    """Mean foreground IoU between predicted and GT label maps
    (metric.py:4-36). pred/target [B,H,W] int."""
    ious = []
    for obj in range(1, obj_num + 1):
        p = pred == obj
        t = target == obj
        inter = jnp.sum(p & t, axis=(-2, -1)).astype(jnp.float32)
        union = jnp.sum(p | t, axis=(-2, -1)).astype(jnp.float32)
        ious.append((inter + epsilon) / (union + epsilon))
    return jnp.mean(jnp.stack(ious), axis=0)


class AverageMeter:
    """Windowed moving average (aot_plus/utils/meters.py)."""

    def __init__(self, window: int = 100):
        self.window = window
        self.reset()

    def reset(self):
        self.vals = []

    def update(self, v: float):
        self.vals.append(float(v))
        if len(self.vals) > self.window:
            self.vals.pop(0)

    @property
    def avg(self) -> float:
        return float(np.mean(self.vals)) if self.vals else 0.0
