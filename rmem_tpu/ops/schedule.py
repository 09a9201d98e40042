"""LR schedule: poly (power 0.9) or cosine decay with linear warmup.

Reference: aot_plus/utils/learning.py:4-46. Returned as a pure function of
the step so it can live inside the jitted train step (optax-compatible).
"""

from __future__ import annotations

import jax.numpy as jnp


def make_lr_schedule(base_lr: float, min_lr: float, total_steps: int,
                     power: float = 0.9, warmup_ratio: float = 0.05,
                     cosine: bool = False, restarts: int = 1):
    warm_up_steps = total_steps * warmup_ratio

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        max_itr = float(total_steps)
        wu = warm_up_steps
        if restarts > 1:
            each = jnp.ceil(max_itr / restarts)
            step = jnp.mod(step, each)
            wu = warm_up_steps / restarts
            max_itr = each
        warm = min_lr + (base_lr - min_lr) * step / jnp.maximum(wu, 1.0)
        it = step - wu
        mx = max_itr - wu
        if cosine:
            decay = min_lr + (base_lr - min_lr) * (
                jnp.cos(jnp.pi * it / (mx + 1.0)) + 1.0) * 0.5
        else:
            decay = min_lr + (base_lr - min_lr) * (
                jnp.maximum(1.0 - it / (mx + 1.0), 0.0) ** power)
        return jnp.where(step < wu, warm, decay)

    return schedule


def encoder_lr(now_lr, min_lr: float, encoder_ratio: float):
    """Encoder param-group LR: (lr - min) * ratio + min (learning.py:35-37)."""
    return (now_lr - min_lr) * encoder_ratio + min_lr
