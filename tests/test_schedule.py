"""LR schedule + EMA semantics vs the reference formulas
(aot_plus/utils/learning.py:4-46, utils/ema.py:51-55)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from rmem_tpu.engine.train_state import ema_update
from rmem_tpu.ops.schedule import encoder_lr, make_lr_schedule


def _ref_lr(base_lr, min_lr, p, itr, max_itr, warm_up, cosine):
    """Independent re-derivation of adjust_learning_rate."""
    if itr < warm_up:
        return min_lr + (base_lr - min_lr) * itr / warm_up
    itr = itr - warm_up
    max_itr = max_itr - warm_up
    if cosine:
        return min_lr + (base_lr - min_lr) * (
            math.cos(math.pi * itr / (max_itr + 1)) + 1.0) * 0.5
    return min_lr + (base_lr - min_lr) * (1 - itr / (max_itr + 1)) ** p


@pytest.mark.parametrize("cosine", [False, True])
def test_lr_schedule_matches_reference(cosine):
    base, mn, total, power, wu_ratio = 2e-4, 1e-5, 20000, 0.9, 0.05
    sched = make_lr_schedule(base, mn, total, power, wu_ratio, cosine)
    wu = total * wu_ratio
    for step in (0, 100, 999, 1000, 5000, 19999):
        ref = _ref_lr(base, mn, power, step, total, wu, cosine)
        np.testing.assert_allclose(float(sched(step)), ref, rtol=1e-5)


def test_encoder_lr_ratio():
    # (lr - min) * ratio + min (learning.py:35-37)
    np.testing.assert_allclose(float(encoder_lr(2e-4, 1e-5, 0.1)),
                               (2e-4 - 1e-5) * 0.1 + 1e-5)


def test_ema_warmup_decay():
    """decay = min(1 - 1/(total*ratio), (1+n)/(10+n)) (ema.py:51-55)."""
    p0 = {"w": jnp.asarray(0.0)}
    p1 = {"w": jnp.asarray(1.0)}
    total, ratio = 20000, 0.1
    # early step: warmup decay dominates
    n = 5
    out = ema_update(p0, p1, jnp.int32(n), total, ratio)
    d = (1 + n) / (10 + n)
    np.testing.assert_allclose(float(out["w"]), (1 - d) * 1.0, rtol=1e-6)
    # late step: asymptotic decay 1 - 1/2000
    n = 100000
    out = ema_update(p0, p1, jnp.int32(n), total, ratio)
    d = 1 - 1 / (total * ratio)
    np.testing.assert_allclose(float(out["w"]), (1 - d) * 1.0, rtol=1e-3)
