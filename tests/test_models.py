"""Model-level equivalences: merged sibling projections == separate Dense.

The merged path (config.merged_projections) concatenates the kernels of
projections that read the same activation and runs ONE dot
(models/gpm.py:DenseParams/merged_dense). Param tree paths/shapes are
unchanged, so the SAME param dict must drive both formulations to equal
outputs (per-output-column matmuls are independent).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rmem_tpu.config import get_config
from rmem_tpu.engine import InferenceEngine
from rmem_tpu.models import build_vos_model, init_params

HW = (49, 49)


def _build(merged: bool):
    cfg = get_config("pre_vost", model="tiny_deaotl",
                     merged_projections=merged, latter_mem_len=2)
    model = build_vos_model(cfg.model_vos, cfg)
    params = init_params(model, jax.random.PRNGKey(0), HW)
    return cfg, model, params


def test_merged_projections_same_param_tree():
    _, _, p0 = _build(False)
    _, _, p1 = _build(True)
    f0 = jax.tree_util.tree_leaves_with_path(p0)
    f1 = jax.tree_util.tree_leaves_with_path(p1)
    assert [k for k, _ in f0] == [k for k, _ in f1]
    for (k, a), (_, b) in zip(f0, f1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(k))


def test_merged_projections_exact():
    """Full engine loop (reference frame + propagate + update) produces the
    same logits with merged and separate projections from the SAME params."""
    cfg0, model0, params = _build(False)
    cfg1, model1, _ = _build(True)

    rng = np.random.RandomState(3)
    imgs = rng.rand(4, 1, *HW, 3).astype(np.float32)
    mask = np.zeros((1, *HW), np.int32)
    mask[:, 10:25, 10:25] = 1

    outs = []
    for cfg, model in ((cfg0, model0), (cfg1, model1)):
        eng = InferenceEngine(model, params, cfg, donate=False,
                              cast_params=False)
        state, logits = eng.add_reference(jnp.asarray(imgs[0]),
                                          jnp.asarray(mask), [1], gap=1)
        seq = [np.asarray(logits)]
        for t in range(1, 4):
            state, logits = eng.propagate(state, jnp.asarray(imgs[t]))
            full = eng.predict_logits_at(logits, HW)
            label = jnp.argmax(full, axis=-1).astype(jnp.int32)
            state = eng.update_memory(state, label)
            seq.append(np.asarray(logits))
        outs.append(seq)

    for t, (a, b) in enumerate(zip(*outs)):
        np.testing.assert_array_equal(a, b, err_msg=f"frame {t}")
