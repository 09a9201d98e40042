"""Multi-host TRAIN path under 2 REAL jax.distributed processes (VERDICT r4
Next #8): the data-parallel train step's gradient all-reduce crosses the
gloo process boundary, and loss + every updated param must match the
in-process 2-device mesh run at the same global batch — the train-side twin
of test_multihost_eval (reference DDP contract: trainer.py:92-109)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from tests._multihost_common import run_pair

HW = (33, 33)


def _reference_params_and_losses():
    """Same 3 steps on an in-process 2-device submesh (conftest provides 8
    virtual devices) — the exact setup test_parallel_train_step_multidev
    already pins against single-device."""
    from rmem_tpu.config import get_config
    from rmem_tpu.engine.train_state import (TrainState, make_optimizer,
                                             make_train_step)
    from rmem_tpu.models import build_vos_model, init_params
    from rmem_tpu.ops.masks import host_id_shuffle_matrix
    from rmem_tpu.parallel import (make_mesh, make_parallel_train_step,
                                   shard_batch)

    cfg = get_config("test", model="tiny_deaotl", train_total_steps=100,
                     compute_dtype="float32")
    model = build_vos_model(cfg.model_vos, cfg)
    params = init_params(model, jax.random.PRNGKey(0), HW)
    tx = make_optimizer(params, cfg)
    state = TrainState.create(params, cfg)
    mesh = make_mesh((2,), ("data",))
    pstep = make_parallel_train_step(make_train_step(model, cfg, tx), mesh)

    rng = np.random.RandomState(0)
    imgs = rng.rand(2, 2, *HW, 3).astype(np.float32)
    labels = np.zeros((2, 2, *HW), np.int32)
    labels[:, :, 12:30, 12:30] = 1
    batch_np = {"imgs": imgs, "labels": labels,
                "obj_nums": np.asarray([1, 1], np.int32)}
    shuffle = jnp.asarray(host_id_shuffle_matrix(np.random.RandomState(0),
                                                 11, 2))
    losses = []
    for _ in range(3):
        state, metrics = pstep(state, shard_batch(batch_np, mesh), shuffle)
        losses.append(float(metrics["loss"]))
    flat = jax.tree_util.tree_leaves_with_path(state.params)
    return {jax.tree_util.keystr(p): np.asarray(leaf, np.float32)
            for p, leaf in flat}, losses


def test_two_process_train_matches_in_process(tmp_path):
    run_pair(tmp_path, "_multihost_train_worker.py")
    res = []
    for pid in range(2):
        with open(os.path.join(str(tmp_path), f"p{pid}.json")) as f:
            res.append(json.load(f))
    assert all(r["process_count"] == 2 for r in res)
    assert all(r["n_devices"] == 2 for r in res)
    # both processes observed the identical (allreduced) loss trajectory
    assert res[0]["losses"] == res[1]["losses"]
    assert all(np.isfinite(res[0]["losses"]))
    assert res[0]["losses"][-1] < res[0]["losses"][0]

    p0 = np.load(os.path.join(str(tmp_path), "params_p0.npz"))
    p1 = np.load(os.path.join(str(tmp_path), "params_p1.npz"))
    assert set(p0.files) == set(p1.files)
    for k in p0.files:  # replicated params stay bit-synchronized
        np.testing.assert_array_equal(p0[k], p1[k], err_msg=k)

    ref_params, ref_losses = _reference_params_and_losses()
    np.testing.assert_allclose(res[0]["losses"], ref_losses, rtol=2e-4)
    assert set(ref_params) == set(p0.files)
    for k, v in ref_params.items():
        np.testing.assert_allclose(p0[k], v, atol=2e-5, err_msg=k)
