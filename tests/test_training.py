"""Training step smoke tests: loss finite and decreasing on a synthetic clip;
multi-device data-parallel step on the 8-way virtual CPU mesh."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rmem_tpu.config import get_config
from rmem_tpu.engine.train_state import TrainState, make_optimizer, make_train_step
from rmem_tpu.engine.training import train_forward
from rmem_tpu.models import build_vos_model, init_params
from rmem_tpu.parallel import make_mesh, make_parallel_train_step, shard_batch

HW = (33, 33)


def _batch(b, t, seed=0):
    rng = np.random.RandomState(seed)
    imgs = rng.rand(b, t, *HW, 3).astype(np.float32)
    labels = np.zeros((b, t, *HW), np.int32)
    labels[:, :, 12:30, 12:30] = 1
    labels[:, :, 32:40, 5:20] = 2
    return {"imgs": jnp.asarray(imgs), "labels": jnp.asarray(labels),
            "obj_nums": jnp.asarray([2] * b)}


@pytest.mark.parametrize("model_name", ["tiny_aotl", "tiny_deaotl"])
def test_train_forward_finite(model_name):
    cfg = get_config("test", model=model_name, train_total_steps=100)
    model = build_vos_model(cfg.model_vos, cfg)
    params = init_params(model, jax.random.PRNGKey(0), HW)
    batch = _batch(1, 4)
    loss, metrics = train_forward(
        model, params, batch["imgs"], batch["labels"], batch["obj_nums"],
        jnp.float32(0), None, jnp.asarray(False), cfg)
    assert np.isfinite(float(loss))
    assert float(metrics["aux_weight"]) == pytest.approx(1.0, abs=1e-3)
    # observability outputs (reference per-frame meters, trainer.py:635-653)
    assert metrics["loss_per_frame"].shape == (3,)
    assert metrics["iou_per_frame"].shape == (3,)
    assert 0.0 <= float(metrics["iou"]) <= 1.0
    assert metrics["pred_label_last"].shape == (1, *HW)


def test_train_step_loss_decreases():
    cfg = get_config("test", model="tiny_deaotl", train_total_steps=100,
                     train_lr=1e-3)
    model = build_vos_model(cfg.model_vos, cfg)
    params = init_params(model, jax.random.PRNGKey(0), HW)
    tx = make_optimizer(params, cfg)
    state = TrainState.create(params, cfg)
    step = jax.jit(make_train_step(model, cfg, tx))
    batch = _batch(1, 3)
    from rmem_tpu.ops.masks import host_id_shuffle_matrix
    rng = np.random.RandomState(0)
    losses = []
    for i in range(4):
        shuffle = jnp.asarray(host_id_shuffle_matrix(rng, 11, 1))
        state, metrics = step(state, batch, shuffle)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 4


def test_parallel_train_step_multidev():
    """2-way data parallel == single-device at the same global batch: loss
    and updated params allclose (the DDP correctness contract being
    replaced, reference trainer.py:92-109). The TP test closes the
    dp-vs-dpxtp edge; this closes single-vs-dp."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2+ virtual devices")
    cfg = get_config("test", model="tiny_deaotl", train_total_steps=100,
                     compute_dtype="float32")
    model = build_vos_model(cfg.model_vos, cfg)
    params = init_params(model, jax.random.PRNGKey(0), HW)
    tx = make_optimizer(params, cfg)
    from rmem_tpu.ops.masks import host_id_shuffle_matrix
    shuffle = jnp.asarray(host_id_shuffle_matrix(np.random.RandomState(0),
                                                 11, 2))
    params2 = jax.tree_util.tree_map(jnp.array, params)  # steps donate arg 0

    # single-device step at the full global batch
    state_sd = TrainState.create(params, cfg)
    step_sd = jax.jit(make_train_step(model, cfg, tx))
    st_sd, m_sd = step_sd(state_sd, _batch(2, 2), shuffle)

    # 2-way data-parallel step, same global batch
    state = TrainState.create(params2, cfg)
    mesh = make_mesh((2,), ("data",))
    pstep = make_parallel_train_step(make_train_step(model, cfg, tx), mesh)
    batch = shard_batch(_batch(2, 2), mesh)
    state, metrics = pstep(state, batch, shuffle)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1

    np.testing.assert_allclose(float(metrics["loss"]), float(m_sd["loss"]),
                               rtol=2e-4)
    flat_dp = jax.tree_util.tree_leaves_with_path(state.params)
    flat_sd = dict(jax.tree_util.tree_leaves_with_path(st_sd.params))
    for path, leaf_dp in flat_dp:
        a, b = np.asarray(leaf_dp), np.asarray(flat_sd[path])
        np.testing.assert_allclose(
            a, b, atol=2e-5,
            err_msg=jax.tree_util.keystr(path))


def test_parallel_train_step_tensor_parallel():
    """dp x tp on a ('data','model') mesh: megatron-style shardings on the
    GPM self-attention block (parallel/tp.py). The step must (a) actually
    shard the annotated kernels over 'model', (b) produce the same loss as
    the replicated data-parallel step (GSPMD partitions the same math),
    and (c) keep the shardings through the update (out_shardings)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4+ virtual devices")
    from jax.sharding import PartitionSpec as P

    cfg = get_config("test", model="tiny_deaotl", train_total_steps=100)
    model = build_vos_model(cfg.model_vos, cfg)
    params = init_params(model, jax.random.PRNGKey(0), HW)
    tx = make_optimizer(params, cfg)
    from rmem_tpu.ops.masks import host_id_shuffle_matrix
    shuffle = jnp.asarray(host_id_shuffle_matrix(np.random.RandomState(0),
                                                 11, 2))

    # fresh buffers for the second run up front: the steps donate arg 0
    params2 = jax.tree_util.tree_map(jnp.array, params)

    # reference: plain 2-way data-parallel
    state = TrainState.create(params, cfg)
    mesh_dp = make_mesh((2,), ("data",))
    pstep = make_parallel_train_step(make_train_step(model, cfg, tx),
                                     mesh_dp)
    st_dp, m_dp = pstep(state, shard_batch(_batch(2, 2), mesh_dp), shuffle)

    # dp x tp
    state2 = TrainState.create(params2, cfg)
    mesh = make_mesh((2, 2), ("data", "model"))
    pstep2 = make_parallel_train_step(make_train_step(model, cfg, tx),
                                      mesh, state_template=state2)
    st_tp, m_tp = pstep2(state2, shard_batch(_batch(2, 2), mesh), shuffle)

    assert np.isfinite(float(m_tp["loss"]))
    np.testing.assert_allclose(float(m_tp["loss"]), float(m_dp["loss"]),
                               rtol=2e-3)
    blk = st_tp.params["lstt"]["block0"]["self_attn"]
    v1 = blk["linear_V1"]["kernel"]
    proj = blk["tail"]["projection"]["kernel"]
    assert v1.sharding.spec == P(None, "model"), v1.sharding
    assert proj.sharding.spec == P("model", None), proj.sharding
    # updated params still match the replicated run where replicated
    enc = np.asarray(st_tp.params["encoder_projector"]["kernel"])
    np.testing.assert_allclose(
        enc, np.asarray(st_dp.params["encoder_projector"]["kernel"]),
        atol=2e-5)


def test_train_forward_gru_memory_gets_gradients():
    """With GRU_MEMORY the training scan must run ConvGRU compression (the
    reference's restrict_long_memories compresses at train time too,
    transformer.py:420-430) so the GRU cells receive gradients."""
    cfg = get_config("test", model="tiny_aotl", train_total_steps=100,
                     gru_memory=True, former_mem_len=1, latter_mem_len=1,
                     train_long_term_mem_gap=1)
    model = build_vos_model(cfg.model_vos, cfg)
    params = init_params(model, jax.random.PRNGKey(0), HW)
    batch = _batch(1, 5)

    def loss_fn(p):
        loss, _ = train_forward(
            model, p, batch["imgs"], batch["labels"], batch["obj_nums"],
            jnp.float32(0), None, jnp.asarray(False), cfg)
        return loss

    grads = jax.grad(loss_fn)(params)
    import flax.traverse_util as trav
    flat = {"/".join(k): v for k, v in trav.flatten_dict(grads).items()}
    gru_keys = [k for k in flat if "memory_gru" in k]
    assert gru_keys, "no ConvGRU params found"
    total = sum(float(jnp.sum(jnp.abs(flat[k]))) for k in gru_keys)
    assert np.isfinite(total) and total > 0.0, \
        f"ConvGRU grads are zero: {gru_keys}"


def test_optimizer_group_labels():
    from rmem_tpu.engine.train_state import _tree_labels
    cfg = get_config("pre_vost", model="r50_aotl")
    model = build_vos_model(cfg.model_vos, cfg)
    params = init_params(model, jax.random.PRNGKey(0), HW)
    labels = _tree_labels(params, cfg)
    import flax.traverse_util as trav
    flat = trav.flatten_dict(labels)
    joined = {"/".join(k): v for k, v in flat.items()}
    assert joined["patch_wise_id_bank/kernel"] == "idbank"
    assert any(v == "frozen" and "layer1" in k for k, v in joined.items())
    assert any(v == "encoder" and "layer3" in k for k, v in joined.items())
    # all folded BN affines frozen
    assert all(v == "frozen" for k, v in joined.items()
               if "/bn" in k or k.startswith("encoder/bn"))
    assert joined["lstt/block0/linear_Q/kernel"] == "base"


def test_trainer_meters_and_image_logs(tmp_path):
    """Per-frame meters fill and overlay PNGs are dumped when
    train_tblog_step is set (reference trainer.py:635-653,745-862)."""
    from rmem_tpu.managers.trainer import Trainer

    cfg = get_config("test", model="tiny_deaotl", train_total_steps=100,
                     train_batch_size=1, data_seq_len=3, train_log_step=1,
                     train_tblog_step=2, train_save_step=10_000,
                     dir_root=str(tmp_path))
    tr = Trainer(cfg, log=lambda *a: None)
    tr.train(max_steps=2)
    meters = tr.frame_meter_summary()
    assert len(meters["loss_per_frame"]) == 2  # seq_len-1 frame positions
    assert len(meters["iou_per_frame"]) == 2
    assert all(0.0 <= v <= 100.0 for v in meters["iou_per_frame"])
    img_dir = os.path.join(cfg.dir_result, "img_logs")
    names = sorted(os.listdir(img_dir))
    assert any(n.endswith("_img.png") for n in names)
    assert any(n.endswith("_gt.png") for n in names)
    assert any(n.endswith("_pred.png") for n in names)


def test_train_forward_var_loss():
    """Top-down encoder aux reconstruction loss enters the objective
    (aot_engine.py:115-118) and is reported as a metric."""
    cfg = get_config("test", model="tiny_aotl", train_total_steps=100,
                     model_encoder="tiny_topdown", var_loss_weight=0.01)
    model = build_vos_model(cfg.model_vos, cfg)
    params = init_params(model, jax.random.PRNGKey(0), HW)
    batch = _batch(1, 3)
    loss, metrics = train_forward(
        model, params, batch["imgs"], batch["labels"], batch["obj_nums"],
        jnp.float32(0), None, jnp.asarray(False), cfg)
    assert np.isfinite(float(loss))
    assert float(metrics["var_loss"]) > 0.0
    base = float(metrics["aux_weight"] * metrics["aux_loss"]
                 + metrics["pred_loss"])
    assert float(loss) == pytest.approx(
        base + 0.01 * float(metrics["var_loss"]), rel=1e-5)


def test_train_grad_pallas_matches_xla():
    """Training loss + gradients through the fused Pallas bank-attention
    custom VJP (interpret mode) match the XLA einsum path."""
    from jax.experimental.pallas import tpu as pltpu

    batch = _batch(1, 4)

    def loss_and_grads(use_pallas):
        # train_remat="none": interpret-mode pallas_call carries an IO
        # effect that jax.checkpoint cannot partial-eval (real-TPU lowering
        # has no such effect, so remat works on chip)
        cfg = get_config("test", model="tiny_aotl", train_total_steps=100,
                         train_long_term_mem_gap=1, latter_mem_len=1,
                         use_pallas_bank_attention_train=("force" if use_pallas else False),
                         train_remat="none", compute_dtype="float32")
        model = build_vos_model(cfg.model_vos, cfg)
        params = init_params(model, jax.random.PRNGKey(0), HW)

        def loss_fn(p):
            loss, _ = train_forward(
                model, p, batch["imgs"], batch["labels"],
                batch["obj_nums"], jnp.float32(0), None,
                jnp.asarray(False), cfg)
            return loss

        return jax.value_and_grad(loss_fn)(params)

    l_ref, g_ref = loss_and_grads(False)
    with pltpu.force_tpu_interpret_mode():
        l_pl, g_pl = loss_and_grads(True)

    np.testing.assert_allclose(float(l_pl), float(l_ref), rtol=2e-4)
    flat_r = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_p = dict(jax.tree_util.tree_leaves_with_path(g_pl))
    worst = 0.0
    for path, leaf_r in flat_r:
        leaf_p = flat_p[path]
        denom = np.abs(np.asarray(leaf_r)).max() + 1e-6
        rel = np.abs(np.asarray(leaf_p) - np.asarray(leaf_r)).max() / denom
        worst = max(worst, rel)
        assert rel < 5e-3, (jax.tree_util.keystr(path), rel)


def test_process_batch_loader():
    """Subprocess loader: decode/augment off the GIL, same batch contract."""
    from rmem_tpu.data.train_datasets import (ProcessBatchLoader,
                                              SyntheticTrainDataset)

    ds = SyntheticTrainDataset(seq_len=3, hw=HW)
    loader = ProcessBatchLoader(ds, batch_size=2, num_workers=2, prefetch=2)
    try:
        for _ in range(3):
            b = next(loader)
            assert b["imgs"].shape == (2, 3, *HW, 3)
            assert b["labels"].shape == (2, 3, *HW)
            assert b["obj_nums"].shape == (2,)
            assert np.isfinite(b["imgs"]).all()
    finally:
        loader.close()


def test_inline_batch_loader_zero_workers():
    """num_workers=0 loads synchronously in the caller's thread (torch
    DataLoader semantics, train.py --data_workers 0); previously a 0-worker
    BatchLoader had no feeder and __next__ blocked forever."""
    from rmem_tpu.data.train_datasets import (InlineBatchLoader,
                                              SyntheticTrainDataset,
                                              make_batch_loader)

    ds = SyntheticTrainDataset(seq_len=3, hw=HW)
    loader = make_batch_loader(ds, batch_size=2, num_workers=0)
    assert isinstance(loader, InlineBatchLoader)
    try:
        for _ in range(2):
            b = next(loader)
            assert b["imgs"].shape == (2, 3, *HW, 3)
            assert b["labels"].shape == (2, 3, *HW)
            assert b["labels"].dtype == np.int32
            assert b["obj_nums"].shape == (2,)
            assert (b["obj_nums"] <= 10).all()
    finally:
        loader.close()


def test_train_forward_reverse_infer_cond_gated():
    """REVERSE_INFER (aot_engine.py:371-396): the consistency loss is added
    ONLY on gap-boundary frames (via lax.cond, so non-boundary frames skip
    the reverse decode's FLOPs entirely) and gradients stay finite."""
    kw = dict(train_total_steps=100, train_long_term_mem_gap=2)
    cfg_off = get_config("test", model="tiny_deaotl", **kw)
    cfg_on = get_config("test", model="tiny_deaotl", reverse_infer=True, **kw)
    model = build_vos_model(cfg_off.model_vos, cfg_off)
    params = init_params(model, jax.random.PRNGKey(0), HW)
    batch = _batch(1, 4)
    args = (batch["imgs"], batch["labels"], batch["obj_nums"],
            jnp.float32(0), None, jnp.asarray(False))

    _, m_off = train_forward(model, params, *args, cfg_off)
    _, m_on = train_forward(model, params, *args, cfg_on)
    pf_off = np.asarray(m_off["loss_per_frame"])
    pf_on = np.asarray(m_on["loss_per_frame"])
    # gap=2, writes at fidx 2 only (fidx-last>=2): frames 1 and 3 unchanged,
    # frame 2 strictly larger by the weighted reverse loss
    np.testing.assert_allclose(pf_on[[0, 2]], pf_off[[0, 2]], rtol=1e-5)
    assert pf_on[1] > pf_off[1]

    def loss_fn(p):
        loss, _ = train_forward(model, p, *args, cfg_on)
        return loss

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)


def test_trainer_resume_continuity(tmp_path):
    """Kill-and-resume integration (VERDICT r3 Missing #3 / Next #2): a
    trainer subprocess is SIGKILLed after its first checkpoint lands; a new
    Trainer with the same config must auto-resume with step, params,
    optimizer moments, and EMA exactly equal to the on-disk checkpoint,
    then continue training and keep the checkpoint rotation going
    (reference trainer.py:188-260)."""
    import signal
    import subprocess
    import sys
    import time as time_mod

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo_root, "tests", "_trainer_kill_worker.py")
    dir_root = str(tmp_path)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen([sys.executable, worker, dir_root], env=env,
                            cwd=repo_root, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT)

    # wait for the first checkpoint, then SIGKILL mid-run (no cleanup)
    from rmem_tpu.config import get_config
    cfg = get_config("test", model="tiny_deaotl", train_total_steps=100,
                     train_batch_size=1, data_seq_len=3, train_log_step=1,
                     train_save_step=2, train_max_keep_ckpt=2,
                     train_auto_resume=True, dir_root=dir_root)
    ckpt_dir = os.path.join(cfg.dir_result, "ckpt")
    deadline = time_mod.time() + 900
    from rmem_tpu.utils.checkpoint import latest_checkpoint
    found = None
    while time_mod.time() < deadline:
        if proc.poll() is not None:
            out = proc.stdout.read().decode()
            raise AssertionError(f"worker exited early:\n{out[-3000:]}")
        found = latest_checkpoint(ckpt_dir)
        if found:
            break
        time_mod.sleep(0.5)
    assert found, "no checkpoint appeared within timeout"
    proc.send_signal(signal.SIGKILL)
    proc.wait()
    ckpt_path, saved_step = latest_checkpoint(ckpt_dir)
    assert saved_step >= 2

    # resume in-process with the SAME config: auto-resume must restore the
    # full TrainState from disk
    from rmem_tpu.managers.trainer import Trainer
    from rmem_tpu.utils.checkpoint import load_pytree

    tr = Trainer(cfg, log=lambda *a: None)
    assert int(tr.state.step) == saved_step

    # every leaf (params, opt moments, EMA, step) equals the checkpoint
    disk = load_pytree(tr.state, ckpt_path)
    flat_mem = jax.tree_util.tree_leaves_with_path(tr.state)
    flat_disk = dict(jax.tree_util.tree_leaves_with_path(disk))
    for path, leaf in flat_mem:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(flat_disk[path]),
            err_msg=jax.tree_util.keystr(path))
    # EMA is a real running average by now, not a fresh copy of params
    p0 = np.asarray(tr.state.params["encoder_projector"]["kernel"])
    e0 = np.asarray(tr.state.ema_params["encoder_projector"]["kernel"])
    assert not np.array_equal(p0, e0)

    # training continues from the restored step and rotation prunes
    tr.train(max_steps=saved_step + 2)
    assert int(tr.state.step) == saved_step + 2
    ckpts = sorted(os.listdir(ckpt_dir))
    assert len(ckpts) <= 2  # train_max_keep_ckpt
    _, newest = latest_checkpoint(ckpt_dir)
    assert newest == saved_step + 2
    ema_dir = os.path.join(cfg.dir_result, "ema_ckpt")
    assert any(f.startswith("ema_step_") for f in os.listdir(ema_dir))
