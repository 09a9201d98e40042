"""Train state + optimizer: AdamW with per-group LR rules, EMA, grad clip.

Reference: aot_plus/networks/managers/trainer.py:125-180 (optimizer/EMA),
utils/learning.py:4-91 (schedule, param groups, WD exemptions). Mapped to a
single optax chain with path-labeled learning rates instead of 400 torch
param groups:

  clip_by_global_norm(5) -> adam moments -> decoupled WD (masked) ->
  per-group -lr(step) scaling

Groups: `frozen` (folded BN affines everywhere + encoder stages below
freeze_at), `encoder` (0.1x LR, learning.py:35-37), `idbank`
(patch_wise_id_bank: LR 0 once the use_prev_pred curriculum starts,
trainer.py:527-529), `base`.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import flax.struct
import flax.traverse_util as trav
import jax
import jax.numpy as jnp
import optax

from rmem_tpu.config import Config
from rmem_tpu.ops.schedule import encoder_lr, make_lr_schedule

FROZEN_STAGES = ("conv1", "bn1", "layer1")  # freeze_at=2 (resnet.py:206-213)


def param_label(path: Tuple[str, ...], cfg: Config) -> str:
    joined = "/".join(path)
    in_encoder = path[0] == "encoder"
    is_bn = any(p.startswith("bn") or p == "bn" or "downsample_bn" in p
                for p in path)
    if in_encoder and is_bn:
        return "frozen"  # FrozenBatchNorm buffers are not trainable
    if in_encoder and cfg.train_encoder_freeze_at >= 2 and any(
            path[1].startswith(s) for s in FROZEN_STAGES):
        return "frozen"
    if "patch_wise_id_bank" in joined:
        return "idbank"
    if in_encoder:
        return "encoder"
    return "base"


def wd_applies(path: Tuple[str, ...], leaf, cfg: Config) -> bool:
    """utils/learning.py:66-83 with frozen leaves excluded."""
    joined = "/".join(path)
    if param_label(path, cfg) == "frozen":
        return False
    for key in cfg.train_weight_decay_exemption:
        if key in joined:
            return False
    if leaf.ndim == 1:
        if path[-1] == "bias":
            return False
        # frozen-BN scales in the encoder would keep WD (learning.py:74-79)
        # but ours are folded constants, so all remaining 1-D params skip WD
        return False
    return True


def _tree_labels(params, cfg: Config):
    flat = trav.flatten_dict(params)
    return trav.unflatten_dict(
        {k: param_label(k, cfg) for k in flat})


def _tree_wd_mask(params, cfg: Config):
    flat = trav.flatten_dict(params)
    return trav.unflatten_dict(
        {k: wd_applies(k, v, cfg) for k, v in flat.items()})


class _GroupLRState(NamedTuple):
    count: jnp.ndarray


def _scale_by_group_lr(cfg: Config, labels_tree) -> optax.GradientTransformation:
    sched = make_lr_schedule(cfg.train_lr, cfg.train_lr_min,
                             cfg.train_total_steps, cfg.train_lr_power,
                             cfg.train_lr_warm_up_ratio,
                             cfg.train_lr_cosine_decay, cfg.train_lr_restart)
    seq_start = cfg.train_seq_training_start_ratio * cfg.train_total_steps

    def lr_for(label: str, step):
        base = sched(step)
        if label == "frozen":
            return jnp.zeros_like(base)
        if label == "encoder":
            return encoder_lr(base, cfg.train_lr_min,
                              cfg.train_lr_encoder_ratio)
        if label == "idbank":
            # frozen once seq-training starts (trainer.py:527-529)
            return jnp.where(step >= seq_start, 0.0, base)
        return base

    def init(params):
        del params
        return _GroupLRState(count=jnp.zeros((), jnp.int32))

    def update(updates, state, params=None):
        del params
        step = state.count.astype(jnp.float32)
        updates = jax.tree_util.tree_map(
            lambda u, lab: u * (-lr_for(lab, step)), updates, labels_tree)
        return updates, _GroupLRState(count=state.count + 1)

    return optax.GradientTransformation(init, update)


def make_optimizer(params, cfg: Config) -> optax.GradientTransformation:
    labels = _tree_labels(params, cfg)
    wd_mask = _tree_wd_mask(params, cfg)
    if cfg.train_opt == "adamw":
        moments = optax.scale_by_adam(eps=1e-8)
    elif cfg.train_opt == "sgd":
        moments = optax.trace(decay=cfg.train_sgd_momentum)
    else:
        raise ValueError(cfg.train_opt)
    return optax.chain(
        optax.clip_by_global_norm(cfg.train_clip_grad_norm),
        moments,
        optax.add_decayed_weights(cfg.train_weight_decay, mask=wd_mask),
        _scale_by_group_lr(cfg, labels),
    )


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    ema_params: Any
    step: jnp.ndarray  # int32

    @staticmethod
    def create(params, cfg: Config) -> "TrainState":
        tx = make_optimizer(params, cfg)
        # EMA starts as a *copy* — aliasing params would break buffer
        # donation of the train state (same buffer donated twice)
        ema = jax.tree_util.tree_map(jnp.array, params)
        return TrainState(params=params, opt_state=tx.init(params),
                          ema_params=ema,
                          step=jnp.zeros((), jnp.int32))


def ema_update(ema_params, params, step, total_steps: int,
               ema_ratio: float = 0.1):
    """EMA with warmup decay min(decay, (1+n)/(10+n)) (utils/ema.py:51-55);
    decay = 1 - 1/(total_steps*ratio) (trainer.py:127-128)."""
    decay = 1.0 - 1.0 / (total_steps * ema_ratio)
    n = step.astype(jnp.float32)
    d = jnp.minimum(decay, (1.0 + n) / (10.0 + n))
    return jax.tree_util.tree_map(
        lambda e, p: d * e + (1.0 - d) * p, ema_params, params)


def make_train_step(model, cfg: Config, tx: optax.GradientTransformation
                    ) -> Callable:
    """Returns step(state, batch, shuffle) -> (state, metrics). batch:
    imgs [B,T,H,W,3], labels [B,T,H,W], obj_nums [B]; shuffle from
    rmem_tpu.ops.masks.host_id_shuffle_matrix."""
    from rmem_tpu.engine.training import train_forward

    seq_start = cfg.train_seq_training_start_ratio * cfg.train_total_steps

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray],
                shuffle: jnp.ndarray):
        """batch: imgs/labels/obj_nums (sharded on 'data'); shuffle:
        [B, obj+1, obj+1] id permutation matrices, generated host-side per
        step like the reference (aot_engine.py:559-563) — jax.random
        permutation inside the SPMD step deadlocks XLA:CPU collectives on
        low-core hosts and is host-trivial anyway."""
        stepf = state.step.astype(jnp.float32)
        use_prev = stepf >= seq_start

        def loss_fn(params):
            return train_forward(model, params, batch["imgs"],
                                 batch["labels"], batch["obj_nums"], stepf,
                                 shuffle, use_prev, cfg)

        (loss, metrics), grads = jax.value_and_grad(loss_fn,
                                                    has_aux=True)(state.params)
        # Data-parallel gradient reduction happens inside XLA: params are
        # replicated, the batch is sharded over the 'data' mesh axis, so the
        # grad of a replicated param is an automatic cross-device psum
        # (replaces DDP allreduce, trainer.py:103-109).
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = ema_update(state.ema_params, params, state.step,
                         cfg.train_total_steps, cfg.train_ema_ratio)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(params=params, opt_state=opt_state,
                          ema_params=ema, step=state.step + 1), metrics

    return step_fn
