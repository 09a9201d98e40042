"""Training engine: the per-clip sequential frame loop as a `lax.scan`.

Reference: aot_plus/networks/engines/aot_engine.py:40-128 (AOTEngine.forward)
and managers/trainer.py:479-739. One training step:

1. offline-encode all T frames in one batched encoder pass
   (aot_engine.py:174-196),
2. reference frame 0 with ground-truth identity embedding (id-shuffle
   augmentation, aot_engine.py:218-232),
3. scan over frames 1..T-1: propagate, loss, then write memory for that frame
   from its GT one-hot — or, in the `use_prev_pred` curriculum, from the hard
   argmax prediction with the identity gradient stopped
   (aot_engine.py:53,91-106,229-231,327-336),
4. loss = aux_weight(step) * ref_frame_loss + mean(frame losses)
   (aot_engine.py:108-113).

The frame scan is rematerialized (jax.checkpoint) so the backward pass
re-runs the per-frame LSTT instead of storing T activation sets — the TPU
counterpart of the reference fitting seq_len 15-17 via AMP.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from rmem_tpu.config import Config
from rmem_tpu.memory import (bank_append, evict_if_full, init_bank,
                             valid_slot_mask)
from rmem_tpu.memory.eviction import evict_if_full_gru
from rmem_tpu.ops.losses import segmentation_loss
from rmem_tpu.ops.masks import mask_unused_ids, unshuffle_logits
from rmem_tpu.ops.resize import resize_bilinear, upsample_argmax
from rmem_tpu.ops.temporal_pe import interpolate_temporal_pe


def _flatten_frames(x):
    """[B,T,...] -> [B*T,...]"""
    return x.reshape((-1,) + x.shape[2:])


def train_forward(model, params, imgs, labels, obj_nums, step, shuffle,
                  use_prev_pred, cfg: Config, dp_rng=None):
    """Clip loss. imgs [B,T,H,W,3]; labels [B,T,H,W] int (255=ignore);
    obj_nums [B]; shuffle [B,obj+1,obj+1] or None; use_prev_pred / step are
    traced. Returns (loss, metrics)."""
    apply = lambda method, *a, **k: model.apply({"params": params}, *a,
                                                method=method, **k)
    # fused Pallas bank attention fwd+bwd (flash-style custom VJP): on TPU
    # this nearly halves the batch-4 step time (benchmarks/train_bench.py);
    # the CPU backend would need interpret mode, so fall back to XLA there
    # ("force" bypasses the backend check for interpret-mode tests)
    use_pallas = (cfg.use_pallas_bank_attention_train == "force"
                  or (cfg.use_pallas_bank_attention_train is True
                      and jax.default_backend() != "cpu"))
    # "train_all" additionally routes DeAOT's local attention through the
    # Pallas-forward/XLA-backward wrapper (narrow-channel models fall back
    # inside the kernel; AOT/LSTT has no local attention path)
    if (use_pallas is True and cfg.use_pallas_local_attention_train
            and cfg.model_vos == "deaot"):
        use_pallas = "train_all"
    b, t = imgs.shape[:2]
    hw_in = imgs.shape[2:4]
    deterministic = dp_rng is None

    # 1. offline encode all frames at once (aot_engine.py:174-196)
    var_loss = jnp.zeros(())
    if cfg.var_loss_weight > 0:
        # top-down encoder's reconstruction regularizer, sown into
        # 'aux_losses' (aot_engine.py:116-118, resnet.py:344-356)
        xs_flat, aux = model.apply(
            {"params": params}, _flatten_frames(imgs),
            method=type(model).encode_image, mutable=["aux_losses"])
        sown = jax.tree_util.tree_leaves(aux)
        if sown:
            var_loss = jnp.mean(jnp.stack([jnp.asarray(v) for v in sown]))
    else:
        xs_flat = apply(type(model).encode_image, _flatten_frames(imgs))
    n_levels = len(xs_flat)
    xs_bt = [x.reshape((b, t) + x.shape[1:]) for x in xs_flat]

    eh, ew = xs_bt[-1].shape[2:4]
    hw = eh * ew
    c = xs_bt[-1].shape[-1]
    self_pos = apply(type(model).get_pos_emb, eh, ew)
    cur_pe = mem_pe_table = None
    if cfg.use_temporal_positional_embedding:
        cur_pe, mem_pe_table = apply(type(model).temporal_pe)

    # Identity inputs as INT LABEL PLANES through the id bank's patch-space
    # one-hot path (models/aot._PatchWiseIdBank, x.ndim==3): training labels
    # and curriculum predictions are hard, so the reference's float chain
    # one_hot -> zero-ignored-bg -> shuffle-einsum -> concat-ignore
    # (aot_engine.py:208-224; ops/masks.apply_ignore_token) collapses to one
    # integer remap per pixel: channel = perm[label], 255 -> the ignore
    # channel (obj+1 — a real channel under model_ignore_token, the id
    # bank's zero-contribution sentinel otherwise, same index either way).
    # The float path materialized [B,T,H,W,obj+2] one-hots through the scan;
    # the label-vs-float equality is pinned by tests/test_models.py.
    ign_val = jnp.int32(cfg.model_max_obj_num + 1)
    if shuffle is not None:
        perm = jnp.argmax(shuffle, axis=-1).astype(jnp.int32)  # [B, obj+1]
    else:
        perm = None

    def map_id_label(label):
        """[B,H,W] raw label (255=ignore) -> id-bank channel plane. The
        permutation lookup is an unrolled select chain over the obj+1 ids —
        a per-pixel gather from the tiny table lowers to a slow TPU gather."""
        safe = jnp.clip(label, 0, cfg.model_max_obj_num).astype(jnp.int32)
        if perm is not None:
            mapped = jnp.zeros_like(safe)
            for o in range(cfg.model_max_obj_num + 1):
                mapped = jnp.where(safe == o, perm[:, o, None, None], mapped)
        else:
            mapped = safe
        return jnp.where(label == 255, ign_val, mapped)

    def id_embed(id_label):
        e = apply(type(model).get_id_emb, id_label)
        # freeze_id during the curriculum (aot_engine.py:229-231)
        return jnp.where(use_prev_pred, jax.lax.stop_gradient(e), e)

    def decode4(intermediates, xs):
        """Decode to the /4 logit grid (pre-upsample): unshuffled, unused ids
        masked. The full-resolution upsample + loss run OUTSIDE the frame
        scan, batched over frames (see below)."""
        logits4 = apply(type(model).decode_id_logits, intermediates, xs)
        if shuffle is not None:
            logits4 = unshuffle_logits(logits4, shuffle)
        return mask_unused_ids(logits4, obj_nums)

    def frame_loss(logits4, frame_label):
        logits = resize_bilinear(logits4, hw_in, cfg.model_align_corners)
        loss = segmentation_loss(
            logits, frame_label, obj_nums, step,
            cfg.train_top_k_percent_pixels,
            cfg.train_hard_mining_ratio * cfg.train_total_steps)
        return logits, loss

    def decode(intermediates, xs, frame_label):
        return frame_loss(decode4(intermediates, xs), frame_label)

    # 2. reference frame (aot_engine.py:241-325)
    xs0 = tuple(x[:, 0] for x in xs_bt)
    xs_frames0_feat = xs0[-1].reshape(b, hw, c)
    ref_id_emb = id_embed(map_id_label(labels[:, 0]))
    mem_pe1 = mem_pe_table[0:1] if mem_pe_table is not None else None
    inter0, mems0, _ = apply(type(model).lstt_forward,
                             xs0[-1].reshape(b, hw, c), None, None, None,
                             ref_id_emb, self_pos, cur_pe, mem_pe1, (eh, ew),
                             False, deterministic, dp_rng)
    lk, lv, sk, sv = apply(type(model).write_memories, mems0, ref_id_emb)
    bank = init_bank(lk.shape[0], cfg.max_mem_slots, b, hw, lk.shape[-1],
                     lv.shape[-1], dtype=lk.dtype)
    bank = bank_append(bank, lk, lv)
    _, aux_loss = decode(inter0, xs0, labels[:, 0])

    # REVERSE_INFER (aot_engine.py:371-396): after every long-memory write,
    # re-decode frame 0 from the current bank minus its first slot, using the
    # frame-1 short memories (detached), and add a weighted consistency loss.
    def reverse_loss_fn(bank, first_short):
        from rmem_tpu.memory.bank import _compact_axis
        rbank_k = _compact_axis(bank.k, jnp.int32(0), 1)
        rbank_v = _compact_axis(bank.v, jnp.int32(0), 1)
        bank_tuple = (rbank_k, rbank_v)
        rmask = jnp.arange(bank.capacity) < (bank.count - 1)
        slot_pe = None
        if mem_pe_table is not None:
            slot_pe = interpolate_temporal_pe(mem_pe_table, bank.count - 1,
                                              bank.capacity)
        inter, _, _ = apply(type(model).lstt_forward,
                            xs_frames0_feat, bank_tuple, rmask, first_short,
                            None, self_pos, cur_pe, slot_pe, (eh, ew), False,
                            deterministic, dp_rng, use_pallas)
        _, loss = decode(inter, xs0, labels[:, 0])
        return cfg.reverse_loss * loss

    # GRU_MEMORY: ConvGRU hidden states carried through the scan so the
    # compression cells receive gradients at train time too — the reference's
    # restrict_long_memories runs GRU compression into slot 1 during training
    # as well (transformer.py:420-430; train drop index = former+1).
    if cfg.gru_memory_active:
        ghk0 = jnp.zeros((lk.shape[0], b, eh, ew, lk.shape[-1]), lk.dtype)
        ghv0 = jnp.zeros((lv.shape[0], b, eh, ew, lv.shape[-1]), lv.dtype)

        def compress_fn(ks, vs, hk, hv):
            return model.apply(
                {"params": params}, ks, vs, hk, hv, (eh, ew),
                method=lambda m, *a: m.lstt.compress_evicted(*a))
    else:
        ghk0 = ghv0 = jnp.zeros((), jnp.float32)

    # 3. frame scan (aot_engine.py:84-106)
    def frame_body(carry, data):
        bank, short, first_short, last_mem_step, ghk, ghv = carry
        xs_f, label_f, fidx = data
        feat = xs_f[-1].reshape(b, hw, c)
        slot_pe = None
        if mem_pe_table is not None:
            slot_pe = interpolate_temporal_pe(mem_pe_table, bank.count,
                                              bank.capacity)
        bank_tuple = (bank.k, bank.v)
        inter, mems, _ = apply(type(model).lstt_forward, feat, bank_tuple,
                               valid_slot_mask(bank), short, None, self_pos,
                               cur_pe, slot_pe, (eh, ew), False,
                               deterministic, dp_rng, use_pallas)
        logits4 = decode4(inter, xs_f)

        # memory write for THIS frame (aot_engine.py:91-99,327-336):
        # GT identity, or the hard argmax prediction under the curriculum.
        # The hard label is all the scan needs at full resolution — the
        # fused upsample+argmax epilogue (the eval fast path; bit-identical
        # to resize->argmax) avoids materializing the [H, W, C] float
        # logits inside the rematted body; the loss itself is computed
        # OUTSIDE the scan, batched over frames, from the emitted logits4.
        l4d = jax.lax.stop_gradient(logits4)
        if b == 1:
            pred_label = upsample_argmax(l4d, hw_in,
                                         cfg.model_align_corners)[None]
        else:
            full = resize_bilinear(l4d, hw_in, cfg.model_align_corners)
            pred_label = jnp.argmax(full, axis=-1).astype(jnp.int32)
        id_emb = id_embed(map_id_label(
            jnp.where(use_prev_pred, pred_label, label_f)))

        lk, lv, sk, sv = apply(type(model).write_memories, mems, id_emb)
        do_long = fidx - last_mem_step >= cfg.train_long_term_mem_gap
        if cfg.no_long_memory:
            do_long = jnp.asarray(False)
        appended = bank_append(bank, lk, lv)
        if cfg.gru_memory_active:
            evicted, nhk, nhv = evict_if_full_gru(
                appended, cfg.former_mem_len, cfg.latter_mem_len,
                compress_fn, ghk, ghv, use_attn_weight=False)
            new_ghk = jnp.where(do_long, nhk, ghk)
            new_ghv = jnp.where(do_long, nhv, ghv)
        else:
            evicted = evict_if_full(appended, cfg.former_mem_len,
                                    cfg.latter_mem_len, use_attn_weight=False)
            new_ghk, new_ghv = ghk, ghv
        new_bank = jax.tree_util.tree_map(
            lambda a_, b_: jnp.where(do_long, a_, b_), evicted, bank)
        new_short = (sk, sv)
        # capture frame-1 short memories, detached (aot_engine.py:372-374)
        new_first = jax.tree_util.tree_map(
            lambda f, n: jnp.where(fidx == 1, jax.lax.stop_gradient(n), f),
            first_short, new_short)
        ys = (logits4, pred_label)
        if cfg.reverse_infer:
            # lax.cond (not where-masking) so the reverse decode's full
            # LSTT forward runs only on gap-boundary frames, mirroring the
            # inference-side write gate; masking the result would still pay
            # ~2x the propagate FLOPs on EVERY frame
            rloss = jax.lax.cond(
                do_long,
                lambda ops: reverse_loss_fn(*ops),
                lambda ops: jnp.zeros((b,), jnp.float32),
                (new_bank, new_first))
            ys = ys + (rloss,)
        new_last = jnp.where(do_long, fidx, last_mem_step)
        return (new_bank, new_short, new_first, new_last,
                new_ghk, new_ghv), ys

    short0 = (sk, sv)
    xs_scan = tuple(jnp.swapaxes(x[:, 1:], 0, 1) for x in xs_bt)
    labels_scan = jnp.swapaxes(labels[:, 1:], 0, 1)
    scan_data = (xs_scan,
                 labels_scan,
                 jnp.arange(1, t, dtype=jnp.int32))
    carry0 = (bank, short0, jax.tree_util.tree_map(jnp.zeros_like, short0),
              jnp.zeros((), jnp.int32), ghk0, ghv0)

    # remat policy over the per-frame LSTT body (the encoder is already
    # outside the scan): "full" recomputes everything in the backward pass,
    # "dots" saves MXU outputs (recompute only elementwise/softmax — more
    # memory, less recompute), "none" stores all activations
    remat = cfg.train_remat if t > 2 else "none"
    if remat == "full":
        body = jax.checkpoint(frame_body)
    elif remat == "dots":
        # dots + the named top-k mask residual: without it the backward
        # re-runs the 216k-pixel radix select per frame vs ~216 KB/frame
        # of bool mask to store (losses.py 'topk_mask')
        body = jax.checkpoint(
            frame_body,
            policy=jax.checkpoint_policies.save_from_both_policies(
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                jax.checkpoint_policies.save_only_these_names(
                    "topk_mask")))
    else:
        body = frame_body
    carry_out, ys = jax.lax.scan(
        body, carry0, scan_data, unroll=max(1, cfg.train_scan_unroll))
    logits4_seq, pred_seq = ys[0], ys[1]  # [T-1,B,h4,w4,C], [T-1,B,H,W]
    last_pred = pred_seq[-1]              # [B,H,W] argmax of the final frame

    # per-frame loss + IoU meter, batched over frames OUTSIDE the rematted
    # scan body: the full-resolution chain (4x upsample, log_softmax, radix
    # top-k, Jaccard) runs once forward and once backward over [T-1] frames
    # instead of forward + remat-recompute + backward per scan iteration,
    # and its intermediates never enter the scan carry/residuals
    from rmem_tpu.utils.metric import pytorch_iou_batched
    losses = jax.vmap(lambda l4, lab: frame_loss(l4, lab)[1])(
        logits4_seq, labels_scan)         # [T-1, B]
    ious = jax.vmap(lambda p, lab: pytorch_iou_batched(
        p, lab, obj_nums, cfg.model_max_obj_num))(pred_seq, labels_scan)
    if cfg.reverse_infer:
        losses = losses + ys[2]
    # losses [T-1, B]; ious [T-1]

    # 4. combine (aot_engine.py:108-113, _init_losses:145-146)
    aux_step = cfg.train_total_steps * cfg.train_aux_loss_ratio + 1e-5
    aux_w = cfg.train_aux_loss_weight * jnp.maximum(
        aux_step - step, 0.0) / aux_step
    pred_loss = losses.mean()
    loss = aux_w * aux_loss.mean() + pred_loss
    # per-frame-position meters + train IoU (trainer.py:635-653)
    metrics = {"loss": loss, "aux_loss": aux_loss.mean(),
               "pred_loss": pred_loss, "aux_weight": aux_w,
               "loss_per_frame": losses.mean(axis=-1),
               "iou_per_frame": ious,
               "iou": ious.mean(),
               "pred_label_last": last_pred}
    if cfg.var_loss_weight > 0:
        # loss += VAR_LOSS_WEIGHT * var_loss (aot_engine.py:116-117)
        loss = loss + cfg.var_loss_weight * var_loss
        metrics["loss"] = loss
        metrics["var_loss"] = var_loss
    return loss, metrics
