"""Per-video inference engine: pure jitted step functions over fixed shapes.

Replaces the reference's stateful AOTEngine/AOTInferEngine
(aot_plus/networks/engines/aot_engine.py:18-726) with three pure functions
over an explicit `EngineState` pytree:

    add_reference(params, img, mask)          (aot_engine.py:241-325)
    propagate(params, state, img) -> logits   (aot_engine.py:398-436)
    update_memory(params, state, label)       (aot_engine.py:327-369)

All shapes are static (fixed bank capacity, fixed image size per engine), so
one compilation serves an entire dataset split; state buffers are donated so
the bank updates in place in HBM. Multi-object videos beyond
`model_max_obj_num` run as a leading group axis (the reference's list of
sub-engines, aot_engine.py:571-726, becomes a batch dimension).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from rmem_tpu.config import Config
from rmem_tpu.memory import (MemoryBank, bank_append, init_bank,
                             valid_slot_mask)
from rmem_tpu.memory.eviction import evict_if_full_gru, update_bank_inplace
from rmem_tpu.ops.masks import apply_ignore_token, mask_unused_ids, one_hot_mask
from rmem_tpu.ops.resize import resize_bilinear
from rmem_tpu.ops.temporal_pe import interpolate_temporal_pe


@flax.struct.dataclass
class EngineState:
    """Carry state for one video (one engine group batch)."""

    bank: MemoryBank
    short_k: jnp.ndarray                    # [L, B, HW, Ck]
    short_v: jnp.ndarray                    # [L, B, HW, Cv]; DeAOT stores
                                            # [V, ID_V] concatenated
    mems: Dict[str, jnp.ndarray]            # pending emissions from propagate
    record: Optional[jnp.ndarray]           # [B, HW, S] slot attention mass
    logits4x: jnp.ndarray                   # [B, H/4, W/4, obj+1] masked
    frame_step: jnp.ndarray                 # int32
    last_mem_step: jnp.ndarray              # int32
    gap: jnp.ndarray                        # int32 long-term write cadence
    obj_nums: jnp.ndarray                   # [B] int32
    gru_hid_k: Optional[jnp.ndarray] = None  # [L,B,H,W,C] (GRU_MEMORY)
    gru_hid_v: Optional[jnp.ndarray] = None


def separate_mask(label: jnp.ndarray, num_groups: int,
                  max_obj: int) -> jnp.ndarray:
    """[B?,H,W] global label -> [G,H,W] per-group labels in [0, max_obj]
    (aot_engine.py:604-617)."""
    if label.ndim == 3:
        label = label[0]
    outs = []
    for g in range(num_groups):
        start = g * max_obj + 1
        end = (g + 1) * max_obj
        fg = (label >= start) & (label <= end)
        outs.append(jnp.where(fg, label - start + 1, 0).astype(label.dtype))
    return jnp.stack(outs)


def soft_logit_aggregation(logits: jnp.ndarray, max_obj: int) -> jnp.ndarray:
    """[G,H,W,obj+1] group logits -> [H,W, 1+G*obj] merged logits
    (aot_engine.py:650-673): bg prob is the product of per-group bg probs."""
    if logits.shape[0] == 1:
        return logits[0]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    bg = jnp.prod(probs[..., 0], axis=0)[..., None]
    fg = jnp.concatenate([probs[g, ..., 1:1 + max_obj]
                          for g in range(probs.shape[0])], axis=-1)
    merged = jnp.clip(jnp.concatenate([bg, fg], axis=-1), 1e-5, 1 - 1e-5)
    return jnp.log(merged) - jnp.log1p(-merged)  # torch.logit


class InferenceEngine:
    """Streaming per-frame driver. The host loop feeds frames; device state
    stays resident. One compilation per (image size, group count)."""

    def __init__(self, model, params, cfg: Config, need_record: bool = True,
                 donate: bool = True, cast_params: bool = True):
        import jax as _jax
        self.model = model
        if cast_params and cfg.compute_dtype == "bfloat16":
            # Fold FoldedBN scales into the preceding conv kernels (pure
            # f32 param transform at load; VERDICT r3 Next #3). Only on the
            # bf16 fast path: conv(x, W*s) == conv(x, W)*s exactly in real
            # arithmetic, and in bf16 the difference is below the rounding
            # already present; the f32 parity path keeps the unfolded
            # order so PARITY_RUN's bit-identical claim stands.
            from rmem_tpu.models.encoders import fold_bn_params
            params = fold_bn_params(params)
            # Pre-cast float params to the compute dtype ONCE. Halves the
            # resident param HBM footprint (~100 MB f32 -> ~50 MB for
            # r50_deaotl) and removes the per-frame weight converts from
            # the graph. Measured A/B on the fused eval scan: FPS unchanged
            # within noise (179.5 vs 181.8 — XLA already fuses the weight
            # casts into consumers), so this is a memory win, not a speed
            # win. Modules that pin dtype=float32 (fpn conv_out) just cast
            # the (already bf16-rounded) weight back up; the suite's
            # engine/golden tests pass unchanged.
            params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                params)
        self.params = params
        self.cfg = cfg
        self.need_record = need_record and not cfg.no_long_memory
        # fused Pallas bank attention (custom flash-style VJP for training);
        # "all" additionally routes DeAOT's local attention to the fused
        # VMEM kernel (inference-only, no VJP needed here)
        if cfg.use_pallas_bank_attention and _jax.default_backend() != "cpu":
            if cfg.use_pallas_local_attention and cfg.model_vos == "deaot":
                self.use_pallas = ("all+dw" if cfg.use_pallas_dwconv
                                   else "all")
            else:
                self.use_pallas = True
        else:
            self.use_pallas = False
        self._donate = donate
        donate_args = (1,) if donate else ()
        self._add_ref = jax.jit(self._add_reference_impl)
        self._propagate = jax.jit(self._propagate_impl,
                                  donate_argnums=donate_args)
        self._update = jax.jit(self._update_impl, donate_argnums=donate_args)
        self._step = jax.jit(self._step_impl, donate_argnums=donate_args,
                             static_argnames=("out_hw",))
        self._scan = jax.jit(self._scan_impl, donate_argnums=donate_args,
                             static_argnames=("out_hw",))

    # -- helpers -------------------------------------------------------
    def _apply(self, params, method, *args, **kw):
        return self.model.apply({"params": params}, *args,
                                method=method, **kw)

    def _id_emb(self, params, label, shuffle=None):
        if shuffle is None:
            # hard labels, no id-shuffle (the eval path): skip the HWC
            # one-hot entirely — the id bank takes the int label plane and
            # one-hots in patch space (models/aot.py:_PatchWiseIdBank).
            # 255-ignore maps to channel obj+1 when the ignore token
            # exists (apply_ignore_token: bg zeroed + ignore channel set
            # == exactly one-hot of index obj+1); without the ignore
            # token, index obj+1 is out of range and one-hots to zero —
            # identical to one_hot_mask's all-zero row at 255.
            if label.ndim == 4:
                label = label[..., 0]
            lbl = jnp.where(label == 255, self.cfg.model_max_obj_num + 1,
                            label).astype(jnp.int32)
            return self._apply(params, type(self.model).get_id_emb, lbl)
        oh, ig = one_hot_mask(label, self.cfg.model_max_obj_num)
        full = apply_ignore_token(oh, ig, shuffle) \
            if self.cfg.model_ignore_token else oh
        return self._apply(params, type(self.model).get_id_emb, full)

    def _bank_tuple(self, bank: MemoryBank):
        return (bank.k, bank.v)

    def _short_tuple(self, state: EngineState):
        return (state.short_k, state.short_v)

    def _decode(self, params, intermediates, xs, obj_nums):
        logits = self._apply(params, type(self.model).decode_id_logits,
                             intermediates, xs)
        return mask_unused_ids(logits, obj_nums)

    def _encode_groups(self, params, img, groups: int):
        """Encode once and broadcast features to the id-group batch (the
        reference re-encodes per sub-engine, aot_engine.py:689-700)."""
        xs = self._apply(params, type(self.model).encode_image, img)
        if img.shape[0] == 1 and groups > 1:
            xs = tuple(jnp.tile(x, (groups, 1, 1, 1)) for x in xs)
        return xs

    # -- add_reference (aot_engine.py:241-325) -------------------------
    def _add_reference_impl(self, params, img, label, obj_nums, frame_step,
                            gap):
        cfg = self.cfg
        xs = self._encode_groups(params, img, label.shape[0])
        b, eh, ew, c = xs[-1].shape
        hw = eh * ew
        feat = xs[-1].reshape(b, hw, c)
        id_emb = self._id_emb(params, label)
        self_pos = self._apply(params, type(self.model).get_pos_emb, eh, ew)
        cur_pe, mem_pe = None, None
        if cfg.use_temporal_positional_embedding:
            cur_pe, mem = self._apply(params, type(self.model).temporal_pe)
            mem_pe = mem[0:1]  # T=1: PE slot 0 (transformer.py:603-604)

        intermediates, mems, _ = self._apply(
            params, type(self.model).lstt_forward, feat, None, None, None,
            id_emb, self_pos, cur_pe, mem_pe, (eh, ew))
        lk, lv, sk, sv = self._apply(
            params, type(self.model).write_memories, mems, id_emb)

        # slots are stored token-padded: the Pallas bank kernel then needs
        # NO per-frame relayout (pads masked via true_lk; values read
        # zero-copy from this buffer), and appends write the unpadded slot
        # into the padded slab (dynamic_update_slice of a smaller update).
        # Pad granularity: the smallest 128-multiple that still admits a
        # wide divisor key tile (see preferred_token_pad — tiles must
        # DIVIDE the padded extent, and narrow tiles measured 8 FPS slower
        # from the shorter pipeline). The einsum path masks a padded bank
        # exactly (true_lk) but gains nothing from the layout, so padding
        # is applied only when the kernel runs.
        if self.use_pallas:
            from rmem_tpu.kernels.bank_attention import preferred_token_pad
            hw_pad = preferred_token_pad(hw)
        else:
            hw_pad = hw
        bank = init_bank(
            num_layers=lk.shape[0], capacity=cfg.max_mem_slots, batch=b,
            hw=hw_pad, ck=lk.shape[-1], cv=lv.shape[-1], dtype=lk.dtype)
        bank = bank_append(bank, lk, lv)

        logits = self._decode(params, intermediates, xs, obj_nums)
        ghk = ghv = None
        if cfg.gru_memory_active:
            # ConvGRU hidden states, zero-init (transformer.py:444-453)
            ghk = jnp.zeros((lk.shape[0], b, eh, ew, lk.shape[-1]), lk.dtype)
            ghv = jnp.zeros((lv.shape[0], b, eh, ew, lv.shape[-1]), lv.dtype)
        # record starts as zeros (not None) so the state pytree structure is
        # stable across propagate calls (lax.scan carry requirement); it is
        # only consumed when the bank is full, never right after reference
        record0 = (jnp.zeros((b, hw, cfg.max_mem_slots), jnp.float32)
                   if self.need_record else None)
        state = EngineState(
            bank=bank, short_k=sk, short_v=sv,
            mems=mems, record=record0, logits4x=logits,
            frame_step=jnp.asarray(frame_step, jnp.int32),
            last_mem_step=jnp.asarray(frame_step, jnp.int32),
            gap=jnp.asarray(gap, jnp.int32),
            obj_nums=jnp.asarray(obj_nums, jnp.int32),
            gru_hid_k=ghk, gru_hid_v=ghv,
        )
        return state, logits

    # -- propagate (aot_engine.py:398-436) ------------------------------
    def _propagate_impl(self, params, state: EngineState, img):
        xs = self._encode_groups(params, img, state.short_k.shape[1])
        b, eh, ew, c = xs[-1].shape
        hw = eh * ew
        feat = xs[-1].reshape(b, hw, c)
        self_pos = self._apply(params, type(self.model).get_pos_emb, eh, ew)
        cur_pe, slot_pe = None, None
        if self.cfg.use_temporal_positional_embedding:
            cur_pe, mem = self._apply(params, type(self.model).temporal_pe)
            slot_pe = interpolate_temporal_pe(mem, state.bank.count,
                                              state.bank.capacity)
            # rank -> physical: slots are order-indexed (update_bank_inplace
            # overwrites evicted slots in place), so each physical slot
            # takes the PE of its temporal rank. Identity while the bank is
            # in temporal order (fill-up / compaction paths).
            slot_pe = jnp.take(slot_pe, state.bank.order, axis=0)
        intermediates, mems, record = self._apply(
            params, type(self.model).lstt_forward, feat,
            self._bank_tuple(state.bank), valid_slot_mask(state.bank),
            self._short_tuple(state), None, self_pos, cur_pe, slot_pe,
            (eh, ew), self.need_record, True, None, self.use_pallas)
        logits = self._decode(params, intermediates, xs, state.obj_nums)
        state = state.replace(frame_step=state.frame_step + 1, mems=mems,
                              record=record, logits4x=logits)
        return state, logits

    # -- update_memory (aot_engine.py:327-369) ---------------------------
    def _update_impl(self, params, state: EngineState, label):
        cfg = self.cfg
        id_emb = self._id_emb(params, label)
        lk, lv, sk, sv = self._apply(
            params, type(self.model).write_memories, state.mems, id_emb)

        if cfg.no_long_memory:
            return state.replace(short_k=sk, short_v=sv)

        do_long = state.frame_step - state.last_mem_step >= state.gap

        record, fg = None, None
        if self.need_record and state.record is not None:
            # fg prob at encoder resolution (aot_engine.py:355-362); cheap
            # enough ([B, hw] softmax + resize) to compute every frame
            b_, hw = lk.shape[1], lk.shape[2]
            up = resize_bilinear(state.logits4x, self._enc_hw(state),
                                 cfg.model_align_corners)
            prob = jax.nn.softmax(up.astype(jnp.float32), axis=-1)
            record = state.record
            fg = (1.0 - prob[..., 0]).reshape(b_, hw)

        if cfg.gru_memory_active:
            # the ConvGRU compression is too heavy to run every frame, so
            # this (off-by-default) variant keeps the lax.cond append+evict
            # — it pays the cond-join bank copy each frame
            def no_write(_):
                return state.bank, state.gru_hid_k, state.gru_hid_v

            def write(_):
                appended = bank_append(state.bank, lk, lv)
                eh, ew = self._enc_hw(state)

                def compress_fn(ks, vs, hk, hv):
                    # bank slots are token-padded; the ConvGRU reshapes to
                    # (eh, ew), so slice to the true extent and pad the
                    # compressed outputs back to the slot width
                    t_hw = eh * ew
                    pad = ks.shape[2] - t_hw
                    ok, ov, nhk, nhv = self.model.apply(
                        {"params": params}, ks[:, :, :t_hw], vs[:, :, :t_hw],
                        hk, hv, (eh, ew),
                        method=lambda m, *a: m.lstt.compress_evicted(*a))
                    if pad:
                        ok = jnp.pad(ok, ((0, 0), (0, 0), (0, pad), (0, 0)))
                        ov = jnp.pad(ov, ((0, 0), (0, 0), (0, pad), (0, 0)))
                    return ok, ov, nhk, nhv

                evicted, nhk, nhv = evict_if_full_gru(
                    appended, cfg.former_mem_len, cfg.latter_mem_len,
                    compress_fn, state.gru_hid_k, state.gru_hid_v,
                    record, fg, use_attn_weight=record is not None)
                return evicted, nhk, nhv

            new_bank, ghk, ghv = jax.lax.cond(do_long, write, no_write, None)
        else:
            # order-indexed in-place write: unconditional one-slot
            # dynamic_update_slice (no cond-join copy of the bank carry,
            # no compaction gather — see memory/eviction.update_bank_inplace)
            new_bank = update_bank_inplace(
                state.bank, lk, lv, do_long,
                cfg.former_mem_len, cfg.latter_mem_len, record, fg,
                use_attn_weight=record is not None)
            ghk, ghv = state.gru_hid_k, state.gru_hid_v
        return state.replace(
            bank=new_bank,
            short_k=sk, short_v=sv,
            gru_hid_k=ghk, gru_hid_v=ghv,
            last_mem_step=jnp.where(do_long, state.frame_step,
                                    state.last_mem_step),
        )

    # -- fused streaming step -------------------------------------------
    def _step_impl(self, params, state: EngineState, img, out_hw):
        """propagate -> upsample -> argmax -> update_memory in ONE dispatch.

        The fast path for the common single-group, single-aug case: per-frame
        Python/jit dispatch overhead dominates on slow hosts, and the
        reference pays it four times per frame (propagate, softmax, argmax,
        update). Returns (state, label [B,H,W] int32, probs? None)."""
        from rmem_tpu.ops.resize import resize_nearest

        state, logits4 = self._propagate_impl(params, state, img)
        # (a channel-first upsample+argmax epilogue — transpose to
        # [1,C,H,W] so the argmax reduces over a major axis — was measured
        # 158.3 vs 182 FPS on the 480p bench: the channel-last interleave
        # lerp is what XLA schedules well here, not the reduce. Exact
        # equivalence of the two formulations stays pinned by
        # test_step_epilogue_channel_first_exact.)
        if logits4.shape[0] == 1:
            # single id-group: soft_logit_aggregation is the identity, so
            # upsample+argmax runs phase-decomposed channel-major without
            # materializing the [H, W, c] float tensor (ops/resize.py;
            # bit-identical, pinned by test_step_epilogue_phase_exact)
            from rmem_tpu.ops.resize import upsample_argmax
            label_full = upsample_argmax(logits4, out_hw,
                                         self.cfg.model_align_corners)
        else:
            logits = resize_bilinear(logits4, out_hw,
                                     self.cfg.model_align_corners)
            merged = soft_logit_aggregation(logits,
                                            self.cfg.model_max_obj_num)
            label_full = jnp.argmax(merged, axis=-1).astype(jnp.int32)
        # memory update expects the label at the model input size, nearest-
        # resized from the full-res argmax (evaluator.py:509-523)
        label_in = resize_nearest(label_full[None, ..., None],
                                  img.shape[1:3])[0, ..., 0]
        glabels = separate_mask(label_in[None], img.shape[0],
                                self.cfg.model_max_obj_num)
        state = self._update_impl(params, state, glabels)
        return state, label_full

    def step(self, state: EngineState, img, out_hw: Tuple[int, int]):
        """Fused propagate+update; returns (state, merged label at out_hw)."""
        return self._step(self.params, state, img, out_hw=out_hw)

    # -- fused multi-aug step ---------------------------------------------
    def _multi_step_impl(self, params, states, imgs, out_hw, flips):
        """ALL (scale, flip) augs in ONE dispatch (the reference loops augs
        on the host, evaluator.py:351-441): propagate each aug, upsample to
        the original size, unflip, mean the softmaxes, argmax; then per aug
        re-flip + nearest-resize the label to that aug's input size and
        update its memory (evaluator.py:509-523)."""
        from rmem_tpu.ops.resize import resize_nearest

        new_states = []
        agg = []
        for st, img, flip in zip(states, imgs, flips):
            st, logits4 = self._propagate_impl(params, st, img)
            logits = resize_bilinear(logits4, out_hw,
                                     self.cfg.model_align_corners)
            merged = soft_logit_aggregation(logits,
                                            self.cfg.model_max_obj_num)
            if flip:
                merged = merged[:, ::-1]
            agg.append(jax.nn.softmax(merged.astype(jnp.float32), axis=-1))
            new_states.append(st)
        mean_prob = jnp.mean(jnp.stack(agg), axis=0)
        label_full = jnp.argmax(mean_prob, axis=-1).astype(jnp.int32)

        out_states = []
        for st, img, flip in zip(new_states, imgs, flips):
            lab = label_full[:, ::-1] if flip else label_full
            lab_in = resize_nearest(lab[None, ..., None],
                                    img.shape[1:3])[0, ..., 0]
            glabels = separate_mask(lab_in[None], img.shape[0],
                                    self.cfg.model_max_obj_num)
            out_states.append(self._update_impl(params, st, glabels))
        return tuple(out_states), label_full

    def step_multi(self, states, imgs, out_hw: Tuple[int, int], flips):
        """states/imgs: per-aug tuples; flips: static tuple of bools."""
        if not hasattr(self, "_multi_step"):
            self._multi_step = jax.jit(
                self._multi_step_impl, donate_argnums=(1,),
                static_argnames=("out_hw", "flips"))
        return self._multi_step(self.params, tuple(states), tuple(imgs),
                                out_hw=out_hw, flips=tuple(flips))

    def _multi_scan_impl(self, params, states, imgs, out_hw, flips):
        def body(sts, imgs_t):
            sts, label = self._multi_step_impl(params, sts, imgs_t, out_hw,
                                               flips)
            return sts, label

        return jax.lax.scan(body, tuple(states), tuple(imgs))

    def scan_steps_multi(self, states, imgs, out_hw: Tuple[int, int], flips):
        """Chunked multi-aug: imgs is a per-aug tuple of [K,B,H,W,3] stacks;
        one dispatch per K-frame chunk."""
        if not hasattr(self, "_multi_scan"):
            self._multi_scan = jax.jit(
                self._multi_scan_impl, donate_argnums=(1,),
                static_argnames=("out_hw", "flips"))
        return self._multi_scan(self.params, tuple(states), tuple(imgs),
                                out_hw=out_hw, flips=tuple(flips))

    # -- chunked frame scan ---------------------------------------------
    def _scan_impl(self, params, state: EngineState, imgs, out_hw):
        """lax.scan of the fused step over a chunk of frames: ONE dispatch
        per chunk, so per-call host/tunnel latency is amortized across K
        frames (SURVEY §7 step 4's 'engine as a scan'). imgs: [K, B, H, W, 3];
        returns (state, labels [K, *out_hw])."""
        def body(st, img):
            st, label = self._step_impl(params, st, img, out_hw)
            return st, label

        return jax.lax.scan(body, state, imgs)

    def scan_steps(self, state: EngineState, imgs, out_hw: Tuple[int, int]):
        """Process a [K, B, H, W, 3] frame chunk in one dispatch."""
        return self._scan(self.params, state, imgs, out_hw=out_hw)

    # -- raw-frame chunked scan (device-side preprocessing) ---------------
    def _prep_impl(self, raw, in_hw, flip):
        """[K, H0, W0, 3] uint8 -> [K, 1, h, w, 3] normalized float32:
        cast, cv2-exact cubic resize, ImageNet normalize, optional flip —
        all on device. Uploading raw uint8 instead of resized float32 cuts
        host->device traffic 4x (and the bytes compress far better on
        tunneled transports); the resize runs on the VPU instead of the
        host core (managers/evaluator.py _prep_frame is the host twin)."""
        from rmem_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
        from rmem_tpu.ops.resize import resize_cubic

        if raw.ndim == 3:
            # planar I420 [K, H0*3//2, W0]: reduced-bytes upload mode
            # (config.eval_yuv420_upload) — device-side chroma upsample +
            # BT.601 inverse, then the same cubic/normalize pipeline
            from rmem_tpu.ops.color import yuv420_to_rgb
            x = resize_cubic(yuv420_to_rgb(raw), in_hw)
        else:
            x = resize_cubic(raw.astype(jnp.float32), in_hw)
        mean = jnp.asarray(IMAGENET_MEAN) * 255.0
        std = jnp.asarray(IMAGENET_STD) * 255.0
        x = (x - mean) / std
        if flip:
            x = x[:, :, ::-1]
        return x[:, None]

    def _scan_raw_impl(self, params, state: EngineState, raw, in_hw,
                       out_hw, flip):
        imgs = self._prep_impl(raw, in_hw, flip)
        state, labels = self._scan_impl(params, state, imgs, out_hw)
        return state, labels.astype(jnp.uint8)  # 4x smaller D2H

    def scan_steps_raw(self, state: EngineState, raw_u8,
                       in_hw: Tuple[int, int], out_hw: Tuple[int, int],
                       flip: bool = False):
        """Single-aug chunk from RAW [K, H0, W0, 3] uint8 frames."""
        if not hasattr(self, "_scan_raw"):
            donate = (1,) if self._donate else ()
            self._scan_raw = jax.jit(
                self._scan_raw_impl, donate_argnums=donate,
                static_argnames=("in_hw", "out_hw", "flip"))
        return self._scan_raw(self.params, state, raw_u8, in_hw=in_hw,
                              out_hw=out_hw, flip=flip)

    def _multi_scan_raw_impl(self, params, states, raw, in_hws, out_hw,
                             flips):
        imgs = tuple(self._prep_impl(raw, in_hw, flip)
                     for in_hw, flip in zip(in_hws, flips))
        states, labels = self._multi_scan_impl(params, states, imgs, out_hw,
                                               flips)
        return states, labels.astype(jnp.uint8)

    def scan_steps_multi_raw(self, states, raw_u8, in_hws, out_hw, flips):
        """Multi-aug chunk from ONE raw uint8 upload: every (scale, flip)
        aug resizes from the same frames on device."""
        if not hasattr(self, "_multi_scan_raw"):
            self._multi_scan_raw = jax.jit(
                self._multi_scan_raw_impl, donate_argnums=(1,),
                static_argnames=("in_hws", "out_hw", "flips"))
        return self._multi_scan_raw(self.params, tuple(states), raw_u8,
                                    in_hws=tuple(in_hws), out_hw=out_hw,
                                    flips=tuple(flips))

    def _enc_hw(self, state: EngineState) -> Tuple[int, int]:
        """16x grid dims from the (static) 4x logits shape."""
        hw = state.short_k.shape[2]
        h4, w4 = state.logits4x.shape[1:3]
        if self.cfg.model_align_corners:
            eh, ew = (h4 - 1) // 4 + 1, (w4 - 1) // 4 + 1
        else:
            eh, ew = h4 // 4, w4 // 4
        assert eh * ew == hw, (eh, ew, hw)
        return (eh, ew)

    # -- public API ------------------------------------------------------
    def add_reference(self, img, label, obj_nums, frame_step=0,
                      gap: int = 5) -> Tuple[EngineState, jnp.ndarray]:
        """img [B,H,W,3] float; label [B,H,W] int; obj_nums [B]."""
        return self._add_ref(self.params, img, label,
                             jnp.asarray(obj_nums, jnp.int32),
                             jnp.asarray(frame_step, jnp.int32),
                             jnp.asarray(gap, jnp.int32))

    def propagate(self, state: EngineState, img):
        return self._propagate(self.params, state, img)

    def update_memory(self, state: EngineState, label):
        return self._update(self.params, state, label)

    def predict_logits_at(self, logits4x, out_hw):
        """Upsample 4x logits to `out_hw` (aot_engine.py:467-483)."""
        return resize_bilinear(logits4x, out_hw, self.cfg.model_align_corners)
