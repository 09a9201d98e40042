"""Component time budget by graph ablation inside the fused scan.

Per-op microbenchmarks are invalid on this rig (the tunnel dominates any
single-op sync — ROUND_NOTES), so components are measured by REMOVING them
from the compiled scan graph (monkeypatched stubs that keep all shapes) and
timing the same chunked loop as bench.py. The difference to the full graph
is that component's budget, including whatever XLA fusion around it
disappears with it.

Stubs keep parameters and shapes identical, so no init/convert changes.

Usage: python benchmarks/ablate_bench.py [--ablate none,local,...]
Ablations:
  none       full graph (reference point; same as bench.py)
  bank       long-term bank attention -> zeros (+ zero record)
  local      tiled local attention -> zeros
  self_attn  gated self-attention -> zeros
  dwconv     GatedTail depthwise conv removed (gate+projection kept)
  tails      GatedTail -> projection(agg*gate) only == dwconv here
  encoder    encoder -> constant feature pyramid
  decode     FPN decoder + conv head -> zeros (folds most of the epilogue
             too: true decode share = decode - epilogue)
  epilogue   full-res label chain (upsample/aggregate/argmax/resize/
             separate_mask) -> constants (also zeroes the write-time fg
             upsample, a minor conflation)
  update     memory-update path skipped entirely (id emb, write
             projections, append, eviction)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

HW = (481, 849)
NUM_OBJECTS = 10
CHUNK = 30
N_CHUNKS = 4


def _apply_ablation(name):
    from rmem_tpu.models import gpm
    from rmem_tpu.ops import layers as ops_layers

    if name == "none":
        return
    if name == "bank":
        def stub(q, k, v, mask, heads, need_record=False, scale=None,
                 use_pallas=False, **kw):
            out = jnp.zeros(q.shape[:-1] + (v.shape[-1],), q.dtype)
            rec = (jnp.zeros(q.shape[:-1] + (k.shape[0],), jnp.float32)
                   if need_record else None)
            return out, rec
        gpm.bank_attention_dispatch = stub
    elif name == "local":
        def stub(q, k, v, rel, size_2d, heads, max_dis=7, scale=None,
                 tile=None, **kw):
            return jnp.zeros(q.shape[:-1] + (v.shape[-1],), q.dtype)
        # patch BOTH formulations: the production config routes through the
        # Pallas kernel (use_pallas='all'), which GPMBlock imports from its
        # module at call time
        gpm.tiled_local_attention = stub
        from rmem_tpu.kernels import local_attention as la
        la.pallas_local_attention = stub
    elif name == "self_attn":
        def stub(self, x, size_2d, deterministic=True, **kw):
            return jnp.zeros(x.shape[:-1] + (self.d_vu,), x.dtype)
        gpm.GatedSelfAttention.__call__ = stub
    elif name in ("dwconv", "tails"):
        def stub(self, agg, gate, size_2d, deterministic=True, **kw):
            return self.projection(agg * gate)
        gpm.GatedTail.__call__ = stub
    elif name == "stem":
        # zero the stem's output: conv1 (7x7s2 over 3 channels — the
        # MXU-hostile contraction) + bn + relu + maxpool get DCE'd
        from rmem_tpu.models.encoders import resnet as rn
        orig_pool = rn.max_pool_3x3_s2

        def stub(x):
            return jnp.zeros_like(orig_pool(x))
        rn.max_pool_3x3_s2 = stub
    elif name == "encoder":
        # constant pyramid: zero out the conv stack but keep shapes by
        # replacing the encoder's apply with broadcast constants
        from rmem_tpu.models import aot as aot_mod

        orig = aot_mod.AOT.encode_image

        def stub(self, img):
            # zeros_like only needs shapes -> the conv stack's outputs are
            # unused and XLA dead-code-eliminates the whole encoder
            return tuple(jnp.zeros_like(x) for x in orig(self, img))
        aot_mod.AOT.encode_image = stub
    elif name == "decode":
        # FPN decoder + conv head -> zeros (logits4x shape kept; the
        # epilogue then runs on constants and partially folds, so the true
        # decode share is between this and the epilogue ablation)
        from rmem_tpu.engine import inference as eng_mod

        orig = eng_mod.InferenceEngine._decode

        def stub(self, params, intermediates, xs, obj_nums):
            return jnp.zeros_like(orig(self, params, intermediates, xs,
                                       obj_nums))
        eng_mod.InferenceEngine._decode = stub
    elif name == "epilogue":
        # full-res label chain: bilinear upsample [..,12] -> soft logit
        # aggregation -> argmax -> nearest resize -> separate_mask. Zeroing
        # the upsample constant-folds the whole chain; the memory update
        # still runs (on a constant label).
        from rmem_tpu.engine import inference as eng_mod
        orig = eng_mod.resize_bilinear

        def stub(x, out_hw, align_corners):
            return jnp.zeros_like(orig(x, out_hw, align_corners))
        eng_mod.resize_bilinear = stub
    elif name == "bankwrite":
        # only the long-memory K/V slot write: run the REAL update for the
        # count/order/stats schedule (so the attention workload stays
        # bit-identical — naive count stubs inflate the valid-slot count
        # and measure MORE attention, not less write), then restore the
        # original K/V so XLA dead-code-eliminates the two big
        # dynamic_update_slices. id emb, write projections, eviction
        # metadata, and the short-term update all stay.
        from rmem_tpu.engine import inference as eng_mod
        orig_upd = eng_mod.update_bank_inplace

        def stub(bank, k, v, do, f, l, record=None, fg=None,
                 use_attn_weight=False):
            real = orig_upd(bank, k, v, do, f, l, record, fg,
                            use_attn_weight)
            return real.replace(k=bank.k, v=bank.v)
        eng_mod.update_bank_inplace = stub
    elif name == "idemb":
        from rmem_tpu.engine import inference as eng_mod
        orig = eng_mod.InferenceEngine._id_emb

        def stub(self, params, label):
            return jnp.zeros_like(orig(self, params, label))
        eng_mod.InferenceEngine._id_emb = stub
    elif name == "update":
        # memory-update path: id embedding + write projections + append +
        # scored eviction + short-term replace (state passes through)
        from rmem_tpu.engine import inference as eng_mod

        def stub(self, params, state, label):
            return state
        eng_mod.InferenceEngine._update_impl = stub
    elif name == "cond":
        # the lax.cond construct itself: id emb, write projections, and the
        # short-term replace all still run, but the bank never changes and
        # NO cond is emitted. Removes cond-boundary buffer copies of the
        # bank carry plus the amortized write compute (= bankwrite's
        # share); the delta beyond bankwrite is the copy cost.
        from rmem_tpu.engine import inference as eng_mod

        def stub(self, params, state, label):
            id_emb = self._id_emb(params, label)
            _, _, sk, sv = self._apply(
                params, type(self.model).write_memories, state.mems, id_emb)
            return state.replace(short_k=sk, short_v=sv)
        eng_mod.InferenceEngine._update_impl = stub
    elif name == "writeproj":
        # write projections (fuse_id_value + V/ID_V concat) -> zeros;
        # id emb, the cond write, and the short-term replace all still run
        # (on constants)
        from rmem_tpu.models import aot as aot_mod
        from rmem_tpu.models import deaot as deaot_mod

        def stub_of(orig):
            def stub(self, mems, id_emb):
                return tuple(jnp.zeros_like(t)
                             for t in orig(self, mems, id_emb))
            return stub
        deaot_mod.DeAOT.write_memories = stub_of(
            deaot_mod.DeAOT.write_memories)
        aot_mod.AOT.write_memories = stub_of(aot_mod.AOT.write_memories)
    elif name == "shortwrite":
        # short-term memory keeps the previous frame's buffers (the sk/sv
        # produced by write_memories are dropped; projections may then
        # partially dead-code on the AOT path — on DeAOT lk/sk alias so
        # only the state write itself disappears)
        from rmem_tpu.engine import inference as eng_mod
        orig = eng_mod.InferenceEngine._update_impl

        def stub(self, params, state, label):
            new = orig(self, params, state, label)
            return new.replace(short_k=state.short_k,
                               short_v=state.short_v)
        eng_mod.InferenceEngine._update_impl = stub
    else:
        raise ValueError(name)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ablate", default="none")
    args = ap.parse_args()

    from rmem_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    _apply_ablation(args.ablate)

    from rmem_tpu.config import get_config
    from rmem_tpu.engine import InferenceEngine
    from rmem_tpu.models import build_vos_model, init_params

    cfg = get_config("pre_vost", model="r50_deaotl")
    model = build_vos_model(cfg.model_vos, cfg)
    params = init_params(model, jax.random.PRNGKey(0), HW)
    engine = InferenceEngine(model, params, cfg, donate=True)

    rng = np.random.RandomState(0)
    img0 = jnp.asarray(rng.rand(1, *HW, 3), jnp.float32)
    mask = np.zeros((1, *HW), np.int32)
    for i in range(NUM_OBJECTS):
        mask[:, :, i * 80:(i * 80 + 60)] = i + 1
    state, _ = engine.add_reference(img0, jnp.asarray(mask), [NUM_OBJECTS],
                                    gap=5)
    chunk = jnp.asarray(rng.rand(CHUNK, 1, *HW, 3), jnp.float32)

    state, labels = engine.scan_steps(state, chunk, HW)
    _ = np.asarray(labels[-1])

    t0 = time.perf_counter()
    for _ in range(N_CHUNKS):
        state, labels = engine.scan_steps(state, chunk, HW)
    _ = np.asarray(labels[-1])
    dt = time.perf_counter() - t0

    fps = (CHUNK * N_CHUNKS) / dt
    print(json.dumps({
        "ablate": args.ablate,
        "fps": round(fps, 2),
        "ms_per_frame": round(1000.0 * dt / (CHUNK * N_CHUNKS), 3),
    }))


if __name__ == "__main__":
    main()
