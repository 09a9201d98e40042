"""Bisect the residual forward divergence: run the reference torch model and
our converted model on an IDENTICAL input tensor and diff per-stage outputs
(encoder pyramid, projector, id embedding, per-layer LSTT outputs, logits).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from cpu_shim import install  # noqa: E402

install()
sys.path.insert(0, "/root/reference/aot_plus")
sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="r50_deaotl")
    ap.add_argument("--stage", default="pre_vost")
    ap.add_argument("--ckpt", default="/tmp/parity/ref_weights.pth")
    ap.add_argument("--hw", type=int, nargs=2, default=[209, 305])
    args = ap.parse_args()

    import torch
    from tools.get_config import get_config as ref_get_config
    from networks.models import build_vos_model as ref_build

    rcfg = ref_get_config(args.stage, "parity", args.model)
    tmodel = ref_build(rcfg.MODEL_VOS, rcfg)
    from utils.checkpoint import load_network as ref_load
    tmodel, removed = ref_load(tmodel, args.ckpt, 0)
    tmodel.eval()
    print("ref removed keys:", removed)

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from rmem_tpu.config import get_config
    from rmem_tpu.models import build_vos_model, load_model_params

    cfg = get_config(args.stage, "parity", args.model,
                     compute_dtype="float32")
    model = build_vos_model(cfg.model_vos, cfg)
    params = load_model_params(model, args.ckpt)

    h, w = args.hw
    rng = np.random.RandomState(3)
    img = rng.randn(1, 3, h, w).astype(np.float32)
    lab = np.zeros((1, 1, h, w), np.float32)
    lab[:, :, h // 4: h // 2, w // 4: w // 2] = 1.0
    lab[:, :, h // 2: 3 * h // 4, w // 2: 3 * w // 4] = 2.0

    def diff(name, a, b):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        if a.shape != b.shape:
            print(f"{name}: SHAPE {a.shape} vs {b.shape}")
            return
        d = np.abs(a - b)
        scale = max(np.abs(a).max(), 1e-6)
        print(f"{name}: max|d|={d.max():.3e} mean|d|={d.mean():.3e} "
              f"rel={d.max() / scale:.3e} (|a|max={np.abs(a).max():.3f})")

    # ---- encoder pyramid ----
    with torch.no_grad():
        t_xs = tmodel.encode_image(torch.from_numpy(img))
    j_xs = model.apply({"params": params}, jnp.asarray(
        img.transpose(0, 2, 3, 1)), method=type(model).encode_image)
    for i, (txi, jxi) in enumerate(zip(t_xs, j_xs)):
        diff(f"enc[{i}]", txi.numpy(), np.transpose(np.asarray(jxi),
                                                    (0, 3, 1, 2)))

    # ---- id embedding ----
    from utils.image import one_hot_mask as ref_one_hot
    with torch.no_grad():
        oh, ignore = ref_one_hot(torch.from_numpy(lab), rcfg.MODEL_MAX_OBJ_NUM)
        non_ig = (ignore == 0).float()
        oh2 = oh.clone()
        oh2[:, 0] = oh[:, 0] * non_ig.squeeze(1)
        oh_full = torch.cat([oh2, ignore], 1)
        t_id = tmodel.get_id_emb(oh_full)  # [B, C, H/16, W/16]
    from rmem_tpu.ops.masks import apply_ignore_token, one_hot_mask
    j_oh, j_ig = one_hot_mask(jnp.asarray(lab[:, 0].astype(np.int32)),
                              cfg.model_max_obj_num)
    j_in = apply_ignore_token(j_oh, j_ig, None)
    diff("one_hot", oh_full.numpy(),
         np.transpose(np.asarray(j_in), (0, 3, 1, 2)))
    j_id = model.apply({"params": params}, j_in,
                       method=type(model).get_id_emb)  # [B, hw, C]
    b, hw_, c = j_id.shape
    eh, ew = j_xs[-1].shape[1:3]
    diff("id_emb", t_id.numpy(),
         np.transpose(np.asarray(j_id).reshape(b, eh, ew, c), (0, 3, 1, 2)))

    # ---- positional embedding ----
    with torch.no_grad():
        t_pos = tmodel.get_pos_emb(t_xs[-1])  # [1, C, eh, ew] or seq
    j_pos = model.apply({"params": params}, eh, ew,
                        method=type(model).get_pos_emb)
    tp = t_pos.numpy()
    jp = np.asarray(j_pos)
    print("pos shapes", tp.shape, jp.shape)
    if tp.ndim == 4:
        tp_seq = tp.reshape(tp.shape[0], tp.shape[1], -1).transpose(2, 0, 1)
    else:
        tp_seq = tp
    diff("pos_emb", tp_seq.squeeze(), np.asarray(jp).squeeze())

    # ---- LSTT reference-frame forward (writes memories) ----
    with torch.no_grad():
        # the engine reshapes pos emb to [hw, B, C] (aot_engine.py:290-292)
        t_pos_seq = t_pos.expand(1, -1, -1, -1).reshape(
            1, t_pos.shape[1], -1).permute(2, 0, 1)
        t_te = (torch.cat((tmodel.cur_pos_emb, tmodel.mem_pos_emb), dim=0)
                if rcfg.USE_TEMPORAL_POSITIONAL_EMBEDDING else None)
        t_out = tmodel.LSTT_forward(
            t_xs, curr_id_emb=t_id.flatten(2).permute(2, 0, 1),
            pos_emb=t_pos_seq, size_2d=(eh, ew), temporal_encoding=t_te)
    feat = j_xs[-1].reshape(1, eh * ew, -1)
    cur_pe, mem_pe = model.apply({"params": params},
                                 method=type(model).temporal_pe)
    mem_pe1 = mem_pe[0:1] if mem_pe is not None else None
    j_inter, j_mems, _ = model.apply(
        {"params": params}, feat, None, None, None, j_id, j_pos, cur_pe,
        mem_pe1, (eh, ew), method=type(model).lstt_forward)
    for i, (ti, ji) in enumerate(zip(t_out, j_inter)):
        # torch: [hw, B, C] ; ours: [B, hw, C]
        diff(f"lstt_inter[{i}]", ti.numpy(),
             np.transpose(np.asarray(ji), (1, 0, 2)))

    # ---- decode ----
    with torch.no_grad():
        t_logits = tmodel.decode_id_logits(t_out, t_xs)
    j_logits = model.apply({"params": params}, j_inter, j_xs,
                           method=type(model).decode_id_logits)
    diff("logits", t_logits.numpy(),
         np.transpose(np.asarray(j_logits), (0, 3, 1, 2)))

    # ---- frame-1 propagate on an identical second frame ------------------
    # reference: init memory from the ref-frame output, then LSTT_forward
    # with no id emb reads long+short memories (aot_engine.py:398-436)
    with torch.no_grad():
        tmodel.init_LSTT_memory(size_2d=(eh, ew))
        img2 = rng.randn(1, 3, h, w).astype(np.float32)
        t_xs2 = tmodel.encode_image(torch.from_numpy(img2))
        t_out2 = tmodel.LSTT_forward(
            t_xs2, curr_id_emb=None, pos_emb=t_pos_seq, size_2d=(eh, ew),
            temporal_encoding=t_te)
        t_logits2 = tmodel.decode_id_logits(t_out2, t_xs2)

    lk, lv, sk, sv = model.apply(
        {"params": params}, j_mems, j_id,
        method=type(model).write_memories)
    bank_tuple = (lk[:, None], lv[:, None])
    mask1 = jnp.asarray([True])
    short = (sk, sv)
    j_xs2 = model.apply({"params": params}, jnp.asarray(
        img2.transpose(0, 2, 3, 1)), method=type(model).encode_image)
    feat2 = j_xs2[-1].reshape(1, eh * ew, -1)
    j_inter2, _, _ = model.apply(
        {"params": params}, feat2, bank_tuple, mask1, short, None, j_pos,
        cur_pe, mem_pe1, (eh, ew), method=type(model).lstt_forward)
    j_logits2 = model.apply({"params": params}, j_inter2, j_xs2,
                            method=type(model).decode_id_logits)
    diff("propagate1_logits", t_logits2.numpy(),
         np.transpose(np.asarray(j_logits2), (0, 3, 1, 2)))


if __name__ == "__main__":
    main()
