"""Single-video demo (aot_plus/tools/demo.py): propagate a first-frame mask
through a directory of frames, write overlaid PNGs and predicted masks."""

from __future__ import annotations

import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser(description="rmem_tpu demo")
    p.add_argument("--model", default="r50_deaotl")
    p.add_argument("--stage", default="pre_vost_2")
    p.add_argument("--ckpt_path", default="test")
    p.add_argument("--frames_dir", required=True,
                   help="directory of ordered video frames (jpg/png)")
    p.add_argument("--first_mask", required=True,
                   help="palettized PNG mask for the first frame")
    p.add_argument("--output_dir", default="./demo_out")
    p.add_argument("--gap", type=int, default=5)
    p.add_argument("--max_frames", type=int, default=None)
    args = p.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from rmem_tpu.config import get_config
    from rmem_tpu.data.transforms import (prep_eval_frame, resize_label,
                                          restrict_size)
    from rmem_tpu.engine import InferenceEngine, separate_mask, \
        soft_logit_aggregation
    from rmem_tpu.models import build_vos_model, init_params
    from rmem_tpu.utils.image import AsyncMaskWriter, overlay_mask

    cfg = get_config(args.stage, "demo", args.model,
                     test_ckpt_path=args.ckpt_path)
    from rmem_tpu.models import load_model_params
    model = build_vos_model(cfg.model_vos, cfg)
    params = (load_model_params(model, args.ckpt_path)
              if args.ckpt_path != "test"
              else init_params(model, jax.random.PRNGKey(0)))
    engine = InferenceEngine(model, params, cfg, donate=False)

    frames = sorted(f for f in os.listdir(args.frames_dir)
                    if f.lower().endswith((".jpg", ".png", ".jpeg")))
    if args.max_frames:
        frames = frames[: args.max_frames]
    first = np.asarray(Image.open(args.first_mask), np.uint8)
    writer = AsyncMaskWriter()
    os.makedirs(args.output_dir, exist_ok=True)

    state = None
    groups = max(int(np.ceil(first.max() / cfg.model_max_obj_num)), 1)
    for i, fname in enumerate(frames):
        raw = cv2.imread(os.path.join(args.frames_dir, fname))[:, :, ::-1]
        ori_h, ori_w = raw.shape[:2]
        hw = restrict_size(ori_h, ori_w, cfg.test_max_size,
                           cfg.test_min_size, 1.0, cfg.model_align_corners)
        # shared with Evaluator._prep_frame: float32-cubic-resize THEN
        # normalize (video_transforms.py:635-639) so demo masks match the
        # parity-verified eval path exactly.
        img = jnp.asarray(prep_eval_frame(raw, hw)[None])
        if i == 0:
            lab = resize_label(first, hw)
            glab = separate_mask(jnp.asarray(lab[None]), groups,
                                 cfg.model_max_obj_num)
            # ghost-identity semantics: every group is told it has the full
            # MODEL_MAX_OBJ_NUM objects, matching the reference inference
            # engine (aot_engine.py:686-699) and our Evaluator.
            state, _ = engine.add_reference(
                img, glab, [cfg.model_max_obj_num] * groups,
                gap=args.gap)
            pred = first
        else:
            state, logits4 = engine.propagate(state, img)
            logits = engine.predict_logits_at(logits4, (ori_h, ori_w))
            merged = soft_logit_aggregation(logits, cfg.model_max_obj_num)
            pred = np.asarray(jnp.argmax(merged, -1), np.uint8)
            lab = resize_label(pred, hw)
            glab = separate_mask(jnp.asarray(lab[None]), groups,
                                 cfg.model_max_obj_num)
            state = engine.update_memory(state, glab)
        writer.save(pred, os.path.join(args.output_dir, "masks",
                                       os.path.splitext(fname)[0] + ".png"))
        over = overlay_mask(raw, pred)
        cv2.imwrite(os.path.join(args.output_dir,
                                 os.path.splitext(fname)[0] + "_overlay.jpg"),
                    over[:, :, ::-1])
        print(f"frame {i + 1}/{len(frames)}: {fname}")
    writer.join()
    print(f"wrote {len(frames)} overlays + masks to {args.output_dir}")


if __name__ == "__main__":
    main()
