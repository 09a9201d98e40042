"""Evaluator pipeline + offline scorer tests (synthetic data, tiny model)."""

import os

import numpy as np
import pytest
from PIL import Image

from rmem_tpu.config import get_config
from rmem_tpu.evaluation import Evaluation
from rmem_tpu.evaluation.evaluation import summarize
from rmem_tpu.managers.evaluator import Evaluator
from rmem_tpu.utils.image import label_colormap


def _write_mask(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    img = Image.fromarray(arr.astype(np.uint8)).convert("P")
    img.putpalette(label_colormap().reshape(-1).tolist())
    img.save(path)


def _make_gt(root, seqs=("a", "b"), frames=4, hw=(24, 32)):
    for s in seqs:
        for i in range(frames):
            m = np.zeros(hw, np.uint8)
            m[4:12, 4 + i:12 + i] = 1
            m[14:20, 6:14] = 2
            if i == 1:
                m[0:2, 0:2] = 255  # void region
            _write_mask(os.path.join(root, "Annotations", s,
                                     f"{i:05d}.png"), m)
    os.makedirs(os.path.join(root, "ImageSets"), exist_ok=True)
    with open(os.path.join(root, "ImageSets", "val.txt"), "w") as f:
        f.write("\n".join(seqs) + "\n")


def test_offline_scorer_perfect_and_degraded(tmp_path):
    root = str(tmp_path / "ds")
    _make_gt(root)
    # perfect predictions = GT with void zeroed
    res_perfect = str(tmp_path / "res_p")
    for s in ("a", "b"):
        for i in range(4):
            gt = np.asarray(Image.open(os.path.join(
                root, "Annotations", s, f"{i:05d}.png")), np.uint8)
            _write_mask(os.path.join(res_perfect, s, f"{i:05d}.png"),
                        np.where(gt == 255, 0, gt))
    ev = Evaluation(root, "val")
    g = summarize(ev.evaluate(res_perfect))
    assert g["J"] == pytest.approx(100.0)
    assert g["J_tr"] == pytest.approx(100.0)

    # degraded: object 1 erased everywhere
    res_bad = str(tmp_path / "res_b")
    for s in ("a", "b"):
        for i in range(4):
            gt = np.asarray(Image.open(os.path.join(
                root, "Annotations", s, f"{i:05d}.png")), np.uint8)
            pred = np.where((gt == 255) | (gt == 1), 0, gt)
            _write_mask(os.path.join(res_bad, s, f"{i:05d}.png"), pred)
    g2 = summarize(ev.evaluate(res_bad))
    assert g2["J"] == pytest.approx(50.0)  # obj1 J=0, obj2 J=1


def test_evaluator_synthetic_multiscale_flip(tmp_path):
    cfg = get_config("test", model="tiny_deaotl",
                     test_dataset="test", test_ckpt_path="test",
                     test_flip=True, test_multiscale=(1.0,))
    out = str(tmp_path / "eval_out")
    ev = Evaluator(cfg, output_root=out, log=lambda *a: None)
    assert len(ev.augs) == 2  # (1.0, noflip) + (1.0, flip)
    stats = ev.evaluate(max_seqs=1, max_frames=4)
    assert stats["all_frame_fps"] > 0
    pngs = os.listdir(os.path.join(out, "test0"))
    assert len(pngs) == 4
    arr = np.asarray(Image.open(os.path.join(out, "test0", "00001.png")))
    assert arr.shape == (240, 432)
    assert set(np.unique(arr)) <= {0, 1, 2}


def test_evaluator_deterministic_probes(tmp_path):
    """Seeded determinism harness: two runs with the same weights produce
    bit-identical per-frame logit probes (reference --debug_fix_random)."""
    import jax
    from rmem_tpu.models import build_vos_model, init_params

    cfg = get_config("test", model="tiny_deaotl", test_dataset="test",
                     test_ckpt_path="test")
    model = build_vos_model(cfg.model_vos, cfg)
    params = init_params(model, jax.random.PRNGKey(7))
    probes = []
    for run in range(2):
        ev = Evaluator(cfg, params=params,
                       output_root=str(tmp_path / f"r{run}"),
                       log=lambda *a: None, probe=True)
        ev.evaluate(max_seqs=1, max_frames=4)
        probes.append(np.stack(ev.probes))
    np.testing.assert_array_equal(probes[0], probes[1])
    assert probes[0].shape == (3, 7)
