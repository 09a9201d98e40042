"""Eval datasets: per-sequence frame streams.

Reference: aot_plus/dataloaders/eval_datasets.py. Each dataset yields
`VideoSequence` objects; a sequence yields per-frame dicts with the raw uint8
image, the (optional) ground-truth label with ids squeezed to the
first-seen-order index space, and metadata — including mid-video new-object
introduction via the per-frame obj_nums/obj_indices scan
(eval_datasets.py:37-52).
"""

from __future__ import annotations

import os
import zlib
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional, Sequence

import cv2
import numpy as np


@dataclass
class Frame:
    image: np.ndarray                 # uint8/float32 [H, W, 3] RGB
    label: Optional[np.ndarray]       # uint8 [H, W] squeezed ids, or None
    name: str
    obj_num: int
    obj_idx: List[int]                # squeezed -> original id map


@dataclass
class VideoSequence:
    """Lazy frame streamer for one video (eval_datasets.py:14-120)."""

    name: str
    image_root: str
    label_root: str
    images: List[str] = field(default_factory=list)
    labels: List[str] = field(default_factory=list)
    single_obj: bool = False

    def __post_init__(self):
        # scan label files to find when each object first appears
        self.obj_nums: List[int] = []
        self.obj_indices: List[List[int]] = []
        curr_objs = [0]
        for img_name in self.images:
            self.obj_nums.append(len(curr_objs) - 1)
            lbl = os.path.splitext(img_name)[0] + ".png"
            if lbl in self.labels:
                lab = self._read_label(lbl)
                for obj in np.unique(lab):
                    if obj not in curr_objs and obj != 255:
                        curr_objs.append(int(obj))
            self.obj_indices.append(curr_objs.copy())
        if len(self.obj_nums) > 1:
            self.obj_nums[0] = self.obj_nums[1]

    def __len__(self):
        return len(self.images)

    def _read_image(self, name: str) -> np.ndarray:
        path = os.path.join(self.image_root, self.name, name)
        img = cv2.imread(path)
        return np.asarray(img, np.float32)[:, :, ::-1]  # BGR -> RGB

    def _read_label(self, name: str,
                    squeeze_idx: Optional[List[int]] = None) -> np.ndarray:
        from PIL import Image
        path = os.path.join(self.label_root, self.name, name)
        label = np.asarray(Image.open(path), np.uint8)
        if self.single_obj:
            label = (label > 0).astype(np.uint8)
        elif squeeze_idx is not None:
            out = np.zeros_like(label)
            for new_id, obj_id in enumerate(squeeze_idx):
                if obj_id == 0:
                    continue
                out += ((label == obj_id) * new_id).astype(np.uint8)
            label = out
        return label

    def first_label_file(self) -> Optional[str]:
        """Path of the first annotation PNG (for byte-exact copy into the
        result dir, reference eval_datasets.py:311-334)."""
        if not self.labels or not getattr(self, "label_root", None):
            return None
        p = os.path.join(self.label_root, self.name, self.labels[0])
        return p if os.path.isfile(p) else None

    def __iter__(self) -> Iterator[Frame]:
        for idx, img_name in enumerate(self.images):
            lbl = os.path.splitext(img_name)[0] + ".png"
            label = None
            if lbl in self.labels:
                label = self._read_label(lbl, self.obj_indices[idx])
            yield Frame(image=self._read_image(img_name), label=label,
                        name=img_name, obj_num=self.obj_nums[idx],
                        obj_idx=self.obj_indices[idx])


class VOSTestDataset:
    """VOST val split (eval_datasets.py:274-344): JPEGImages_10fps unless
    oracle; DAVIS-style layout otherwise."""

    def __init__(self, root: str, split: str = "val", oracle: bool = False):
        self.image_root = os.path.join(
            root, "JPEGImages" if oracle else "JPEGImages_10fps")
        self.label_root = os.path.join(root, "Annotations")
        with open(os.path.join(root, "ImageSets", f"{split}.txt")) as f:
            self.seq_names = [s.strip() for s in f if s.strip()]

    def __len__(self):
        return len(self.seq_names)

    def sequence(self, idx: int) -> VideoSequence:
        name = self.seq_names[idx]
        images = sorted(os.listdir(os.path.join(self.image_root, name)))
        # only the first frame's annotation drives inference
        # (eval_datasets.py:307-309); the rest are GT for offline scoring
        labels = [os.path.splitext(images[0])[0] + ".png"]
        return VideoSequence(name, self.image_root, self.label_root,
                             images, labels)


class DAVISTestDataset:
    """DAVIS 2017 val (eval_datasets.py:121-188)."""

    def __init__(self, root: str, split: str = "val", year: int = 2017,
                 resolution: str = "480p"):
        self.image_root = os.path.join(root, "JPEGImages", resolution)
        self.label_root = os.path.join(root, "Annotations", resolution)
        with open(os.path.join(root, "ImageSets", str(year),
                               f"{split}.txt")) as f:
            self.seq_names = [s.strip() for s in f if s.strip()]

    def __len__(self):
        return len(self.seq_names)

    def sequence(self, idx: int) -> VideoSequence:
        name = self.seq_names[idx]
        images = sorted(os.listdir(os.path.join(self.image_root, name)))
        labels = [os.path.splitext(images[0])[0] + ".png"]
        return VideoSequence(name, self.image_root, self.label_root,
                             images, labels)


class LongVideosTestDataset:
    """Long Videos (1000+ frames), single-object (eval_datasets.py:426-454)."""

    def __init__(self, root: str, split: str = "val"):
        self.image_root = os.path.join(root, "JPEGImages")
        self.label_root = os.path.join(root, "Annotations")
        with open(os.path.join(root, "ImageSets", f"{split}.txt")) as f:
            self.seq_names = [s.strip() for s in f if s.strip()]

    def __len__(self):
        return len(self.seq_names)

    def sequence(self, idx: int) -> VideoSequence:
        name = self.seq_names[idx]
        images = sorted(os.listdir(os.path.join(self.image_root, name)))
        labels = [os.path.splitext(images[0])[0] + ".png"]
        return VideoSequence(name, self.image_root, self.label_root,
                             images, labels, single_obj=True)


class YouTubeVOSTestDataset:
    """YouTube-VOS val (eval_datasets.py:190-271): sparse JPEG set with
    per-object first-appearance annotations (multiple label files drive
    mid-video new-object introduction); `dense` scores every frame from the
    _all_frames image set against the sparse annotations
    (eval_datasets.py:201-210)."""

    def __init__(self, root: str, year: int = 2019, split: str = "valid",
                 dense: bool = False):
        base = os.path.join(root, f"{year}", split)
        self.image_root = os.path.join(
            base + ("_all_frames" if dense else ""), "JPEGImages")
        self.label_root = os.path.join(base, "Annotations")
        self.seq_names = sorted(os.listdir(self.label_root))

    def __len__(self):
        return len(self.seq_names)

    def sequence(self, idx: int) -> VideoSequence:
        name = self.seq_names[idx]
        images = sorted(os.listdir(os.path.join(self.image_root, name)))
        # all annotated frames participate (new objects appear mid-video)
        labels = sorted(os.listdir(os.path.join(self.label_root, name)))
        return VideoSequence(name, self.image_root, self.label_root,
                             images, labels)


class _SyntheticSequence(VideoSequence):
    """3 sequences x N zero frames with a 2-object first mask
    (eval_datasets.py:457-514)."""

    def __init__(self, name: str, num_frames: int = 10, hw=(240, 432)):
        self.name = name
        self.hw = hw
        self.images = [f"{i:05d}.jpg" for i in range(num_frames)]
        self.labels = ["00000.png"]
        self.single_obj = False
        super().__post_init__()

    def _read_image(self, name):
        # zlib.crc32, not hash(): str hashes are salted per process, which
        # would break cross-process determinism of the probe harness.
        seed = zlib.crc32(f"{self.name}/{name}".encode()) % (2 ** 31)
        rng = np.random.RandomState(seed)
        return rng.rand(*self.hw, 3).astype(np.float32) * 255.0

    def _read_label(self, name, squeeze_idx=None):
        h, w = self.hw
        label = np.zeros(self.hw, np.uint8)
        label[h // 5: h // 2, w // 5: w // 2] = 1
        label[h // 2: 4 * h // 5, w // 2: 4 * w // 5] = 2
        return label


class SyntheticEvalDataset:
    def __init__(self, num_seqs: int = 3, num_frames: int = 10,
                 hw=(240, 432)):
        self.seq_names = [f"test{i}" for i in range(num_seqs)]
        self.num_frames = num_frames
        self.hw = hw

    def __len__(self):
        return len(self.seq_names)

    def sequence(self, idx: int) -> VideoSequence:
        return _SyntheticSequence(self.seq_names[idx], self.num_frames,
                                  self.hw)


def sequence_lengths(dataset) -> Optional[List[int]]:
    """Per-sequence frame counts from the dataset index (one listdir per
    sequence, no decoding). Feeds length-aware host sharding — the static
    counterpart of the reference's dynamic work queue
    (aot_plus/networks/managers/evaluator.py:276-295). Returns None when the
    dataset doesn't expose a cheap index."""
    if hasattr(dataset, "num_frames"):  # synthetic
        return [int(dataset.num_frames)] * len(dataset)
    if hasattr(dataset, "seq_names") and hasattr(dataset, "image_root"):
        try:
            return [len(os.listdir(os.path.join(dataset.image_root, n)))
                    for n in dataset.seq_names]
        except OSError:
            return None
    return None


def build_eval_dataset(cfg, data_root: Optional[str] = None):
    """Dataset dispatch (aot_plus/networks/managers/evaluator.py:112-263)."""
    name = cfg.test_dataset
    root = data_root or cfg.dir_data
    if name == "test":
        return SyntheticEvalDataset()
    if name == "vost":
        return VOSTestDataset(os.path.join(root, "VOST"),
                              cfg.test_dataset_split)
    if name in ("davis2017", "davis"):
        return DAVISTestDataset(os.path.join(root, "DAVIS"),
                                cfg.test_dataset_split)
    if name == "long_videos":
        return LongVideosTestDataset(os.path.join(root, "long_videos"),
                                     cfg.test_dataset_split)
    if name == "youtubevos":
        return YouTubeVOSTestDataset(os.path.join(root, "YTB"),
                                     split="valid")
    if name == "youtubevos_dense":
        return YouTubeVOSTestDataset(os.path.join(root, "YTB"),
                                     split="valid", dense=True)
    raise NotImplementedError(f"eval dataset {name!r}")
