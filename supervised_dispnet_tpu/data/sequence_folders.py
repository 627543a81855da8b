"""Training dataset: 3-frame snippets from dumped KITTI scene folders.

Rebuild of the reference dataset (reference:
``datasets/sequence_folders.py::SequenceFolder``). Directory layout (as
produced by ``data/prepare_train_data.py``):

    root/
      train.txt            # scene dir names, one per line
      val.txt
      <scene>/
        0000000000.jpg     # frames, lexicographically ordered
        ...
        cam.txt            # 3x3 intrinsics (9 floats)
        0000000000.npy     # optional GT depth dumps (--with-depth)
        poses.txt          # optional GT poses (--with-pose)

Each sample: target frame + (seq_len - 1) neighbours at +-demi_length,
shared intrinsics, optional target GT depth.
"""

from __future__ import annotations

import random
from pathlib import Path

import numpy as np


def load_as_float(path: Path) -> np.ndarray:
    """Decode an image to float32 RGB. cv2 first (SIMD decode, releases the
    GIL — matters for the threaded BatchLoader), imageio fallback."""
    try:
        import cv2

        img = cv2.imread(str(path), cv2.IMREAD_COLOR)
        if img is not None:
            return img[:, :, ::-1].astype(np.float32)
    except ImportError:
        pass
    import imageio.v2 as imageio

    return imageio.imread(path).astype(np.float32)


class SequenceFolder:
    def __init__(
        self,
        root: str | Path,
        seed: int | None = None,
        train: bool = True,
        sequence_length: int = 3,
        with_depth: bool = False,
        shuffle: bool = True,
    ):
        self.root = Path(root)
        self.with_depth = with_depth
        list_file = self.root / ("train.txt" if train else "val.txt")
        scenes = [self.root / line.strip() for line in open(list_file) if line.strip()]
        self.samples = self._crawl(scenes, sequence_length)
        if shuffle:
            rng = random.Random(seed)
            rng.shuffle(self.samples)

    def _crawl(self, scenes: list[Path], sequence_length: int):
        samples = []
        demi = (sequence_length - 1) // 2
        for scene in scenes:
            intrinsics = np.genfromtxt(scene / "cam.txt").astype(np.float32).reshape(3, 3)
            imgs = sorted(
                p for p in scene.iterdir() if p.suffix.lower() in (".jpg", ".png")
            )
            if len(imgs) < sequence_length:
                continue
            for i in range(demi, len(imgs) - demi):
                refs = [imgs[i + j] for j in range(-demi, demi + 1) if j != 0]
                sample = {
                    "intrinsics": intrinsics,
                    "tgt": imgs[i],
                    "ref_imgs": refs,
                }
                if self.with_depth:
                    d = imgs[i].with_suffix(".npy")
                    if not d.exists():
                        continue
                    sample["depth"] = d
                samples.append(sample)
        return samples

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, index: int) -> dict:
        s = self.samples[index]
        tgt = load_as_float(s["tgt"]) / 255.0
        refs = [load_as_float(p) / 255.0 for p in s["ref_imgs"]]
        out = {
            "tgt": tgt,  # (H, W, 3) float [0, 1]
            "ref_imgs": np.stack(refs) if refs else np.zeros((0,) + tgt.shape),
            "intrinsics": s["intrinsics"].copy(),
        }
        if self.with_depth:
            out["depth"] = np.load(s["depth"]).astype(np.float32)
        return out
