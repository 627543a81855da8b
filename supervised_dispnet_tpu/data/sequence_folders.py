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


def load_as_uint8(path: Path) -> np.ndarray:
    """Decode an image to uint8 RGB. cv2 first (SIMD decode, releases the
    GIL — matters for the threaded BatchLoader), imageio fallback."""
    try:
        import cv2

        img = cv2.imread(str(path), cv2.IMREAD_COLOR)
        if img is not None:
            return np.ascontiguousarray(img[:, :, ::-1])
    except ImportError:
        pass
    import imageio.v2 as imageio

    return np.asarray(imageio.imread(path), dtype=np.uint8)


def load_as_float(path: Path) -> np.ndarray:
    """Decode an image to float32 RGB."""
    return load_as_uint8(path).astype(np.float32)


class SequenceFolder:
    def __init__(
        self,
        root: str | Path,
        seed: int | None = None,
        train: bool = True,
        sequence_length: int = 3,
        with_depth: bool = False,
        shuffle: bool = True,
        uint8: bool = False,
    ):
        """``uint8=True`` yields raw uint8 images (the jitted train step
        converts to float on device) — 4x less host->device traffic."""
        self.root = Path(root)
        self.with_depth = with_depth
        self.uint8 = uint8
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
        if self.uint8:
            tgt = load_as_uint8(s["tgt"])
            refs = [load_as_uint8(p) for p in s["ref_imgs"]]
            zeros_dtype = np.uint8
        else:
            tgt = load_as_float(s["tgt"]) / 255.0
            refs = [load_as_float(p) / 255.0 for p in s["ref_imgs"]]
            zeros_dtype = np.float32
        out = {
            "tgt": tgt,  # (H, W, 3) float [0, 1] or uint8
            "ref_imgs": (np.stack(refs) if refs
                         else np.zeros((0,) + tgt.shape, zeros_dtype)),
            "intrinsics": s["intrinsics"].copy(),
        }
        if self.with_depth:
            out["depth"] = np.load(s["depth"]).astype(np.float32)
        return out
