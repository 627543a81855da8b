"""Validation dataset: single frames + dense/sparse GT depth dumps.

Rebuild of the reference dataset (reference:
``datasets/validation_folders.py::ValidationSet``): crawls val.txt scenes
for (image, depth-npy) pairs.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from supervised_dispnet_tpu.data.sequence_folders import load_as_float


class ValidationSet:
    def __init__(self, root: str | Path, uint8: bool = False):
        self.uint8 = uint8
        self.root = Path(root)
        list_file = self.root / "val.txt"
        scenes = [self.root / line.strip() for line in open(list_file) if line.strip()]
        self.samples = []
        for scene in scenes:
            for img in sorted(
                p for p in scene.iterdir() if p.suffix.lower() in (".jpg", ".png")
            ):
                depth = img.with_suffix(".npy")
                if depth.exists():
                    self.samples.append((img, depth))

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, index: int) -> dict:
        img_path, depth_path = self.samples[index]
        if self.uint8:
            from supervised_dispnet_tpu.data.sequence_folders import load_as_uint8

            img = load_as_uint8(img_path)
        else:
            img = load_as_float(img_path) / 255.0
        return {
            "img": img,
            "depth": np.load(depth_path).astype(np.float32),
        }
