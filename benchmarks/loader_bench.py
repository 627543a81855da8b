"""Host input-pipeline throughput (SURVEY.md §7 hard part #4: the host must
keep the chip fed).

Generates a synthetic dump (JPEG frames at the KITTI training resolution),
then measures BatchLoader decode+collate throughput in images/sec for
several worker counts.

Usage: python benchmarks/loader_bench.py [--frames 600]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=600)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--width", type=int, default=416)
    args = ap.parse_args()

    import cv2

    from supervised_dispnet_tpu.data.loader import BatchLoader
    from supervised_dispnet_tpu.data.sequence_folders import SequenceFolder

    with tempfile.TemporaryDirectory() as td:
        root = Path(td)
        scene = root / "scene_a"
        scene.mkdir()
        rng = np.random.default_rng(0)
        K = np.array([[200.0, 0, args.width / 2],
                      [0, 200.0, args.height / 2], [0, 0, 1]])
        np.savetxt(scene / "cam.txt", K)
        for i in range(args.frames):
            img = rng.uniform(0, 255, (args.height, args.width, 3)).astype(np.uint8)
            cv2.imwrite(str(scene / f"{i:010d}.jpg"), img)
        (root / "train.txt").write_text("scene_a\n")

        ds = SequenceFolder(root, train=True, sequence_length=3)
        results = {}
        for workers in (1, 4, 8, 16):
            loader = BatchLoader(ds, args.batch, shuffle=True,
                                 num_workers=workers, prefetch=4)
            n = 0
            t0 = time.perf_counter()
            for batch in loader:
                n += batch["tgt"].shape[0] * 3  # tgt + 2 refs decoded
            dt = time.perf_counter() - t0
            results[f"workers_{workers}"] = round(n / dt, 1)
            print(f"workers={workers}: {n / dt:.0f} decoded-images/sec", flush=True)

        # packed zero-decode pipeline on the same frames (data/packed.py)
        from supervised_dispnet_tpu.data.packed import (
            PackedSequenceDataset, pack_split,
        )

        t0 = time.perf_counter()
        pack_split(root, root / "_packed", "train")
        print(f"pack time: {time.perf_counter() - t0:.1f}s (one-off)", flush=True)
        pds = PackedSequenceDataset(root / "_packed", train=True,
                                    sequence_length=3)
        for run in range(2):  # run 2 = page-cache warm
            loader = BatchLoader(pds, args.batch, shuffle=True, prefetch=4)
            n = 0
            t0 = time.perf_counter()
            for batch in loader:
                n += batch["tgt"].shape[0] * 3
            dt = time.perf_counter() - t0
            results[f"packed_run{run}"] = round(n / dt, 1)
            print(f"packed run {run}: {n / dt:.0f} images/sec", flush=True)

        print(json.dumps({
            "metric": "host_loader_decoded_images_per_sec",
            "value": results,
            "unit": "images/sec (decode+collate, 128x416 jpg; packed = "
                    "zero-decode memmap gather)",
        }))


if __name__ == "__main__":
    main()
