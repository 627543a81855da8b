"""Dump a synthetic ego-motion sequence in the KITTI odometry layout
(``sequences/<seq>/image_2/*.png`` + ``poses/<seq>.txt``) so the trained
self-supervised pose net can be evaluated through the real
``test_pose.py`` CLI without KITTI data (reference:
``kitti_eval/pose_evaluation_utils.py`` consumes exactly this layout).

Usage:
  python scripts/dump_synthetic_odometry.py <out_dir> [--frames 60]
      [--seq 09] [--seed 0]

The scene/motion distribution matches benchmarks/convergence_check.py's
self-supervised training configuration, so a checkpoint from
``convergence_check --loss selfsup --save`` sees in-domain data.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--seq", default="09")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--width", type=int, default=416)
    args = ap.parse_args()

    import cv2

    from supervised_dispnet_tpu.data.synthetic import (
        PlaneSceneConfig, render_sequence,
    )

    # the convergence_check selfsup scene (benchmarks/convergence_check.py
    # run_selfsup) — keep in sync so saved checkpoints are in-domain
    cfg = PlaneSceneConfig(
        height=args.height, width=args.width,
        focal=200.0 * args.width / 416,
        tilt=0.35, center_depth=(5.0, 16.0),
        fg_planes=2, room=True, rot=0.04,
    )
    seq = render_sequence(np.random.default_rng(args.seed), args.frames, cfg)

    img_dir = Path(args.out_dir) / "sequences" / args.seq / "image_2"
    img_dir.mkdir(parents=True, exist_ok=True)
    pose_dir = Path(args.out_dir) / "poses"
    pose_dir.mkdir(parents=True, exist_ok=True)

    for i, frame in enumerate(seq["frames"]):
        u8 = np.clip(frame * 255.0, 0, 255).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"{i:06d}.png"), u8[:, :, ::-1])  # BGR

    with open(pose_dir / f"{args.seq}.txt", "w") as f:
        for P in seq["poses"]:
            f.write(" ".join(f"{v:.9e}" for v in P.reshape(-1)) + "\n")

    print(f"wrote {args.frames} frames + poses to {args.out_dir} "
          f"(sequence {args.seq})")


if __name__ == "__main__":
    main()
