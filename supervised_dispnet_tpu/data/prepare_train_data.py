"""Offline ETL driver: raw KITTI -> dumped training folders.

Rebuild of the reference CLI (reference: ``data/prepare_train_data.py``):

    python -m supervised_dispnet_tpu.data.prepare_train_data <raw_kitti> \
        --dataset-format kitti --dump-root <out> --with-depth --with-pose \
        --static-frames data/static_frames.txt --height 128 --width 416

Dumps per-scene folders of resized frames + ``cam.txt`` intrinsics,
optional per-frame sparse depth ``.npy`` and ``poses.txt``, then writes
train.txt / val.txt scene splits. Scene dumps run in a joblib process pool
like the reference.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def dump_scene(loader, scene: dict, dump_root: Path) -> str | None:
    import cv2

    out_dir = dump_root / scene["name"]
    out_dir.mkdir(parents=True, exist_ok=True)
    K = None
    for i in range(len(scene["frames"])):
        img, K, _ = loader.load_image(scene, i)
        name = scene["frames"][i].stem
        cv2.imwrite(str(out_dir / f"{name}.jpg"), img[:, :, ::-1])
        if loader.get_depth:
            np.save(out_dir / f"{name}.npy", loader.get_depth_map(scene, i))
    if K is None:
        return None
    np.savetxt(out_dir / "cam.txt", K, fmt="%.8f")
    if loader.get_pose and "poses" in scene:
        np.savetxt(out_dir / "poses.txt", scene["poses"].reshape(-1, 12), fmt="%.8e")
    return scene["name"]


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(
        description="Resize + dump KITTI raw for training (reference CLI parity)"
    )
    parser.add_argument("dataset_dir", type=Path)
    parser.add_argument("--dataset-format", default="kitti",
                        choices=["kitti", "odometry", "cityscapes"])
    parser.add_argument("--dump-root", type=Path, required=True)
    parser.add_argument("--height", type=int, default=128)
    parser.add_argument("--width", type=int, default=416)
    parser.add_argument("--static-frames", type=Path, default=None)
    parser.add_argument("--test-scenes", type=Path, default=None,
                        help="file of Eigen test drive names to exclude")
    parser.add_argument("--with-depth", action="store_true")
    parser.add_argument("--with-pose", action="store_true")
    parser.add_argument("--num-threads", type=int, default=4)
    parser.add_argument("--val-frac", type=float, default=0.1)
    args = parser.parse_args(argv)

    # fail fast on malformed canonical lists (see data/filelists/README.md)
    from supervised_dispnet_tpu.data.filelist_validation import require_valid

    if args.static_frames:
        require_valid("static_frames", args.static_frames)
    if args.test_scenes:
        require_valid("test_scenes", args.test_scenes)

    if args.dataset_format == "kitti":
        from supervised_dispnet_tpu.data.kitti_raw_loader import KittiRawLoader

        loader = KittiRawLoader(
            args.dataset_dir,
            static_frames_file=args.static_frames,
            img_height=args.height,
            img_width=args.width,
            get_depth=args.with_depth,
            get_pose=args.with_pose,
            test_scene_file=args.test_scenes,
        )
        scenes = [
            s for drive in loader.scenes for s in loader.collect_scene_data(drive)
        ]
    elif args.dataset_format == "odometry":
        from supervised_dispnet_tpu.data.kitti_odometry_loader import (
            KittiOdometryLoader,
        )

        loader = KittiOdometryLoader(
            args.dataset_dir,
            img_height=args.height,
            img_width=args.width,
            get_depth=args.with_depth,
            get_pose=args.with_pose,
        )
        scenes = [
            s for seq in loader.scenes for s in loader.collect_scene_data(seq)
        ]
    else:
        from supervised_dispnet_tpu.data.cityscapes_loader import CityscapesLoader

        loader = CityscapesLoader(
            args.dataset_dir, img_height=args.height, img_width=args.width
        )
        scenes = list(loader.collect_scene_data())
    args.dump_root.mkdir(parents=True, exist_ok=True)

    from joblib import Parallel, delayed

    results = Parallel(n_jobs=args.num_threads)(
        delayed(dump_scene)(loader, s, args.dump_root) for s in scenes
    )
    names: list[str] = [r for r in results if r]

    rng = np.random.default_rng(8964)
    names = sorted(names)
    rng.shuffle(names)
    n_val = max(1, int(len(names) * args.val_frac)) if names else 0
    with open(args.dump_root / "val.txt", "w") as f:
        f.writelines(n + "\n" for n in names[:n_val])
    with open(args.dump_root / "train.txt", "w") as f:
        f.writelines(n + "\n" for n in names[n_val:])
    print(f"dumped {len(names)} scenes -> {args.dump_root}")


if __name__ == "__main__":
    main()
