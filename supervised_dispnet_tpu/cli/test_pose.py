"""Odometry pose evaluation CLI — rebuild of the reference ``test_pose.py``:
evaluate PoseExpNet snippet ATE/RE on KITTI odometry sequences (09/10).

Expects the KITTI odometry layout:
  <dataset-dir>/sequences/<seq>/image_2/*.png
  <dataset-dir>/poses/<seq>.txt
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="KITTI odometry pose evaluation (snippet ATE/RE)",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("--pretrained-posenet", required=True,
                   help="torch exp_pose .pth.tar or orbax dir")
    p.add_argument("--dataset-dir", required=True)
    p.add_argument("--sequences", nargs="+", default=["09"])
    p.add_argument("--sequence-length", type=int, default=3)
    p.add_argument("--img-height", type=int, default=128)
    p.add_argument("--img-width", type=int, default=416)
    p.add_argument("--rotation-mode", default="euler", choices=["euler", "quat"])
    p.add_argument("--imagenet-normalization", action="store_true")
    p.add_argument("--batch-size", type=int, default=32,
                   help="snippets per device dispatch (each frame is "
                        "decoded once; the naive per-snippet loop cost "
                        "one host->device round trip per snippet)")
    return p


def pose_vec_to_snippet(poses_vec: np.ndarray, rotation_mode: str) -> np.ndarray:
    """(R-1, 6) predicted tgt->ref transforms + identity tgt -> (R, 3, 4)
    snippet *poses* re-expressed relative to the FIRST frame (reference
    protocol, matching ``snippet_from_poses`` on the GT side).

    The network emits M_j = T_j^{-1} T_mid (the transform that maps
    target-frame points into reference frame j, the same convention
    ``inverse_warp`` consumes). The pose of frame j in target coordinates is
    its inverse A_j = M_j^{-1}; re-anchoring to the first frame gives
    A_first^{-1} A_j.
    """
    import jax.numpy as jnp

    from supervised_dispnet_tpu.ops.warp import pose_vec2mat

    mats = np.asarray(pose_vec2mat(jnp.asarray(poses_vec), rotation_mode))
    R = len(poses_vec) + 1
    mid = R // 2
    poses = []  # A_i: pose of frame i in target(mid) coordinates
    j = 0
    for i in range(R):
        if i == mid:
            poses.append(np.hstack([np.eye(3), np.zeros((3, 1))]).astype(np.float32))
        else:
            Rm = mats[j][:, :3]
            tm = mats[j][:, 3]
            poses.append(np.hstack([Rm.T, (-Rm.T @ tm)[:, None]]))
            j += 1
    # re-anchor to the first frame: A_first^{-1} @ A_i
    R0 = poses[0][:, :3]
    t0 = poses[0][:, 3]
    out = []
    for T in poses:
        Rr = R0.T @ T[:, :3]
        tr = R0.T @ (T[:, 3] - t0)
        out.append(np.hstack([Rr, tr[:, None]]))
    return np.stack(out)


def main(argv: list[str] | None = None) -> None:
    args = build_parser().parse_args(argv)

    # persistent XLA compile cache: first compiles through the remote
    # tunnel take minutes; cached re-invocations are instant
    from supervised_dispnet_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    import cv2
    import jax
    import jax.numpy as jnp

    from supervised_dispnet_tpu.data.augment import (
        HALF_MEAN, HALF_STD, IMAGENET_MEAN, IMAGENET_STD, normalize_images,
    )
    from supervised_dispnet_tpu.kitti_eval.pose_evaluation_utils import (
        evaluate_pose_snippets, read_odometry_poses, snippet_from_poses,
    )
    from supervised_dispnet_tpu.models import PoseExpNet

    nb_refs = args.sequence_length - 1
    model = PoseExpNet(nb_ref_imgs=nb_refs, output_exp=False)

    ckpt = Path(args.pretrained_posenet)
    if ckpt.is_file():
        from supervised_dispnet_tpu.utils.checkpoint import (
            convert_pose_exp_net, load_torch_state_dict,
        )

        params = convert_pose_exp_net(load_torch_state_dict(ckpt), output_exp=False)
    else:
        # orbax run dir from self-supervised training: raw restore (no
        # optimizer template, so any-optimizer checkpoints load); the
        # pose model's params live under the 'pose' key
        from supervised_dispnet_tpu.utils.checkpoint import restore_raw

        restored, _ = restore_raw(ckpt)
        if "pose" not in restored["params"]:
            raise ValueError(
                f"{ckpt} has no pose-net params — was this run trained "
                "with --loss selfsup?")
        params = restored["params"]["pose"]
        # a training checkpoint may carry the explainability decoder; the
        # eval model (output_exp=False) simply never references it
        params = {k: v for k, v in params.items()
                  if not k.startswith(("upconv", "predict_mask"))}

    mean = IMAGENET_MEAN if args.imagenet_normalization else HALF_MEAN
    std = IMAGENET_STD if args.imagenet_normalization else HALF_STD

    @jax.jit
    def forward(tgt_u8, refs_u8):
        # uint8 transport (4x fewer bytes over the tunnel); convert +
        # normalize on device
        tgt = normalize_images(tgt_u8.astype(jnp.float32) / 255.0, mean, std)
        refs = normalize_images(refs_u8.astype(jnp.float32) / 255.0, mean, std)
        _, pose = model.apply({"params": params}, tgt,
                              [refs[:, i] for i in range(nb_refs)])
        return pose

    demi = nb_refs // 2
    B = max(1, args.batch_size)
    gt_snips, pred_snips = [], []
    for seq in args.sequences:
        seq_dir = Path(args.dataset_dir) / "sequences" / seq / "image_2"
        frames = sorted(seq_dir.glob("*.png"))
        gt_poses = read_odometry_poses(Path(args.dataset_dir) / "poses" / f"{seq}.txt")
        n = min(len(frames), len(gt_poses))

        # decode every frame ONCE (the old per-snippet loop decoded each
        # frame seq_length times and paid one device round trip per
        # snippet)
        def load(i):
            img = cv2.imread(str(frames[i]))[:, :, ::-1]
            return np.ascontiguousarray(
                cv2.resize(img, (args.img_width, args.img_height),
                           interpolation=cv2.INTER_AREA))

        cache = [load(i) for i in range(n)]
        centers = list(range(demi, n - demi))
        for c0 in range(0, len(centers), B):
            ids = centers[c0:c0 + B]
            padded = ids + [ids[-1]] * (B - len(ids))  # static batch shape
            tgt = np.stack([cache[i] for i in padded])
            refs = np.stack([
                [cache[j] for j in range(i - demi, i + demi + 1) if j != i]
                for i in padded])
            poses = np.asarray(forward(jnp.asarray(tgt), jnp.asarray(refs)))
            for k, i in enumerate(ids):
                idxs = np.arange(i - demi, i + demi + 1)
                pred_snips.append(
                    pose_vec_to_snippet(poses[k], args.rotation_mode))
                gt_snips.append(snippet_from_poses(gt_poses, idxs))
            if (c0 // B) % 10 == 0:
                print(f"  seq {seq}: {c0 + len(ids)}/{len(centers)} snippets",
                      flush=True)

    results = evaluate_pose_snippets(gt_snips, pred_snips)
    print(f"\nATE  {results['ate_mean']:.4f} +/- {results['ate_std']:.4f}")
    print(f"RE   {results['re_mean']:.4f} +/- {results['re_std']:.4f}")
    print(f"n    {int(results['n_snippets'])}")


if __name__ == "__main__":
    main()
