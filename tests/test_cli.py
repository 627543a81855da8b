"""CLI smoke tests: run_inference and test_disp end-to-end with a converted
torch fixture checkpoint (BASELINE config 1 shape: pretrained checkpoint ->
inference/eval, no training)."""

import numpy as np
import pytest
import torch


@pytest.fixture(scope="module")
def torch_ckpt(tmp_path_factory):
    from tests.torch_ref import TorchDispNetS

    torch.manual_seed(0)
    model = TorchDispNetS()
    path = tmp_path_factory.mktemp("ckpt") / "dispnet_model_best.pth.tar"
    torch.save({"epoch": 1, "state_dict": model.state_dict()}, path)
    return path


def test_run_inference_cli(torch_ckpt, tmp_path):
    import cv2

    from supervised_dispnet_tpu.cli.run_inference import main

    src = tmp_path / "imgs"
    src.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        cv2.imwrite(str(src / f"img{i}.png"),
                    rng.uniform(0, 255, (64, 208, 3)).astype(np.uint8))
    out = tmp_path / "out"
    main([
        "--pretrained", str(torch_ckpt), "--network", "dispnet",
        "--dataset-dir", str(src), "--output-dir", str(out),
        "--img-height", "32", "--img-width", "104",
        "--output-disp", "--output-depth", "--save-npy",
    ])
    assert (out / "img0_disp.png").exists()
    assert (out / "img0_depth.png").exists()
    depth = np.load(out / "img1_depth.npy")
    assert depth.shape == (32, 104)
    assert (depth > 0).all()


@pytest.fixture
def kitti_raw_eval(tmp_path):
    """Raw-KITTI-shaped tree for the Eigen eval CLI."""
    import cv2

    date = "2011_09_26"
    drive = f"{date}_drive_0001_sync"
    root = tmp_path / "raw"
    date_dir = root / date
    img_dir = date_dir / drive / "image_02" / "data"
    velo_dir = date_dir / drive / "velodyne_points" / "data"
    img_dir.mkdir(parents=True)
    velo_dir.mkdir(parents=True)

    H, W = 64, 208
    fx = fy = 100.0
    P = np.array([[fx, 0, W / 2, 0], [0, fy, H / 2, 0], [0, 0, 1, 0]])
    lines = ["R_rect_00: " + " ".join(map(str, np.eye(3).ravel())),
             "P_rect_02: " + " ".join(map(str, P.ravel()))]
    (date_dir / "calib_cam_to_cam.txt").write_text("\n".join(lines))
    R = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], dtype=float)
    (date_dir / "calib_velo_to_cam.txt").write_text(
        "R: " + " ".join(map(str, R.ravel())) + "\nT: 0 0 0\n")

    rng = np.random.default_rng(1)
    test_list = []
    for i in range(2):
        cv2.imwrite(str(img_dir / f"{i:010d}.png"),
                    rng.uniform(0, 255, (H, W, 3)).astype(np.uint8))
        pts = np.hstack([
            rng.uniform(5, 60, (300, 1)),
            rng.uniform(-6, 6, (300, 1)),
            rng.uniform(-2, 0.5, (300, 1)),
            np.ones((300, 1)),
        ]).astype(np.float32)
        pts.tofile(velo_dir / f"{i:010d}.bin")
        test_list.append(f"{date}/{drive}/image_02/data/{i:010d}.png")
    list_file = tmp_path / "test_files.txt"
    list_file.write_text("\n".join(test_list))
    return root, list_file


def test_test_disp_cli(torch_ckpt, kitti_raw_eval, capsys):
    from supervised_dispnet_tpu.cli.test_disp import main

    root, list_file = kitti_raw_eval
    main([
        "--pretrained-dispnet", str(torch_ckpt), "--network", "dispnet",
        "--dataset-dir", str(root), "--dataset-list", str(list_file),
        "--img-height", "32", "--img-width", "104",
        "--median-scaling", "--batch-size", "2",
    ])
    out = capsys.readouterr().out
    assert "abs_rel" in out
    # metrics parse as finite floats
    last = out.strip().splitlines()[-1]
    vals = [float(v) for v in last.split()]
    assert len(vals) == 7
    assert all(np.isfinite(vals))


def test_test_pose_cli(tmp_path, capsys):
    """Odometry pose eval CLI end-to-end with a converted torch PoseExpNet."""
    import cv2

    from supervised_dispnet_tpu.cli.test_pose import main
    from tests.torch_ref import TorchPoseExpNet

    torch.manual_seed(1)
    pose_model = TorchPoseExpNet(nb_ref_imgs=2, output_exp=False)
    ckpt = tmp_path / "exp_pose_model_best.pth.tar"
    torch.save({"epoch": 1, "state_dict": pose_model.state_dict()}, ckpt)

    seq_dir = tmp_path / "odom" / "sequences" / "09" / "image_2"
    pose_dir = tmp_path / "odom" / "poses"
    seq_dir.mkdir(parents=True)
    pose_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    n = 6
    for i in range(n):
        cv2.imwrite(str(seq_dir / f"{i:06d}.png"),
                    rng.uniform(0, 255, (64, 208, 3)).astype(np.uint8))
    poses = []
    t = np.zeros(3)
    for i in range(n):
        poses.append(np.hstack([np.eye(3), t[:, None]]))
        t = t + [1.0, 0.0, 0.1]
    np.savetxt(pose_dir / "09.txt", np.stack(poses).reshape(n, 12))

    main([
        "--pretrained-posenet", str(ckpt),
        "--dataset-dir", str(tmp_path / "odom"),
        "--sequences", "09",
        "--img-height", "32", "--img-width", "104",
    ])
    out = capsys.readouterr().out
    assert "ATE" in out and "RE" in out
    ate = float(out.split("ATE")[1].split("+/-")[0])
    assert np.isfinite(ate)


def test_test_pose_cli_orbax(tmp_path, capsys):
    """Pose eval CLI restoring the pose net from an orbax run dir written
    by self-supervised training (kills the torch-only restriction)."""
    import cv2
    import jax.numpy as jnp
    import optax

    from supervised_dispnet_tpu.cli.test_pose import main
    from supervised_dispnet_tpu.models import DispNetS, PoseExpNet
    from supervised_dispnet_tpu.training import create_train_state
    from supervised_dispnet_tpu.utils.checkpoint import save_checkpoint

    H, W = 32, 104
    disp = DispNetS()
    pose = PoseExpNet(nb_ref_imgs=2, output_exp=True)
    tgt0 = jnp.zeros((1, H, W, 3))
    state = create_train_state(
        disp, (tgt0,), optax.adam(1e-4), seed=0,
        extra_models={"pose": (pose, (tgt0, [tgt0, tgt0]))},
    )
    run_dir = tmp_path / "run"
    save_checkpoint(run_dir, state, step=1)

    seq_dir = tmp_path / "odom" / "sequences" / "09" / "image_2"
    pose_dir = tmp_path / "odom" / "poses"
    seq_dir.mkdir(parents=True)
    pose_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    n = 6
    for i in range(n):
        cv2.imwrite(str(seq_dir / f"{i:06d}.png"),
                    rng.uniform(0, 255, (64, 208, 3)).astype(np.uint8))
    poses = []
    t = np.zeros(3)
    for i in range(n):
        poses.append(np.hstack([np.eye(3), t[:, None]]))
        t = t + [1.0, 0.0, 0.1]
    np.savetxt(pose_dir / "09.txt", np.stack(poses).reshape(n, 12))

    main([
        "--pretrained-posenet", str(run_dir),
        "--dataset-dir", str(tmp_path / "odom"),
        "--sequences", "09",
        "--img-height", str(H), "--img-width", str(W),
    ])
    out = capsys.readouterr().out
    assert "ATE" in out
    assert np.isfinite(float(out.split("ATE")[1].split("+/-")[0]))


def test_train_cli_end_to_end(tmp_path, monkeypatch):
    """cli/train.py main(): tiny dump -> 1 supervised epoch -> checkpoint."""
    import imageio.v2 as imageio

    from supervised_dispnet_tpu.cli.train import main

    H, W = 32, 64
    root = tmp_path / "dump"
    rng = np.random.default_rng(0)
    K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]], np.float32)
    for s in ("scene_a", "scene_b"):
        d = root / s
        d.mkdir(parents=True)
        np.savetxt(d / "cam.txt", K)
        for i in range(4):
            imageio.imwrite(d / f"{i:010d}.jpg",
                            rng.uniform(0, 255, (H, W, 3)).astype(np.uint8))
            depth = rng.uniform(1, 60, (H, W)).astype(np.float32)
            np.save(d / f"{i:010d}.npy", depth)
    (root / "train.txt").write_text("scene_a\n")
    (root / "val.txt").write_text("scene_b\n")

    monkeypatch.chdir(tmp_path)
    main([
        str(root), "--network", "disp_res_18", "--loss", "l1",
        "--epochs", "1", "-b", "2", "-j", "2",
        "--img-height", str(H), "--img-width", str(W),
        "--name", "cli_smoke",
    ])
    runs = list((tmp_path / "checkpoints" / "cli_smoke").iterdir())
    assert len(runs) == 1
    assert (runs[0] / "metrics.jsonl").exists()
    assert (runs[0] / "ckpts").exists()


def test_test_disp_cli_classification_orbax(kitti_raw_eval, tmp_path, capsys):
    """Eigen eval CLI with a classification-head model restored from an
    orbax checkpoint (BASELINE configs 2+4 combined path)."""
    import optax

    import jax
    import jax.numpy as jnp

    from supervised_dispnet_tpu.cli.test_disp import main
    from supervised_dispnet_tpu.models import DispResNet
    from supervised_dispnet_tpu.training import create_train_state
    from supervised_dispnet_tpu.utils.checkpoint import save_checkpoint

    root, list_file = kitti_raw_eval
    model = DispResNet(encoder_depth=18, head="classification", num_bins=16)
    state = create_train_state(
        model, (jnp.zeros((1, 32, 104, 3)),), optax.adamw(1e-4, weight_decay=0.01)
    )
    ckpt_dir = tmp_path / "clf_run"
    save_checkpoint(ckpt_dir, state, step=0)

    main([
        "--pretrained-dispnet", str(ckpt_dir), "--network", "disp_res_18",
        "--dataset-dir", str(root), "--dataset-list", str(list_file),
        "--img-height", "32", "--img-width", "104",
        "--classification", "--num-bins", "16", "--batch-size", "2",
    ])
    out = capsys.readouterr().out
    last = out.strip().splitlines()[-1]
    vals = [float(v) for v in last.split()]
    assert len(vals) == 7 and all(np.isfinite(vals))


def test_run_inference_empty_folder_int8_exits_cleanly(torch_ckpt, tmp_path):
    """ADVICE r2: --int8 on an empty folder must take the '0 files' exit,
    not crash in calibration on an all-zeros dummy image."""
    from supervised_dispnet_tpu.cli.run_inference import main

    src = tmp_path / "empty"
    src.mkdir()
    out = tmp_path / "out"
    main([
        "--pretrained", str(torch_ckpt), "--network", "dispnet",
        "--dataset-dir", str(src), "--output-dir", str(out),
        "--img-height", "32", "--img-width", "104", "--int8",
    ])  # no exception = pass; nothing to write
    assert not list(out.glob("*.png")) if out.exists() else True


def test_run_inference_fcrn_int8(tmp_path):
    """FCRN serves through --int8 (rejection lifted late round 3: dilated
    unpool convs quantize with exact geometry and trained-weights quality
    measured +0.0003 abs_rel — BASELINE.md FCRN int8 section)."""
    import cv2

    from tests.torch_ref import TorchFCRN
    from supervised_dispnet_tpu.cli.run_inference import main

    torch.manual_seed(0)
    ck = tmp_path / "fcrn_model_best.pth.tar"
    # the fork's FCRN keeps the ResNet stem at the state_dict root
    # (FCRNNameMap default); the fixture nests it under `encoder.`
    sd = {k.removeprefix("encoder."): v
          for k, v in TorchFCRN().state_dict().items()}
    torch.save({"epoch": 1, "state_dict": sd}, ck)
    src = tmp_path / "imgs"
    src.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        cv2.imwrite(str(src / f"img{i}.png"),
                    rng.uniform(0, 255, (64, 96, 3)).astype(np.uint8))
    out = tmp_path / "out"
    main([
        "--pretrained", str(ck), "--network", "fcrn",
        "--dataset-dir", str(src), "--output-dir", str(out),
        "--img-height", "64", "--img-width", "96", "--int8", "--save-npy",
    ])
    depth = np.load(out / "img0_depth.npy")
    assert depth.shape == (64, 96)
    assert np.isfinite(depth).all() and (depth > 0).all()


def test_profiler_clamps_to_short_epochs(tmp_path):
    """ADVICE r2: profile_steps > len(epoch) must not leave a trace open
    (the next epoch's start_trace would raise mid-training)."""
    import imageio.v2 as imageio

    from supervised_dispnet_tpu.models import DispNetS
    from supervised_dispnet_tpu.training.trainer import Trainer, TrainerConfig
    from supervised_dispnet_tpu.data.loader import BatchLoader
    from supervised_dispnet_tpu.data.sequence_folders import SequenceFolder
    from supervised_dispnet_tpu.utils.logging import (
        CsvLogger, JsonlLogger, TermLogger,
    )

    H, W = 32, 64
    root = tmp_path / "dump"
    rng = np.random.default_rng(0)
    K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]], np.float32)
    d = root / "scene_a"
    d.mkdir(parents=True)
    np.savetxt(d / "cam.txt", K)
    for i in range(4):
        imageio.imwrite(d / f"{i:010d}.jpg",
                        rng.integers(0, 256, (H, W, 3), dtype=np.uint8))
        np.save(d / f"{i:010d}.npy",
                rng.uniform(1, 60, (H, W)).astype(np.float32))
    (root / "train.txt").write_text("scene_a\n")
    (root / "val.txt").write_text("")

    cfg = TrainerConfig(
        data=str(root), save_path=str(tmp_path / "run"), loss="l1",
        network="dispnet", batch_size=2, workers=1,
        img_height=H, img_width=W,
        profile_steps=10,  # > the 2-batch epoch
    )
    trainer = Trainer(cfg, DispNetS())
    ds = SequenceFolder(root, train=True, sequence_length=1, with_depth=True)
    loader = BatchLoader(ds, 2, shuffle=False, num_workers=1)
    for epoch in range(2):  # second epoch would re-enter start_trace
        logger = TermLogger(2, len(loader), 1)
        logger.epoch_start(epoch)
        csv = CsvLogger(tmp_path / "run")
        jsonl = JsonlLogger(tmp_path / "run" / "m.jsonl")
        trainer.train_epoch(loader, logger, csv, jsonl)
        jsonl.close()


def test_run_inference_fused_upsample_matches_unfused(tmp_path):
    """--fused-upsample on a converted DispResNet-18 torch checkpoint:
    same .npy depth outputs as the default decoder (exact
    reparametrization; ops/fused_upconv.py)."""
    import cv2

    from supervised_dispnet_tpu.cli.run_inference import main
    from tests.torch_ref import TorchDispResNet

    torch.manual_seed(2)
    ckpt = tmp_path / "dispnet_model_best.pth.tar"
    torch.save({"epoch": 1,
                "state_dict": TorchDispResNet(depth=18).state_dict()}, ckpt)
    src = tmp_path / "imgs"
    src.mkdir()
    rng = np.random.default_rng(3)
    for i in range(2):
        cv2.imwrite(str(src / f"f{i}.png"),
                    rng.uniform(0, 255, (32, 64, 3)).astype(np.uint8))
    outs = {}
    for tag, extra in (("plain", []), ("fused", ["--fused-upsample"])):
        dst = tmp_path / f"out_{tag}"
        main(["--pretrained", str(ckpt), "--network", "disp_res_18",
              "--dataset-dir", str(src), "--output-dir", str(dst),
              "--img-height", "32", "--img-width", "64", "--save-npy",
              "--batch-size", "2"] + extra)
        outs[tag] = np.load(dst / "f0_depth.npy")
    np.testing.assert_allclose(outs["fused"], outs["plain"],
                               rtol=1e-3, atol=1e-4)
