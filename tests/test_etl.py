"""ETL tests: synthetic raw-KITTI tree -> prepare_train_data dump;
cityscapes crawler; static-frame/test-scene exclusion; oxts poses."""

import json

import numpy as np
import pytest


@pytest.fixture
def kitti_raw(tmp_path):
    """Minimal raw-KITTI tree: one date, two drives, calib, oxts, velodyne."""
    import cv2

    date = "2011_09_26"
    date_dir = tmp_path / date
    date_dir.mkdir()
    H, W = 64, 208

    fx = fy = 100.0
    cx, cy = W / 2, H / 2
    P = np.array([[fx, 0, cx, 0], [0, fy, cy, 0], [0, 0, 1, 0]])
    lines = ["R_rect_00: " + " ".join(map(str, np.eye(3).ravel()))]
    for cam in (2, 3):
        lines.append(f"P_rect_0{cam}: " + " ".join(map(str, P.ravel())))
    (date_dir / "calib_cam_to_cam.txt").write_text("\n".join(lines))
    R = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], dtype=float)
    (date_dir / "calib_velo_to_cam.txt").write_text(
        "R: " + " ".join(map(str, R.ravel())) + "\nT: 0 0 0\n"
    )

    rng = np.random.default_rng(0)
    for drive_name in ("0001", "0002"):
        drive = date_dir / f"{date}_drive_{drive_name}_sync"
        img_dir = drive / "image_02" / "data"
        velo_dir = drive / "velodyne_points" / "data"
        oxts_dir = drive / "oxts" / "data"
        for d in (img_dir, velo_dir, oxts_dir):
            d.mkdir(parents=True)
        for i in range(4):
            img = rng.uniform(0, 255, (H, W, 3)).astype(np.uint8)
            cv2.imwrite(str(img_dir / f"{i:010d}.png"), img)
            pts = np.hstack([
                rng.uniform(5, 30, (50, 1)),   # x forward
                rng.uniform(-5, 5, (50, 1)),   # y
                rng.uniform(-1, 1, (50, 1)),   # z
                np.ones((50, 1)),
            ]).astype(np.float32)
            pts.tofile(velo_dir / f"{i:010d}.bin")
            # oxts: lat lon alt roll pitch yaw + padding
            vals = [49.0 + i * 1e-5, 8.43 + i * 1e-5, 112.0 + 0.01 * i,
                    0.01, 0.02, 0.1 * i] + [0.0] * 24
            np.savetxt(oxts_dir / f"{i:010d}.txt", [vals])
    # static frames: exclude frame 1 of drive 0001
    sf = tmp_path / "static_frames.txt"
    sf.write_text(f"{date} {date}_drive_0001_sync 0000000001\n")
    # test scenes: exclude drive 0002 entirely
    ts = tmp_path / "test_scenes.txt"
    ts.write_text(f"{date}_drive_0002_sync\n")
    return tmp_path


def test_kitti_raw_loader_crawl_and_exclusions(kitti_raw):
    from supervised_dispnet_tpu.data.kitti_raw_loader import KittiRawLoader

    loader = KittiRawLoader(
        kitti_raw,
        static_frames_file=kitti_raw / "static_frames.txt",
        test_scene_file=kitti_raw / "test_scenes.txt",
        img_height=32, img_width=104,
        get_depth=True, get_pose=True,
    )
    assert len(loader.scenes) == 1  # drive 0002 excluded
    scenes = list(loader.collect_scene_data(loader.scenes[0]))
    assert len(scenes) == 1  # left cam only by default
    s = scenes[0]
    assert len(s["frames"]) == 3  # frame 1 static-excluded
    assert s["intrinsics"].shape == (3, 3)
    # poses align 1:1 with the kept frames
    assert s["poses"].shape == (3, 3, 4)
    # first pose is identity (origin-relative)
    np.testing.assert_allclose(s["poses"][0], np.hstack([np.eye(3), np.zeros((3, 1))]),
                               atol=1e-9)

    img, K, orig = loader.load_image(s, 0)
    assert img.shape == (32, 104, 3)
    # intrinsics rescaled by zoom factors
    np.testing.assert_allclose(K[0, 0], 100.0 * 104 / 208, rtol=1e-6)
    np.testing.assert_allclose(K[1, 1], 100.0 * 32 / 64, rtol=1e-6)

    depth = loader.get_depth_map(s, 0)
    assert depth.shape == (32, 104)
    assert (depth > 0).any()
    assert depth.max() <= 30.5


def test_prepare_train_data_cli(kitti_raw, tmp_path):
    from supervised_dispnet_tpu.data.prepare_train_data import main

    dump = tmp_path / "dump"
    main([
        str(kitti_raw), "--dump-root", str(dump),
        "--height", "32", "--width", "104",
        "--static-frames", str(kitti_raw / "static_frames.txt"),
        "--test-scenes", str(kitti_raw / "test_scenes.txt"),
        "--with-depth", "--num-threads", "1", "--val-frac", "0.5",
    ])
    scene_dir = dump / "2011_09_26_drive_0001_sync_02"
    assert scene_dir.exists()
    assert (scene_dir / "cam.txt").exists()
    jpgs = sorted(scene_dir.glob("*.jpg"))
    npys = sorted(scene_dir.glob("*.npy"))
    assert len(jpgs) == 3 and len(npys) == 3
    assert (dump / "train.txt").exists() and (dump / "val.txt").exists()
    K = np.genfromtxt(scene_dir / "cam.txt")
    assert K.shape == (3, 3)


def test_oxts_pose_translation_direction(kitti_raw):
    from supervised_dispnet_tpu.data.kitti_raw_loader import oxts_to_pose

    oxts_dir = (kitti_raw / "2011_09_26" / "2011_09_26_drive_0001_sync"
                / "oxts" / "data")
    poses = oxts_to_pose(sorted(oxts_dir.glob("*.txt")))
    assert poses.shape == (4, 3, 4)
    # translations grow monotonically away from origin
    norms = np.linalg.norm(poses[:, :, 3], axis=1)
    assert norms[0] == pytest.approx(0.0, abs=1e-9)
    assert (np.diff(norms) > 0).all()


@pytest.fixture
def cityscapes_tree(tmp_path):
    import cv2

    root = tmp_path / "cs"
    img_dir = root / "leftImg8bit_sequence" / "train" / "aachen"
    cam_dir = root / "camera" / "train" / "aachen"
    img_dir.mkdir(parents=True)
    cam_dir.mkdir(parents=True)
    rng = np.random.default_rng(1)
    for seq in ("000000",):
        for i in range(3):
            stem = f"aachen_{seq}_{i:06d}_leftImg8bit"
            cv2.imwrite(str(img_dir / f"{stem}.png"),
                        rng.uniform(0, 255, (64, 128, 3)).astype(np.uint8))
            cam = {"intrinsic": {"fx": 2262.52, "fy": 2265.3,
                                 "u0": 1096.98, "v0": 513.137}}
            (cam_dir / f"aachen_{seq}_{i:06d}_camera.json").write_text(
                json.dumps(cam))
    return root


def test_cityscapes_loader(cityscapes_tree):
    from supervised_dispnet_tpu.data.cityscapes_loader import CityscapesLoader

    loader = CityscapesLoader(cityscapes_tree, img_height=32, img_width=64)
    scenes = list(loader.collect_scene_data())
    assert len(scenes) == 1
    s = scenes[0]
    assert len(s["frames"]) == 3
    img, K, orig = loader.load_image(s, 0)
    assert img.shape == (32, 64, 3)
    assert K[0, 0] == pytest.approx(2262.52 * 64 / 128, rel=1e-6)
    # vertical zoom accounts for the hood crop (64 * 0.75 = 48 rows kept)
    assert K[1, 1] == pytest.approx(2265.3 * 32 / 48, rel=1e-6)


def test_min_speed_fallback_filters_static(kitti_raw):
    """With no static_frames file, low-GPS-speed frames are excluded
    (reference: ETL min-speed exclusion)."""
    from supervised_dispnet_tpu.data.kitti_raw_loader import KittiRawLoader

    # rewrite drive 0001 oxts: frames 0,1 stationary, 2,3 moving
    oxts_dir = (kitti_raw / "2011_09_26" / "2011_09_26_drive_0001_sync"
                / "oxts" / "data")
    for i in range(4):
        speed = 0.0 if i < 2 else 5.0
        vals = [49.0, 8.43, 112.0, 0.0, 0.0, 0.0, speed, 0.0] + [0.0] * 22
        np.savetxt(oxts_dir / f"{i:010d}.txt", [vals])

    loader = KittiRawLoader(
        kitti_raw, static_frames_file=None,
        test_scene_file=kitti_raw / "test_scenes.txt",
        img_height=32, img_width=104, min_speed=2.0,
    )
    scenes = list(loader.collect_scene_data(loader.scenes[0]))
    assert len(scenes[0]["frames"]) == 2
    assert [f.stem for f in scenes[0]["frames"]] == ["0000000002", "0000000003"]


# --- filelist validators (VERDICT r1 item 8) ------------------------------

@pytest.mark.quick
def test_filelist_validators_accept_canonical_formats(tmp_path):
    from supervised_dispnet_tpu.data.filelist_validation import (
        validate_eigen_list, validate_static_frames, validate_test_scenes,
    )

    sf = tmp_path / "static_frames.txt"
    sf.write_text("2011_09_26 2011_09_26_drive_0009_sync 0000000386\n"
                  "2011_09_28 2011_09_28_drive_0002_sync 0000000051\n")
    assert validate_static_frames(sf) == []

    ts = tmp_path / "eigen_test_scenes.txt"
    ts.write_text("2011_09_26_drive_0002_sync\n2011_09_26_drive_0009_sync\n")
    assert validate_test_scenes(ts) == []

    el = tmp_path / "test_files_eigen.txt"
    el.write_text(
        "2011_09_26/2011_09_26_drive_0002_sync/image_02/data/0000000069.png\n")
    assert validate_eigen_list(el, expect_count=False) == []
    # canonical count check
    assert any("697" in e for e in validate_eigen_list(el, expect_count=True))


def test_filelist_validators_reject_malformed(tmp_path):
    from supervised_dispnet_tpu.data.filelist_validation import (
        require_valid, validate_static_frames,
    )

    bad = tmp_path / "static_frames.txt"
    bad.write_text("2011_09_26 drive9 frameX\nonly two\n")
    errs = validate_static_frames(bad)
    assert any("bad drive" in e for e in errs)
    assert any("expected 3 fields" in e for e in errs)
    with pytest.raises(ValueError, match="malformed"):
        require_valid("static_frames", bad)


def test_prepare_train_data_rejects_bad_static_frames(kitti_raw, tmp_path):
    from supervised_dispnet_tpu.data.prepare_train_data import main

    bad = tmp_path / "static_frames.txt"
    bad.write_text("garbage\n")
    with pytest.raises(ValueError, match="malformed"):
        main([str(kitti_raw), "--dump-root", str(tmp_path / "d"),
              "--static-frames", str(bad), "--num-threads", "1"])


# --- odometry-format ETL (VERDICT r1 item 9) -------------------------------

@pytest.fixture()
def odometry_tree(tmp_path):
    """Synthetic KITTI odometry layout: 3 sequences (one a test seq) with
    calib + poses."""
    import cv2

    rng = np.random.default_rng(3)
    H, W = 64, 128
    root = tmp_path / "odometry"
    for seq in ("00", "01", "09"):
        img_dir = root / "sequences" / seq / "image_2"
        img_dir.mkdir(parents=True)
        for i in range(5):
            cv2.imwrite(str(img_dir / f"{i:06d}.png"),
                        rng.uniform(0, 255, (H, W, 3)).astype(np.uint8))
        P2 = np.array([[70.0, 0, W / 2, 0.1], [0, 70.0, H / 2, 0], [0, 0, 1, 0]])
        (root / "sequences" / seq / "calib.txt").write_text(
            "P0: " + " ".join(map(str, P2.reshape(-1))) + "\n"
            "P2: " + " ".join(map(str, P2.reshape(-1))) + "\n")
        poses = []
        t = np.zeros(3)
        for i in range(5):
            poses.append(np.hstack([np.eye(3), t[:, None]]).reshape(-1))
            t = t + [0.1, 0, 1.0]
        (root / "poses").mkdir(exist_ok=True)
        np.savetxt(root / "poses" / f"{seq}.txt", np.stack(poses))
    return root


def test_odometry_etl_dump(odometry_tree, tmp_path):
    """prepare_train_data --dataset-format odometry dumps scenes consumable
    by SequenceFolder (self-sup snippet training on odometry)."""
    from supervised_dispnet_tpu.data.prepare_train_data import main
    from supervised_dispnet_tpu.data.sequence_folders import SequenceFolder

    dump = tmp_path / "odo_dump"
    main([str(odometry_tree), "--dataset-format", "odometry",
          "--dump-root", str(dump), "--with-pose",
          "--height", "32", "--width", "64", "--num-threads", "1",
          "--val-frac", "0.5"])
    # test sequence 09 excluded; 00 and 01 dumped
    names = sorted(d.name for d in dump.iterdir() if d.is_dir())
    assert names == ["seq_00", "seq_01"]
    # intrinsics rescaled to the dump resolution
    K = np.loadtxt(dump / "seq_00" / "cam.txt")
    assert K[0, 0] == pytest.approx(70.0 * 64 / 128)
    assert K[1, 1] == pytest.approx(70.0 * 32 / 64)
    # GT poses dumped alongside
    poses = np.loadtxt(dump / "seq_00" / "poses.txt")
    assert poses.shape == (5, 12)

    ds = SequenceFolder(dump, train=True, sequence_length=3)
    assert len(ds) > 0
    s = ds[0]
    assert s["tgt"].shape == (32, 64, 3)
    assert s["ref_imgs"].shape == (2, 32, 64, 3)


def test_odometry_rejects_with_depth(odometry_tree, tmp_path):
    from supervised_dispnet_tpu.data.kitti_odometry_loader import (
        KittiOdometryLoader,
    )

    with pytest.raises(ValueError, match="with-depth"):
        KittiOdometryLoader(odometry_tree, get_depth=True)


def test_pose_cli_on_odometry_tree(odometry_tree, tmp_path, capsys):
    """test_pose.py end to end on the synthetic odometry tree with a fresh
    PoseExpNet (reference: test_pose.py on sequences 09/10)."""
    import torch

    from supervised_dispnet_tpu.cli.test_pose import main
    from tests.torch_ref import TorchPoseExpNet

    torch.manual_seed(0)
    ckpt = tmp_path / "exp_pose.pth.tar"
    torch.save({"state_dict": TorchPoseExpNet(nb_ref_imgs=2).state_dict()}, ckpt)
    main(["--pretrained-posenet", str(ckpt), "--dataset-dir", str(odometry_tree),
          "--sequences", "09", "--img-height", "32", "--img-width", "64"])
    out = capsys.readouterr().out
    assert "ATE" in out and "RE" in out
