"""End-to-end slice: synthetic dumped dataset -> datasets -> Trainer.fit
(1 epoch) -> orbax checkpoint -> restore -> validation metrics.

Mirrors BASELINE configs 3/5 on tiny shapes (SURVEY.md §7 minimum slice,
widened to training)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

H, W = 32, 64


@pytest.fixture(scope="module")
def dump_root(tmp_path_factory):
    """Two-scene dumped dataset in prepare_train_data layout."""
    import imageio.v2 as imageio

    root = tmp_path_factory.mktemp("kitti_dump")
    rng = np.random.default_rng(0)
    K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]], np.float32)
    scenes = ["scene_a", "scene_b"]
    for s in scenes:
        d = root / s
        d.mkdir()
        np.savetxt(d / "cam.txt", K)
        for i in range(6):
            img = (rng.uniform(0, 255, (H, W, 3))).astype(np.uint8)
            imageio.imwrite(d / f"{i:010d}.jpg", img)
            depth = rng.uniform(1, 60, (H, W)).astype(np.float32)
            depth *= rng.uniform(size=(H, W)) > 0.5
            np.save(d / f"{i:010d}.npy", depth)
    (root / "train.txt").write_text("scene_a\n")
    (root / "val.txt").write_text("scene_b\n")
    return root


def test_sequence_folder(dump_root):
    from supervised_dispnet_tpu.data.sequence_folders import SequenceFolder

    ds = SequenceFolder(dump_root, train=True, sequence_length=3, with_depth=True)
    assert len(ds) == 4  # 6 frames, demi=1 -> indices 1..4
    s = ds[0]
    assert s["tgt"].shape == (H, W, 3)
    assert s["ref_imgs"].shape == (2, H, W, 3)
    assert s["intrinsics"].shape == (3, 3)
    assert s["depth"].shape == (H, W)
    assert 0.0 <= s["tgt"].min() and s["tgt"].max() <= 1.0


def test_validation_set(dump_root):
    from supervised_dispnet_tpu.data.validation_folders import ValidationSet

    ds = ValidationSet(dump_root)
    assert len(ds) == 6
    s = ds[0]
    assert s["img"].shape == (H, W, 3)
    assert s["depth"].shape == (H, W)


def test_batch_loader(dump_root):
    from supervised_dispnet_tpu.data.loader import BatchLoader
    from supervised_dispnet_tpu.data.sequence_folders import SequenceFolder

    ds = SequenceFolder(dump_root, train=True, sequence_length=3, with_depth=True)
    loader = BatchLoader(ds, batch_size=2, shuffle=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["tgt"].shape == (2, H, W, 3)
    assert batches[0]["ref_imgs"].shape == (2, 2, H, W, 3)
    # second epoch reshuffles but yields same count
    assert len(list(loader)) == 2


def test_trainer_supervised_end_to_end(dump_root, tmp_path):
    from supervised_dispnet_tpu.models import DispResNet
    from supervised_dispnet_tpu.parallel import make_mesh
    from supervised_dispnet_tpu.training.trainer import Trainer, TrainerConfig
    from supervised_dispnet_tpu.utils.checkpoint import restore_checkpoint

    cfg = TrainerConfig(
        data=str(dump_root),
        save_path=str(tmp_path / "exp"),
        loss="berhu",
        epochs=1,
        batch_size=2,
        workers=2,
        img_height=H,
        img_width=W,
        training_output_freq=1,  # exercise the tensorboard image path
    )
    mesh = make_mesh(jax.devices()[:1])
    trainer = Trainer(cfg, DispResNet(encoder_depth=18), mesh=mesh)
    best = trainer.fit()
    assert np.isfinite(best)
    # logs written
    assert (tmp_path / "exp" / "progress_log_full.csv").exists()
    assert (tmp_path / "exp" / "metrics.jsonl").exists()
    # checkpoint roundtrip
    step_before = int(trainer.state.step)
    restored = restore_checkpoint(tmp_path / "exp", trainer.state)
    assert int(restored.step) == step_before
    a = jax.tree_util.tree_leaves(trainer.state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_trainer_selfsup_end_to_end(dump_root, tmp_path):
    from supervised_dispnet_tpu.models import DispResNet, PoseExpNet
    from supervised_dispnet_tpu.parallel import make_mesh
    from supervised_dispnet_tpu.training.trainer import Trainer, TrainerConfig

    cfg = TrainerConfig(
        data=str(dump_root),
        save_path=str(tmp_path / "exp_ss"),
        loss="selfsup",
        epochs=1,
        epoch_size=2,
        batch_size=2,
        workers=2,
        img_height=H,
        img_width=W,
    )
    mesh = make_mesh(jax.devices()[:1])
    trainer = Trainer(
        cfg, DispResNet(encoder_depth=18), PoseExpNet(nb_ref_imgs=2), mesh=mesh
    )
    best = trainer.fit()
    assert np.isfinite(best)


def test_trainer_selfsup_without_gt(tmp_path):
    """No depth dumps at all -> validation falls back to photometric loss
    (reference: train.py::validate_without_gt)."""
    import imageio.v2 as imageio

    from supervised_dispnet_tpu.models import DispResNet, PoseExpNet
    from supervised_dispnet_tpu.parallel import make_mesh
    from supervised_dispnet_tpu.training.trainer import Trainer, TrainerConfig

    root = tmp_path / "dump_nogt"
    rng = np.random.default_rng(1)
    K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]], np.float32)
    for s in ("scene_a", "scene_b"):
        d = root / s
        d.mkdir(parents=True)
        np.savetxt(d / "cam.txt", K)
        for i in range(5):
            imageio.imwrite(d / f"{i:010d}.jpg",
                            rng.uniform(0, 255, (H, W, 3)).astype(np.uint8))
    (root / "train.txt").write_text("scene_a\n")
    (root / "val.txt").write_text("scene_b\n")

    cfg = TrainerConfig(
        data=str(root), save_path=str(tmp_path / "exp_nogt"),
        loss="selfsup", epochs=1, epoch_size=1, batch_size=2, workers=2,
        img_height=H, img_width=W,
    )
    mesh = make_mesh(jax.devices()[:1])
    trainer = Trainer(
        cfg, DispResNet(encoder_depth=18), PoseExpNet(nb_ref_imgs=2), mesh=mesh
    )
    best = trainer.fit()
    assert not trainer.val_with_gt
    assert np.isfinite(best)


def test_trainer_resume_continues_epochs(dump_root, tmp_path):
    """resume=True restores state and continues at the next epoch instead of
    restarting from 0."""
    from supervised_dispnet_tpu.models import DispResNet
    from supervised_dispnet_tpu.parallel import make_mesh
    from supervised_dispnet_tpu.training.trainer import Trainer, TrainerConfig

    kw = dict(
        data=str(dump_root), save_path=str(tmp_path / "exp_resume"),
        loss="l1", batch_size=2, workers=2, img_height=H, img_width=W,
    )
    mesh = make_mesh(jax.devices()[:1])
    t1 = Trainer(TrainerConfig(epochs=1, **kw), DispResNet(encoder_depth=18),
                 mesh=mesh)
    t1.fit()
    steps_after_1 = int(t1.state.step)

    t2 = Trainer(TrainerConfig(epochs=2, resume=True, **kw),
                 DispResNet(encoder_depth=18), mesh=mesh)
    t2.fit()
    # exactly one more epoch of steps, not two
    assert int(t2.state.step) == 2 * steps_after_1


def test_trainer_resume_preserves_best(dump_root, tmp_path):
    """The best-metric seed survives a resume: a post-resume epoch that is
    WORSE than the pre-resume best must not be crowned best (ADVICE r1)."""
    import json

    from supervised_dispnet_tpu.models import DispResNet
    from supervised_dispnet_tpu.parallel import make_mesh
    from supervised_dispnet_tpu.training.trainer import Trainer, TrainerConfig
    from supervised_dispnet_tpu.utils.checkpoint import latest_checkpoint_step

    kw = dict(
        data=str(dump_root), save_path=str(tmp_path / "exp_best"),
        loss="l1", batch_size=2, workers=2, img_height=H, img_width=W,
    )
    mesh = make_mesh(jax.devices()[:1])
    t1 = Trainer(TrainerConfig(epochs=1, **kw), DispResNet(encoder_depth=18),
                 mesh=mesh)
    best1 = t1.fit()
    # fake an unbeatably good recorded best, as if an earlier epoch had it
    meta_path = tmp_path / "exp_best" / "trainer_meta.json"
    meta = json.loads(meta_path.read_text())
    meta["best"] = 0.0
    meta_path.write_text(json.dumps(meta))
    best_step_before = latest_checkpoint_step(tmp_path / "exp_best", best=True)

    t2 = Trainer(TrainerConfig(epochs=2, resume=True, **kw),
                 DispResNet(encoder_depth=18), mesh=mesh)
    best2 = t2.fit()
    assert best2 == 0.0  # seeded from the sidecar, not reset to inf
    # and the 'best' checkpoint was NOT overwritten by the worse epoch
    assert latest_checkpoint_step(tmp_path / "exp_best", best=True) == best_step_before
    assert np.isfinite(best1)


def test_batch_loader_propagates_dataset_errors():
    from supervised_dispnet_tpu.data.loader import BatchLoader

    class Bad:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 3:
                raise ValueError("corrupt sample")
            return {"x": np.zeros(2, np.float32)}

    loader = BatchLoader(Bad(), batch_size=2, shuffle=False, num_workers=2)
    with pytest.raises(ValueError, match="corrupt sample"):
        for _ in loader:
            pass


def test_trainer_with_grain_loader(dump_root, tmp_path):
    """loader='grain' drives two epochs through ONE persistent worker pool
    (the train loader's endless sampler survives the epoch boundary)."""
    pytest.importorskip("grain")
    from supervised_dispnet_tpu.models import DispResNet
    from supervised_dispnet_tpu.parallel import make_mesh
    from supervised_dispnet_tpu.training.trainer import Trainer, TrainerConfig

    cfg = TrainerConfig(
        data=str(dump_root), save_path=str(tmp_path / "exp_grain"),
        loss="l1", epochs=2, batch_size=2, workers=0,
        img_height=H, img_width=W, loader="grain",
    )
    mesh = make_mesh(jax.devices()[:1])
    trainer = Trainer(cfg, DispResNet(encoder_depth=18), mesh=mesh)
    best = trainer.fit()
    assert np.isfinite(best)


def test_odometry_etl_selfsup_train_pose_eval(tmp_path, capsys):
    """The full odometry flow as ONE pipeline (VERDICT r2 item 5):
    synthetic KITTI-odometry tree -> prepare_train_data --dataset-format
    odometry -> train CLI --loss selfsup on the dump -> test_pose CLI
    evaluates the TRAINED checkpoint on the held-out test sequence."""
    import cv2

    from supervised_dispnet_tpu.cli.test_pose import main as test_pose_main
    from supervised_dispnet_tpu.cli.train import main as train_main
    from supervised_dispnet_tpu.data.prepare_train_data import main as etl_main

    # 1) synthetic odometry tree (seq 09 is a held-out test sequence)
    rng = np.random.default_rng(7)
    Ho, Wo = 64, 128
    root = tmp_path / "odometry"
    for seq in ("00", "09"):
        img_dir = root / "sequences" / seq / "image_2"
        img_dir.mkdir(parents=True)
        for i in range(8):
            cv2.imwrite(str(img_dir / f"{i:06d}.png"),
                        rng.integers(0, 256, (Ho, Wo, 3), dtype=np.uint8))
        P2 = np.array([[70.0, 0, Wo / 2, 0.0], [0, 70.0, Ho / 2, 0],
                       [0, 0, 1, 0]])
        (root / "sequences" / seq / "calib.txt").write_text(
            "P0: " + " ".join(map(str, P2.reshape(-1))) + "\n"
            "P2: " + " ".join(map(str, P2.reshape(-1))) + "\n")
        poses, t = [], np.zeros(3)
        for i in range(8):
            poses.append(np.hstack([np.eye(3), t[:, None]]).reshape(-1))
            t = t + [0.05, 0, 1.0]
        (root / "poses").mkdir(exist_ok=True)
        np.savetxt(root / "poses" / f"{seq}.txt", np.stack(poses))

    # 2) odometry ETL
    dump = tmp_path / "dump"
    etl_main([str(root), "--dataset-format", "odometry",
              "--dump-root", str(dump), "--with-pose",
              "--height", str(H), "--width", str(W), "--num-threads", "1",
              "--val-frac", "0.0"])
    assert (dump / "seq_00").is_dir()

    # 3) self-supervised training on the dump (tiny: 1 epoch, 2 steps)
    ckpt_dir = tmp_path / "ckpts"
    train_main([str(dump), "--loss", "selfsup", "--network", "dispnet",
                "--epochs", "1", "--epoch-size", "2", "-b", "2", "-j", "1",
                "--img-height", str(H), "--img-width", str(W),
                "--checkpoints-dir", str(ckpt_dir), "--name", "odo"])
    runs = sorted((ckpt_dir / "odo").iterdir())
    assert runs, "train CLI produced no run dir"
    run_dir = runs[-1]

    # 4) pose evaluation of the TRAINED checkpoint on the held-out seq
    test_pose_main(["--pretrained-posenet", str(run_dir),
                    "--dataset-dir", str(root), "--sequences", "09",
                    "--img-height", str(H), "--img-width", str(W),
                    "--batch-size", "4"])
    out = capsys.readouterr().out
    assert "ATE" in out and "RE" in out


def test_log_images_selfsup_warp_under_remat(dump_root, tmp_path):
    """Warp-image diagnostics survive --remat: the loss drops warped_results
    in the remat branch (losses/selfsup.py), so _log_images re-forwards a
    B=1 warp outside the train step and logs train/warped + train/diff
    (reference: tensorboard warp images in ``train.py``)."""
    from supervised_dispnet_tpu.data.loader import BatchLoader
    from supervised_dispnet_tpu.data.sequence_folders import SequenceFolder
    from supervised_dispnet_tpu.models import DispResNet, PoseExpNet
    from supervised_dispnet_tpu.parallel import make_mesh
    from supervised_dispnet_tpu.training.trainer import Trainer, TrainerConfig

    cfg = TrainerConfig(
        data=str(dump_root), save_path=str(tmp_path / "exp_warp"),
        loss="selfsup", epochs=1, epoch_size=1, batch_size=2, workers=2,
        img_height=H, img_width=W, remat=True, training_output_freq=1,
    )
    mesh = make_mesh(jax.devices()[:1])
    trainer = Trainer(cfg, DispResNet(encoder_depth=18),
                      PoseExpNet(nb_ref_imgs=2), mesh=mesh)
    assert trainer._viz_warp is not None

    class StubTB:
        def __init__(self):
            self.tags = set()

        def add_image(self, tag, img, step):
            img = np.asarray(img)
            assert img.ndim == 3 and img.shape[0] == 3  # CHW RGB
            assert np.isfinite(img).all()
            self.tags.add(tag)

    trainer.tb = StubTB()
    ds = SequenceFolder(dump_root, train=True, sequence_length=3,
                        with_depth=False)
    np_batch = next(iter(BatchLoader(ds, batch_size=2, shuffle=False,
                                     num_workers=1)))
    trainer._log_images(np_batch, step=1)
    assert {"train/disp", "train/input",
            "train/warped", "train/diff"} <= trainer.tb.tags
