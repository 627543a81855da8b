"""Packed binary dataset (data/packed.py): pack -> serve parity with the
file-based datasets, vectorized get_batch, loader integration, and the
Trainer auto-detecting a packed root."""

import numpy as np
import pytest

H, W = 32, 64


@pytest.fixture(scope="module")
def dump_root(tmp_path_factory):
    """Two-scene dumped dataset in prepare_train_data layout."""
    import imageio.v2 as imageio

    root = tmp_path_factory.mktemp("kitti_dump_packed")
    rng = np.random.default_rng(0)
    K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]], np.float32)
    for s in ("scene_a", "scene_b"):
        d = root / s
        d.mkdir()
        np.savetxt(d / "cam.txt", K)
        for i in range(6):
            img = rng.uniform(0, 255, (H, W, 3)).astype(np.uint8)
            imageio.imwrite(d / f"{i:010d}.jpg", img)
            depth = rng.uniform(1, 60, (H, W)).astype(np.float32)
            depth *= rng.uniform(size=(H, W)) > 0.5
            np.save(d / f"{i:010d}.npy", depth)
    (root / "train.txt").write_text("scene_a\n")
    (root / "val.txt").write_text("scene_b\n")
    return root


@pytest.fixture(scope="module")
def packed_root(dump_root, tmp_path_factory):
    from supervised_dispnet_tpu.data.packed import pack_split

    out = tmp_path_factory.mktemp("packed")
    meta_train = pack_split(dump_root, out, "train")
    meta_val = pack_split(dump_root, out, "val")
    assert meta_train["n_frames"] == 6
    assert meta_val["with_depth"]
    return out


def test_is_packed(dump_root, packed_root):
    from supervised_dispnet_tpu.data.packed import is_packed

    assert is_packed(packed_root)
    assert not is_packed(dump_root)


def test_packed_sequence_matches_folder(dump_root, packed_root):
    """Same samples, same shuffle law, bit-identical arrays."""
    from supervised_dispnet_tpu.data.packed import PackedSequenceDataset
    from supervised_dispnet_tpu.data.sequence_folders import SequenceFolder

    kw = dict(seed=7, train=True, sequence_length=3, with_depth=True)
    folder = SequenceFolder(dump_root, **kw)
    packed = PackedSequenceDataset(packed_root, **kw)
    assert len(folder) == len(packed) == 4
    for i in range(len(folder)):
        a, b = folder[i], packed[i]
        np.testing.assert_array_equal(a["tgt"], b["tgt"])
        np.testing.assert_array_equal(a["ref_imgs"], b["ref_imgs"])
        np.testing.assert_array_equal(a["intrinsics"], b["intrinsics"])
        np.testing.assert_array_equal(a["depth"], b["depth"])


def test_packed_get_batch_matches_getitem(packed_root):
    from supervised_dispnet_tpu.data.packed import PackedSequenceDataset

    ds = PackedSequenceDataset(packed_root, seed=1, train=True,
                               sequence_length=3, with_depth=True)
    ids = [2, 0, 3]
    batch = ds.get_batch(ids)
    for j, i in enumerate(ids):
        item = ds[i]
        for k in item:
            np.testing.assert_array_equal(batch[k][j], item[k])
    assert batch["tgt"].dtype == np.float32
    assert batch["tgt"].shape == (3, H, W, 3)


def test_packed_validation_matches_folder(dump_root, packed_root):
    from supervised_dispnet_tpu.data.packed import PackedValidationSet
    from supervised_dispnet_tpu.data.validation_folders import ValidationSet

    folder = ValidationSet(dump_root)
    packed = PackedValidationSet(packed_root)
    assert len(folder) == len(packed) == 6
    for i in range(len(folder)):
        a, b = folder[i], packed[i]
        np.testing.assert_array_equal(a["img"], b["img"])
        np.testing.assert_array_equal(a["depth"], b["depth"])
    batch = packed.get_batch([1, 4])
    np.testing.assert_array_equal(batch["img"][1], packed[4]["img"])


def test_batch_loader_uses_get_batch(packed_root):
    """BatchLoader routes packed datasets through the vectorized path and
    yields the same batches as per-item collation."""
    from supervised_dispnet_tpu.data.loader import BatchLoader
    from supervised_dispnet_tpu.data.packed import PackedSequenceDataset

    ds = PackedSequenceDataset(packed_root, seed=3, train=True,
                               sequence_length=3, with_depth=True)
    loader = BatchLoader(ds, batch_size=2, shuffle=True, num_workers=1, seed=3)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["tgt"].shape == (2, H, W, 3)
    assert batches[0]["ref_imgs"].shape == (2, 2, H, W, 3)
    # reproduce the loader's shuffle to check content equality
    order = np.arange(len(ds))
    np.random.default_rng(3 + 0).shuffle(order)
    expect = ds.get_batch(order[:2])
    for k in expect:
        np.testing.assert_array_equal(batches[0][k], expect[k])


def test_trainer_auto_detects_packed_root(packed_root, tmp_path):
    import jax

    from supervised_dispnet_tpu.models import DispNetS
    from supervised_dispnet_tpu.parallel import make_mesh
    from supervised_dispnet_tpu.training.trainer import Trainer, TrainerConfig

    cfg = TrainerConfig(
        data=str(packed_root), save_path=str(tmp_path / "run"),
        loss="l1", epochs=1, batch_size=2, img_height=H, img_width=W,
        workers=1, epoch_size=2,
    )
    trainer = Trainer(cfg, DispNetS(), mesh=make_mesh(jax.devices()[:1]))
    best = trainer.fit()
    assert np.isfinite(best)
