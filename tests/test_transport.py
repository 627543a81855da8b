"""Compact host->device transport: uint8 images + f16 depth, converted and
normalized inside the jitted steps. On tunneled TPU setups the link is the
training bottleneck (~30-45 MB/s measured), so batches ship at 1/4 (images)
and 1/2 (depth) of their f32 size. These tests pin the semantics: uint8
transport is EXACT (8-bit sources), f16 depth is exact on the sparse zeros.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from supervised_dispnet_tpu.data.augment import AugmentConfig
from supervised_dispnet_tpu.models import DispNetS, PoseExpNet
from supervised_dispnet_tpu.training import (
    create_train_state,
    make_eval_step,
    make_selfsup_eval_step,
    make_selfsup_train_step,
    make_supervised_train_step,
)

H, W = 32, 64
NO_AUG = AugmentConfig(flip=False, scale_crop=False, color_jitter=False)


def _u8_batch(B=4, seed=0):
    rng = np.random.default_rng(seed)
    tgt_u8 = rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8)
    K = np.broadcast_to(
        np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]], np.float32),
        (B, 3, 3),
    ).copy()
    # depth pre-rounded to f16 so the f32 and f16 transports carry the
    # same values and results must match bitwise
    depth = (rng.uniform(1, 60, (B, H, W))
             * (rng.uniform(size=(B, H, W)) > 0.5)).astype(np.float16)
    return tgt_u8, K, depth


def test_supervised_step_uint8_f16_matches_float():
    model = DispNetS()
    state = create_train_state(model, (jnp.zeros((1, H, W, 3)),),
                               optax.adam(1e-3), seed=0)
    step = make_supervised_train_step(model, "berhu", aug=NO_AUG, donate=False)
    tgt_u8, K, depth16 = _u8_batch()

    compact = {"tgt": jnp.asarray(tgt_u8), "intrinsics": jnp.asarray(K),
               "depth": jnp.asarray(depth16)}
    full = {"tgt": jnp.asarray(tgt_u8.astype(np.float32) / 255.0),
            "intrinsics": jnp.asarray(K),
            "depth": jnp.asarray(depth16.astype(np.float32))}
    s1, m1 = step(state, compact)
    s2, m2 = step(state, full)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    # the two input dtypes compile to different XLA programs, so fp
    # reassociation gives epsilon-level grad diffs; Adam renormalizes those
    # into lr-scale differences where grad ~ 0 — same tolerance as the DP
    # parity tests
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_selfsup_step_uint8_matches_float():
    disp = DispNetS()
    pose = PoseExpNet(nb_ref_imgs=2, output_exp=True)
    tgt0 = jnp.zeros((1, H, W, 3))
    state = create_train_state(
        disp, (tgt0,), optax.adam(1e-4), seed=0,
        extra_models={"pose": (pose, (tgt0, [tgt0, tgt0]))},
    )
    step = make_selfsup_train_step(disp, pose, nb_ref_imgs=2, aug=NO_AUG,
                                   donate=False)
    rng = np.random.default_rng(1)
    tgt_u8 = rng.integers(0, 256, (4, H, W, 3), dtype=np.uint8)
    refs_u8 = rng.integers(0, 256, (4, 2, H, W, 3), dtype=np.uint8)
    K = _u8_batch(4)[1]

    compact = {"tgt": jnp.asarray(tgt_u8), "ref_imgs": jnp.asarray(refs_u8),
               "intrinsics": jnp.asarray(K)}
    full = {"tgt": jnp.asarray(tgt_u8.astype(np.float32) / 255.0),
            "ref_imgs": jnp.asarray(refs_u8.astype(np.float32) / 255.0),
            "intrinsics": jnp.asarray(K)}
    _, m1 = step(state, compact)
    _, m2 = step(state, full)
    for k in ("loss", "photo_loss", "exp_loss", "smooth_loss"):
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=1e-6)


def test_eval_step_on_device_normalization():
    from supervised_dispnet_tpu.data.augment import normalize_images

    model = DispNetS()
    state = create_train_state(model, (jnp.zeros((1, H, W, 3)),),
                               optax.adam(1e-3), seed=0)
    aug = AugmentConfig()
    ev_raw = make_eval_step(model, aug=aug)          # raw u8 in, normalizes
    ev_legacy = make_eval_step(model)                # pre-normalized in
    tgt_u8, _, depth16 = _u8_batch(2, seed=3)
    depth32 = depth16.astype(np.float32)

    m1 = ev_raw(state.params, state.batch_stats,
                {"img": jnp.asarray(tgt_u8), "depth": jnp.asarray(depth16)})
    norm = normalize_images(
        jnp.asarray(tgt_u8.astype(np.float32) / 255.0), aug.mean, aug.std)
    m2 = ev_legacy(state.params, state.batch_stats,
                   {"img": norm, "depth": jnp.asarray(depth32)})
    for k in m2:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=1e-5)


def test_selfsup_eval_step_on_device_normalization():
    from supervised_dispnet_tpu.data.augment import normalize_images

    disp = DispNetS()
    pose = PoseExpNet(nb_ref_imgs=2, output_exp=True)
    tgt0 = jnp.zeros((1, H, W, 3))
    state = create_train_state(
        disp, (tgt0,), optax.adam(1e-4), seed=0,
        extra_models={"pose": (pose, (tgt0, [tgt0, tgt0]))},
    )
    aug = AugmentConfig()
    ev_raw = make_selfsup_eval_step(disp, pose, nb_ref_imgs=2, aug=aug)
    ev_legacy = make_selfsup_eval_step(disp, pose, nb_ref_imgs=2)
    rng = np.random.default_rng(5)
    tgt_u8 = rng.integers(0, 256, (2, H, W, 3), dtype=np.uint8)
    refs_u8 = rng.integers(0, 256, (2, 2, H, W, 3), dtype=np.uint8)
    K = _u8_batch(2)[1]

    m1 = ev_raw(state.params, state.batch_stats,
                {"tgt": jnp.asarray(tgt_u8), "ref_imgs": jnp.asarray(refs_u8),
                 "intrinsics": jnp.asarray(K)})
    m2 = ev_legacy(
        state.params, state.batch_stats,
        {"tgt": normalize_images(jnp.asarray(tgt_u8.astype(np.float32) / 255.0),
                                 aug.mean, aug.std),
         "ref_imgs": normalize_images(
             jnp.asarray(refs_u8.astype(np.float32) / 255.0),
             aug.mean, aug.std),
         "intrinsics": jnp.asarray(K)})
    for k in m2:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=1e-5)


def test_datasets_uint8_flag(tmp_path):
    import imageio.v2 as imageio

    from supervised_dispnet_tpu.data.sequence_folders import SequenceFolder
    from supervised_dispnet_tpu.data.validation_folders import ValidationSet

    rng = np.random.default_rng(0)
    d = tmp_path / "scene_a"
    d.mkdir()
    np.savetxt(d / "cam.txt", np.eye(3))
    for i in range(3):
        imageio.imwrite(d / f"{i:010d}.jpg",
                        rng.integers(0, 256, (H, W, 3), dtype=np.uint8))
        np.save(d / f"{i:010d}.npy", rng.uniform(1, 60, (H, W)).astype(np.float32))
    (tmp_path / "train.txt").write_text("scene_a\n")
    (tmp_path / "val.txt").write_text("scene_a\n")

    f = SequenceFolder(tmp_path, train=True, sequence_length=3, seed=0)
    u = SequenceFolder(tmp_path, train=True, sequence_length=3, seed=0, uint8=True)
    assert u[0]["tgt"].dtype == np.uint8
    np.testing.assert_allclose(u[0]["tgt"].astype(np.float32) / 255.0,
                               f[0]["tgt"], atol=1e-7)
    np.testing.assert_allclose(u[0]["ref_imgs"].astype(np.float32) / 255.0,
                               f[0]["ref_imgs"], atol=1e-7)

    fv = ValidationSet(tmp_path)
    uv = ValidationSet(tmp_path, uint8=True)
    assert uv[0]["img"].dtype == np.uint8
    np.testing.assert_allclose(uv[0]["img"].astype(np.float32) / 255.0,
                               fv[0]["img"], atol=1e-7)


def test_packed_uint8_flag(tmp_path):
    import imageio.v2 as imageio

    from supervised_dispnet_tpu.data.packed import (
        PackedSequenceDataset, PackedValidationSet, pack_split,
    )

    rng = np.random.default_rng(0)
    d = tmp_path / "scene_a"
    d.mkdir()
    np.savetxt(d / "cam.txt", np.eye(3))
    for i in range(4):
        imageio.imwrite(d / f"{i:010d}.jpg",
                        rng.integers(0, 256, (H, W, 3), dtype=np.uint8))
        np.save(d / f"{i:010d}.npy", rng.uniform(1, 60, (H, W)).astype(np.float32))
    (tmp_path / "train.txt").write_text("scene_a\n")
    (tmp_path / "val.txt").write_text("scene_a\n")
    out = tmp_path / "packed"
    pack_split(tmp_path, out, "train")
    pack_split(tmp_path, out, "val")

    f = PackedSequenceDataset(out, train=True, seed=0)
    u = PackedSequenceDataset(out, train=True, seed=0, uint8=True)
    assert u[0]["tgt"].dtype == np.uint8
    np.testing.assert_array_equal(u[0]["tgt"].astype(np.float32) / 255.0,
                                  f[0]["tgt"])
    b = u.get_batch([0, 1])
    assert b["tgt"].dtype == np.uint8 and b["ref_imgs"].dtype == np.uint8

    uv = PackedValidationSet(out, uint8=True)
    assert uv[0]["img"].dtype == np.uint8
    assert uv.get_batch([0])["img"].dtype == np.uint8
