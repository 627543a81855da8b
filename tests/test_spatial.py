"""Spatial partitioning (height-sharded convs over a 2-D mesh): parity
with single-device execution, and the rows-per-shard guard.

The SP design (parallel/mesh.py): the train/eval steps put a
``with_sharding_constraint`` of P('data', 'spatial') on the image
activations and GSPMD partitions every conv along H with halo exchanges.
Numerics are exact only while the deepest conv level keeps >= 1 row per
shard — below that XLA's windowed-partition transpose silently degrades
gradients (measured round 4), so the steps enforce
``H / max_stride >= shards`` at trace time.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from supervised_dispnet_tpu.data.augment import AugmentConfig
from supervised_dispnet_tpu.models import DispNetS, DispResNet, PoseExpNet
from supervised_dispnet_tpu.parallel import make_mesh, shard_batch, spatial_size
from supervised_dispnet_tpu.training import (
    create_train_state,
    make_eval_step,
    make_selfsup_train_step,
    make_supervised_train_step,
)

NO_AUG = AugmentConfig(flip=False, scale_crop=False, color_jitter=False)
# H must give the stride-32 encoder >= 2 rows per shard at 2 spatial
# shards for bit-level grad parity (1 row/shard is ~1e-4; <1 is wrong
# and guarded against)
H, W = 128, 64


def _sup_batch(B=8, seed=0, h=H, w=W):
    rng = np.random.default_rng(seed)
    tgt = rng.uniform(0, 1, (B, h, w, 3)).astype(np.float32)
    K = np.broadcast_to(
        np.array([[60.0, 0, w / 2], [0, 60.0, h / 2], [0, 0, 1]], np.float32),
        (B, 3, 3)).copy()
    depth = rng.uniform(1, 60, (B, h, w)).astype(np.float32)
    depth *= rng.uniform(size=(B, h, w)) > 0.5
    return {"tgt": tgt, "intrinsics": K, "depth": depth}


@pytest.mark.quick
def test_make_mesh_spatial_axes():
    mesh = make_mesh(jax.devices()[:8], spatial=2)
    assert mesh.axis_names == ("data", "spatial")
    assert mesh.shape["data"] == 4 and mesh.shape["spatial"] == 2
    assert spatial_size(mesh) == 2
    assert spatial_size(make_mesh(jax.devices()[:8])) == 1
    with pytest.raises(ValueError):
        make_mesh(jax.devices()[:8], spatial=3)


def test_supervised_step_spatial_parity_8dev():
    """Same math on 1 device and a (data=4, spatial=2) mesh: the conv
    halo-exchange partition reproduces the single-device step."""
    assert jax.device_count() >= 8, "conftest must force 8 virtual devices"
    mesh = make_mesh(jax.devices()[:8], spatial=2)
    model = DispResNet(encoder_depth=18)
    state = create_train_state(
        model, (jnp.zeros((1, H, W, 3)),), optax.adam(1e-3), seed=0)

    step_sp = make_supervised_train_step(model, "berhu", aug=NO_AUG,
                                         mesh=mesh, donate=False)
    step_1 = make_supervised_train_step(model, "berhu", aug=NO_AUG,
                                        donate=False)
    batch_np = _sup_batch(B=8, seed=3)
    s1, m1 = step_sp(state, shard_batch(
        {k: jnp.asarray(v) for k, v in batch_np.items()}, mesh))
    s2, m2 = step_1(state, {k: jnp.asarray(v) for k, v in batch_np.items()})
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_eval_step_spatial_parity_8dev():
    mesh = make_mesh(jax.devices()[:8], spatial=2)
    model = DispResNet(encoder_depth=18)
    state = create_train_state(
        model, (jnp.zeros((1, H, W, 3)),), optax.adam(1e-3), seed=0)
    ev_sp = make_eval_step(model, mesh=mesh)
    ev_1 = make_eval_step(model)
    rng = np.random.default_rng(4)
    batch_np = {
        "img": rng.standard_normal((8, H, W, 3)).astype(np.float32),
        "depth": rng.uniform(1, 60, (8, H, W)).astype(np.float32),
    }
    out_sp = ev_sp(state.params, state.batch_stats, shard_batch(
        {k: jnp.asarray(v) for k, v in batch_np.items()}, mesh))
    out_1 = ev_1(state.params, state.batch_stats,
                 {k: jnp.asarray(v) for k, v in batch_np.items()})
    for k in ("abs_rel", "rmse", "a1"):
        np.testing.assert_allclose(float(out_sp[k]), float(out_1[k]),
                                   rtol=1e-4)


def test_spatial_guard_rejects_too_many_shards():
    """Below 1 row per shard at the deepest conv level, gradients would be
    silently wrong — the step must refuse at trace time."""
    mesh = make_mesh(jax.devices()[:8], spatial=4)
    model = DispResNet(encoder_depth=18)  # stride 32: needs H >= 128
    state = create_train_state(
        model, (jnp.zeros((1, 64, W, 3)),), optax.adam(1e-3), seed=0)
    step = make_supervised_train_step(model, "l1", aug=NO_AUG, mesh=mesh,
                                      donate=False)
    batch = {k: jnp.asarray(v) for k, v in _sup_batch(B=8, h=64).items()}
    with pytest.raises(ValueError, match="spatial partitioning"):
        step(state, shard_batch(batch, mesh))


def test_selfsup_step_spatial_runs():
    """Self-sup step (DispNetS + PoseExpNet, both stride 128) composes
    with spatial sharding: H=256 at 2 shards satisfies the guard, losses
    finite, warp gathers cross shard boundaries via XLA collectives."""
    mesh = make_mesh(jax.devices()[:8], spatial=2)
    h, w = 256, 32
    disp = DispNetS()
    pose = PoseExpNet(nb_ref_imgs=2, output_exp=True)
    state = create_train_state(
        disp, (jnp.zeros((1, h, w, 3)),), optax.adam(1e-3), seed=0,
        extra_models={"pose": (pose, (jnp.zeros((1, h, w, 3)),
                                      [jnp.zeros((1, h, w, 3))] * 2))})
    step = make_selfsup_train_step(disp, pose, nb_ref_imgs=2, aug=NO_AUG,
                                   mesh=mesh, donate=False)
    rng = np.random.default_rng(7)
    batch = shard_batch({
        "tgt": jnp.asarray(rng.uniform(0, 1, (4, h, w, 3)).astype(np.float32)),
        "ref_imgs": jnp.asarray(
            rng.uniform(0, 1, (4, 2, h, w, 3)).astype(np.float32)),
        "intrinsics": jnp.asarray(np.broadcast_to(
            np.array([[60.0, 0, w / 2], [0, 60.0, h / 2], [0, 0, 1]],
                     np.float32), (4, 3, 3)).copy()),
    }, mesh)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["photo_loss"]))
