"""Gradient accumulation (TrainerConfig.accum_steps / optax.MultiSteps)
and the jax.profiler trace flag."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from supervised_dispnet_tpu.data.augment import AugmentConfig
from supervised_dispnet_tpu.models import DispNetS
from supervised_dispnet_tpu.training import (
    create_train_state,
    make_supervised_train_step,
)

H, W = 32, 64
NO_AUG = AugmentConfig(flip=False, scale_crop=False, color_jitter=False)


def _batch(lo, hi, seed=0):
    rng = np.random.default_rng(seed)
    B = hi - lo
    return {
        "tgt": jnp.asarray(rng.uniform(0, 1, (8, H, W, 3)).astype(np.float32))[lo:hi],
        "intrinsics": jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
        "depth": jnp.asarray(
            (rng.uniform(1, 60, (8, H, W))
             * (rng.uniform(size=(8, H, W)) > 0.5)).astype(np.float32))[lo:hi],
    }


def test_accum_two_micro_steps_equal_one_full_batch():
    """k=2 accumulation over two half-batches produces the same params as
    one full-batch step (mean-of-grads == grad-of-mean at equal sizes;
    no BN, augmentation off so RNG plays no role)."""
    model = DispNetS()
    lr = 1e-3

    def run(tx, batches):
        state = create_train_state(model, (jnp.zeros((1, H, W, 3)),), tx, seed=0)
        step = make_supervised_train_step(model, "l1", aug=NO_AUG, donate=False)
        for b in batches:
            state, _ = step(state, b)
        return state.params

    p_full = run(optax.adam(lr), [_batch(0, 8)])
    p_accum = run(optax.MultiSteps(optax.adam(lr), every_k_schedule=2),
                  [_batch(0, 4), _batch(4, 8)])
    # mean-of-half-grads vs grad-of-full differ at fp-epsilon; Adam
    # renormalizes that into lr-scale deltas where grad ~ 0 — same
    # tolerance as the DP/transport parity tests (2x lr)
    for a, b in zip(jax.tree_util.tree_leaves(p_full),
                    jax.tree_util.tree_leaves(p_accum)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_trainer_accum_and_profile(tmp_path):
    """Trainer end-to-end with accum_steps=2 and profile_steps=2: finite
    loss, optimizer applies every 2nd micro-step, trace directory written."""
    import imageio.v2 as imageio

    from supervised_dispnet_tpu.parallel import make_mesh
    from supervised_dispnet_tpu.training.trainer import Trainer, TrainerConfig

    rng = np.random.default_rng(0)
    for s in ("scene_a", "scene_b"):
        d = tmp_path / "dump" / s
        d.mkdir(parents=True)
        np.savetxt(d / "cam.txt", np.eye(3))
        for i in range(8):
            imageio.imwrite(d / f"{i:010d}.jpg",
                            rng.integers(0, 256, (H, W, 3), dtype=np.uint8))
            np.save(d / f"{i:010d}.npy",
                    rng.uniform(1, 60, (H, W)).astype(np.float32))
    (tmp_path / "dump" / "train.txt").write_text("scene_a\n")
    (tmp_path / "dump" / "val.txt").write_text("scene_b\n")

    cfg = TrainerConfig(
        data=str(tmp_path / "dump"), save_path=str(tmp_path / "run"),
        loss="l1", epochs=1, batch_size=2, img_height=H, img_width=W,
        workers=1, epoch_size=4, accum_steps=2, profile_steps=2,
    )
    trainer = Trainer(cfg, DispNetS(), mesh=make_mesh(jax.devices()[:1]))
    best = trainer.fit()
    assert np.isfinite(best)
    # MultiSteps: inner optimizer applied every 2nd micro-step
    assert int(trainer.state.opt_state.gradient_step) == 2
    prof = tmp_path / "run" / "profile"
    assert prof.exists() and any(prof.rglob("*"))
