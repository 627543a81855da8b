"""LR schedules + EMA shadow params (ROADMAP round-2 features).

The reference trained at a fixed lr and kept no parameter average; both are
extensions, expressed in optimizer steps and off by default.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from supervised_dispnet_tpu.data.augment import AugmentConfig
from supervised_dispnet_tpu.models import DispNetS
from supervised_dispnet_tpu.training import (
    create_train_state,
    make_supervised_train_step,
)
from supervised_dispnet_tpu.training.trainer import (
    TrainerConfig,
    build_lr_schedule,
    build_optimizer,
)

H, W = 32, 64
NO_AUG = AugmentConfig(flip=False, scale_crop=False, color_jitter=False)


def _sup_batch(B=4, seed=0):
    rng = np.random.default_rng(seed)
    tgt = rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)
    K = np.broadcast_to(
        np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]], np.float32),
        (B, 3, 3),
    ).copy()
    depth = rng.uniform(1, 60, (B, H, W)).astype(np.float32)
    return {"tgt": jnp.asarray(tgt), "intrinsics": jnp.asarray(K),
            "depth": jnp.asarray(depth)}


# ---------------------------------------------------------------------------
# schedules
# ---------------------------------------------------------------------------

def test_constant_schedule_default():
    sched = build_lr_schedule(TrainerConfig(lr=2e-4))
    assert float(sched(0)) == pytest.approx(2e-4)
    assert float(sched(10_000)) == pytest.approx(2e-4)


def test_step_schedule_staircase():
    cfg = TrainerConfig(lr=1e-3, lr_schedule="step", lr_decay_steps=100,
                        lr_decay_rate=0.5)
    sched = build_lr_schedule(cfg)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(99)) == pytest.approx(1e-3)
    assert float(sched(100)) == pytest.approx(5e-4)
    assert float(sched(250)) == pytest.approx(2.5e-4)


def test_cosine_schedule_decays_to_zero():
    cfg = TrainerConfig(lr=1e-3, lr_schedule="cosine", lr_decay_steps=1000)
    sched = build_lr_schedule(cfg)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(500)) == pytest.approx(5e-4, rel=1e-3)
    assert float(sched(1000)) == pytest.approx(0.0, abs=1e-9)


def test_warmup_prefixes_any_schedule():
    cfg = TrainerConfig(lr=1e-3, lr_warmup_steps=10)
    sched = build_lr_schedule(cfg)
    assert float(sched(0)) == pytest.approx(0.0)
    assert float(sched(5)) == pytest.approx(5e-4)
    assert float(sched(10)) == pytest.approx(1e-3)
    assert float(sched(100)) == pytest.approx(1e-3)


def test_schedule_config_validation():
    with pytest.raises(ValueError):
        build_lr_schedule(TrainerConfig(lr_schedule="step"))  # no decay steps
    with pytest.raises(ValueError):
        build_lr_schedule(TrainerConfig(lr_schedule="cosine"))
    with pytest.raises(ValueError):
        build_lr_schedule(TrainerConfig(lr_schedule="nope"))


def test_scheduled_optimizer_steps_shrink():
    """A decaying schedule must actually shrink Adam update magnitudes."""
    cfg = TrainerConfig(lr=1e-3, lr_schedule="step", lr_decay_steps=2,
                        lr_decay_rate=0.01)
    tx = build_optimizer(cfg)
    params = {"w": jnp.ones((4,))}
    opt_state = tx.init(params)
    g = {"w": jnp.full((4,), 0.7)}
    # steps 0,1 at lr=1e-3; steps 2,3 at lr=1e-5
    sizes = []
    for _ in range(4):
        updates, opt_state = tx.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
        sizes.append(float(jnp.abs(updates["w"]).max()))
    assert sizes[1] == pytest.approx(1e-3, rel=0.2)
    assert sizes[2] == pytest.approx(1e-5, rel=0.2)


# ---------------------------------------------------------------------------
# EMA
# ---------------------------------------------------------------------------

def test_ema_disabled_by_default():
    model = DispNetS()
    state = create_train_state(model, (jnp.zeros((1, H, W, 3)),),
                               optax.adam(1e-3), seed=0)
    assert state.ema_params is None
    step = make_supervised_train_step(model, "l1", aug=NO_AUG, donate=False)
    state, _ = step(state, _sup_batch())
    assert state.ema_params is None


def test_ema_tracks_exact_blend():
    """ema_t = d*ema_{t-1} + (1-d)*params_t, seeded from the init params."""
    d = 0.5
    model = DispNetS()
    state = create_train_state(model, (jnp.zeros((1, H, W, 3)),),
                               optax.adam(1e-2), seed=0, ema=True)
    # the shadow starts as a copy of the live params
    for a, b in zip(jax.tree_util.tree_leaves(state.ema_params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    step = make_supervised_train_step(model, "l1", aug=NO_AUG, donate=False,
                                      ema_decay=d)
    batch = _sup_batch(seed=3)
    ema_ref = state.params
    for _ in range(3):
        state, _ = step(state, batch)
        ema_ref = jax.tree.map(lambda e, p: d * e + (1 - d) * p,
                               ema_ref, state.params)
    for a, b in zip(jax.tree_util.tree_leaves(state.ema_params),
                    jax.tree_util.tree_leaves(ema_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # and the shadow lags the live params (it still holds init mass)
    diffs = [
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(jax.tree_util.tree_leaves(state.ema_params),
                        jax.tree_util.tree_leaves(state.params))
    ]
    assert max(diffs) > 0


def test_ema_checkpoint_roundtrip(tmp_path):
    from supervised_dispnet_tpu.utils.checkpoint import (
        restore_checkpoint, save_checkpoint,
    )

    model = DispNetS()
    state = create_train_state(model, (jnp.zeros((1, H, W, 3)),),
                               optax.adam(1e-2), seed=0, ema=True)
    step = make_supervised_train_step(model, "l1", aug=NO_AUG, donate=False,
                                      ema_decay=0.9)
    state, _ = step(state, _sup_batch(seed=5))
    save_checkpoint(tmp_path, state, step=0)

    template = create_train_state(model, (jnp.zeros((1, H, W, 3)),),
                                  optax.adam(1e-2), seed=1, ema=True)
    restored = restore_checkpoint(tmp_path, template)
    for a, b in zip(jax.tree_util.tree_leaves(restored.ema_params),
                    jax.tree_util.tree_leaves(state.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_pre_ema_checkpoint_into_ema_state(tmp_path):
    """A checkpoint written without EMA restores into an EMA-enabled state:
    the shadow re-seeds from the restored live params."""
    from supervised_dispnet_tpu.utils.checkpoint import (
        restore_checkpoint, save_checkpoint,
    )

    model = DispNetS()
    plain = create_train_state(model, (jnp.zeros((1, H, W, 3)),),
                               optax.adam(1e-2), seed=0)
    step = make_supervised_train_step(model, "l1", aug=NO_AUG, donate=False)
    plain, _ = step(plain, _sup_batch(seed=6))
    save_checkpoint(tmp_path, plain, step=0)

    template = create_train_state(model, (jnp.zeros((1, H, W, 3)),),
                                  optax.adam(1e-2), seed=1, ema=True)
    restored = restore_checkpoint(tmp_path, template)
    for a, b in zip(jax.tree_util.tree_leaves(restored.ema_params),
                    jax.tree_util.tree_leaves(plain.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_eval_params_prefers_ema():
    from supervised_dispnet_tpu.training.trainer import Trainer

    cfg = TrainerConfig(batch_size=2, img_height=H, img_width=W,
                        ema_decay=0.9, loss="l1", network="dispnet")
    trainer = Trainer(cfg, DispNetS())
    assert trainer.state.ema_params is not None
    # identical at init
    assert trainer.eval_params() is trainer.state.ema_params
    trainer.state, _ = trainer.train_step(
        trainer.state,
        {k: np.asarray(v) for k, v in _sup_batch(B=2, seed=7).items()})
    # after a step the shadow differs from the live params
    a = jax.tree_util.tree_leaves(trainer.eval_params())
    b = jax.tree_util.tree_leaves(trainer.state.params)
    assert any(float(np.abs(np.asarray(x) - np.asarray(y)).max()) > 0
               for x, y in zip(a, b))


# ---------------------------------------------------------------------------
# accumulation semantics: schedules/EMA tick per optimizer UPDATE, not per
# micro-step (round-3 fix: toggling accum_steps must not change the
# effective lr trajectory or compound the EMA decay k times per update)
# ---------------------------------------------------------------------------

def test_schedule_ticks_per_update_under_accum():
    """With accum_steps=2 and a staircase schedule of period 2 updates,
    4 micro-steps = 2 real updates, both inside the first lr period —
    the schedule must NOT have decayed (which it would if it ticked per
    micro-step)."""
    cfg = TrainerConfig(lr=1e-3, lr_schedule="step", lr_decay_steps=2,
                        lr_decay_rate=0.01, accum_steps=2)
    tx = build_optimizer(cfg)
    params = {"w": jnp.ones((4,))}
    opt_state = tx.init(params)
    g = {"w": jnp.full((4,), 0.7)}
    sizes = []
    for _ in range(4):
        updates, opt_state = tx.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
        sizes.append(float(jnp.abs(updates["w"]).max()))
    # micro-steps 0, 2 emit zero updates; 1, 3 are real updates at inner
    # schedule steps 0 and 1 — both still at the base lr
    assert sizes[0] == 0.0 and sizes[2] == 0.0
    assert sizes[1] == pytest.approx(1e-3, rel=0.2)
    assert sizes[3] == pytest.approx(1e-3, rel=0.2)
    # sanity: without accumulation the same 4 steps span 2 periods
    cfg1 = TrainerConfig(lr=1e-3, lr_schedule="step", lr_decay_steps=2,
                         lr_decay_rate=0.01)
    tx1 = build_optimizer(cfg1)
    p1 = {"w": jnp.ones((4,))}
    s1 = tx1.init(p1)
    last = None
    for _ in range(4):
        updates, s1 = tx1.update(g, s1, p1)
        p1 = optax.apply_updates(p1, updates)
        last = float(jnp.abs(updates["w"]).max())
    assert last == pytest.approx(1e-5, rel=0.2)


def test_ema_ticks_per_update_under_accum():
    """With accum_steps=2, the EMA shadow blends once per real optimizer
    update (every 2nd micro-step), not once per micro-step."""
    d = 0.5
    k = 2
    model = DispNetS()
    tx = optax.MultiSteps(optax.adam(1e-2), every_k_schedule=k)
    state = create_train_state(model, (jnp.zeros((1, H, W, 3)),), tx,
                               seed=0, ema=True)
    step = make_supervised_train_step(model, "l1", aug=NO_AUG, donate=False,
                                      ema_decay=d, accum_steps=k)
    batch = _sup_batch(seed=3)
    ema_ref = state.params
    for micro in range(4):
        state, _ = step(state, batch)
        if (micro + 1) % k == 0:  # real update boundary
            ema_ref = jax.tree.map(lambda e, p: d * e + (1 - d) * p,
                                   ema_ref, state.params)
        else:
            # no real update: live params unchanged AND shadow untouched
            for a, b in zip(jax.tree_util.tree_leaves(state.ema_params),
                            jax.tree_util.tree_leaves(ema_ref)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state.ema_params),
                    jax.tree_util.tree_leaves(ema_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_bf16_grads_and_opt_state_flags():
    """Precision probes (VERDICT r2 item 6): bf16 grad cast and bf16 Adam
    first moment must build, step, and store mu in bf16."""
    cfg = TrainerConfig(lr=1e-3, bf16_grads=True, bf16_opt_state=True)
    tx = build_optimizer(cfg)
    params = {"w": jnp.ones((8,), jnp.float32)}
    opt_state = tx.init(params)
    g = {"w": jnp.full((8,), 0.37, jnp.float32)}
    updates, opt_state = tx.update(g, opt_state, params)
    new = optax.apply_updates(params, updates)
    assert np.isfinite(np.asarray(new["w"])).all()
    assert float(jnp.abs(new["w"] - params["w"]).max()) > 0
    mu_dtypes = {str(x.dtype) for x in jax.tree_util.tree_leaves(opt_state)
                 if hasattr(x, "dtype") and x.ndim > 0}
    assert "bfloat16" in mu_dtypes, mu_dtypes
