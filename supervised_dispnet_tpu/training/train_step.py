"""Jitted, mesh-sharded train/eval steps.

The TPU rebuild of the reference's per-batch loop (reference:
``train.py::train`` — forward, loss, backward, Adam step). One fused XLA
program per step: on-device augmentation + forward + loss + grad + Adam
update, with the batch sharded over the data mesh and gradients reduced by
XLA collectives over ICI. Buffers are donated so params update in place.

Supervised losses: l1 | berhu | scale_invariant | classification
(reference: the training loss selector flag). Self-supervised: photometric
+ explainability + smoothness with PoseExpNet
(reference: ``train.py`` self-sup path, BASELINE config 5).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from supervised_dispnet_tpu.data.augment import AugmentConfig, augment_batch
from supervised_dispnet_tpu.losses import (
    berhu_loss,
    depth_classification_loss,
    explainability_loss,
    l1_loss,
    multiscale_supervised_loss,
    photometric_reconstruction_loss,
    scale_invariant_loss,
    smooth_loss,
    compute_errors,
    logits_to_depth,
)
from supervised_dispnet_tpu.losses.classification import DepthBins
from supervised_dispnet_tpu.parallel.mesh import (
    DATA_AXIS, SPATIAL_AXIS, spatial_size,
)


class TrainState(struct.PyTreeNode):
    """Model + optimizer state (params, BN stats, opt state, step, rng).

    ``ema_params`` is an optional exponential-moving-average shadow of
    ``params`` (None = EMA disabled; None is an empty pytree so the state
    layout is unchanged for non-EMA runs)."""

    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    ema_params: Any = None

    def apply_gradients(self, grads, new_batch_stats, new_rng,
                        ema_decay: float = 0.0, accum_steps: int = 1):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        if ema_decay and new_ema is not None:
            if accum_steps > 1:
                # under gradient accumulation (optax.MultiSteps) only every
                # k-th micro-step performs a real optimizer update; ticking
                # EMA on the in-between micro-steps would compound the decay
                # k times per update, silently changing the configured
                # semantics when accumulation is toggled
                is_update = (self.step + 1) % accum_steps == 0
                new_ema = jax.tree.map(
                    lambda e, p: jnp.where(
                        is_update, ema_decay * e + (1.0 - ema_decay) * p, e),
                    new_ema, new_params,
                )
            else:
                new_ema = jax.tree.map(
                    lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
                    new_ema, new_params,
                )
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
            rng=new_rng,
            ema_params=new_ema,
        )


def create_train_state(
    model,
    example_input,
    tx: optax.GradientTransformation,
    seed: int = 0,
    extra_models: dict | None = None,
    ema: bool = False,
) -> TrainState:
    """Initialize a TrainState. ``extra_models`` maps name -> (model, args)
    for multi-network training (disp net + pose net). ``ema`` seeds an
    EMA shadow copy of the params (updated when the train step is built
    with ``ema_decay > 0``)."""
    rng = jax.random.PRNGKey(seed)
    init_rng, state_rng = jax.random.split(rng)
    # jit the init: eager flax init dispatches op-by-op (measured 36 s for
    # DispNetS on 1 vCPU vs 1.5 s as one cached program; on TPU it saves
    # one RPC round trip per op through the relay)
    variables = jax.jit(model.init)(init_rng, *example_input)
    params = {"disp": variables["params"]}
    batch_stats = {"disp": variables.get("batch_stats", {})}
    if extra_models:
        import zlib

        for name, (m, args) in extra_models.items():
            # crc32, not hash(): str hashing is salted per process and would
            # make seeded runs irreproducible
            v = jax.jit(m.init)(
                jax.random.fold_in(init_rng, zlib.crc32(name.encode())), *args)
            params[name] = v["params"]
            batch_stats[name] = v.get("batch_stats", {})
    opt_state = tx.init(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        rng=state_rng,
        tx=tx,
        # a REAL copy, not an alias: donated steps may not receive the same
        # buffer twice (params and its shadow are both donated)
        ema_params=jax.tree.map(jnp.copy, params) if ema else None,
    )


def _apply(model, params, batch_stats, *args, train: bool):
    """Run a flax model handling optional batch_stats collections."""
    from supervised_dispnet_tpu.models.common import model_takes_train

    variables = {"params": params}
    has_bn = bool(batch_stats)
    if has_bn:
        variables["batch_stats"] = batch_stats
    if train and has_bn:
        out, updates = model.apply(variables, *args, train=True, mutable=["batch_stats"])
        return out, updates["batch_stats"]
    if model_takes_train(model):
        out = model.apply(variables, *args, train=False)
    else:
        out = model.apply(variables, *args)
    return out, batch_stats


def _imgs_to_float(x: jax.Array) -> jax.Array:
    """uint8 [0,255] -> float32 [0,1] on device (no-op for float inputs).

    Batches travel host->device as uint8 so the transfer is 4x smaller —
    on tunneled TPU setups the link is the training bottleneck (measured
    ~30-45 MB/s; a fresh fp32 B=64 image batch alone costs ~1.4 s)."""
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 255.0
    return x


def _depth_to_float(x: jax.Array) -> jax.Array:
    """f16-transported GT depth -> f32 (no-op for f32). fp16 is exact for
    the sparse zeros and keeps <0.05% relative error below the 80 m cap —
    far under the abs_rel scale — for half the transfer bytes."""
    return x.astype(jnp.float32) if x.dtype != jnp.float32 else x


def _model_max_stride(model) -> int:
    """Deepest feature-map stride of a network — the spatial-
    partitioning guard needs it (every conv level must keep >= 1 row
    per spatial shard). DispNetS and the pose nets have 7 stride-2
    stages (stride 128); the ResNet/VGG/FCRN encoders stop at 32."""
    from supervised_dispnet_tpu.models import DispNetS, PoseExpNet, PoseNet

    return 128 if isinstance(model, (DispNetS, PoseExpNet, PoseNet)) else 32


def _spatial_constrain(x, mesh, max_stride: int = 32):
    """Shard image height over the mesh's spatial axis (no-op without
    one): GSPMD then partitions every conv along H with halo exchanges
    over ICI — the per-device activation working set scales down with
    the mesh (full-resolution inputs fit and speed up with no model
    change). Guard: below 1 row per shard at the deepest level, XLA's
    windowed-partition transpose silently degrades the gradients
    (measured round 4: rel err O(1) at H/32 < shards, <=1.3e-4 at
    exactly 1 row/shard, 1.5e-6 at >= 2)."""
    sp = spatial_size(mesh)
    if sp == 1:
        return x
    if x.shape[1] < max_stride * sp:
        raise ValueError(
            f"spatial partitioning needs height {x.shape[1]} >= "
            f"max_stride {max_stride} * spatial shards {sp} (>= 1 row "
            "per shard at the deepest conv level); lower --spatial-shards "
            "or raise the input height")
    spec = P(DATA_AXIS, SPATIAL_AXIS, *([None] * (x.ndim - 2)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def _collapse_single_device_mesh(mesh):
    """A 1-device mesh gets NO sharding annotations: committed-sharded
    dispatch is pathologically slow through the axon TPU relay (measured
    93 ms -> 2.7-9.2 s/step for the identical program) and annotations
    add nothing on one device. Multi-device meshes are untouched."""
    if mesh is not None and mesh.size == 1:
        return None
    return mesh


SUPERVISED_LOSSES: dict[str, Callable] = {
    "l1": l1_loss,
    "berhu": berhu_loss,
    "scale_invariant": scale_invariant_loss,
}


def disps_to_depths(disps: list[jax.Array]) -> list[jax.Array]:
    """disparity -> depth (reference: depth = 1/disp in ``train.py``)."""
    return [1.0 / d[..., 0] for d in disps]


def make_supervised_train_step(
    model,
    loss_name: str = "berhu",
    bins: DepthBins | None = None,
    aug: AugmentConfig = AugmentConfig(),
    max_depth: float = 80.0,
    mesh=None,
    multiscale: bool = True,
    donate: bool = True,
    use_pallas_losses: bool = False,
    ema_decay: float = 0.0,
    accum_steps: int = 1,
    fake_quant: bool = False,
):
    """Build the jitted supervised step: (state, batch) -> (state, metrics).

    batch: {'tgt': (B, H, W, 3) [0,1], 'intrinsics': (B, 3, 3),
            'depth': (B, H, W) sparse GT}.

    ``use_pallas_losses`` swaps in the fused Pallas reduction kernels
    (ops/pallas/losses.py, custom-VJP) for berhu / classification.

    ``fake_quant`` trains THROUGH int8 quantization noise (QAT,
    ops/quant.py::fake_quant_methods) so the checkpoint serves via
    ``--int8`` with less quality loss than post-training calibration.
    """
    classification = loss_name == "classification"
    if classification and bins is None:
        bins = DepthBins()
    if not classification and loss_name not in SUPERVISED_LOSSES:
        raise ValueError(f"unknown supervised loss {loss_name!r}")
    ce_fn = depth_classification_loss
    sup_losses = dict(SUPERVISED_LOSSES)
    if use_pallas_losses:
        from supervised_dispnet_tpu.ops.pallas import (
            berhu_loss_pallas, depth_classification_loss_pallas,
        )

        ce_fn = depth_classification_loss_pallas
        sup_losses["berhu"] = berhu_loss_pallas

    def step(state: TrainState, batch):
        rng, key = jax.random.split(state.rng)
        imgs, _, depth_gt = augment_batch(
            key, _imgs_to_float(batch["tgt"])[:, None], batch["intrinsics"],
            _depth_to_float(batch["depth"]), config=aug
        )
        x = _spatial_constrain(imgs[:, 0], mesh, _model_max_stride(model))
        depth_gt = _spatial_constrain(depth_gt, mesh)
        mask = (depth_gt > 0) & (depth_gt < max_depth)

        def loss_fn(params):
            if fake_quant:
                from supervised_dispnet_tpu.ops.quant import fake_quant_methods

                with fake_quant_methods():
                    out, new_bs = _apply(
                        model, params["disp"], state.batch_stats["disp"], x,
                        train=True,
                    )
            else:
                out, new_bs = _apply(
                    model, params["disp"], state.batch_stats["disp"], x, train=True
                )
            if classification:
                if isinstance(out, (list, tuple)):  # multi-scale bin logits
                    from supervised_dispnet_tpu.losses import (
                        multiscale_classification_loss,
                    )

                    loss = multiscale_classification_loss(
                        out, depth_gt, mask, bins, ce_fn=ce_fn)
                else:
                    loss = ce_fn(out, depth_gt, mask, bins)
            else:
                fn = sup_losses[loss_name]
                if not isinstance(out, (list, tuple)):
                    # FCRN-style direct metric depth, single scale (the
                    # eval-step decode at train_step.py::make_eval_step;
                    # Laina et al. train FCRN with BerHu on depth)
                    loss = fn(out[..., 0], depth_gt, mask)
                else:
                    depths = disps_to_depths(out)
                    if multiscale:
                        loss = multiscale_supervised_loss(
                            depths, depth_gt, mask, fn)
                    else:
                        loss = fn(depths[0], depth_gt, mask)
            return loss, new_bs

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(
            grads, {**state.batch_stats, "disp": new_bs}, rng,
            ema_decay=ema_decay, accum_steps=accum_steps,
        )
        metrics = {"loss": loss}
        return new_state, metrics

    mesh = _collapse_single_device_mesh(mesh)
    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(
        step,
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_selfsup_train_step(
    disp_model,
    pose_model,
    nb_ref_imgs: int = 2,
    photo_weight: float = 1.0,
    mask_weight: float = 0.2,
    smooth_weight: float = 0.1,
    rotation_mode: str = "euler",
    padding_mode: str = "zeros",
    aug: AugmentConfig = AugmentConfig(),
    num_scales: int = 4,
    mesh=None,
    donate: bool = True,
    use_pallas_warp: bool = False,
    half_res_photo: bool = False,
    ema_decay: float = 0.0,
    accum_steps: int = 1,
    fake_quant: bool = False,
    remat_photo: bool = False,
    batch_refs: bool = False,
    stochastic_photo: int = 1,
):
    """Self-supervised step (reference: BASELINE config 5; ``train.py``
    photometric path with -p/-m/-s weights). ``half_res_photo`` computes
    the photometric pyramid one octave down (~4x cheaper warp gathers,
    documented deviation). ``fake_quant`` QAT-trains the DISP net (the
    net the --int8 serving path quantizes; the pose net serves fp).
    ``remat_photo`` checkpoints each (scale, ref) photometric term so the
    warp intermediates are recomputed in the backward pass (--remat).
    ``stochastic_photo`` > 1 evaluates the photometric term on a
    random-phase 1/N^2 pixel subset per step (unbiased; documented
    deviation like half_res — see losses/selfsup.py).

    batch: {'tgt': (B, H, W, 3), 'ref_imgs': (B, R, H, W, 3),
            'intrinsics': (B, 3, 3)}.
    """
    with_exp = mask_weight > 0

    def step(state: TrainState, batch):
        rng, key, photo_key = jax.random.split(state.rng, 3)
        snippet = jnp.concatenate(
            [_imgs_to_float(batch["tgt"])[:, None],
             _imgs_to_float(batch["ref_imgs"])], axis=1)
        imgs, K = augment_batch(key, snippet, batch["intrinsics"], config=aug)
        stride = max(_model_max_stride(disp_model), _model_max_stride(pose_model))
        tgt = _spatial_constrain(imgs[:, 0], mesh, stride)
        refs = [_spatial_constrain(imgs[:, 1 + r], mesh, stride)
                for r in range(nb_ref_imgs)]

        def loss_fn(params):
            if fake_quant:
                from supervised_dispnet_tpu.ops.quant import fake_quant_methods

                with fake_quant_methods():
                    disps, new_bs_d = _apply(
                        disp_model, params["disp"], state.batch_stats["disp"],
                        tgt, train=True,
                    )
            else:
                disps, new_bs_d = _apply(
                    disp_model, params["disp"], state.batch_stats["disp"], tgt,
                    train=True,
                )
            disps = disps[:num_scales]
            depths = disps_to_depths(disps)
            (exp_masks, pose), new_bs_p = _apply(
                pose_model, params["pose"], state.batch_stats["pose"], tgt, refs,
                train=True,
            )
            if not with_exp:
                exp_masks = None
            else:
                exp_masks = exp_masks[:num_scales]
            photo, _ = photometric_reconstruction_loss(
                tgt, refs, K, depths, exp_masks, pose,
                rotation_mode=rotation_mode, padding_mode=padding_mode,
                use_pallas_warp=use_pallas_warp, half_res=half_res_photo,
                remat=remat_photo, batch_refs=batch_refs,
                stochastic_stride=stochastic_photo, rng=photo_key,
            )
            exp_l = explainability_loss(exp_masks) if with_exp else jnp.float32(0.0)
            smooth = smooth_loss(disps)
            loss = photo_weight * photo + mask_weight * exp_l + smooth_weight * smooth
            aux = {
                "photo_loss": photo,
                "exp_loss": exp_l,
                "smooth_loss": smooth,
                "batch_stats": {"disp": new_bs_d, "pose": new_bs_p},
            }
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, aux["batch_stats"], rng,
                                          ema_decay=ema_decay,
                                          accum_steps=accum_steps)
        metrics = {
            "loss": loss,
            "photo_loss": aux["photo_loss"],
            "exp_loss": aux["exp_loss"],
            "smooth_loss": aux["smooth_loss"],
        }
        return new_state, metrics

    mesh = _collapse_single_device_mesh(mesh)
    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(
        step,
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_selfsup_eval_step(
    disp_model,
    pose_model,
    nb_ref_imgs: int = 2,
    rotation_mode: str = "euler",
    padding_mode: str = "zeros",
    num_scales: int = 4,
    with_exp: bool = True,
    mesh=None,
    aug: AugmentConfig | None = None,
):
    """Loss-only self-supervised validation (reference:
    ``train.py::validate_without_gt`` — photometric + exp + smooth losses on
    the val set, no gradients).

    batch: {'tgt', 'ref_imgs', 'intrinsics'}. With ``aug`` set, images
    arrive raw ([0,1] float or uint8) and are normalized on device;
    without it they must be pre-normalized (legacy contract).
    """

    def prep(x):
        x = _imgs_to_float(x)
        if aug is not None:
            from supervised_dispnet_tpu.data.augment import normalize_images

            x = normalize_images(x, aug.mean, aug.std)
        return x

    def step(params, batch_stats, batch):
        stride = max(_model_max_stride(disp_model),
                     _model_max_stride(pose_model))
        tgt = _spatial_constrain(prep(batch["tgt"]), mesh, stride)
        refs = [_spatial_constrain(prep(batch["ref_imgs"][:, r]), mesh, stride)
                for r in range(nb_ref_imgs)]
        disps, _ = _apply(disp_model, params["disp"], batch_stats["disp"],
                          tgt, train=False)
        disps = disps[:num_scales]
        depths = disps_to_depths(disps)
        (exp_masks, pose), _ = _apply(
            pose_model, params["pose"], batch_stats["pose"], tgt, refs,
            train=False)
        if not with_exp:
            exp_masks = None
        else:
            exp_masks = exp_masks[:num_scales]
        photo, _ = photometric_reconstruction_loss(
            tgt, refs, batch["intrinsics"], depths, exp_masks, pose,
            rotation_mode=rotation_mode, padding_mode=padding_mode)
        exp_l = explainability_loss(exp_masks) if with_exp else jnp.float32(0.0)
        smooth = smooth_loss(disps)
        return {"photo_loss": photo, "exp_loss": exp_l, "smooth_loss": smooth}

    mesh = _collapse_single_device_mesh(mesh)
    if mesh is None:
        return jax.jit(step)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(step, in_shardings=(repl, repl, data), out_shardings=repl)


def make_eval_step(
    model,
    classification: bool = False,
    bins: DepthBins | None = None,
    max_depth: float = 80.0,
    mesh=None,
    aug: AugmentConfig | None = None,
):
    """Validation step: forward + Eigen metrics against dumped GT
    (reference: ``train.py::validate_with_gt``).

    batch: {'img': (B, H, W, 3), 'depth': (B, H, W)}. With ``aug`` set,
    images arrive raw ([0,1] float or uint8) and are normalized on device;
    without it they must be pre-normalized (legacy contract). Depth may
    arrive f16 (transport) and is evaluated in f32.
    """
    if classification and bins is None:
        bins = DepthBins()

    def step(params, batch_stats, batch):
        img = _imgs_to_float(batch["img"])
        if aug is not None:
            from supervised_dispnet_tpu.data.augment import normalize_images

            img = normalize_images(img, aug.mean, aug.std)
        img = _spatial_constrain(img, mesh, _model_max_stride(model))
        out, _ = _apply(model, params["disp"], batch_stats["disp"], img, train=False)
        if classification:
            if isinstance(out, (list, tuple)):
                out = out[0]  # finest-scale logits
            depth = logits_to_depth(out, bins)
        elif isinstance(out, (list, tuple)):
            depth = 1.0 / out[0][..., 0]
        else:  # FCRN-style direct depth
            depth = out[..., 0]
        gt = _spatial_constrain(_depth_to_float(batch["depth"]), mesh)
        mask = (gt > 0) & (gt < max_depth)
        return compute_errors(gt, depth, mask)

    mesh = _collapse_single_device_mesh(mesh)
    if mesh is None:
        return jax.jit(step)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(step, in_shardings=(repl, repl, data), out_shardings=repl)
