"""Training-works smoke: training on a *learnable* synthetic mapping must
drive Eigen metrics down.

Supervised task: depth is a smooth deterministic function of image content
(depth = 5 + 40 * blurred-brightness), so a depth net must learn it. Runs a
few hundred fused train steps and reports initial vs final val abs_rel.

Self-supervised task (--loss selfsup): synthetic ego-motion video of a
textured plane (data/synthetic.py — analytic GT depth, known camera
poses). DispNet + PoseExpNet train jointly through the photometric warp
exactly like BASELINE config 5; reported metrics are median-scaled
abs_rel vs the analytic depth and scale-aligned pose ATE / rotation
error vs the known motions. This is the only offline demonstration that
the coupled disp+pose learning dynamics converge (reference:
``train.py`` self-sup path).

Usage: python benchmarks/convergence_check.py [--steps 300]
       python benchmarks/convergence_check.py --loss selfsup --steps 600
Intended for TPU; runs anywhere.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def synth_batch(rng, B, H, W):
    # smooth random images via low-res upsample
    low = rng.uniform(0, 1, (B, H // 8, W // 8, 3)).astype(np.float32)
    img = np.repeat(np.repeat(low, 8, axis=1), 8, axis=2)
    brightness = img.mean(axis=-1)
    depth = 5.0 + 40.0 * brightness
    return img, depth.astype(np.float32)


def run_selfsup(args) -> None:
    """Joint DispNet+PoseExpNet training on synthetic ego-motion video."""
    import jax
    import jax.numpy as jnp
    import optax

    from supervised_dispnet_tpu.data.augment import (
        AugmentConfig, HALF_MEAN, HALF_STD, normalize_images,
    )
    from supervised_dispnet_tpu.data.synthetic import (
        PlaneSceneConfig, pose_errors, render_batch, scaled_abs_rel,
    )
    from supervised_dispnet_tpu.models import get_disp_net, PoseExpNet
    from supervised_dispnet_tpu.training import (
        create_train_state, make_selfsup_train_step,
    )

    H, W, B = args.height, args.width, args.batch
    # the structured scene: corridor (floor/ceiling/walls/back plane) +
    # floating occluder quads. room=True matters for MORE than realism: a
    # single background plane is homography-degenerate for SfM — any
    # (depth, pose) pair consistent with the inter-frame homography
    # reconstructs it exactly, so the photometric loss never ties depth
    # to the true plane (measured: loss down, TRAIN abs_rel up). Two or
    # more planes make the motion, and with it per-pixel depth, unique.
    cfg = PlaneSceneConfig(height=H, width=W, focal=200.0 * W / 416,
                           tilt=0.35, center_depth=(5.0, 16.0),
                           fg_planes=2, room=True, rot=0.04)
    rng = np.random.default_rng(0)

    disp_model = get_disp_net(args.network)
    pose_model = PoseExpNet(nb_ref_imgs=cfg.nb_refs, output_exp=True)
    if args.bf16:
        if hasattr(disp_model, "dtype"):
            disp_model = disp_model.clone(dtype=jnp.bfloat16)
        pose_model = pose_model.clone(dtype=jnp.bfloat16)

    tgt0 = jnp.zeros((1, H, W, 3))
    state = create_train_state(
        disp_model, (tgt0,), optax.adam(2e-4), seed=0,
        extra_models={"pose": (pose_model,
                               (tgt0, [tgt0] * cfg.nb_refs))},
    )
    # FULL augmentation, exactly like real training: the train batch
    # carries no poses (both nets predict them), the whole snippet gets
    # one spatial transform with intrinsics rescaled, so flip/scale-crop
    # are photometric-consistent and pose-safe. Only the EVAL batches
    # need the known poses, and eval never augments. Without aug the
    # ~30M-param nets memorize the finite rendered pool (observed: loss
    # down, held-out abs_rel up).
    step = make_selfsup_train_step(
        disp_model, pose_model, nb_ref_imgs=cfg.nb_refs,
        aug=AugmentConfig(), donate=False, fake_quant=args.qat,
        stochastic_photo=args.stochastic_photo,
    )

    # pre-render a pool of snippets and upload ONCE (uint8 transport);
    # per-step batches are device-side slices — the host link never sees
    # a training batch again (BASELINE.md transport findings)
    n_pool = args.pool if args.pool else max(8, min(24, args.steps // 4))
    print(f"rendering {n_pool} train batches of {B} snippets...", flush=True)
    pool = [render_batch(rng, B, cfg) for _ in range(n_pool)]
    pool_tgt = jax.device_put(np.stack(
        [(p["tgt"] * 255).astype(np.uint8) for p in pool]))
    pool_refs = jax.device_put(np.stack(
        [(p["ref_imgs"] * 255).astype(np.uint8) for p in pool]))
    pool_K = jax.device_put(np.stack([p["intrinsics"] for p in pool]))

    val = render_batch(np.random.default_rng(999), B, cfg)
    val_tgt = jax.device_put((val["tgt"] * 255).astype(np.uint8))
    val_refs = jax.device_put((val["ref_imgs"] * 255).astype(np.uint8))

    from supervised_dispnet_tpu.training.train_step import _apply

    @jax.jit
    def predict(params, batch_stats, tgt_u8, refs_u8):
        x = normalize_images(tgt_u8.astype(jnp.float32) / 255.0,
                             HALF_MEAN, HALF_STD)
        refs = [normalize_images(refs_u8[:, r].astype(jnp.float32) / 255.0,
                                 HALF_MEAN, HALF_STD)
                for r in range(cfg.nb_refs)]
        disps, _ = _apply(disp_model, params["disp"], batch_stats["disp"],
                          x, train=False)
        # pose model output = (exp_masks, pose)
        (_, pose), _ = _apply(pose_model, params["pose"],
                              batch_stats["pose"], x, refs, train=False)
        return 1.0 / jnp.maximum(disps[0][..., 0], 1e-6), pose

    def evaluate(state):
        depth_pred, pose_pred = predict(state.params, state.batch_stats,
                                        val_tgt, val_refs)
        abs_rel = scaled_abs_rel(np.asarray(depth_pred), val["depth"])
        ate, rot = pose_errors(np.asarray(pose_pred), val["poses"])
        # in-sample (pool batch 0) depth error separates optimization
        # failure (train abs_rel flat/up) from generalization gap (train
        # down, val up)
        d_tr, _ = predict(state.params, state.batch_stats,
                          pool_tgt[0], pool_refs[0])
        train_abs_rel = scaled_abs_rel(np.asarray(d_tr), pool[0]["depth"])
        return {"abs_rel": round(abs_rel, 4),
                "train_abs_rel": round(train_abs_rel, 4),
                "pose_ate_m": round(ate, 4),
                "pose_rot_rad": round(rot, 5)}

    initial = evaluate(state)
    print(f"initial: {initial}", flush=True)
    t0 = time.time()
    curve = []
    for i in range(args.steps):
        j = i % n_pool
        batch = {"tgt": pool_tgt[j], "ref_imgs": pool_refs[j],
                 "intrinsics": pool_K[j]}
        state, metrics = step(state, batch)
        if (i + 1) % args.eval_every == 0 or i == 0:
            m = evaluate(state)
            parts = {k: round(float(metrics[k]), 4)
                     for k in ("loss", "photo_loss", "smooth_loss")
                     if k in metrics}
            curve.append({"step": i + 1, **parts, **m})
            print(f"step {i + 1}: {parts} {m}", flush=True)
    final = evaluate(state)
    if args.save:
        from supervised_dispnet_tpu.utils.checkpoint import save_checkpoint

        save_checkpoint(Path(args.save), state, step=0)
        print(f"saved trained checkpoint to {args.save}", flush=True)
    print(json.dumps({
        "metric": "synthetic_selfsup_convergence",
        "initial": initial,
        "final": final,
        "steps": args.steps,
        "batch": B,
        "seconds": round(time.time() - t0, 1),
        "curve": curve,
        # depth is the primary signal (it needs the full coupled system to
        # work); pose must improve too, but tz dominates the synthetic
        # motions so scale-aligned ATE moves less than rotation does
        "converged": (final["abs_rel"] < 0.7 * initial["abs_rel"]
                      and final["pose_ate_m"] < 0.95 * initial["pose_ate_m"]
                      and final["pose_rot_rad"] < 0.8 * initial["pose_rot_rad"]),
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--network", default="disp_res_18")
    ap.add_argument("--loss", default="berhu",
                    choices=["l1", "berhu", "scale_invariant",
                             "classification", "selfsup"])
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 trunk compute (fp32 params/heads)")
    ap.add_argument("--multiscale-classification", action="store_true",
                    help="supervise bin logits at all 4 decoder scales")
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--width", type=int, default=416)
    ap.add_argument("--pool", type=int, default=0,
                    help="selfsup: number of pre-rendered train batches "
                         "(0 = auto; augmentation multiplies diversity)")
    ap.add_argument("--eval-every", type=int, default=100)
    ap.add_argument("--qat", action="store_true",
                    help="quantization-aware training (fake-quant convs; "
                         "selfsup: disp net only); pair with --save + "
                         "quant_bench --checkpoint to measure the int8 "
                         "quality win")
    ap.add_argument("--init-from", default=None, metavar="DIR",
                    help="supervised: warm-start params+BN from an orbax "
                         "checkpoint (fp train -> --qat fine-tune recipe)")
    ap.add_argument("--save", default=None, metavar="DIR",
                    help="save the trained state as an orbax checkpoint "
                         "(feeds quant_bench --checkpoint for trained-"
                         "weights int8 calibration)")
    ap.add_argument("--stochastic-photo", type=int, default=1,
                    help="selfsup: photometric term on a random-phase 1/N^2 "
                         "pixel subset per step (1 = off) — the convergence-"
                         "parity arm for the --stochastic-photo train flag")
    ap.add_argument("--bf16-grads", action="store_true",
                    help="cast gradients to bf16 before Adam — the "
                         "convergence-parity gate for the precision probe")
    ap.add_argument("--bf16-opt-state", action="store_true",
                    help="store Adam's first moment in bf16 (mu_dtype)")
    args = ap.parse_args()

    if args.loss == "selfsup":
        if args.batch == 32:
            args.batch = 16  # selfsup default: 3 views/snippet
        if args.network == "disp_res_18":
            args.network = "dispnet"  # the reference's self-sup config
        run_selfsup(args)
        return

    import jax

    from supervised_dispnet_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    import jax.numpy as jnp
    import optax

    from supervised_dispnet_tpu.data.augment import AugmentConfig
    from supervised_dispnet_tpu.models import get_disp_net
    from supervised_dispnet_tpu.training import (
        create_train_state,
        make_eval_step,
        make_supervised_train_step,
    )

    H, W, B = args.height, args.width, args.batch
    rng = np.random.default_rng(0)
    classification = args.loss == "classification"
    model = get_disp_net(
        args.network, head="classification" if classification else "disp",
        multiscale_classification=args.multiscale_classification)
    if args.bf16 and hasattr(model, "dtype"):
        model = model.clone(dtype=jnp.bfloat16)
    from supervised_dispnet_tpu.training.trainer import (
        TrainerConfig, build_optimizer,
    )

    tx = build_optimizer(TrainerConfig(
        lr=1e-4, bf16_grads=args.bf16_grads,
        bf16_opt_state=args.bf16_opt_state))
    state = create_train_state(model, (jnp.zeros((1, H, W, 3)),), tx)
    if args.init_from:
        # warm start from a prior run (e.g. fp training before a --qat
        # fine-tune — the standard QAT recipe); optimizer state stays
        # fresh, only params + BN stats are grafted
        from supervised_dispnet_tpu.utils.checkpoint import restore_raw

        restored, _ = restore_raw(Path(args.init_from))
        state = state.replace(
            params=jax.tree_util.tree_map(jnp.asarray, restored["params"]),
            batch_stats=jax.tree_util.tree_map(
                jnp.asarray, restored.get("batch_stats", state.batch_stats)),
        )
        print(f"initialized from {args.init_from}", flush=True)
    no_aug = AugmentConfig(flip=False, scale_crop=False, color_jitter=False)
    step = make_supervised_train_step(model, args.loss, aug=no_aug,
                                      fake_quant=args.qat)
    ev = make_eval_step(model, classification=classification)

    K = np.broadcast_to(
        np.array([[200.0, 0, W / 2], [0, 200.0, H / 2], [0, 0, 1]], np.float32),
        (B, 3, 3),
    ).copy()

    val_img, val_depth = synth_batch(np.random.default_rng(999), B, H, W)
    # eval expects normalized (mean .5 / std .5) images
    val_batch = {
        "img": jnp.asarray((val_img - 0.5) / 0.5),
        "depth": jnp.asarray(val_depth),
    }

    def val_abs_rel(state):
        errs = ev(state.params, state.batch_stats, val_batch)
        return float(errs["abs_rel"])

    initial = val_abs_rel(state)
    t0 = time.time()
    for i in range(args.steps):
        img, depth = synth_batch(rng, B, H, W)
        batch = {
            "tgt": jnp.asarray(img),
            "intrinsics": jnp.asarray(K),
            "depth": jnp.asarray(depth),
        }
        state, metrics = step(state, batch)
        if i % 50 == 0:
            print(f"step {i}: loss {float(metrics['loss']):.4f} "
                  f"abs_rel {val_abs_rel(state):.4f}", flush=True)
    final = val_abs_rel(state)
    if args.save:
        from supervised_dispnet_tpu.utils.checkpoint import save_checkpoint

        save_checkpoint(Path(args.save), state, step=0)
        print(f"saved trained checkpoint to {args.save}", flush=True)
    print(json.dumps({
        "metric": "synthetic_convergence_abs_rel",
        "multiscale_classification": args.multiscale_classification,
        "qat": args.qat,
        "initial": round(initial, 4),
        "final": round(final, 4),
        "steps": args.steps,
        "seconds": round(time.time() - t0, 1),
        "converged": final < 0.5 * initial,
    }))


if __name__ == "__main__":
    main()
