"""Training-works smoke: supervised training on a *learnable* synthetic
mapping must drive Eigen metrics down.

Synthetic task: depth is a smooth deterministic function of image content
(depth = 5 + 40 * blurred-brightness), so a depth net must learn it. Runs a
few hundred fused train steps and reports initial vs final val abs_rel.

Usage: python benchmarks/convergence_check.py [--steps 300]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--network", default="disp_res_18")
    ap.add_argument("--loss", default="berhu",
                    choices=["l1", "berhu", "scale_invariant", "classification"])
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 trunk compute (fp32 params/heads)")
    ap.add_argument("--multiscale-classification", action="store_true",
                    help="supervise bin logits at all 4 decoder scales")
    args = ap.parse_args()

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

    H, W, B = 128, 416, args.batch
    rng = np.random.default_rng(0)
    classification = args.loss == "classification"
    model = get_disp_net(
        args.network, head="classification" if classification else "disp",
        multiscale_classification=args.multiscale_classification)
    if args.bf16 and hasattr(model, "dtype"):
        model = model.clone(dtype=jnp.bfloat16)
    state = create_train_state(
        model, (jnp.zeros((1, H, W, 3)),), optax.adam(1e-4)
    )
    no_aug = AugmentConfig(flip=False, scale_crop=False, color_jitter=False)
    step = make_supervised_train_step(model, args.loss, aug=no_aug)
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
    print(json.dumps({
        "metric": "synthetic_convergence_abs_rel",
        "multiscale_classification": args.multiscale_classification,
        "initial": round(initial, 4),
        "final": round(final, 4),
        "steps": args.steps,
        "seconds": round(time.time() - t0, 1),
        "converged": final < 0.5 * initial,
    }))


if __name__ == "__main__":
    main()
