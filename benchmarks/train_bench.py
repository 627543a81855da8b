"""Training-step throughput benchmarks (supervised + self-supervised).

Run on TPU:  python benchmarks/train_bench.py [--mode supervised|selfsup]

Timing uses the serial state chain (each step consumes the previous
TrainState) + final loss readback — see BASELINE.md timing-protocol note.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

# runnable as `python benchmarks/train_bench.py` without installation
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="supervised",
                    choices=["supervised", "selfsup"])
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--network", default="disp_res_50")
    ap.add_argument("--loss", default="berhu")
    ap.add_argument("--half-res-photo", action="store_true")
    ap.add_argument("--stochastic-photo", type=int, default=1,
                    help="evaluate the photometric loss at every N-th pixel "
                         "per axis with a random per-step phase (unbiased; "
                         "cuts warp gather indices N^2-fold; 1 = off)")
    ap.add_argument("--remat", nargs="?", const=True, default=False,
                    choices=[True, False, "full", "conv"],
                    help="activation checkpointing on the disp net (the "
                         "B=64 self-sup HBM-cliff probe: sweep --batch "
                         "with/without this flag)")
    ap.add_argument("--bf16-grads", action="store_true",
                    help="cast gradients to bf16 before Adam (precision "
                         "probe — VERDICT r2 item 6)")
    ap.add_argument("--cost-analysis", action="store_true",
                    help="print XLA cost analysis (flops, bytes accessed) "
                         "of the compiled step + roofline vs measured rate")
    ap.add_argument("--bf16-opt-state", action="store_true",
                    help="store Adam's first moment in bf16 (mu_dtype)")
    ap.add_argument("--fused-upsample", action="store_true",
                    help="build the disp net with the fused decoder "
                         "(upsample composed into each decoder conv; "
                         "disp_res_* / disp_vgg_bn)")
    ap.add_argument("--img-height", type=int, default=128,
                    help="input height (full-res KITTI sweep: 384)")
    ap.add_argument("--img-width", type=int, default=416,
                    help="input width (full-res KITTI sweep: 1280)")
    args = ap.parse_args()

    import jax

    from supervised_dispnet_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    import jax.numpy as jnp
    import optax

    from supervised_dispnet_tpu.models import PoseExpNet, get_disp_net
    from supervised_dispnet_tpu.training import (
        create_train_state,
        make_selfsup_train_step,
        make_supervised_train_step,
    )

    from supervised_dispnet_tpu.training.trainer import (
        TrainerConfig, build_optimizer,
    )

    tx = build_optimizer(TrainerConfig(
        lr=1e-4, bf16_grads=args.bf16_grads,
        bf16_opt_state=args.bf16_opt_state))

    H, W, B = args.img_height, args.img_width, args.batch
    rng = np.random.default_rng(0)
    K = np.broadcast_to(
        np.array([[200.0, 0, W / 2], [0, 200.0, H / 2], [0, 0, 1]], np.float32),
        (B, 3, 3),
    ).copy()

    tgt0 = jnp.zeros((1, H, W, 3))
    if args.mode == "supervised":
        model = get_disp_net(args.network, head="classification"
                             if args.loss == "classification" else "disp",
                             remat=args.remat,
                             fused_upsample=args.fused_upsample)
        if hasattr(model, "dtype"):
            model = model.clone(dtype=jnp.bfloat16)
        state = create_train_state(model, (tgt0,), tx)
        step = make_supervised_train_step(model, args.loss, donate=False)
        depth = rng.uniform(1, 60, (B, H, W)).astype(np.float32)
        depth *= rng.uniform(size=(B, H, W)) > 0.5
        batch = {
            "tgt": jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)),
            "intrinsics": jnp.asarray(K),
            "depth": jnp.asarray(depth),
        }
    else:
        model = get_disp_net("dispnet", remat=args.remat,
                             fused_upsample=args.fused_upsample)
        if hasattr(model, "dtype"):
            model = model.clone(dtype=jnp.bfloat16)
        pose = PoseExpNet(nb_ref_imgs=2, output_exp=True, dtype=jnp.bfloat16)
        state = create_train_state(
            model, (tgt0,), tx,
            extra_models={"pose": (pose, (tgt0, [tgt0, tgt0]))},
        )
        step = make_selfsup_train_step(model, pose, nb_ref_imgs=2, donate=False,
                                       half_res_photo=args.half_res_photo,
                                       stochastic_photo=args.stochastic_photo,
                                       remat_photo=args.remat)
        batch = {
            "tgt": jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)),
            "ref_imgs": jnp.asarray(
                rng.uniform(0, 1, (B, 2, H, W, 3)).astype(np.float32)),
            "intrinsics": jnp.asarray(K),
        }

    state, m = step(state, batch)
    float(m["loss"])  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, m = step(state, batch)
    float(m["loss"])
    dt = time.perf_counter() - t0

    result = {
        "metric": f"{args.mode}_train_images_per_sec_per_chip",
        "value": round(B * args.iters / dt, 2),
        "unit": "images/sec/chip",
        "ms_per_step": round(dt / args.iters * 1000, 2),
        "batch": B,
        "resolution": f"{H}x{W}",
        "remat": args.remat,
        "fused_upsample": args.fused_upsample,
        "bf16_grads": args.bf16_grads,
        "bf16_opt_state": args.bf16_opt_state,
    }
    # peak HBM (the number --remat trades throughput for); absent on
    # backends without memory_stats (CPU)
    stats = jax.local_devices()[0].memory_stats() or {}
    if "peak_bytes_in_use" in stats:
        result["peak_hbm_gib"] = round(stats["peak_bytes_in_use"] / 2**30, 2)
    if args.cost_analysis:
        try:
            ca = step.lower(state, batch).compile().cost_analysis() or {}
            flops = float(ca.get("flops", 0.0))
            byts = float(ca.get("bytes accessed", 0.0))
            step_s = dt / args.iters
            result["cost_gflops_per_step"] = round(flops / 1e9, 1)
            result["cost_gb_per_step"] = round(byts / 1e9, 2)
            result["achieved_tflops_per_sec"] = round(flops / step_s / 1e12, 1)
            result["achieved_gb_per_sec"] = round(byts / step_s / 1e9, 1)
        except Exception as e:  # cost analysis is best-effort per backend
            result["cost_analysis_error"] = repr(e)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
