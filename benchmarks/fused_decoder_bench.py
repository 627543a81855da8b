"""Serving throughput: DispResNet-50 fused_upsample decoder vs the
default (resize -> conv) decoder, bf16 and int8 — the VERDICT r3 item-6
attempt at the decoder-structural HBM traffic (BASELINE.md round-3
roofline: ~19 GB/step of bilinear-resize outputs + layout copies).

bench.py serial-chain protocol, best of 3 windows.

Run: python benchmarks/fused_decoder_bench.py [--batch 256] [--skip-int8]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

WARMUP, ITERS, WINDOWS = 3, 30, 3


def best_window(f, *args):
    import jax.numpy as jnp

    best = float("inf")
    rates = []
    for _ in range(WINDOWS):
        s = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            s = f(*args, s)
        float(s)
        dt = time.perf_counter() - t0
        best = min(best, dt)
        rates.append(round(ITERS / dt, 2))
    return best, rates


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--skip-int8", action="store_true")
    ap.add_argument("--skip-unfused", action="store_true",
                    help="measure only the fused decoder (e.g. for the "
                         "DISPNET_TPU_PS_FORM=0/1 A/B)")
    ap.add_argument("--network", default="disp_res_50",
                    choices=["disp_res_18", "disp_res_50", "disp_vgg_bn",
                             "dispnet"])
    ap.add_argument("--img-height", type=int, default=128)
    ap.add_argument("--img-width", type=int, default=416)
    args = ap.parse_args()
    H, W = args.img_height, args.img_width

    import jax
    import jax.numpy as jnp

    from supervised_dispnet_tpu.models import DispResNet, DispVggBN
    from supervised_dispnet_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    B = args.batch
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (B, H, W, 3), jnp.float32)

    def build(fused: bool):
        if args.network == "dispnet":
            from supervised_dispnet_tpu.models import DispNetS
            return DispNetS(dtype=jnp.bfloat16, fused_upsample=fused)
        if args.network == "disp_vgg_bn":
            return DispVggBN(dtype=jnp.bfloat16, fused_upsample=fused)
        depth = 18 if args.network == "disp_res_18" else 50
        return DispResNet(encoder_depth=depth, dtype=jnp.bfloat16,
                          fused_upsample=fused)

    results = {"network": args.network}
    models = {"unfused": build(False), "fused": build(True)}
    train_kw = {} if args.network == "dispnet" else {"train": False}
    # jitted init at B=1: ONE relay program instead of an RPC per op
    # (eager init measured minutes-to-stuck through a degraded relay)
    variables = jax.jit(models["unfused"].init)(rng, x[:1])
    jax.block_until_ready(variables)
    if args.skip_unfused:
        del models["unfused"]

    outs = {}
    for name, model in models.items():
        @jax.jit
        def fwd(v, x, s, model=model):
            return jnp.sum(model.apply(v, x + s * 1e-30, **train_kw)[0])

        s = jnp.float32(0.0)
        for _ in range(WARMUP):
            s = fwd(variables, x, s)
        float(s)
        dt, rates = best_window(fwd, variables, x)
        results[f"bf16_{name}_img_s"] = round(B * ITERS / dt, 1)
        results[f"bf16_{name}_windows"] = rates
        outs[name] = jax.jit(
            lambda v, x, model=model: model.apply(v, x, **train_kw)[0]
        )(variables, x)
        print(name, "bf16", results[f"bf16_{name}_img_s"], flush=True)

    if "unfused" in outs:
        import numpy as np
        d = np.abs(np.asarray(outs["fused"], np.float32)
                   - np.asarray(outs["unfused"], np.float32))
        rel = d / np.abs(np.asarray(outs["unfused"], np.float32))
        results["bf16_parity_rel_median"] = float(np.median(rel))
        results["bf16_parity_rel_max"] = float(rel.max())

    if not args.skip_int8:
        from supervised_dispnet_tpu.ops.quant import (
            calibrate_conv_ranges, quantized_apply)

        for name, model in models.items():
            ranges = calibrate_conv_ranges(model, variables, [x[:8]])

            @jax.jit
            def fwd_q(v, x, s, model=model, ranges=ranges):
                return jnp.sum(quantized_apply(
                    model, v, x + s * 1e-30, ranges=ranges)[0]
                    .astype(jnp.float32))

            s = jnp.float32(0.0)
            for _ in range(WARMUP):
                s = fwd_q(variables, x, s)
            float(s)
            dt, rates = best_window(fwd_q, variables, x)
            results[f"int8_{name}_img_s"] = round(B * ITERS / dt, 1)
            results[f"int8_{name}_windows"] = rates
            print(name, "int8", results[f"int8_{name}_img_s"], flush=True)

    results["batch"] = B
    results["resolution"] = f"{H}x{W}"
    print(json.dumps(results))


if __name__ == "__main__":
    main()
