"""int8 PTQ inference benchmark: DispResNet-50 at the eval resolution.

Compares the bf16 serving forward against the int8-quantized one
(ops/quant.py) under bench.py's serial-chain timing protocol, and reports
the quantization quality cost as the relative disparity error vs fp32.

Usage: python benchmarks/quant_bench.py [--batch 256] [--exempt-stem]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=25)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--width", type=int, default=416)
    ap.add_argument("--network", default="disp_res_50")
    ap.add_argument("--exempt-stem", action="store_true",
                    help="keep the 7x7 Cin=3 stem conv un-quantized "
                         "(C=3 int8 tiling probe)")
    ap.add_argument("--percentile", type=float, default=None,
                    help="calibrate to this percentile of |activation| "
                         "instead of the max (e.g. 99.9)")
    ap.add_argument("--checkpoint", default=None, metavar="DIR",
                    help="orbax checkpoint (e.g. convergence_check --save) "
                         "— measure quantization quality on TRAINED "
                         "weights instead of random init (trained BN "
                         "outliers are what per-tensor scales clip)")
    ap.add_argument("--quality-only", action="store_true",
                    help="skip the B=256 timing chain (compile-heavy); "
                         "report only the quantization-quality block — "
                         "the mode for calibration sweeps")
    ap.add_argument("--calib-batches", type=int, default=1,
                    help="number of 8-image calibration batches (trained-"
                         "checkpoint mode renders training-domain scenes; "
                         "1 mirrors the eval CLIs' lazy first-batch "
                         "calibration)")
    ap.add_argument("--fused-upsample", action="store_true",
                    help="disp_res*: quantize the fused decoder "
                         "(ops/fused_upconv.py; bench.py's round-4 "
                         "default) — quality is still measured against "
                         "the UNFUSED fp32 forward, so the reported "
                         "error includes reparametrization + int8")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from supervised_dispnet_tpu.models import get_disp_net
    from supervised_dispnet_tpu.models.common import apply_model
    from supervised_dispnet_tpu.ops.quant import (
        calibrate_conv_ranges, quantized_apply,
    )
    from supervised_dispnet_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    model = get_disp_net(args.network, fused_upsample=args.fused_upsample)
    if hasattr(model, "dtype"):  # DispVggBN has no bf16-trunk knob
        model = model.clone(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (args.batch, args.height, args.width, 3),
                           jnp.float32)
    synth_val = None  # (normalized imgs, gt depth) when in trained mode
    if args.checkpoint:
        from supervised_dispnet_tpu.utils.checkpoint import restore_raw

        restored, _ = restore_raw(Path(args.checkpoint))
        variables = {"params": restored["params"]["disp"]}
        bs = restored.get("batch_stats", {}).get("disp", {})
        if bs:
            variables["batch_stats"] = bs
        print(f"loaded trained weights from {args.checkpoint}", flush=True)
        # trained weights only mean something on training-domain inputs:
        # calibrate on rendered scenes (convergence_check's generator,
        # same (x-.5)/.5 normalization) and hold out a val batch with GT
        # depth so quality is an abs_rel delta, not a disparity proxy
        from benchmarks.convergence_check import synth_batch

        rng_np = np.random.default_rng(7)
        calib_inputs = []
        for _ in range(max(args.calib_batches, 1)):
            img, _ = synth_batch(rng_np, 8, args.height, args.width)
            calib_inputs.append(jnp.asarray((img - 0.5) / 0.5))
        v_img, v_depth = synth_batch(np.random.default_rng(999), 16,
                                     args.height, args.width)
        synth_val = (jnp.asarray((v_img - 0.5) / 0.5), v_depth)
    else:
        variables = model.init(rng, x)
        calib_inputs = [x[:8]]

    exempt = None
    if args.exempt_stem:
        def exempt(m):  # noqa: E731 — predicate by kernel size
            return tuple(m.kernel_size) == (7, 7)

    calib = calibrate_conv_ranges(
        model, variables, calib_inputs, exempt=exempt,
        percentile=args.percentile)
    print(f"calibrated {len(calib)} convs", flush=True)

    @jax.jit
    def fwd_bf16(variables, x, s):
        out = apply_model(model, variables, x + s * 1e-30)
        return jnp.sum(out[0] if isinstance(out, (list, tuple)) else out)

    @jax.jit
    def fwd_int8(variables, x, s):
        out = quantized_apply(model, variables, x + s * 1e-30,
                              ranges=calib, exempt=exempt)
        return jnp.sum(out[0] if isinstance(out, (list, tuple)) else out)

    def bench(f):
        s = jnp.float32(0.0)
        for _ in range(3):
            s = f(variables, x, s)
        float(s)
        s = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            s = f(variables, x, s)
        float(s)
        return args.batch * args.iters / (time.perf_counter() - t0)

    if args.quality_only:
        ips_bf16 = ips_int8 = float("nan")
    else:
        ips_bf16 = bench(fwd_bf16)
        print(f"bf16: {ips_bf16:.0f} img/s", flush=True)
        ips_int8 = bench(fwd_int8)
        print(f"int8: {ips_int8:.0f} img/s ({ips_int8 / ips_bf16:.2f}x)",
              flush=True)

    # quality: relative disparity error vs the fp32 forward (fp32, not
    # bf16, is the quality reference); trained mode evaluates on the
    # training-domain val batch instead of random noise
    model32 = get_disp_net(args.network)  # quality reference: UNFUSED fp32
    model32q = get_disp_net(args.network,
                            fused_upsample=args.fused_upsample)
    small = synth_val[0] if synth_val is not None else x[:16]

    def finest(out):
        return out[0] if isinstance(out, (list, tuple)) else out

    d_fp = np.asarray(finest(apply_model(model32, variables, small)),
                      dtype=np.float32)
    d_q = np.asarray(
        jax.jit(lambda v, xx: finest(quantized_apply(
            model32q, v, xx, ranges=calib, exempt=exempt))
        )(variables, small), dtype=np.float32)
    rel = np.abs(d_q - d_fp) / np.maximum(np.abs(d_fp), 1e-12)

    result = {
        "metric": "int8_ptq_inference",
        "value": round(float(ips_int8), 1),
        "unit": f"images/sec ({args.network} int8 PTQ B={args.batch})",
        "bf16_images_per_sec": round(float(ips_bf16), 1),
        "speedup_vs_bf16": round(float(ips_int8 / ips_bf16), 3),
        "disp_rel_err_median": round(float(np.median(rel)), 5),
        "disp_rel_err_p95": round(float(np.percentile(rel, 95)), 5),
        "disp_rel_err_max": round(float(rel.max()), 5),
        "exempt_stem": bool(args.exempt_stem),
        "fused_upsample": bool(args.fused_upsample),
        "percentile": args.percentile,
        "calib_batches": args.calib_batches,
    }
    if synth_val is not None:
        # the metric of record: abs_rel on GT depth, fp32 vs int8 of the
        # SAME trained weights (depth = 1/finest disp, cap 80 m — the
        # eval-step decode, train_step.py::make_eval_step)
        gt = synth_val[1]
        mask = (gt > 0) & (gt < 80.0)
        direct_depth = args.network == "fcrn"  # metric depth, no 1/d

        def abs_rel_of(d):
            depth = d[..., 0] if direct_depth else 1.0 / d[..., 0]
            return float(np.mean(np.abs(depth[mask] - gt[mask]) / gt[mask]))

        result["abs_rel_fp32"] = round(abs_rel_of(d_fp), 5)
        result["abs_rel_int8"] = round(abs_rel_of(d_q), 5)
        result["abs_rel_delta"] = round(
            result["abs_rel_int8"] - result["abs_rel_fp32"], 5)
        result["trained_checkpoint"] = args.checkpoint
    print(json.dumps(result))


if __name__ == "__main__":
    main()
