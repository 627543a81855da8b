"""Benchmark: KITTI Eigen-split inference throughput, images/sec/chip.

Flagship config: DispResNet-50 forward at the reference eval resolution
(128 x 416), bfloat16 compute (fp32 params/head), jitted, with the
fused decoder (`fused_upsample=True`): each (2x bilinear upsample ->
3x3 conv) decoder stage runs as ONE lhs-dilated conv on the same
weights (exact reparametrization, ops/fused_upconv.py; parity tested in
tests/test_models.py + tests/test_quant.py) — the full-res resize
intermediates never hit HBM. Measured round 4 (B=256, best-of-3):
bf16 6620.7 -> 6782.9, int8 8586.0 -> 9443.4 img/s
(benchmarks/fused_decoder_bench.py).

Timing protocol: each iteration's scalar output feeds the next iteration's
input (a true serial dependency chain), and the final scalar is read back
to the host. This defeats both async-dispatch undercounting and the
remote-relay execution cache (identical enqueued programs were observed to
be deduplicated, yielding impossible >1 PFLOP/s readings with naive
block_until_ready timing).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": R,
   "mfu": ..., "model_tflops_per_sec": ..., ...}

vs_baseline is measured against the MEASURED reference anchor: the torch
fixture of the reference's best model (DispResNet-50) under the installed
torch CPU build on this machine (benchmarks/torch_anchor.py; the reference
never published a throughput number and no GPU exists here — see
BASELINE.md for the recorded measurement and the GPU extrapolation
discussion). mfu is the absolute utilization: analytic model FLOPs from
XLA's cost analysis divided by measured time and the chip's bf16 peak.
"""

from __future__ import annotations

import json
import time

# Measured anchor (benchmarks/torch_anchor.py, 2026-08-16): the reference
# architecture under torch 2.13 CPU on this machine's 1 vCPU. Our flax
# model on the same CPU measured 5.48 img/s (1.05x) — same-hardware
# framework parity; the TPU ratio below is therefore hardware + framework.
BASELINE_TORCH_CPU_IMAGES_PER_SEC = 5.23

# bf16 peak matmul throughput per chip, by device kind
PEAK_BF16_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5e": 197e12,
    "TPU v5 lite": 197e12,
    "TPU v5p": 459e12,
    "TPU v6e": 918e12,
    "TPU v6 lite": 918e12,
}

BATCH = 256  # batch sweep on v5e: 256 > 64 by ~26% images/sec
H, W = 128, 416
WARMUP = 3
ITERS = 25
# The chip is reached through a shared relay whose deliverable throughput
# wanders +-5-8% (and occasionally -40%) over minutes — measured round 4:
# byte-identical int8 HLO timed 8500 and 4215 img/s in ONE process. Timing
# therefore takes the best of WINDOWS serial-chain windows (min-time
# estimator: program speed is the least-contended window; contention is
# additive noise). This is what reconciles BENCH_r03's int8 8086.9 vs
# quant_bench's 8498 — different windows, same program.
WINDOWS = 3


def best_window(f, *args, iters=ITERS, windows=WINDOWS):
    """Best throughput (img/s) over `windows` serial-chain timing windows;
    returns (best_images_per_sec, best_dt, all_window_rates)."""
    import jax.numpy as jnp

    rates, best_dt = [], float("inf")
    for _ in range(windows):
        s = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(iters):
            s = f(*args, s)
        float(s)  # host readback forces the whole chain
        dt = time.perf_counter() - t0
        assert jnp.isfinite(s), "non-finite output from the benchmark forward"
        best_dt = min(best_dt, dt)
        rates.append(round(BATCH * iters / dt, 1))
    return BATCH * iters / best_dt, best_dt, rates


def main() -> None:
    import jax

    from supervised_dispnet_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    import jax.numpy as jnp

    from supervised_dispnet_tpu.models import DispResNet

    model = DispResNet(encoder_depth=50, dtype=jnp.bfloat16,
                       fused_upsample=True)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (BATCH, H, W, 3), jnp.float32)
    variables = model.init(rng, x)

    @jax.jit
    def forward(variables, x, s):
        # s (previous iteration's scalar) feeds the input: serial chain
        return jnp.sum(model.apply(variables, x + s * 1e-30, train=False)[0])

    # analytic FLOPs of one forward from XLA's cost model (per BATCH images)
    try:
        cost = jax.jit(forward).lower(variables, x, jnp.float32(0.0)).compile()
        flops_per_call = float(cost.cost_analysis()["flops"])
    except Exception:
        flops_per_call = float("nan")

    s = jnp.float32(0.0)
    for _ in range(WARMUP):
        s = forward(variables, x, s)
    float(s)

    n_chips = max(1, jax.device_count())
    images_per_sec, dt, bf16_windows = best_window(forward, variables, x)
    images_per_sec /= n_chips

    # int8 PTQ serving path (ops/quant.py): same protocol; quality cost
    # quantified in BASELINE.md (median disparity rel err 0.4%)
    int8_images_per_sec = None
    try:
        from supervised_dispnet_tpu.ops.quant import (
            calibrate_conv_ranges, quantized_apply,
        )

        ranges = calibrate_conv_ranges(model, variables, [x[:8]])

        @jax.jit
        def forward_q(variables, x, s):
            out = quantized_apply(model, variables, x + s * 1e-30,
                                  ranges=ranges)
            return jnp.sum(out[0])

        s = jnp.float32(0.0)
        for _ in range(WARMUP):
            s = forward_q(variables, x, s)
        float(s)
        rate, _, int8_windows = best_window(forward_q, variables, x)
        int8_images_per_sec = rate / n_chips
    except Exception as e:  # int8 path is additive; never sink the
        # headline metric — but a silent regression would just drop the
        # field from BENCH with no trace, so say what broke on stderr
        import sys
        import traceback

        print(f"WARNING: int8 bench path failed: {e!r}", file=sys.stderr)
        traceback.print_exc(file=sys.stderr)

    result = {
        "metric": "kitti_inference_images_per_sec_per_chip",
        "value": round(images_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / BASELINE_TORCH_CPU_IMAGES_PER_SEC, 1),
        "baseline_anchor": "torch-cpu measured 5.23 img/s (reference arch, "
                           "torch 2.13, 1 vCPU; benchmarks/torch_anchor.py)",
        "timing_windows": bf16_windows,
        "decoder": "fused_upsample (exact reparametrization; "
                   "ops/fused_upconv.py)",
    }
    if int8_images_per_sec:
        result["int8_images_per_sec"] = round(int8_images_per_sec, 2)
        result["int8_timing_windows"] = int8_windows
        result["int8_quality"] = ("disp rel err median 0.41% / p95 5.0% vs "
                                  "fp32 (benchmarks/quant_bench.py, round-3 "
                                  "int8-through encoder chain)")
    if flops_per_call == flops_per_call:  # not NaN
        tflops_per_sec = flops_per_call * ITERS / dt / n_chips / 1e12
        result["model_tflops_per_sec"] = round(tflops_per_sec, 1)
        result["model_gflops_per_image"] = round(flops_per_call / BATCH / 1e9, 2)
        kind = jax.devices()[0].device_kind
        peak = PEAK_BF16_FLOPS.get(kind)
        if peak:
            result["mfu"] = round(tflops_per_sec * 1e12 / peak, 4)
            result["device_kind"] = kind
    print(json.dumps(result))


if __name__ == "__main__":
    main()
