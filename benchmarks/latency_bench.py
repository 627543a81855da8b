"""Serving latency: on-device step latency vs batch size, bf16 and int8.

BASELINE.md's serving numbers are all throughput at the throughput-optimal
batch (256). Production serving also cares about the other end of the
curve: what latency does ONE request (B=1) pay, and where does the
throughput/latency knee sit? This measures on-device step latency for the
flagship serving config (DispResNet-50, fused decoder, 128x416 — reference
`test_disp.py` forward; see SURVEY.md §3.3) across a batch sweep.

Protocol: same serial chain as bench.py (each dispatch consumes a scalar
from the previous one, so the axon relay cannot dedupe or overlap
dispatches); latency = window_time / iters. This is pure device step time
— host<->TPU transport is excluded (it is relay-tunnel-specific here and
not representative of a production host link).

Companion: benchmarks/serving_latency.py (round 3) measures the
end-to-end wall view including the tunnel round trip, with p50/p95/p99;
this file isolates the device so the numbers transfer to any host link.

Usage: python benchmarks/latency_bench.py [--iters 64] [--batches 1,8,64,256]
Emits one JSON line, and a markdown table on stderr for BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

H, W = 128, 416
WARMUP = 3


def chain_window(f, variables, x, iters):
    import jax.numpy as jnp

    s = jnp.float32(0.0)
    for _ in range(WARMUP):
        s = f(variables, x, s)
    float(s)
    s = jnp.float32(0.0)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = f(variables, x, s)
    float(s)
    dt = time.perf_counter() - t0
    assert jnp.isfinite(s), "non-finite output in latency window"
    return dt / iters


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--batches", type=str, default="1,8,64,256")
    ap.add_argument("--windows", type=int, default=3)
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    import jax
    import jax.numpy as jnp

    from supervised_dispnet_tpu.models import DispResNet
    from supervised_dispnet_tpu.ops.quant import (
        calibrate_conv_ranges, quantized_apply,
    )
    from supervised_dispnet_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    model = DispResNet(encoder_depth=50, dtype=jnp.bfloat16,
                       fused_upsample=True)
    rng = jax.random.PRNGKey(0)
    x_init = jax.random.uniform(rng, (8, H, W, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, x_init)
    jax.block_until_ready(variables)
    ranges = calibrate_conv_ranges(model, variables, [x_init])

    @jax.jit
    def fwd_bf16(variables, x, s):
        return jnp.sum(model.apply(variables, x + s * 1e-30, train=False)[0])

    @jax.jit
    def fwd_int8(variables, x, s):
        out = quantized_apply(model, variables, x + s * 1e-30, ranges=ranges)
        return jnp.sum(out[0])

    rows = []
    for b in batches:
        x = jax.random.uniform(jax.random.PRNGKey(b), (b, H, W, 3),
                               jnp.float32)
        row = {"batch": b}
        for name, f in [("bf16", fwd_bf16), ("int8", fwd_int8)]:
            lats = [chain_window(f, variables, x, args.iters)
                    for _ in range(args.windows)]
            best = min(lats)
            row[f"{name}_latency_ms"] = round(best * 1e3, 3)
            row[f"{name}_images_per_sec"] = round(b / best, 1)
            print(f"[latency] B={b:>3} {name}: "
                  f"{best * 1e3:7.3f} ms/step  "
                  f"({b / best:8.1f} img/s)  windows_ms="
                  f"{[round(v * 1e3, 3) for v in lats]}",
                  file=sys.stderr, flush=True)
        rows.append(row)

    print("\n| batch | bf16 ms | bf16 img/s | int8 ms | int8 img/s |",
          file=sys.stderr)
    print("|---|---|---|---|---|", file=sys.stderr)
    for r in rows:
        print(f"| {r['batch']} | {r['bf16_latency_ms']} | "
              f"{r['bf16_images_per_sec']} | {r['int8_latency_ms']} | "
              f"{r['int8_images_per_sec']} |", file=sys.stderr)

    print(json.dumps({
        "bench": "serving_latency",
        "model": "disp_res_50 fused_upsample",
        "resolution": [H, W],
        "device_kind": jax.devices()[0].device_kind,
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
