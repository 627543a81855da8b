"""Serving latency benchmark: per-request wall latency at small batch.

Throughput (bench.py) is the capacity number; a serving deployment also
cares about tail latency at low batch. This measures end-to-end per-call
latency — dispatch + device execution + host readback — for DispResNet-50
at the reference eval resolution, bf16 and (optionally) the int8 PTQ path.

Reference parity note: the reference serves single images through a torch
eval loop (SURVEY.md §1 L6, test_disp.py::main); this is the TPU-native
equivalent measurement. On a tunneled chip the readback RTT is part of
every sample — reported separately via the no-op round-trip baseline.

Companion: benchmarks/latency_bench.py measures the ON-DEVICE step
latency (serial-chain protocol, transport excluded) across the bf16/int8
batch sweep — the BASELINE.md round-5 "serving latency curve" numbers.
This file measures the end-to-end wall view including the tunnel RTT.

Run on TPU:  python benchmarks/serving_latency.py [--int8] [--iters 50]
Prints one JSON line per batch size.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

H, W = 128, 416


def percentiles(samples_ms):
    a = np.asarray(samples_ms)
    return {
        "p50_ms": round(float(np.percentile(a, 50)), 2),
        "p95_ms": round(float(np.percentile(a, 95)), 2),
        "p99_ms": round(float(np.percentile(a, 99)), 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 4, 8])
    args = ap.parse_args()

    import jax

    from supervised_dispnet_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    import jax.numpy as jnp

    from supervised_dispnet_tpu.models import DispResNet

    model = DispResNet(encoder_depth=50, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jax.random.uniform(rng, (1, H, W, 3)))

    # measure the raw tunnel/dispatch round trip so tail numbers can be
    # read net of the transport this environment imposes
    noop = jax.jit(lambda s: s + 1.0)
    s = jnp.float32(0.0)
    for _ in range(5):
        s = noop(s)
    float(s)
    rtt = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        s = noop(s)
        float(s)
        rtt.append((time.perf_counter() - t0) * 1000)
    rtt_stats = percentiles(rtt)

    ranges = None
    if args.int8:
        from supervised_dispnet_tpu.ops.quant import (
            calibrate_conv_ranges, quantized_apply,
        )

        calib = jax.random.uniform(rng, (8, H, W, 3), jnp.float32)
        ranges = calibrate_conv_ranges(model, variables, [calib])

    for B in args.batches:
        x = jax.random.uniform(rng, (B, H, W, 3), jnp.float32)

        if args.int8:
            @jax.jit
            def forward(variables, x, s):
                out = quantized_apply(model, variables, x + s * 1e-30,
                                      ranges=ranges)
                return jnp.sum(out[0])
        else:
            @jax.jit
            def forward(variables, x, s):
                out = model.apply(variables, x + s * 1e-30, train=False)
                return jnp.sum(out[0])

        s = jnp.float32(0.0)
        for _ in range(5):
            s = forward(variables, x, s)
        float(s)

        samples = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            s = forward(variables, x, s)
            float(s)  # per-call readback: the serving-latency definition
            samples.append((time.perf_counter() - t0) * 1000)
        assert jnp.isfinite(s)

        stats = percentiles(samples)
        print(json.dumps({
            "metric": "serving_latency_ms",
            "batch": B,
            "dtype": "int8" if args.int8 else "bf16",
            **stats,
            "images_per_sec_at_this_batch":
                round(B * 1000 / float(np.median(samples)), 1),
            "transport_rtt_p50_ms": rtt_stats["p50_ms"],
        }))


if __name__ == "__main__":
    main()
