"""Benchmark: KITTI Eigen-split inference throughput, images/sec/chip.

Flagship config: DispResNet-50 forward at the reference eval resolution
(128 x 416), bfloat16 compute (fp32 params/head), jitted, with the
fused decoder (`fused_upsample=True`): each (2x bilinear upsample ->
3x3 conv) decoder stage runs as ONE lhs-dilated conv on the same
weights (exact reparametrization, ops/fused_upconv.py; parity tested in
tests/test_models.py + tests/test_quant.py) — the full-res resize
intermediates never hit HBM.

Timing protocol: each iteration's scalar output feeds the next iteration's
input (a true serial dependency chain), and the final scalar is read back
to the host. This defeats both async-dispatch undercounting and the
remote-relay execution cache (identical enqueued programs were observed to
be deduplicated, yielding impossible >1 PFLOP/s readings with naive
block_until_ready timing).

Budget choreography (round 5): the GUARANTEED path is
  compile bf16 -> ONE bf16 window -> compile int8 (+calibration)
  -> ONE int8 window
and only THEN is remaining budget spent on garnish (extra timing windows
for both paths, the cost-analysis recompile). Round 4 ordered the garnish
first and starved the int8 number out of the driver artifact when the
relay degraded (BENCH_r04.json int8_note). A watchdog thread additionally
emits the best partial result shortly after the budget expires, covering
the case where the main thread is stuck inside a relay RPC and the
SIGTERM handler never runs before SIGKILL.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": R,
   "int8_images_per_sec": ..., "mfu": ..., ...}

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
import os
import signal
import sys
import threading
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
# therefore takes the best of up to WINDOWS serial-chain windows (min-time
# estimator: program speed is the least-contended window; contention is
# additive noise). Round 5: only the FIRST window of each path is
# guaranteed; extras run after both paths have a number.
WINDOWS = 3

# Relay latency can also degrade by minutes-per-compile (observed
# 2026-08-19: a 2-op matmul probe took 3m10s wall, ~2s CPU — pure RPC
# wait). The persistent compile cache does NOT mitigate this (measured
# 2026-08-21: identical program, cache entry present and key stable, the
# second process still took 142 s vs 52 s for the first — relay-side
# state dominates over the local executable cache on this backend). The bench must still emit its one JSON line inside the driver's
# window, so: (a) a soft wall budget gates optional work, (b)
# SIGTERM/SIGINT print the best result-so-far before exiting, and (c) a
# watchdog thread emits the partial result if the budget is blown while
# the main thread is wedged inside a relay RPC (Python signal handlers
# only run between bytecodes; a blocked C call can sit on them forever,
# but most RPC waits release the GIL, so a thread still gets scheduled).
BUDGET_S = float(os.environ.get("GRAFT_BENCH_BUDGET_S", "480"))
WATCHDOG_GRACE_S = 45.0
T0 = time.monotonic()

_partial: dict = {}
_printed = False
_print_lock = threading.Lock()


def _emit(result: dict) -> None:
    global _printed
    with _print_lock:
        if not _printed:
            _printed = True
            print(json.dumps(result), flush=True)


def _on_term(signum, frame):
    if _partial.get("value"):
        _partial.setdefault(
            "note", f"partial: signal {signum} at +{time.monotonic() - T0:.0f}s "
                    "(relay degraded); windows completed so far")
        _emit(_partial)
    sys.exit(1)


def _watchdog() -> None:
    """Emit the best partial result if the budget is blown + grace elapsed
    and nothing has been printed — the main thread may be stuck in an RPC."""
    deadline = T0 + BUDGET_S + WATCHDOG_GRACE_S
    while not _printed:
        now = time.monotonic()
        if now >= deadline:
            if _partial.get("value"):
                _partial.setdefault(
                    "note",
                    f"partial: watchdog at +{now - T0:.0f}s (budget "
                    f"{BUDGET_S:.0f}s blown; main thread likely wedged in a "
                    "relay RPC); best results so far")
                _emit(_partial)
            return
        time.sleep(min(5.0, deadline - now))


def _remaining() -> float:
    return BUDGET_S - (time.monotonic() - T0)


def _tick(label: str) -> None:
    # stderr progress marks: when the relay degrades to minutes-per-compile,
    # these say WHERE the budget went (the JSON line stays stdout-only)
    print(f"bench[{label}]: +{time.monotonic() - T0:.1f}s", file=sys.stderr,
          flush=True)


def timed_window(f, *args, iters=ITERS):
    """One serial-chain timing window; returns (images_per_sec, dt)."""
    import jax.numpy as jnp

    s = jnp.float32(0.0)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = f(*args, s)
    float(s)  # host readback forces the whole chain
    dt = time.perf_counter() - t0
    assert jnp.isfinite(s), "non-finite output from the benchmark forward"
    return BATCH * iters / dt, dt


def main() -> None:
    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)
    threading.Thread(target=_watchdog, daemon=True).start()

    import jax

    from supervised_dispnet_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    import jax.numpy as jnp

    from supervised_dispnet_tpu.models import DispResNet

    model = DispResNet(encoder_depth=50, dtype=jnp.bfloat16,
                       fused_upsample=True)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (BATCH, H, W, 3), jnp.float32)
    # jitted init: ONE program through the relay instead of one RPC
    # round trip per op (eager init measured minutes under relay degradation)
    variables = jax.jit(model.init)(rng, x)
    jax.block_until_ready(variables)
    _tick("init-compiled")

    @jax.jit
    def forward(variables, x, s):
        # s (previous iteration's scalar) feeds the input: serial chain
        return jnp.sum(model.apply(variables, x + s * 1e-30, train=False)[0])

    s = jnp.float32(0.0)
    for _ in range(WARMUP):
        s = forward(variables, x, s)
    float(s)
    _tick("bf16-warm")

    n_chips = max(1, jax.device_count())

    # ---- guaranteed step 1: ONE bf16 window -------------------------------
    rate, dt = timed_window(forward, variables, x)
    _tick("bf16-window1")
    bf16_windows = [round(rate, 1)]
    bf16_best_rate, bf16_best_dt = rate, dt
    bf16_done_s = time.monotonic() - T0  # full bf16 cost: compiles + window

    def refresh_partial():
        _partial.update({
            "metric": "kitti_inference_images_per_sec_per_chip",
            "value": round(bf16_best_rate / n_chips, 2),
            "unit": "images/sec/chip",
            "vs_baseline": round(
                bf16_best_rate / n_chips / BASELINE_TORCH_CPU_IMAGES_PER_SEC, 1),
            "timing_windows": bf16_windows,
        })

    refresh_partial()

    # ---- guaranteed step 2: int8 compile + calibration + ONE window -------
    # (ops/quant.py PTQ serving). Historically the int8 path costs about as
    # much end-to-end as the bf16 path just did (compiles dominate), so skip
    # only when the remaining budget can't fit that plus one window.
    int8_images_per_sec = None
    int8_windows: list[float] = []
    forward_q = None
    # Gate estimate re-based round 5 from measured ticks (healthy relay,
    # 2026-08-20: bf16 phase 78 s total, int8 phase 38 s — the model-init
    # compile is shared, so int8 costs ~0.5x the bf16 phase, not 1.0x).
    # 0.6x leaves margin; the floor covers a healthy-relay attempt. If the
    # attempt still overruns the budget, the watchdog thread emits the
    # bf16-only partial at BUDGET_S + grace — attempting is artifact-safe.
    int8_skip = _remaining() < max(45.0, 0.6 * bf16_done_s) + 1.5 * dt
    if int8_skip:
        print(f"WARNING: bench budget: skipping int8 path "
              f"(+{time.monotonic() - T0:.0f}s elapsed of {BUDGET_S:.0f}s)",
              file=sys.stderr)
    else:
        try:
            from supervised_dispnet_tpu.ops.quant import (
                calibrate_conv_ranges, quantized_apply,
            )

            ranges = calibrate_conv_ranges(model, variables, [x[:8]])
            _tick("int8-calibrated")

            @jax.jit
            def forward_q(variables, x, s):
                out = quantized_apply(model, variables, x + s * 1e-30,
                                      ranges=ranges)
                return jnp.sum(out[0])

            s = jnp.float32(0.0)
            for _ in range(WARMUP):
                s = forward_q(variables, x, s)
            float(s)
            q_rate, q_dt = timed_window(forward_q, variables, x)
            _tick("int8-window1")
            int8_windows.append(round(q_rate, 1))
            int8_best_rate, int8_best_dt = q_rate, q_dt
            int8_images_per_sec = q_rate / n_chips
            _partial["int8_images_per_sec"] = round(int8_images_per_sec, 2)
            _partial["int8_timing_windows"] = int8_windows
        except Exception as e:  # int8 path is additive; never sink the
            # headline metric — but a silent regression would just drop the
            # field from BENCH with no trace, so say what broke on stderr
            print(f"WARNING: int8 bench path failed: {e!r}", file=sys.stderr)
            import traceback

            traceback.print_exc(file=sys.stderr)
            forward_q = None

    # ---- garnish: extra timing windows for both paths, budget permitting --
    # (relay contention is additive noise; min-time over windows converges
    # on the program's uncontended speed)
    for w in range(1, WINDOWS):
        if _remaining() < 1.5 * bf16_best_dt:
            print(f"WARNING: bench budget: stopping after {w} bf16 timing "
                  f"window(s) (+{time.monotonic() - T0:.0f}s elapsed)",
                  file=sys.stderr)
            break
        rate, dt_w = timed_window(forward, variables, x)
        bf16_windows.append(round(rate, 1))
        if rate > bf16_best_rate:
            bf16_best_rate, bf16_best_dt = rate, dt_w
            refresh_partial()
    if forward_q is not None:
        for w in range(1, WINDOWS):
            if _remaining() < 1.5 * int8_best_dt:
                print(f"WARNING: bench budget: stopping after {w} int8 timing "
                      f"window(s) (+{time.monotonic() - T0:.0f}s elapsed)",
                      file=sys.stderr)
                break
            q_rate, q_dt = timed_window(forward_q, variables, x)
            _tick("int8-window1")
            int8_windows.append(round(q_rate, 1))
            if q_rate > int8_best_rate:
                int8_best_rate, int8_best_dt = q_rate, q_dt
                int8_images_per_sec = q_rate / n_chips
                _partial["int8_images_per_sec"] = round(int8_images_per_sec, 2)

    images_per_sec = bf16_best_rate / n_chips
    dt = bf16_best_dt

    # ---- garnish: analytic FLOPs from XLA's cost model (per BATCH images).
    # lower().compile() re-lowers the already-warm program — usually instant
    # via the persistent compile cache, but a full recompile through a
    # degraded relay is minutes, so it is gated on the wall budget (mfu is
    # reporting, not the metric).
    flops_per_call = float("nan")
    if _remaining() > 1.5 * dt:
        try:
            cost = forward.lower(variables, x, jnp.float32(0.0)).compile()
            flops_per_call = float(cost.cost_analysis()["flops"])
        except Exception:
            pass
    else:
        print("WARNING: bench budget: skipping cost-analysis recompile",
              file=sys.stderr)

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
    elif int8_skip:
        result["int8_note"] = ("skipped: wall budget exhausted (relay slow); "
                               "see benchmarks/fused_decoder_bench.py for "
                               "the standalone int8 measurement")
    if flops_per_call == flops_per_call:  # not NaN
        tflops_per_sec = flops_per_call * ITERS / dt / n_chips / 1e12
        result["model_tflops_per_sec"] = round(tflops_per_sec, 1)
        result["model_gflops_per_image"] = round(flops_per_call / BATCH / 1e9, 2)
        kind = jax.devices()[0].device_kind
        peak = PEAK_BF16_FLOPS.get(kind)
        if peak:
            result["mfu"] = round(tflops_per_sec * 1e12 / peak, 4)
            result["device_kind"] = kind
    _emit(result)


if __name__ == "__main__":
    main()
