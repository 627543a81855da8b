"""Benchmark: KITTI Eigen-split inference throughput, images/sec/chip.

Flagship config: DispResNet-50 forward at the reference eval resolution
(128 x 416), bfloat16 compute (fp32 params/head), jitted.

Timing protocol: each iteration's scalar output feeds the next iteration's
input (a true serial dependency chain), and the final scalar is read back
to the host. This defeats both async-dispatch undercounting and the
remote-relay execution cache (identical enqueued programs were observed to
be deduplicated, yielding impossible >1 PFLOP/s readings with naive
block_until_ready timing).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": R}

vs_baseline is measured against the single-GPU reference anchor recorded in
BASELINE.md (no published reference throughput exists; see BASELINE.md).
"""

from __future__ import annotations

import json
import time

# Reference anchor: single-GPU (1080Ti-class) PyTorch DispResNet-50
# inference at 128x416 — see BASELINE.md for provenance (estimate; no
# published number exists, BASELINE.json "published": {}).
BASELINE_IMAGES_PER_SEC = 150.0

BATCH = 256  # batch sweep on v5e: 256 > 64 by ~26% images/sec
H, W = 128, 416
WARMUP = 3
ITERS = 25


def main() -> None:
    import jax

    from supervised_dispnet_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    import jax.numpy as jnp

    from supervised_dispnet_tpu.models import DispResNet

    model = DispResNet(encoder_depth=50, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (BATCH, H, W, 3), jnp.float32)
    variables = model.init(rng, x)

    @jax.jit
    def forward(variables, x, s):
        # s (previous iteration's scalar) feeds the input: serial chain
        return jnp.sum(model.apply(variables, x + s * 1e-30, train=False)[0])

    s = jnp.float32(0.0)
    for _ in range(WARMUP):
        s = forward(variables, x, s)
    float(s)

    s = jnp.float32(0.0)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        s = forward(variables, x, s)
    float(s)  # host readback forces the whole chain
    dt = time.perf_counter() - t0

    assert jnp.isfinite(s), "non-finite output from the benchmark forward"
    n_chips = max(1, jax.device_count())
    images_per_sec = BATCH * ITERS / dt / n_chips

    print(json.dumps({
        "metric": "kitti_inference_images_per_sec_per_chip",
        "value": round(images_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / BASELINE_IMAGES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
