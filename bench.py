"""Benchmark: KITTI Eigen-split inference throughput, images/sec/chip.

Flagship config: DispResNet-50 forward at the reference eval resolution
(128 x 416), jitted, steady-state timing with block_until_ready.

Prints ONE JSON line:
  {"metric": "kitti_inference_images_per_sec_per_chip", "value": N,
   "unit": "images/sec/chip", "vs_baseline": R}

vs_baseline is measured against the single-GPU reference anchor recorded in
BASELINE.md (no published reference throughput exists; see BASELINE.md for
provenance of the anchor value).
"""

from __future__ import annotations

import json
import time

# Reference anchor: single-GPU (1080Ti-class) PyTorch DispResNet-50 inference
# at 128x416. No published number exists (BASELINE.json "published": {});
# this anchor is the estimate documented in BASELINE.md pending measurement
# on real reference hardware.
BASELINE_IMAGES_PER_SEC = 150.0

BATCH = 64
H, W = 128, 416
WARMUP = 5
ITERS = 30


def main() -> None:
    import jax
    import jax.numpy as jnp

    from supervised_dispnet_tpu.models import DispResNet

    model = DispResNet(encoder_depth=50)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (BATCH, H, W, 3), jnp.float32)
    variables = model.init(rng, x)

    @jax.jit
    def forward(variables, x):
        return model.apply(variables, x, train=False)[0]

    # warmup / compile
    for _ in range(WARMUP):
        out = forward(variables, x)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = forward(variables, x)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

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
