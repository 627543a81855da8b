"""Measured reference-framework anchor (VERDICT r1: replace the invented
150 img/s GPU estimate with measurement).

No GPU exists in this environment and the reference never published a
throughput number, so the honest anchors are:

1. torch CPU: the reference architecture (torch fixture
   tests/torch_ref.py::TorchDispResNet, depth 50) run under the installed
   torch (CPU build) on THIS machine — the reference framework's measured
   speed on available hardware.
2. jax CPU: our flax DispResNet-50 on the same machine's CPU backend —
   an apples-to-apples same-model/same-hardware framework comparison.

Run:  python benchmarks/torch_anchor.py [--batch 2 --iters 8]
Writes one JSON line with both numbers and the hardware description.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

H, W = 128, 416


def measure_torch(batch: int, iters: int) -> float:
    import numpy as np
    import torch

    from tests.torch_ref import TorchDispResNet

    torch.manual_seed(0)
    model = TorchDispResNet(depth=50).eval()
    x = torch.from_numpy(
        np.random.default_rng(0).uniform(0, 1, (batch, 3, H, W)).astype(np.float32)
    )
    with torch.no_grad():
        model(x)  # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            model(x)
        dt = time.perf_counter() - t0
    return batch * iters / dt


def measure_jax_cpu(batch: int, iters: int) -> float:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from supervised_dispnet_tpu.models import DispResNet

    model = DispResNet(encoder_depth=50)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (batch, H, W, 3), jnp.float32)
    variables = model.init(rng, x)

    @jax.jit
    def forward(variables, x, s):
        return jnp.sum(model.apply(variables, x + s * 1e-30, train=False)[0])

    s = jnp.float32(0.0)
    s = forward(variables, x, s)
    float(s)
    s = jnp.float32(0.0)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = forward(variables, x, s)
    float(s)
    dt = time.perf_counter() - t0
    return batch * iters / dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    torch_ips = measure_torch(args.batch, args.iters)
    jax_ips = measure_jax_cpu(args.batch, args.iters)
    print(json.dumps({
        "metric": "dispresnet50_inference_cpu_anchor",
        "torch_cpu_images_per_sec": round(torch_ips, 3),
        "jax_cpu_images_per_sec": round(jax_ips, 3),
        "jax_over_torch_same_hardware": round(jax_ips / torch_ips, 3),
        "hardware": f"{os.cpu_count()} vCPU ({os.uname().machine})",
        "batch": args.batch,
    }))


if __name__ == "__main__":
    main()
