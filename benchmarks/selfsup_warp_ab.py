"""A/B: batched-refs photometric warp (ONE (R*B) inverse_warp per scale)
vs the per-ref loop (the reference's loop shape) on the FULL self-sup
train step — VERDICT r3 item 7.

The chip sits behind a shared relay whose throughput wanders +-5-8%
(occasionally -40%) over minutes (BASELINE.md round-4 reconciliation),
so single-window A-then-B sweeps are unreliable. This harness compiles
BOTH steps in one process, then alternates A/B/A/B... timing windows and
reports the best window of each — drift hits both arms equally.

Run: python benchmarks/selfsup_warp_ab.py [--batch 32] [--network dispnet]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

WARMUP, ITERS, ROUNDS = 2, 8, 3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--network", default="dispnet")
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--width", type=int, default=416)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from supervised_dispnet_tpu.data.augment import AugmentConfig
    from supervised_dispnet_tpu.models import PoseExpNet, get_disp_net
    from supervised_dispnet_tpu.training import (
        create_train_state, make_selfsup_train_step,
    )
    from supervised_dispnet_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    B, H, W = args.batch, args.height, args.width
    disp = get_disp_net(args.network)
    pose = PoseExpNet(nb_ref_imgs=2, output_exp=True)
    tgt0 = jnp.zeros((1, H, W, 3))
    state = create_train_state(
        disp, (tgt0,), optax.adam(1e-4), seed=0,
        extra_models={"pose": (pose, (tgt0, [tgt0, tgt0]))},
    )
    rng = np.random.default_rng(0)
    batch = {
        "tgt": jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)),
        "ref_imgs": jnp.asarray(
            rng.uniform(0, 1, (B, 2, H, W, 3)).astype(np.float32)),
        "intrinsics": jnp.asarray(np.broadcast_to(
            np.array([[200.0, 0, W / 2], [0, 200.0, H / 2], [0, 0, 1]],
                     np.float32), (B, 3, 3)).copy()),
    }

    steps = {}
    for name, br in (("batched", True), ("per_ref", False)):
        steps[name] = make_selfsup_train_step(
            disp, pose, nb_ref_imgs=2, aug=AugmentConfig(), donate=False,
            batch_refs=br,
        )

    # compile + warm both arms before any timing
    states = {}
    for name, step in steps.items():
        s = state
        for _ in range(WARMUP):
            s, m = step(s, batch)
        jax.block_until_ready(s.params)
        states[name] = s

    results = {n: [] for n in steps}
    for _ in range(ROUNDS):
        for name, step in steps.items():  # alternate arms within a round
            s = states[name]
            t0 = time.perf_counter()
            for _ in range(ITERS):
                s, m = step(s, batch)
            loss = float(m["loss"])  # readback forces the chain
            dt = time.perf_counter() - t0
            assert np.isfinite(loss)
            states[name] = s
            results[name].append(round(B * ITERS / dt, 1))

    out = {"batch": B, "network": args.network, "iters_per_window": ITERS}
    for name, rates in results.items():
        out[f"{name}_img_s"] = max(rates)
        out[f"{name}_windows"] = rates
    out["speedup"] = round(out["batched_img_s"] / out["per_ref_img_s"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
