"""Probe: decoder (2x bilinear resize -> 3x3 conv) vs ONE composed
lhs-dilated conv (VERDICT r3 item 6 — the remaining int8 serving traffic is
decoder-structural: materialized resize outputs at 1/1..1/8 scale).

Per decoder stage the resize output (B, 2H, 2W, Cin) is written and read
back by the following conv; composing resize's transposed-conv taps
[.25, .75, .75, .25] into the 3x3 kernel gives a 6x6 lhs_dilation=2 conv
that reads the HALF-res tensor directly. Variants:

  A  resize (jax.image.resize) -> conv3x3        [current decoder]
  B  edge-pad + composed 6x6 conv, lhs_dilation=2
  C  4-phase decomposition (one 3x3-class conv per output parity) +
     interleave reshape

B/C are interior-exact vs A (1-px border differs — this probe measures
speed only; exact borders are a separate correction if the fusion wins).

Run: python benchmarks/fused_upconv_probe.py [--batch 256] [--dtype bf16]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

WARMUP, ITERS, WINDOWS = 3, 20, 3


def compose_kernel(k: np.ndarray) -> np.ndarray:
    """(3,3,Cin,Cout) conv kernel -> (6,6,Cin,Cout) composed with the 2x
    bilinear tent taps g=[.25,.75,.75,.25] per axis (convolution:
    q[m] = sum_s k[s] g[m-s])."""
    g = np.array([0.25, 0.75, 0.75, 0.25], k.dtype)
    kc = np.zeros((6, 6) + k.shape[2:], k.dtype)
    for s in range(3):
        for t in range(3):
            kc[s:s + 4, t:t + 4] += (k[s, t][None, None]
                                     * (g[:, None] * g[None, :])[..., None, None])
    return kc


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from supervised_dispnet_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    B = args.batch
    # DispResNet-50 @128x416 decoder stages i=0 (biggest) and i=1:
    # (half-res spatial, Cin after upconv{i}_0, Cout of upconv{i}_1)
    stages = [
        ("i0", (B, 64, 208, 16), 16),
        ("i1", (B, 32, 104, 32), 32),
    ]

    results = {}
    for name, (b, h, w, cin), cout in stages:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(b, h, w, cin)).astype(np.float32),
                        dtype=dt)
        k = rng.normal(size=(3, 3, cin, cout)).astype(np.float32) * 0.1
        kj = jnp.asarray(k, dtype=dt)
        kcj = jnp.asarray(compose_kernel(k), dtype=dt)
        dn = ("NHWC", "HWIO", "NHWC")

        def var_a(x, s):
            u = jax.image.resize(
                x + s.astype(dt) * 1e-30, (b, 2 * h, 2 * w, cin),
                method="bilinear")
            return lax.conv_general_dilated(
                u, kj, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn)

        def var_b(x, s):
            xp = jnp.pad(x + s.astype(dt) * 1e-30,
                         ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
            return lax.conv_general_dilated(
                xp, kcj, (1, 1), ((1, 1), (1, 1)), lhs_dilation=(2, 2),
                dimension_numbers=dn)

        # 4-phase: out[2i+py, 2j+px] = conv(xp, kc[py::2, px::2]) per parity
        def var_c(x, s):
            xp = jnp.pad(x + s.astype(dt) * 1e-30,
                         ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
            outs = []
            for py in range(2):
                row = []
                for px in range(2):
                    kph = kcj[py::2, px::2]  # (3, 3, cin, cout)
                    lo_y, lo_x = (1 - py) // 1 and 0 or 0, 0
                    # dilated pad (1,1) -> phase pads: phase p reads dilated
                    # positions 2m+p-1+2t; solve pads so shapes line up
                    row.append(lax.conv_general_dilated(
                        xp, kph, (1, 1),
                        (((1 - py), py - 1 + 2), ((1 - px), px - 1 + 2)),
                        dimension_numbers=dn)[:, :2 * h // 2, :2 * w // 2])
                outs.append(row)
            ph = jnp.stack([jnp.stack(r, axis=0) for r in outs], axis=0)
            # (2, 2, B, h, w, cout) -> (B, 2h, 2w, cout)
            ph = ph.transpose(2, 3, 0, 4, 1, 5)
            return ph.reshape(b, 2 * h, 2 * w, cout)

        fns = {"A_resize_conv": var_a, "B_composed_dilated": var_b,
               "C_4phase": var_c}
        stage_res = {}
        outs = {}
        for vn, fn in fns.items():
            f = jax.jit(lambda x, s, fn=fn: jnp.sum(
                fn(x, s).astype(jnp.float32)))
            try:
                s = jnp.float32(0.0)
                for _ in range(WARMUP):
                    s = f(x, s)
                float(s)
                best = float("inf")
                for _ in range(WINDOWS):
                    s = jnp.float32(0.0)
                    t0 = time.perf_counter()
                    for _ in range(ITERS):
                        s = f(x, s)
                    float(s)
                    best = min(best, time.perf_counter() - t0)
                stage_res[vn] = round(best / ITERS * 1e3, 3)  # ms/iter
                outs[vn] = np.asarray(
                    jax.jit(fn)(x, jnp.float32(0.0)).astype(jnp.float32))
            except Exception as e:  # noqa: BLE001
                stage_res[vn] = f"ERROR: {type(e).__name__}: {e}"[:200]
        # interior parity check (border excluded)
        if "A_resize_conv" in outs:
            a = outs["A_resize_conv"]
            for vn in ("B_composed_dilated", "C_4phase"):
                if vn in outs:
                    err = float(np.abs(
                        (outs[vn] - a)[:, 2:-2, 2:-2]).max())
                    stage_res[f"{vn}_interior_maxerr"] = err
        results[name] = stage_res
        print(name, json.dumps(stage_res), flush=True)

    print(json.dumps({"probe": "fused_upconv", "batch": B,
                      "dtype": args.dtype, "results": results}))


if __name__ == "__main__":
    main()
