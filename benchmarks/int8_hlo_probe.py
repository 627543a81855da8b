"""Inspect the compiled HLO of the int8 PTQ forward on the real TPU.

Questions this answers (round-3 int8-chain work):
  1. Do the requant chains (dequant -> BN/ELU -> scale -> round -> clip ->
     convert s8) fuse into the producing conv's epilogue, or do bf16/f32
     activations materialize in HBM between convs?
  2. What are the largest materialized buffers and their dtypes?

Usage: python benchmarks/int8_hlo_probe.py [--batch 256] [--out /tmp/hlo.txt]
"""

from __future__ import annotations

import argparse
import re
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def analyze(text: str) -> None:
    # every fusion/instruction with its output shape dtype
    root_shapes = []
    for m in re.finditer(r"^\s*(?:ROOT )?%?([\w.\-]+) = ([a-z0-9]+)\[([\d,]*)\]"
                         r"[^=]*fusion", text, re.M):
        name, dtype, shape = m.groups()
        root_shapes.append((name, dtype, shape))
    conv_count = len(re.findall(r" convolution\(", text))
    print(f"convolutions: {conv_count}")
    dt = Counter(d for _, d, _ in root_shapes)
    print(f"fusion output dtypes: {dict(dt)}")

    # biggest tensors written by any instruction (proxy for HBM traffic)
    sizes = []
    for m in re.finditer(r"= ([a-z0-9]+)\[([\d,]+)\]", text):
        dtype, dims = m.groups()
        try:
            n = 1
            for d in dims.split(","):
                n *= int(d)
        except ValueError:
            continue
        bytes_per = {"f32": 4, "bf16": 2, "s8": 1, "u8": 1, "s32": 4,
                     "pred": 1, "f16": 2, "s16": 2}.get(dtype)
        if bytes_per:
            sizes.append((n * bytes_per, dtype, dims))
    sizes.sort(reverse=True)
    print("largest instruction outputs:")
    seen = set()
    shown = 0
    for b, dtype, dims in sizes:
        key = (dtype, dims)
        if key in seen:
            continue
        seen.add(key)
        count = sum(1 for bb, dd, mm in sizes if (dd, mm) == key)
        print(f"  {b/1e6:8.1f} MB  {dtype}[{dims}]  x{count}")
        shown += 1
        if shown >= 12:
            break


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--out", default="/tmp/int8_hlo.txt")
    ap.add_argument("--bf16-out", default="/tmp/bf16_hlo.txt")
    ap.add_argument("--fused-upsample", action="store_true",
                    help="probe the fused-decoder graph (the serving "
                         "default since round 4)")
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
    model = get_disp_net(
        "disp_res_50",
        fused_upsample=args.fused_upsample).clone(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (args.batch, 128, 416, 3), jnp.float32)
    # jitted init: ONE relay program instead of an RPC per op (eager init
    # measured minutes through a degraded relay)
    variables = jax.jit(model.init)(rng, x)
    jax.block_until_ready(variables)
    calib = calibrate_conv_ranges(model, variables, [x[:8]])

    def fwd_int8(variables, x):
        out = quantized_apply(model, variables, x, ranges=calib)
        return jnp.sum(out[0])

    def fwd_bf16(variables, x):
        out = apply_model(model, variables, x)
        return jnp.sum(out[0])

    for name, fn, path in (("int8", fwd_int8, args.out),
                           ("bf16", fwd_bf16, args.bf16_out)):
        compiled = jax.jit(fn).lower(variables, x).compile()
        text = compiled.as_text()
        Path(path).write_text(text)
        print(f"\n=== {name} ({len(text.splitlines())} HLO lines; "
              f"saved {path}) ===")
        analyze(text)
        try:
            ca = compiled.cost_analysis()
            print(f"cost: flops={ca.get('flops', 0)/1e9:.1f}G "
                  f"bytes={ca.get('bytes accessed', 0)/1e9:.2f}GB")
        except Exception as e:
            print(f"cost analysis unavailable: {e}")


if __name__ == "__main__":
    main()
