"""Probe: fused-decoder main conv as ONE lhs-dilated 6x6 conv vs the
pixel-shuffle form (4 dense 3x3 phase convs + depth-to-space), bf16 and
int8, at the real DispResNet-50 decoder stage shapes.

Motivation (VERDICT r4 items 3+8): the lhs-dilated form applies 36 taps
per HIGH-res output pixel — 144 MAC-taps per low-res pixel — of which
3/4 multiply inserted zeros unless the backend's dilated-conv lowering
skips them. The phase decomposition (`ops/fused_upconv.py::
lhs_dilated_conv_ps`) is a bit-identical reordering with 36 dense taps
per low-res pixel. If XLA:TPU multiplies the zeros, PS should win ~4x on
MXU time for these convs; if it already skips them, PS only adds a
reshape. This probe decides which.

Timing: K dependent conv applications inside ONE jitted lax.scan with
genuine value feedback (the relay dedupes identical dispatches, and
back-to-back identical programs read impossibly fast; in-program
chaining is the only protocol that measures truth here — BASELINE.md
round-2 int8 probe note). Best of WINDOWS windows.

Run: python benchmarks/ps_probe.py [--batch 256] [--skip-int8]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

K_CHAIN, WINDOWS, REPS = 12, 3, 3


def run_deconv(args) -> None:
    """DispNetS decoder analog: ConvTranspose(3x3, s=2) — i.e. an
    lhs-dilated 3x3 conv, padding ((1,2),(1,2)) on the dilated grid — vs
    its pixel-shuffle form: ONE dense 2x2 conv to 4*Cout + depth-to-space.

    Derivation (per axis, kernel k[0..2], dilated pad left 1): output
    phase p=0 draws only k[1] at x[j]; p=1 draws k[0] at x[j] and k[2]
    at x[j+1] (zero past the edge -> pad x right by 1). 2D phases have
    {1, 2, 2, 4} taps; padding each phase kernel into a common 2x2
    window gives one VALID conv with 16 MAC-taps per low-res pixel vs
    the dilated form's 36. Parity-checked inline.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    dn = ("NHWC", "HWIO", "NHWC")
    B = args.batch
    # DispNetS training-shape decoder stages (B=32 selfsup default uses
    # B=32; probe at the serving batch too): (half-res spatial, Cin) ->
    # Cout, from DEC_PLANES tail (the big, full/near-full-res stages)
    stages = [
        ("up1", (B, 64, 208, 32), 16),
        ("up2", (B, 32, 104, 64), 32),
        ("up3", (B, 16, 52, 128), 64),
    ]
    rng = np.random.default_rng(0)
    results: dict = {"batch": B, "mode": "deconv"}

    def time_chain(step, x0):
        @jax.jit
        def run(x0):
            def body(x, _):
                return step(x), ()
            xK, _ = lax.scan(body, x0, None, length=K_CHAIN)
            return xK

        out = run(x0)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(WINDOWS):
            t0 = time.perf_counter()
            for _ in range(REPS):
                out = run(out)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / REPS)
        return best / K_CHAIN * 1e3

    for name, (b, h, w, cin), cout in stages:
        x = rng.normal(size=(b, h, w, cin)).astype(np.float32)
        k = (rng.normal(size=(3, 3, cin, cout)).astype(np.float32)
             * (0.5 / np.sqrt(9 * cin)))
        kj = jnp.asarray(k, jnp.bfloat16)
        # phase kernels in a common 2x2 window: out[2j+py, 2i+px] =
        # sum k[ty, tx] x[...] with (ty, tx) of parity (1-py, 1-px);
        # k row 1 acts on x[j] (window pos 0), k rows 0/2 on x[j]/x[j+1]
        pk = np.zeros((2, 2, cin, 4 * cout), np.float32)
        for py in range(2):
            for px in range(2):
                sl = slice(py * cout * 2 + px * cout,
                           py * cout * 2 + px * cout + cout)
                if py == 0 and px == 0:
                    pk[0, 0, :, sl] = k[1, 1]
                elif py == 0:
                    pk[0, 0, :, sl] = k[1, 0]
                    pk[0, 1, :, sl] = k[1, 2]
                elif px == 0:
                    pk[0, 0, :, sl] = k[0, 1]
                    pk[1, 0, :, sl] = k[2, 1]
                else:
                    pk[0, 0, :, sl] = k[0, 0]
                    pk[0, 1, :, sl] = k[0, 2]
                    pk[1, 0, :, sl] = k[2, 0]
                    pk[1, 1, :, sl] = k[2, 2]
        pkj = jnp.asarray(pk, jnp.bfloat16)

        def fold(y, cin=cin):
            b_, H2, W2, co = y.shape
            y = y.reshape(b_, H2 // 2, 2, W2 // 2, 2, co).mean((2, 4))
            return y[..., :cin] if co >= cin else jnp.tile(
                y, (1, 1, 1, -(-cin // co)))[..., :cin]

        def step_dil(xx, kk=kj):
            y = lax.conv_general_dilated(
                xx, kk, (1, 1), ((1, 2), (1, 2)), lhs_dilation=(2, 2),
                dimension_numbers=dn)
            return fold(y).astype(xx.dtype)

        def step_ps(xx, kk=pkj, cout=cout):
            xp = jnp.pad(xx, ((0, 0), (0, 1), (0, 1), (0, 0)))
            y = lax.conv_general_dilated(
                xp, kk, (1, 1), ((0, 0), (0, 0)), dimension_numbers=dn)
            b_, hh, ww, _ = y.shape
            y = y.reshape(b_, hh, ww, 2, 2, cout).transpose(0, 1, 3, 2, 4, 5)
            y = y.reshape(b_, 2 * hh, 2 * ww, cout)
            return fold(y).astype(xx.dtype)

        # parity first (fp32 kernels, one application)
        xf = jnp.asarray(x)
        a = lax.conv_general_dilated(
            xf, jnp.asarray(k), (1, 1), ((1, 2), (1, 2)),
            lhs_dilation=(2, 2), dimension_numbers=dn)
        xpf = jnp.pad(xf, ((0, 0), (0, 1), (0, 1), (0, 0)))
        bps = lax.conv_general_dilated(
            xpf, jnp.asarray(pk), (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=dn)
        b_, hh, ww, _ = bps.shape
        bps = bps.reshape(b_, hh, ww, 2, 2, cout).transpose(
            0, 1, 3, 2, 4, 5).reshape(b_, 2 * hh, 2 * ww, cout)
        err = float(jnp.max(jnp.abs(a - bps)))

        xb = jnp.asarray(x, jnp.bfloat16)
        stage = {
            "parity_maxerr": err,
            "bf16_dilated_ms": round(time_chain(step_dil, xb), 3),
            "bf16_ps_ms": round(time_chain(step_ps, xb), 3),
        }
        results[name] = stage
        print(name, json.dumps(stage), flush=True)
    print(json.dumps({"probe": "deconv_ps_vs_dilated", **results}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--skip-int8", action="store_true")
    ap.add_argument("--deconv", action="store_true",
                    help="probe the DispNetS ConvTranspose analog instead")
    args = ap.parse_args()
    if args.deconv:
        run_deconv(args)
        return

    import jax
    import jax.numpy as jnp
    from jax import lax

    from supervised_dispnet_tpu.ops.fused_upconv import (
        compose_to_phase_kernels,
        compose_upsample_kernel,
    )
    from supervised_dispnet_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    dn = ("NHWC", "HWIO", "NHWC")
    B = args.batch
    # DispResNet-50 @128x416 fused decoder stages (half-res spatial after
    # upconv{i}_0, Cin == Cout of the stage's 3x3): i0 biggest .. i2
    stages = [
        ("i0", (B, 64, 208, 16), 16),
        ("i1", (B, 32, 104, 32), 32),
        ("i2", (B, 16, 52, 64), 64),
    ]

    rng = np.random.default_rng(0)
    results: dict = {"batch": B}

    def time_chain(step, x0):
        """jit(scan(step)) over K_CHAIN dependent iterations; ms/conv."""
        @jax.jit
        def run(x0):
            def body(x, _):
                return step(x), ()
            xK, _ = lax.scan(body, x0, None, length=K_CHAIN)
            return xK

        out = run(x0)
        jax.block_until_ready(out)  # compile + warm
        best = float("inf")
        for _ in range(WINDOWS):
            t0 = time.perf_counter()
            for _ in range(REPS):
                out = run(out)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / REPS)
        return best / K_CHAIN * 1e3

    for name, (b, h, w, cin), cout in stages:
        x = rng.normal(size=(b, h, w, cin)).astype(np.float32)
        k = (rng.normal(size=(3, 3, cin, cout)).astype(np.float32)
             * (0.5 / np.sqrt(9 * cin)))  # keep the chain's values bounded
        kc = np.asarray(compose_upsample_kernel(jnp.asarray(k)))
        pk = np.asarray(compose_to_phase_kernels(jnp.asarray(kc)))
        stage: dict = {}

        # ---- bf16 ----
        kc_b = jnp.asarray(kc, jnp.bfloat16)
        pk_b = jnp.asarray(pk, jnp.bfloat16)

        def fold(y, cin=cin):
            # genuine dependency: fold (B, 2H, 2W, Cout) back to the input
            # shape by 2x2x(Cout->Cin) average pooling (cheap VPU work)
            b_, H2, W2, co = y.shape
            y = y.reshape(b_, H2 // 2, 2, W2 // 2, 2, co).mean((2, 4))
            return y[..., :cin] if co >= cin else jnp.tile(
                y, (1, 1, 1, -(-cin // co)))[..., :cin]

        def step_dil(xx, kk=kc_b):
            xp = jnp.pad(xx, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
            y = lax.conv_general_dilated(
                xp, kk, (1, 1), ((1, 1), (1, 1)), lhs_dilation=(2, 2),
                dimension_numbers=dn)
            return fold(y).astype(xx.dtype)

        def step_ps(xx, kk=pk_b, cout=cout):
            xp = jnp.pad(xx, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
            y = lax.conv_general_dilated(
                xp, kk, (1, 1), ((0, 0), (0, 0)), dimension_numbers=dn)
            b_, hh, ww, _ = y.shape
            y = y.reshape(b_, hh, ww, 2, 2, cout).transpose(0, 1, 3, 2, 4, 5)
            y = y.reshape(b_, 2 * hh, 2 * ww, cout)
            return fold(y).astype(xx.dtype)

        xb = jnp.asarray(x, jnp.bfloat16)
        stage["bf16_dilated_ms"] = round(time_chain(step_dil, xb), 3)
        stage["bf16_ps_ms"] = round(time_chain(step_ps, xb), 3)

        # ---- int8 (weights + activations int8, int32 accumulate) ----
        if not args.skip_int8:
            kc_i = jnp.asarray(
                np.clip(np.round(kc / (np.abs(kc).max() / 127)), -127, 127),
                jnp.int8)
            pk_i = jnp.asarray(
                np.clip(np.round(pk / (np.abs(pk).max() / 127)), -127, 127),
                jnp.int8)

            def fold_i(y, cin=cin):
                b_, H2, W2, co = y.shape
                y = y.reshape(b_, H2 // 2, 2, W2 // 2, 2, co).sum((2, 4))
                y = y[..., :cin]
                return (y >> 12).astype(jnp.int8)  # bounded feedback

            def step_dil_i(xx, kk=kc_i):
                xp = jnp.pad(xx, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
                y = lax.conv_general_dilated(
                    xp, kk, (1, 1), ((1, 1), (1, 1)), lhs_dilation=(2, 2),
                    dimension_numbers=dn,
                    preferred_element_type=jnp.int32)
                return fold_i(y)

            def step_ps_i(xx, kk=pk_i, cout=cout):
                xp = jnp.pad(xx, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
                y = lax.conv_general_dilated(
                    xp, kk, (1, 1), ((0, 0), (0, 0)), dimension_numbers=dn,
                    preferred_element_type=jnp.int32)
                b_, hh, ww, _ = y.shape
                y = y.reshape(b_, hh, ww, 2, 2, cout)
                y = y.transpose(0, 1, 3, 2, 4, 5).reshape(
                    b_, 2 * hh, 2 * ww, cout)
                return fold_i(y)

            xi = jnp.asarray(
                np.clip(rng.normal(size=(b, h, w, cin)) * 32, -127, 127)
                .astype(np.int8))
            stage["int8_dilated_ms"] = round(time_chain(step_dil_i, xi), 3)
            stage["int8_ps_ms"] = round(time_chain(step_ps_i, xi), 3)

        results[name] = stage
        print(name, json.dumps(stage), flush=True)

    print(json.dumps({"probe": "ps_vs_dilated", **results}))


if __name__ == "__main__":
    main()
