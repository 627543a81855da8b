"""Post-training int8 quantization (PTQ) for serving/inference.

The reference has no quantized path (it serves fp32 through torch CUDA;
reference: ``test_disp.py::main`` / ``run_inference.py``). On TPU v5e the
MXU runs int8 matmuls at 2x the bf16 rate (394 vs 197 peak TOPS), and a
dedup-proof in-program probe on this chip measured the model's hot conv
shapes at 1.4-2.0x faster in int8 than bf16 (BASELINE.md round-2 PTQ
section). This module exploits that WITHOUT duplicating any architecture
code: flax method interception swaps every ``nn.Conv.__call__`` for an
int8 kernel at trace time, so the same model definition serves both
precisions.

Scheme (standard symmetric PTQ):
- weights: per-output-channel symmetric int8, quantized at trace time
  from the fp32 params (cost is O(params) elementwise — noise next to
  the conv FLOPs);
- activations: per-tensor symmetric int8 with STATIC scales collected by
  a one-shot calibration pass (``calibrate_conv_ranges`` — a single
  jitted forward per calibration batch that returns every conv input's
  absmax);
- accumulation in int32 (``preferred_element_type``), dequant + bias in
  fp32, output cast back to the network's compute dtype;
- disparity heads (``features == 1``) and any conv matching ``exempt``
  stay in the original precision: their output feeds 1/d directly and
  they are a rounding error of the FLOPs.

ConvTranspose upsamples are left unquantized in v1 (they are <8% of
DispResNet-50 inference FLOPs; XLA lowers them as grad-convs where int8
support is less settled).

Model scope: validated on the sigmoid-bounded disparity nets (DispNetS,
DispResNet-18/50, VGG-BN — median disparity rel err <2% on fixtures).
FCRN predicts metric depth directly; per-tensor activation scales
amplify through its up-projection stack (measured median rel err ~0.9 on
random-init fixtures) — serve FCRN in fp/bf16.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

from supervised_dispnet_tpu.models.common import apply_model


def _conv_path(module: nn.Module) -> str:
    return "/".join(module.path)


def _canon_padding(padding, kernel_size):
    """Mirror flax nn.Conv's padding canonicalization for the subset our
    models use: int, (int, int), sequence of (lo, hi) pairs, or string."""
    if isinstance(padding, str):
        return padding
    if isinstance(padding, int):
        return [(padding, padding)] * len(kernel_size)
    pads = []
    for p in padding:
        pads.append((p, p) if isinstance(p, int) else tuple(p))
    if len(pads) == 1 and len(kernel_size) > 1:
        pads = pads * len(kernel_size)
    return pads


def _canon_strides(strides, kernel_size):
    if strides is None:
        return (1,) * len(kernel_size)
    if isinstance(strides, int):
        return (strides,) * len(kernel_size)
    return tuple(strides)


def _is_quantizable(module: nn.Module, method_name: str,
                    exempt: Callable[[nn.Module], bool] | None) -> bool:
    if not type(module) is nn.Conv or method_name != "__call__":
        return False
    if module.feature_group_count != 1:
        return False  # no grouped convs in this family; bail safely
    if module.features == 1:
        return False  # disparity heads stay fp
    # Dilated convs (FCRN's input_dilation=2 unpool convs) stay fp:
    # _int8_conv does not forward lhs/rhs dilation, so quantizing one
    # would silently change the geometry, not just the precision.
    def _dilated(d):
        if d is None:
            return False
        if isinstance(d, int):
            return d != 1
        return any(v != 1 for v in d)

    if _dilated(module.input_dilation) or _dilated(module.kernel_dilation):
        return False
    if exempt is not None and exempt(module):
        return False
    return True


def calibrate_conv_ranges(
    model,
    variables,
    batches,
    exempt: Callable[[nn.Module], bool] | None = None,
    percentile: float | None = None,
) -> dict[str, float]:
    """One-shot activation-range calibration.

    Runs an eval-mode forward over each batch with an interceptor that
    records ``max|input|`` of every quantizable conv; the whole sweep per
    batch is ONE jitted device program (the stats ride out as outputs),
    so calibration costs a handful of forwards, not per-conv dispatches.

    ``percentile`` (e.g. 99.9) clips the range to that percentile of
    ``|input|`` instead of the absolute max — outlier channels (BN models)
    stop dictating the scale, trading bounded clipping error for finer
    resolution everywhere else.

    Returns {conv_path: float range} maximized over batches.
    """
    def stats_forward(variables, x):
        local: dict[str, jax.Array] = {}

        def rec(next_fun, args, kwargs, context):
            if _is_quantizable(context.module, context.method_name, exempt):
                p = _conv_path(context.module)
                ax = jnp.abs(args[0].astype(jnp.float32))
                a = (jnp.percentile(ax, percentile)
                     if percentile is not None else jnp.max(ax))
                local[p] = jnp.maximum(local[p], a) if p in local else a
            return next_fun(*args, **kwargs)

        with nn.intercept_methods(rec):
            apply_model(model, variables, x)
        return local

    fwd = jax.jit(stats_forward)
    ranges: dict[str, float] = {}
    for batch in batches:
        stats = jax.device_get(fwd(variables, jnp.asarray(batch)))
        for p, a in stats.items():
            ranges[p] = max(ranges.get(p, 0.0), float(a))
    bad = [p for p, a in ranges.items() if not (a > 0.0 and a == a)]
    if bad:
        raise ValueError(f"degenerate calibration ranges for {bad}")
    return ranges


def _int8_conv(module: nn.Conv, x: jax.Array, in_absmax: float) -> jax.Array:
    params = module.variables["params"]
    kernel = params["kernel"].astype(jnp.float32)  # (kh, kw, Cin, Cout)
    in_scale = jnp.float32(in_absmax / 127.0)
    w_scale = jnp.maximum(
        jnp.max(jnp.abs(kernel), axis=(0, 1, 2)), 1e-12) / 127.0  # (Cout,)

    xq = jnp.round(
        jnp.clip(x.astype(jnp.float32) / in_scale, -127.0, 127.0)
    ).astype(jnp.int8)
    wq = jnp.round(kernel / w_scale).astype(jnp.int8)

    dn = lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    out = lax.conv_general_dilated(
        xq, wq,
        window_strides=_canon_strides(module.strides, module.kernel_size),
        padding=_canon_padding(module.padding, module.kernel_size),
        dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )
    out = out.astype(jnp.float32) * (in_scale * w_scale)
    if module.use_bias:
        out = out + params["bias"].astype(jnp.float32)
    return out.astype(x.dtype)


def quantized_apply(
    model,
    variables,
    *args,
    ranges: dict[str, float],
    exempt: Callable[[nn.Module], bool] | None = None,
):
    """Eval-mode forward with every calibrated conv running int8.

    Jittable: wrap in ``jax.jit(lambda v, x: quantized_apply(model, v, x,
    ranges=ranges))``. Convs without a calibration entry (or exempt) run
    in the original precision.
    """
    def q_interceptor(next_fun, fargs, fkwargs, context):
        if _is_quantizable(context.module, context.method_name, exempt):
            p = _conv_path(context.module)
            if p in ranges:
                return _int8_conv(context.module, fargs[0], ranges[p])
        return next_fun(*fargs, **fkwargs)

    with nn.intercept_methods(q_interceptor):
        return apply_model(model, variables, *args)
