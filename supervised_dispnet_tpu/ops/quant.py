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

Round 3 adds the **int8-through encoder chains**: when the calibration
carries per-block output ranges, ResNet encoders run int8-in/int8-out end
to end (``_int8_chain_encoder``) — activations exist in HBM only as int8
between blocks, which is where the per-conv scheme was losing its
bandwidth win (measured 23.3 GB/step accessed vs bf16's 24.5; see
BASELINE.md round-3 int8 section). The VGG-BN stages
(``_int8_chain_vgg_stage``) and DispNetS's DownsampleConv blocks
(``_int8_chain_downsample``) chain the same way — intra-block
intermediates stay int8; block outputs materialize fp because they are
decoder skip inputs in any precision. Those two need no extra
calibration keys (each intermediate requantizes with the next conv's
calibrated input range), so existing calibrations activate them.

Model scope: validated on the sigmoid-bounded disparity nets (DispNetS,
DispResNet-18/50, VGG-BN — median disparity rel err <2% on fixtures) AND
on FCRN with trained weights (abs_rel delta +0.0003 at absmax x1; its
input-dilated unpool convs quantize with exact geometry since lhs/rhs
dilation is forwarded). Random-init fixtures mispredict FCRN badly in
the pessimistic direction (~0.9 median rel err vs 0.003 trained — no BN
means no outlier channels once weights are trained); measure quant
quality on trained checkpoints, per BASELINE.md.
"""

from __future__ import annotations

import os
import re
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


def _canon_dilation(dilation, kernel_size):
    """flax nn.Conv dilation -> the lhs/rhs_dilation sequence
    lax.conv_general_dilated expects (None / int / per-dim sequence)."""
    return _canon_strides(dilation, kernel_size)


def _is_quantizable(module: nn.Module, method_name: str,
                    exempt: Callable[[nn.Module], bool] | None) -> bool:
    if not type(module) is nn.Conv or method_name != "__call__":
        return False
    if module.feature_group_count != 1:
        return False  # no grouped convs in this family; bail safely
    if module.features == 1:
        return False  # disparity heads stay fp
    if exempt is not None and exempt(module):
        return False
    return True


def _is_res_block(module: nn.Module) -> bool:
    from supervised_dispnet_tpu.models.resnet import BasicBlock, Bottleneck

    return type(module) in (BasicBlock, Bottleneck)


def _is_fused_upconv(module: nn.Module, method_name: str) -> bool:
    from supervised_dispnet_tpu.models.dispresnet import _FusedUpConvParams

    return (type(module) is _FusedUpConvParams
            and method_name == "__call__")


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

    Also records ``max|output|`` of every ResNet block under the key
    ``<block_path>::out`` — the int8-through encoder chain
    (``_int8_chain_encoder``) requantizes each block's output with its own
    calibrated range so activations stay int8 in HBM between blocks.

    ``percentile`` (e.g. 99.9) clips the range to that percentile of
    ``|input|`` instead of the absolute max — outlier channels (BN models)
    stop dictating the scale, trading bounded clipping error for finer
    resolution everywhere else.

    Returns {conv_path: float range} maximized over batches.
    """
    def _reduce(ax):
        return (jnp.percentile(ax, percentile)
                if percentile is not None else jnp.max(ax))

    def stats_forward(variables, x):
        local: dict[str, jax.Array] = {}

        def put(p, a):
            local[p] = jnp.maximum(local[p], a) if p in local else a

        def rec(next_fun, args, kwargs, context):
            if _is_quantizable(context.module, context.method_name, exempt):
                put(_conv_path(context.module),
                    _reduce(jnp.abs(args[0].astype(jnp.float32))))
            elif (_is_fused_upconv(context.module, context.method_name)
                  and (exempt is None or not exempt(context.module))):
                # fused decoder stage: h and skip are quantized with
                # SEPARATE scales (strictly finer than the unfused
                # concat's shared scale)
                put(_conv_path(context.module),
                    _reduce(jnp.abs(args[0].astype(jnp.float32))))
                skip = args[1] if len(args) > 1 else kwargs.get("skip")
                if skip is not None:
                    put(_conv_path(context.module) + "::skip",
                        _reduce(jnp.abs(skip.astype(jnp.float32))))
            out = next_fun(*args, **kwargs)
            if (_is_res_block(context.module)
                    and context.method_name == "__call__"):
                put(_conv_path(context.module) + "::out",
                    _reduce(jnp.abs(out.astype(jnp.float32))))
            return out

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


def _int8_conv(module: nn.Conv, x: jax.Array, in_absmax: float,
               baked_entry=None) -> jax.Array:
    in_scale = jnp.float32(in_absmax / 127.0)
    if baked_entry is not None:
        # export path: pre-quantized (wq, w_scale, bias) — the fp32
        # kernel is never read, so it never enters the traced artifact
        wq, w_scale, bias = baked_entry
        wq = jnp.asarray(wq)
        w_scale = jnp.asarray(w_scale)
    else:
        params = module.variables["params"]
        kernel = params["kernel"].astype(jnp.float32)  # (kh, kw, Cin, Cout)
        w_scale = jnp.maximum(
            jnp.max(jnp.abs(kernel), axis=(0, 1, 2)), 1e-12) / 127.0  # (Cout,)
        wq = jnp.round(kernel / w_scale).astype(jnp.int8)
        bias = params["bias"] if module.use_bias else None

    xq = jnp.round(
        jnp.clip(x.astype(jnp.float32) / in_scale, -127.0, 127.0)
    ).astype(jnp.int8)

    dn = lax.conv_dimension_numbers(
        x.shape, wq.shape, ("NHWC", "HWIO", "NHWC"))
    out = lax.conv_general_dilated(
        xq, wq,
        window_strides=_canon_strides(module.strides, module.kernel_size),
        padding=_canon_padding(module.padding, module.kernel_size),
        lhs_dilation=_canon_dilation(module.input_dilation,
                                     module.kernel_size),
        rhs_dilation=_canon_dilation(module.kernel_dilation,
                                     module.kernel_size),
        dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )
    out = out.astype(jnp.float32) * (in_scale * w_scale)
    if bias is not None:
        out = out + jnp.asarray(bias).astype(jnp.float32)
    return out.astype(x.dtype)


def _int8_fused_upconv(module, h, skip, ranges, baked=None,
                       hq=None, h_scale=None, path=None, params=None):
    """int8 path for the fused decoder stage
    (``models/dispresnet._FusedUpConvParams``): the composed 6x6
    lhs-dilated conv runs int8-in/int8-weights directly on the HALF-res
    tensor (edge-pad and the conv's inserted zeros are exact in int8), the
    skip branch is a second int8 conv, both dequantized and summed with
    the bias. The kernel is composed FIRST, then quantized per-output-
    channel (finer than quantizing then composing). Border corrections
    (ops/fused_upconv.py) are computed in fp on 1-px strips — they cancel
    the main conv's phantom terms to within int8 rounding, which only
    touches the 1-px output ring and is inside the serving noise floor
    (quant_bench rel-err table).

    The s8-through decoder chain (``_int8_chain_decoder_up``) calls this
    with a pre-quantized ``(hq, h_scale)`` — the stage then never reads
    an fp copy of ``h`` from HBM — and with ``path``/``params`` resolved
    from the PARENT module (interception happens one level up there).
    Returns fp32 ``y`` (bias included, pre-activation) in that case;
    the per-stage interception path returns ``h.dtype`` as before."""
    from supervised_dispnet_tpu.ops.fused_upconv import (
        _border_conv, _strip_up_phantom, compose_upsample_kernel)

    chained = hq is not None
    if path is None:
        path = _conv_path(module)
    if params is None:
        params = module.variables["params"]
    kernel = params["kernel"].astype(jnp.float32)
    bias = params["bias"].astype(jnp.float32)
    ch = (h if h is not None else hq).shape[-1]
    kh, ks = kernel[:, :, :ch], kernel[:, :, ch:]

    kc = compose_upsample_kernel(kh)  # (6, 6, ch, Cout)
    wc_scale = jnp.maximum(
        jnp.max(jnp.abs(kc), axis=(0, 1, 2)), 1e-12) / 127.0
    wcq = jnp.round(kc / wc_scale).astype(jnp.int8)
    if chained:
        in_scale = jnp.float32(h_scale)
    else:
        in_scale = jnp.float32(ranges[path] / 127.0)
        hq = jnp.round(
            jnp.clip(h.astype(jnp.float32) / in_scale, -127.0, 127.0)
        ).astype(jnp.int8)
    hqp = jnp.pad(hq, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    # The int8 path keeps the lhs-dilated form DELIBERATELY: the
    # pixel-shuffle form's per-conv win (benchmarks/ps_probe.py, -25%)
    # is erased in-model because the depth-to-space reorder is an extra
    # full-resolution memory pass that breaks the conv->dequant->bias->
    # skip-add->ELU epilogue fusion the dilated conv enjoys — measured
    # 9431 -> 7771 img/s (and 7789 with the dequant moved into the phase
    # layout), BASELINE.md round 5. The fp path (upconv2x_fused) DOES use
    # the pixel-shuffle form: its decoder stages are compute-bound enough
    # that the 4x tap reduction nets +2.2% even paying the reorder.
    dn = lax.conv_dimension_numbers(hqp.shape, wcq.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(
        hqp, wcq, (1, 1), ((1, 1), (1, 1)), lhs_dilation=(2, 2),
        dimension_numbers=dn, preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * (in_scale * wc_scale)

    # fp border corrections on the dequantized-equivalent input (strips)
    hf = (hq.astype(jnp.float32) * in_scale)
    B, H, W, _ = hq.shape
    khf = kh
    corr_top = _border_conv(_strip_up_phantom(hf[:, 0]), khf[0], None)
    corr_bot = _border_conv(_strip_up_phantom(hf[:, -1]), khf[2], None)
    corr_left = _border_conv(_strip_up_phantom(hf[:, :, 0]), khf[:, 0], None)
    corr_right = _border_conv(_strip_up_phantom(hf[:, :, -1]), khf[:, 2], None)

    def dot(px, kk):
        return jnp.tensordot(px, kk, axes=([-1], [0]))

    corr_top = corr_top.at[:, 0].add(-dot(hf[:, 0, 0], khf[0, 0]))
    corr_top = corr_top.at[:, -1].add(-dot(hf[:, 0, -1], khf[0, 2]))
    corr_bot = corr_bot.at[:, 0].add(-dot(hf[:, -1, 0], khf[2, 0]))
    corr_bot = corr_bot.at[:, -1].add(-dot(hf[:, -1, -1], khf[2, 2]))
    y = y - jnp.pad(corr_top[:, None], ((0, 0), (0, 2 * H - 1), (0, 0), (0, 0)))
    y = y - jnp.pad(corr_bot[:, None], ((0, 0), (2 * H - 1, 0), (0, 0), (0, 0)))
    y = y - jnp.pad(corr_left[:, :, None], ((0, 0), (0, 0), (0, 2 * W - 1), (0, 0)))
    y = y - jnp.pad(corr_right[:, :, None], ((0, 0), (0, 0), (2 * W - 1, 0), (0, 0)))

    if skip is not None:
        skey = path + "::skip"
        ws_scale = jnp.maximum(
            jnp.max(jnp.abs(ks), axis=(0, 1, 2)), 1e-12) / 127.0
        wsq = jnp.round(ks / ws_scale).astype(jnp.int8)
        s_scale = jnp.float32(ranges[skey] / 127.0)
        sq = jnp.round(
            jnp.clip(skip.astype(jnp.float32) / s_scale, -127.0, 127.0)
        ).astype(jnp.int8)
        dns = lax.conv_dimension_numbers(sq.shape, wsq.shape,
                                         ("NHWC", "HWIO", "NHWC"))
        y = y + lax.conv_general_dilated(
            sq, wsq, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dns,
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * (s_scale * ws_scale)
    y = y + bias
    return y if chained else y.astype(h.dtype)


# ---------------------------------------------------------------------------
# int8-through encoder chain (round 3)
#
# The per-conv interception above dequantizes after EVERY conv, so fp
# activations round-trip through HBM between convs; measured HLO showed the
# int8 graph touching ~23.3 GB/step vs bf16's 24.5 GB — no bandwidth win,
# which is why end-to-end int8 was only 1.14x while per-conv probes show
# 1.4-2x (BASELINE.md round-2 PTQ). The chain below runs the WHOLE ResNet
# encoder int8-in/int8-out: each conv's epilogue fuses dequant + BN + bias
# + relu + requant (all elementwise, so XLA folds it into the conv fusion
# and writes int8 to HBM), the residual add happens in registers, and the
# stem maxpool runs directly on int8 (max commutes with the monotone
# quantization). Activations only exist in HBM as int8 between blocks.
#
# Structure mirrors models/resnet.py::{ResNetEncoder, BasicBlock,
# Bottleneck} (parity-tested in tests/test_quant.py); BN (eval-mode
# affine) is folded into the dequant multiplier/bias analytically, so both
# fold_bn=True and BN-stat checkpoints work.
# ---------------------------------------------------------------------------


def _dn(x_shape, w_shape):
    return lax.conv_dimension_numbers(x_shape, w_shape, ("NHWC", "HWIO", "NHWC"))


def _conv_q(xq, wq, stride, pad):
    return lax.conv_general_dilated(
        xq, wq, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=_dn(xq.shape, wq.shape),
        preferred_element_type=jnp.int32,
    )


def _quantize_fp(x, rng_abs):
    s = jnp.float32(rng_abs / 127.0)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127.0, 127.0)
    return xq.astype(jnp.int8), s


def _requant(acc_i32, mult, bias, out_range, act="relu"):
    """int32 conv accumulator -> int8 with the fused fp epilogue
    (dequant * per-channel mult + bias [+ activation]) -> symmetric
    requant. ``act``: "relu" (BN encoders), "elu" (DispNetS's conv+ELU
    vocabulary), or None."""
    y = acc_i32.astype(jnp.float32) * mult + bias
    if act == "relu":
        y = jnp.maximum(y, 0.0)
    elif act == "elu":
        y = jax.nn.elu(y)
    s = jnp.float32(out_range / 127.0)
    yq = jnp.clip(jnp.round(y / s), -127.0, 127.0).astype(jnp.int8)
    return yq, s


def _maxpool_q(xq):
    """3x3/2 pad-1 max pool on int8 (mirrors the stem nn.max_pool)."""
    return lax.reduce_window(
        xq, jnp.int8(-128), lax.max,
        window_dimensions=(1, 3, 3, 1), window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def _conv_eff(p, s, conv_name, bn_name, fold_bn):
    """Effective (int8 kernel, per-channel weight scale, fp bias) with the
    eval-mode BN affine absorbed: BN(conv(x)) = a*conv(x) + b with
    a = gamma/sqrt(var+eps), b = beta - a*mean."""
    W = p[conv_name]["kernel"].astype(jnp.float32)
    if fold_bn:
        beff = p[conv_name].get("bias", jnp.zeros((W.shape[-1],))).astype(jnp.float32)
    else:
        bn_p, bn_s = p[bn_name], s[bn_name]
        a = (bn_p["scale"].astype(jnp.float32)
             / jnp.sqrt(bn_s["var"].astype(jnp.float32) + 1e-5))
        beff = (bn_p["bias"].astype(jnp.float32)
                - a * bn_s["mean"].astype(jnp.float32))
        W = W * a  # fold the BN gain into the weights pre-quantization
    w_scale = jnp.maximum(jnp.max(jnp.abs(W), axis=(0, 1, 2)), 1e-12) / 127.0
    wq = jnp.round(W / w_scale).astype(jnp.int8)
    return wq, w_scale, beff


def _encoder_plan(enc):
    """(block names, widths, strides, bottleneck?) from the encoder spec."""
    from supervised_dispnet_tpu.models.resnet import RESNET_SPECS, Bottleneck

    block_cls, stage_sizes, _ = RESNET_SPECS[enc.depth]
    blocks = []
    for stage, (n_blocks, width) in enumerate(
            zip(stage_sizes, (64, 128, 256, 512))):
        for b in range(n_blocks):
            stride = 2 if (b == 0 and stage > 0) else 1
            blocks.append((f"layer{stage + 1}_{b}", width, stride,
                           b == n_blocks - 1))
    return blocks, block_cls is Bottleneck


def _encoder_chain_keys(enc) -> list[str]:
    """Calibration keys the chain needs; if any is missing the caller
    falls back to per-conv interception (pre-round-3 calibrations)."""
    base = "/".join(enc.path)
    key = lambda *n: "/".join(((base,) if base else ()) + n)  # noqa: E731
    blocks, bottleneck = _encoder_plan(enc)
    keys = [key("conv1"), key("layer1_0", "conv1")]
    for name, _, _, _ in blocks:
        keys.append(key(name) + "::out")
        keys.append(key(name, "conv2"))
        if bottleneck:
            keys.append(key(name, "conv3"))
    return keys


def _int8_chain_encoder(enc, x, ranges, baked=None):
    """ResNetEncoder eval forward, int8 end-to-end; returns the 5 fp
    feature maps (the decoder consumes those through per-conv int8).
    With ``baked`` (bake_int8_weights), the pre-quantized BN-folded
    weights are used and the fp32 params are never read."""
    p = enc.variables["params"]
    s = enc.variables.get("batch_stats", {})
    base = "/".join(enc.path)
    key = lambda *n: "/".join(((base,) if base else ()) + n)  # noqa: E731
    out_dtype = enc.dtype or x.dtype
    blocks, bottleneck = _encoder_plan(enc)

    def eff(pp, ss, conv_name, bn_name, full_key):
        if baked is not None and full_key + "::eff" in baked:
            wq, ws_, be = baked[full_key + "::eff"]
            return jnp.asarray(wq), jnp.asarray(ws_), jnp.asarray(be)
        return _conv_eff(pp, ss, conv_name, bn_name, enc.fold_bn)

    feats = []
    # stem: conv 7x7/2 + BN + relu, requantized with layer1_0/conv1's
    # calibrated input range (the maxpool keeps the max, so the pre- and
    # post-pool absmax agree for the post-relu tensor)
    xq, s_in = _quantize_fp(x, ranges[key("conv1")])
    wq, ws, b = eff(p, s, "conv1", "bn1", key("conv1"))
    acc = _conv_q(xq, wq, 2, 3)
    hq, s_h = _requant(acc, s_in * ws, b, ranges[key("layer1_0", "conv1")])
    feats.append((hq.astype(jnp.float32) * s_h).astype(out_dtype))  # 1/2
    hq = _maxpool_q(hq)

    for name, width, stride, last_in_stage in blocks:
        bp, bs = p[name], s.get(name, {})
        kb = lambda n: key(name, n)  # noqa: E731
        out_range = ranges[key(name) + "::out"]
        if bottleneck:
            wq1, ws1, b1 = eff(bp, bs, "conv1", "bn1", kb("conv1"))
            h, s1 = _requant(_conv_q(hq, wq1, 1, 0), s_h * ws1, b1,
                             ranges[kb("conv2")])
            wq2, ws2, b2 = eff(bp, bs, "conv2", "bn2", kb("conv2"))
            h, s2 = _requant(_conv_q(h, wq2, stride, 1), s1 * ws2, b2,
                             ranges[kb("conv3")])
            wq3, ws3, b3 = eff(bp, bs, "conv3", "bn3", kb("conv3"))
            main = _conv_q(h, wq3, 1, 0).astype(jnp.float32) * (s2 * ws3) + b3
        else:
            wq1, ws1, b1 = eff(bp, bs, "conv1", "bn1", kb("conv1"))
            h, s1 = _requant(_conv_q(hq, wq1, stride, 1), s_h * ws1, b1,
                             ranges[kb("conv2")])
            wq2, ws2, b2 = eff(bp, bs, "conv2", "bn2", kb("conv2"))
            main = _conv_q(h, wq2, 1, 1).astype(jnp.float32) * (s1 * ws2) + b2
        if "downsample_conv" in bp:
            wqd, wsd, bd = eff(bp, bs, "downsample_conv",
                               "downsample_bn", kb("downsample_conv"))
            idn = (_conv_q(hq, wqd, stride, 0).astype(jnp.float32)
                   * (s_h * wsd) + bd)
        else:
            idn = hq.astype(jnp.float32) * s_h
        # The residual add consumes TWO conv outputs; XLA fuses an
        # epilogue into only one of them and materializes the other as a
        # RAW int32 accumulator (4 B/elem — measured: four 0.4 GB s32
        # buffers at the stage boundaries). Casting each side to bf16
        # closes every conv's epilogue with a 2 B write instead; the bf16
        # rounding (~0.4%) is at the int8 quantization noise floor.
        if "downsample_conv" in bp:
            main = main.astype(jnp.bfloat16)
            idn = idn.astype(jnp.bfloat16)
        y = jnp.maximum((main + idn).astype(jnp.float32), 0.0)
        s_o = jnp.float32(out_range / 127.0)
        hq = jnp.clip(jnp.round(y / s_o), -127.0, 127.0).astype(jnp.int8)
        s_h = s_o
        if last_in_stage:
            feats.append((hq.astype(jnp.float32) * s_h).astype(out_dtype))
    return feats


# ---------------------------------------------------------------------------
# int8-through chains for the non-ResNet encoders (round 3)
#
# The ResNet chain above is interceptable at one module (ResNetEncoder);
# the VGG and DispNetS encoders are built inline from stage/block modules,
# so their chains hang off those blocks instead. The structural boundary
# is the same in both: each block's OUTPUT is a decoder skip connection,
# so it must materialize fp regardless of precision — the win is the
# intra-block intermediates (e.g. _VGGStage's full-res 64-ch conv0 output,
# DownsampleConv's post-stride conv_a output), which stay int8 in HBM.
# Both chains requantize each intermediate with the NEXT conv's already-
# calibrated input range, so they need no new calibration keys: any
# existing per-conv calibration activates them.
# ---------------------------------------------------------------------------


def _module_key(module):
    base = "/".join(module.path)
    return lambda *n: "/".join(((base,) if base else ()) + n)


def _vgg_stage_chain_keys(stage) -> list[str]:
    key = _module_key(stage)
    return [key(f"conv{i}") for i in range(len(stage.widths))]


def _int8_chain_vgg_stage(stage, x, ranges, baked=None):
    """_VGGStage (N x [conv3x3 + BN + relu]) int8-in/int8-out: each conv's
    epilogue fuses dequant + BN affine + bias + relu + requant (BN folded
    into the per-channel multiplier pre-quantization, like the ResNet
    chain); only the last conv dequantizes, because its post-relu output
    is a decoder skip input the fp path materializes too."""
    p = stage.variables["params"]
    s = stage.variables.get("batch_stats", {})
    key = _module_key(stage)
    out_dtype = x.dtype
    n = len(stage.widths)

    def eff(conv_name, bn_name, full_key):
        if baked is not None and full_key + "::eff" in baked:
            wq, ws_, be = baked[full_key + "::eff"]
            return jnp.asarray(wq), jnp.asarray(ws_), jnp.asarray(be)
        return _conv_eff(p, s, conv_name, bn_name, fold_bn=False)

    xq, s_in = _quantize_fp(x, ranges[key("conv0")])
    for i in range(n):
        wq, ws, b = eff(f"conv{i}", f"bn{i}", key(f"conv{i}"))
        acc = _conv_q(xq, wq, 1, 1)
        if i < n - 1:
            xq, s_in = _requant(acc, s_in * ws, b, ranges[key(f"conv{i + 1}")])
        else:
            y = jnp.maximum(acc.astype(jnp.float32) * (s_in * ws) + b, 0.0)
            return y.astype(out_dtype)


def _downsample_chain_keys(block) -> list[str]:
    key = _module_key(block)
    return [key("conv_a", "Conv_0"), key("conv_b", "Conv_0")]


def _int8_chain_downsample(block, x, ranges, baked=None):
    """DownsampleConv (conv/2 + ELU -> conv + ELU, DispNetS's encoder
    vocabulary — no BN) int8-in/int8-out: conv_a's epilogue fuses dequant
    + bias + ELU + requant so its post-stride activation stays int8 in
    HBM; conv_b dequantizes (its output is the encoder skip feature)."""
    p = block.variables["params"]
    key = _module_key(block)
    out_dtype = block.dtype or x.dtype
    pad = (block.kernel - 1) // 2

    def eff(sub, full_key):
        if baked is not None and full_key + "::eff" in baked:
            wq, ws_, be = baked[full_key + "::eff"]
            return jnp.asarray(wq), jnp.asarray(ws_), jnp.asarray(be)
        # no BN: _conv_eff's fold_bn branch reads exactly (kernel, bias)
        return _conv_eff(p[sub], {}, "Conv_0", None, fold_bn=True)

    key_a, key_b = _downsample_chain_keys(block)
    xq, s_in = _quantize_fp(x, ranges[key_a])
    wq, ws, b = eff("conv_a", key_a)
    xq, s_in = _requant(_conv_q(xq, wq, 2, pad), s_in * ws, b,
                        ranges[key_b], act="elu")
    wq, ws, b = eff("conv_b", key_b)
    y = jax.nn.elu(
        _conv_q(xq, wq, 1, pad).astype(jnp.float32) * (s_in * ws) + b)
    return y.astype(out_dtype)


# ---------------------------------------------------------------------------
# s8-through decoder chain (round 5)
#
# With the fused decoder, the per-stage int8 path still hands activations
# between decoder stages as fp in HBM: upconv{i}_0's epilogue dequantizes
# + ELUs + writes bf16, then upconv{i}_1 reads that bf16 back only to
# requantize it to int8 (and again between upconv{i}_1 and upconv{i-1}_0).
# The chain below requantizes INSIDE each stage's epilogue instead —
# dequant + bias + ELU + requant fuse into the conv (all elementwise, the
# same pattern the round-3 encoder chains proved writes int8 to HBM) — so
# decoder activations cross HBM as int8. The handoff rides ``_QAct``
# (int8 tensor + its scale) through the model code between stages; every
# consumer in the fused DispResNet decoder is itself intercepted
# (upconv{i}_0 -> upconv{i}_1 -> upconv{i-1}_0, disp heads), and any
# unanticipated consumer dequantizes via ``astype``/``__jax_array__``
# rather than failing. Requant targets reuse the NEXT conv's calibrated
# input range — it is literally the same tensor — so existing
# calibrations activate the chain with no new keys. The final full-res
# stage (upconv0_1) has no next conv and returns fp for the disp head.
#
# Scoped to DispResNet's fused decoder: there the ELU lives inside the
# intercepted parents (_ConvELU3 / _FusedUpConvELU3). DispVggBN applies
# ELU inline in model code (models/disp_vgg_bn.py::up_block), so it keeps
# the per-stage fused path (safe fallback, measured +41% in round 4).
# ---------------------------------------------------------------------------

_DEC_NAME = re.compile(r"upconv(\d+)_([01])")


class _QAct:
    """int8 activation + its symmetric scale + the fp dtype it replaced,
    threaded between decoder stages by the s8-through chain. Quacks
    enough like an array for the model code between stages
    (``.shape``/``.dtype``/``.astype``); anything else dequantizes via
    ``__jax_array__`` instead of failing."""

    __slots__ = ("q", "scale", "fp_dtype")

    def __init__(self, q, scale, fp_dtype):
        self.q = q
        self.scale = scale
        self.fp_dtype = fp_dtype

    @property
    def shape(self):
        return self.q.shape

    @property
    def dtype(self):
        return self.fp_dtype

    def dequant(self, dt=None):
        return (self.q.astype(jnp.float32) * self.scale).astype(
            dt if dt is not None else self.fp_dtype)

    def astype(self, dt):
        return self.dequant(dt)

    def __jax_array__(self):
        return self.dequant()


def _decoder_chain_keys() -> list[str]:
    """Calibration keys the DispResNet decoder chain needs (all already
    produced by any fused-model calibration — per-conv keys for
    upconv{i}_0, fused h/skip keys for upconv{i}_1)."""
    keys = []
    for i in range(5):
        keys += [f"upconv{i}_0/Conv_0", f"upconv{i}_1/Conv_0"]
        if i > 0:
            keys.append(f"upconv{i}_1/Conv_0::skip")
    return keys


def _decoder_chain_ready(model, ranges) -> bool:
    """Engage only for a top-level fused DispResNet whose calibration
    carries every key (nested/renamed modules fall back per-stage)."""
    if not getattr(model, "fused_upsample", False):
        return False
    if type(model).__name__ != "DispResNet":
        return False
    return all(k in ranges for k in _decoder_chain_keys())


def _int8_chain_dec_conv(module, x, ranges, out_range, baked=None):
    """upconv{i}_0 (conv3x3 + ELU) with the s8 epilogue: dequant + bias +
    ELU + requant-to-next-stage-range fuse into the conv, so the fp
    activation never exists in HBM. Input is the previous stage's
    ``_QAct`` (or fp for the first stage, quantized with this conv's own
    calibrated range — identical grid to the per-conv path)."""
    key = _module_key(module)("Conv_0")
    if baked is not None and key in baked:
        # bake_int8_weights' per-conv entry (wq, w_scale, bias) is the
        # identical grid _conv_eff(fold_bn=True) computes — reuse it so a
        # baked export never reads the decoder's fp32 kernels either
        wq, ws, b = (jnp.asarray(a) for a in baked[key])
    else:
        wq, ws, b = _conv_eff(module.variables["params"], {}, "Conv_0",
                              None, fold_bn=True)
    if isinstance(x, _QAct):
        xq, s_in, dt = x.q, x.scale, x.fp_dtype
    else:
        xq, s_in = _quantize_fp(x, ranges[key])
        dt = x.dtype
    yq, s_o = _requant(_conv_q(xq, wq, 1, 1), s_in * ws, b, out_range,
                       act="elu")
    return _QAct(yq, s_o, dt)


def _int8_chain_dec_fused(module, h, skip, ranges, next_range):
    """upconv{i}_1 (fused upsample-conv + skip conv + ELU): the composed
    6x6 lhs-dilated conv consumes the already-int8 ``h`` directly
    (``_int8_fused_upconv``'s chained form — no fp copy of ``h`` is ever
    read), then ELU + requant to the next stage's range in the epilogue.
    The final full-res stage (``next_range is None``) returns fp for the
    disparity head."""
    y = _int8_fused_upconv(
        None, None, skip, ranges, hq=h.q, h_scale=h.scale,
        path=_module_key(module)("Conv_0"),
        params=module.variables["params"]["Conv_0"])
    y = jax.nn.elu(y)
    if next_range is None:
        return y.astype(h.fp_dtype)
    s_o = jnp.float32(next_range / 127.0)
    yq = jnp.clip(jnp.round(y / s_o), -127.0, 127.0).astype(jnp.int8)
    return _QAct(yq, s_o, h.fp_dtype)


def _bf16_disp_head(module, x):
    """DispHead serving epilogue for the quantized path: the training-time
    head casts its INPUT to fp32 (models/common.py::DispHead), which at
    full resolution materializes ~0.9 GB/step of fp32 activations. For
    serving, run the 3x3 conv in bf16 (input stays bf16) and keep only the
    1-channel sigmoid/scale math in fp32 — the quality cost is inside the
    int8 noise floor (quant_bench rel-err table). Under the s8-through
    decoder chain the input arrives as ``_QAct``; the dequant is
    elementwise and feeds the conv's bf16 input directly."""
    if isinstance(x, _QAct):
        x = x.dequant(jnp.bfloat16)
    p = module.variables["params"]["Conv_0"]
    w = p["kernel"].astype(jnp.bfloat16)
    xb = x.astype(jnp.bfloat16)
    out = lax.conv_general_dilated(
        xb, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=_dn(xb.shape, w.shape),
    ).astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return module.alpha * jax.nn.sigmoid(out) + module.beta


# ---------------------------------------------------------------------------
# int8 weight baking for export (round 3)
#
# ``quantized_apply`` quantizes weights at TRACE time from the fp32
# params, so an exported StableHLO artifact embeds the fp32 kernels as
# constants (full-size artifact; quantization folds at serving-compile
# time). ``bake_int8_weights`` pre-computes every quantized kernel +
# scale once, and ``quantized_apply(..., baked=...)`` consumes them
# instead of reading the fp32 params — the trace never touches the fp32
# kernels, so the artifact stores int8 constants (~4x smaller on conv
# weights) and the serving math is unchanged (same wq/scale values).
# ---------------------------------------------------------------------------


def _np_quant_kernel(kernel):
    import numpy as np

    kernel = np.asarray(kernel, np.float32)
    w_scale = (np.maximum(np.abs(kernel).max((0, 1, 2)), 1e-12)
               / 127.0).astype(np.float32)
    wq = np.round(kernel / w_scale).astype(np.int8)
    return wq, w_scale


def _np_conv_eff(p, s, conv_name, bn_name, fold_bn):
    """numpy twin of ``_conv_eff`` (the bake pass runs under eval_shape,
    where jnp ops would trace — numpy keeps it concrete)."""
    import numpy as np

    W = np.asarray(p[conv_name]["kernel"], np.float32)
    if fold_bn:
        beff = (np.asarray(p[conv_name]["bias"], np.float32)
                if "bias" in p[conv_name] else np.zeros((W.shape[-1],),
                                                        np.float32))
    else:
        bn_p, bn_s = p[bn_name], s[bn_name]
        a = (np.asarray(bn_p["scale"], np.float32)
             / np.sqrt(np.asarray(bn_s["var"], np.float32) + 1e-5))
        beff = (np.asarray(bn_p["bias"], np.float32)
                - a * np.asarray(bn_s["mean"], np.float32))
        W = W * a
    wq, w_scale = _np_quant_kernel(W)
    return wq, w_scale, beff


def bake_int8_weights(
    model,
    variables,
    ranges: dict[str, float],
    exempt: Callable[[nn.Module], bool] | None = None,
) -> dict:
    """Pre-quantize every weight ``quantized_apply`` would quantize.

    Returns a dict the ``baked=`` argument of :func:`quantized_apply`
    consumes: ``{conv_path: (wq, w_scale, bias|None)}`` for per-conv
    int8, plus ``{conv_path + "::eff": (wq, w_scale, beff)}`` for the
    BN-folded int8-through encoder chain. Runs under ``jax.eval_shape``
    (zero device compute — safe on a disconnected backend)."""
    import numpy as np

    from supervised_dispnet_tpu.models.common import apply_model, DownsampleConv
    from supervised_dispnet_tpu.models.disp_vgg_bn import _VGGStage
    from supervised_dispnet_tpu.models.resnet import ResNetEncoder

    baked: dict = {}

    def rec(next_fun, fargs, fkwargs, context):
        m = context.module
        if (type(m) is _VGGStage and context.method_name == "__call__"
                and exempt is None
                and all(k in ranges for k in _vgg_stage_chain_keys(m))):
            key = _module_key(m)
            p = m.variables["params"]
            s = m.variables.get("batch_stats", {})
            for i in range(len(m.widths)):
                baked[key(f"conv{i}") + "::eff"] = _np_conv_eff(
                    p, s, f"conv{i}", f"bn{i}", False)
        if (type(m) is DownsampleConv and context.method_name == "__call__"
                and exempt is None
                and all(k in ranges for k in _downsample_chain_keys(m))):
            key = _module_key(m)
            p = m.variables["params"]
            for sub in ("conv_a", "conv_b"):
                baked[key(sub, "Conv_0") + "::eff"] = _np_conv_eff(
                    p[sub], {}, "Conv_0", None, True)
        if (type(m) is ResNetEncoder and context.method_name == "__call__"
                and exempt is None
                and all(k in ranges for k in _encoder_chain_keys(m))):
            base = "/".join(m.path)
            key = lambda *n: "/".join(((base,) if base else ()) + n)  # noqa: E731
            p = m.variables["params"]
            s = m.variables.get("batch_stats", {})
            blocks, bottleneck = _encoder_plan(m)
            baked[key("conv1") + "::eff"] = _np_conv_eff(
                p, s, "conv1", "bn1", m.fold_bn)
            for name, _, _, _ in blocks:
                bp, bs = p[name], s.get(name, {})
                convs = [("conv1", "bn1"), ("conv2", "bn2")]
                if bottleneck:
                    convs.append(("conv3", "bn3"))
                if "downsample_conv" in bp:
                    convs.append(("downsample_conv", "downsample_bn"))
                for conv_name, bn_name in convs:
                    baked[key(name, conv_name) + "::eff"] = _np_conv_eff(
                        bp, bs, conv_name, bn_name, m.fold_bn)
        elif _is_quantizable(m, context.method_name, exempt):
            pth = _conv_path(m)
            if pth in ranges and pth not in baked:
                params = m.variables["params"]
                wq, w_scale = _np_quant_kernel(params["kernel"])
                bias = (np.asarray(params["bias"], np.float32)
                        if m.use_bias else None)
                baked[pth] = (wq, w_scale, bias)
        return next_fun(*fargs, **fkwargs)

    def fwd(x):
        with nn.intercept_methods(rec):
            return apply_model(model, variables, x)

    jax.eval_shape(fwd, jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32))
    return baked


# ---------------------------------------------------------------------------
# Quantization-aware training (round 3)
#
# PTQ on trained weights costs +0.0041 abs_rel even with percentile
# calibration (BASELINE.md round-3 table) because training never sees the
# quantization noise. QAT closes that by training THROUGH it: every
# quantizable conv runs a quantize-dequantize (QDQ) of its input
# (per-tensor dynamic absmax — the int8 grid the serving path will impose)
# and kernel (per-output-channel absmax, same scheme ``_int8_conv``
# serves), with the straight-through estimator (STE) passing gradients
# through the rounding. Arithmetic stays fp (training speed is NOT the
# goal — the step is conv-bound and bf16-neutral per BASELINE.md round-3
# probes); the payoff is weights that are robust to the serving-time int8
# grid. The reference has no quantized path at all (SURVEY §2.1).
# ---------------------------------------------------------------------------


def _qdq_ste(x: jax.Array, scale: jax.Array) -> jax.Array:
    """Symmetric int8 quantize-dequantize with a straight-through
    gradient: forward = round(clip(x/s)) * s, backward = identity."""
    q = jnp.clip(jnp.round(x / scale), -127.0, 127.0) * scale
    return x + lax.stop_gradient(q - x)


def _fake_quant_conv(module: nn.Conv, x: jax.Array) -> jax.Array:
    """``nn.Conv.__call__`` with QDQ on input + kernel (the exact scales
    the serving path would use on this step's tensors); fp32 conv."""
    params = module.variables["params"]
    kernel = params["kernel"].astype(jnp.float32)
    w_scale = jnp.maximum(
        jnp.max(jnp.abs(lax.stop_gradient(kernel)), axis=(0, 1, 2)),
        1e-12) / 127.0
    wq = _qdq_ste(kernel, w_scale)
    xf = x.astype(jnp.float32)
    in_scale = jnp.maximum(
        jnp.max(jnp.abs(lax.stop_gradient(xf))), 1e-12) / 127.0
    xq = _qdq_ste(xf, in_scale)
    dn = lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    out = lax.conv_general_dilated(
        xq, wq,
        window_strides=_canon_strides(module.strides, module.kernel_size),
        padding=_canon_padding(module.padding, module.kernel_size),
        lhs_dilation=_canon_dilation(module.input_dilation,
                                     module.kernel_size),
        rhs_dilation=_canon_dilation(module.kernel_dilation,
                                     module.kernel_size),
        dimension_numbers=dn,
    )
    if module.use_bias:
        out = out + params["bias"].astype(jnp.float32)
    return out.astype(x.dtype)


def _fake_quant_fused_upconv(module, h, skip) -> jax.Array:
    """``_FusedUpConvParams.__call__`` with the QDQ noise the int8 serving
    path (:func:`_int8_fused_upconv`) injects: the COMPOSED 6x6 kernel is
    quantize-dequantized per-output-channel (compose first, then quantize
    — finer than quantizing the 3x3), ``h`` and ``skip`` get SEPARATE
    per-tensor scales, and the 1-px border corrections stay fp on the
    QDQ'd input — exactly the serving arithmetic, so a `--qat
    --fused-upsample` checkpoint trains against the grid it will serve
    on. Straight-through gradients throughout."""
    from supervised_dispnet_tpu.ops.fused_upconv import (
        compose_upsample_kernel, upconv2x_fused)

    params = module.variables["params"]
    kernel = params["kernel"].astype(jnp.float32)
    bias = params["bias"].astype(jnp.float32)
    ch = h.shape[-1]
    kh, ks = kernel[:, :, :ch], kernel[:, :, ch:]

    kc = compose_upsample_kernel(kh)
    wc_scale = jnp.maximum(
        jnp.max(jnp.abs(lax.stop_gradient(kc)), axis=(0, 1, 2)),
        1e-12) / 127.0
    kcq = _qdq_ste(kc, wc_scale)
    hf = h.astype(jnp.float32)
    in_scale = jnp.maximum(
        jnp.max(jnp.abs(lax.stop_gradient(hf))), 1e-12) / 127.0
    hq = _qdq_ste(hf, in_scale)
    y = upconv2x_fused(hq, kh, composed_kernel=kcq)

    if skip is not None:
        sf = skip.astype(jnp.float32)
        ws_scale = jnp.maximum(
            jnp.max(jnp.abs(lax.stop_gradient(ks)), axis=(0, 1, 2)),
            1e-12) / 127.0
        ksq = _qdq_ste(ks, ws_scale)
        s_scale = jnp.maximum(
            jnp.max(jnp.abs(lax.stop_gradient(sf))), 1e-12) / 127.0
        sq = _qdq_ste(sf, s_scale)
        y = y + lax.conv_general_dilated(
            sq, ksq, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=lax.conv_dimension_numbers(
                sq.shape, ksq.shape, ("NHWC", "HWIO", "NHWC")))
    return (y + bias).astype(h.dtype)


def fake_quant_methods(exempt: Callable[[nn.Module], bool] | None = None):
    """Context manager for QAT forwards: inside it, every quantizable
    ``nn.Conv`` (same predicate the serving path uses — disparity heads
    and grouped convs stay fp; dilated convs ARE in scope) runs
    fake-quantized, and fused decoder stages
    (``models/dispresnet._FusedUpConvParams``) run the serving int8
    arithmetic's QDQ mirror. Wrap the model apply of a train step::

        with fake_quant_methods():
            out, new_bs = model.apply(...)

    Fresh context per call (flax interceptors are not reentrant)."""
    def fq(next_fun, fargs, fkwargs, context):
        if _is_quantizable(context.module, context.method_name, exempt):
            return _fake_quant_conv(context.module, fargs[0])
        if (_is_fused_upconv(context.module, context.method_name)
                and (exempt is None or not exempt(context.module))):
            skip = fargs[1] if len(fargs) > 1 else fkwargs.get("skip")
            return _fake_quant_fused_upconv(context.module, fargs[0], skip)
        return next_fun(*fargs, **fkwargs)

    return nn.intercept_methods(fq)


def quantized_apply(
    model,
    variables,
    *args,
    ranges: dict[str, float],
    exempt: Callable[[nn.Module], bool] | None = None,
    baked: dict | None = None,
):
    """Eval-mode forward with every calibrated conv running int8.

    Jittable: wrap in ``jax.jit(lambda v, x: quantized_apply(model, v, x,
    ranges=ranges))``. Convs without a calibration entry (or exempt) run
    in the original precision. When no ``exempt`` predicate is given,
    the encoder blocks run as fused int8-in/int8-out chains instead of
    per-conv interception: ResNet encoders need the round-3 block-output
    calibration keys (``::out``); VGG stages and DispNetS DownsampleConv
    blocks chain off per-conv keys alone. A fused-decoder DispResNet
    additionally runs the round-5 s8-through decoder chain (activations
    cross HBM as int8 between decoder stages; no extra keys). Passing
    any ``exempt`` predicate (even ``lambda m: False``) forces the
    per-conv/per-stage path.
    ``baked`` (from :func:`bake_int8_weights`) supplies pre-quantized
    weights so a traced export never reads the fp32 kernels.
    """
    from supervised_dispnet_tpu.models.common import DispHead, DownsampleConv
    from supervised_dispnet_tpu.models.disp_vgg_bn import _VGGStage
    from supervised_dispnet_tpu.models.dispresnet import (
        _ConvELU3, _FusedUpConvELU3)
    from supervised_dispnet_tpu.models.resnet import ResNetEncoder

    # DISPNET_TPU_DEC_CHAIN=0 disables ONLY the decoder chain (keeps the
    # encoder chains + per-stage fused path) — the A/B isolation knob for
    # benchmarks; read at trace time like DISPNET_TPU_PS_FORM
    dec_chain = (exempt is None
                 and os.environ.get("DISPNET_TPU_DEC_CHAIN", "1") != "0"
                 and _decoder_chain_ready(model, ranges))

    def q_interceptor(next_fun, fargs, fkwargs, context):
        train = fkwargs.get("train", fargs[1] if len(fargs) > 1 else False)
        if dec_chain and context.method_name == "__call__":
            mod = context.module
            m = (_DEC_NAME.fullmatch(mod.path[-1]) if mod.path else None)
            if m is not None and type(mod) is _ConvELU3 and m.group(2) == "0":
                i = int(m.group(1))
                return _int8_chain_dec_conv(
                    mod, fargs[0], ranges,
                    out_range=ranges[f"upconv{i}_1/Conv_0"], baked=baked)
            if m is not None and type(mod) is _FusedUpConvELU3:
                i = int(m.group(1))
                skip = fargs[1] if len(fargs) > 1 else fkwargs.get("skip")
                nxt = (ranges[f"upconv{i - 1}_0/Conv_0"] if i > 0 else None)
                return _int8_chain_dec_fused(mod, fargs[0], skip, ranges, nxt)
        if (type(context.module) is ResNetEncoder
                and context.method_name == "__call__"
                and exempt is None
                and not train
                and all(k in ranges
                        for k in _encoder_chain_keys(context.module))):
            return _int8_chain_encoder(context.module, fargs[0], ranges,
                                       baked=baked)
        if (type(context.module) is _VGGStage
                and context.method_name == "__call__"
                and exempt is None
                and not train
                and all(k in ranges
                        for k in _vgg_stage_chain_keys(context.module))):
            return _int8_chain_vgg_stage(context.module, fargs[0], ranges,
                                         baked=baked)
        if (type(context.module) is DownsampleConv
                and context.method_name == "__call__"
                and exempt is None
                and all(k in ranges
                        for k in _downsample_chain_keys(context.module))):
            return _int8_chain_downsample(context.module, fargs[0], ranges,
                                          baked=baked)
        if (type(context.module) is DispHead
                and context.method_name == "__call__" and exempt is None
                and ranges):  # empty ranges = identity contract
            return _bf16_disp_head(context.module, fargs[0])
        if _is_quantizable(context.module, context.method_name, exempt):
            p = _conv_path(context.module)
            if p in ranges:
                entry = baked.get(p) if baked is not None else None
                return _int8_conv(context.module, fargs[0], ranges[p],
                                  baked_entry=entry)
        if (_is_fused_upconv(context.module, context.method_name)
                and (exempt is None or not exempt(context.module))):
            p = _conv_path(context.module)
            skip = fargs[1] if len(fargs) > 1 else fkwargs.get("skip")
            if p in ranges and (skip is None or p + "::skip" in ranges):
                return _int8_fused_upconv(context.module, fargs[0], skip,
                                          ranges)
        return next_fun(*fargs, **fkwargs)

    with nn.intercept_methods(q_interceptor):
        return apply_model(model, variables, *args)
