"""DispResNet — ResNet-18/50 encoder + upsample-conv decoder with
skip-concat and multi-scale disparity heads, plus the depth-as-
classification head variant.

Rebuild of the reference's best-performing family (reference:
``models/DispResNet.py`` / ``models/Disp_res.py``): encoder features at
strides 2..32, decoder stages that (conv+ELU -> 2x upsample -> skip concat
-> conv+ELU), disparity heads at 1/1, 1/2, 1/4, 1/8 scale. The
classification variant replaces the sigmoid disparity heads with per-pixel
bin-logit heads decoded by softmax-weighted sum (WACV 2020 paper config).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from supervised_dispnet_tpu.models.common import DispHead, xavier_uniform
from supervised_dispnet_tpu.models.resnet import ResNetEncoder
from supervised_dispnet_tpu.ops.fused_upconv import upconv2x_fused
from supervised_dispnet_tpu.ops.resize import resize_bilinear

DEC_PLANES = (16, 32, 64, 128, 256)


class _ConvELU3(nn.Module):
    features: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), padding=1, kernel_init=xavier_uniform,
                    dtype=self.dtype)(x)
        return nn.elu(x)


class _FusedUpConvParams(nn.Module):
    """Parameter-compatible stand-in for the ``nn.Conv`` inside a decoder
    stage's post-upsample conv: declares the SAME ``kernel``/``bias``
    (named ``Conv_0`` by the parent), but consumes the HALF-res ``h``
    (+ optional skip) directly — upsample composed into the conv via
    ``ops.fused_upconv.upconv2x_fused``, so the (B, 2H, 2W, C) resize
    output never materializes in HBM."""

    features: int
    in_features: int  # h channels + skip channels (the concat width)
    dtype: object = None

    @nn.compact
    def __call__(self, h, skip=None):
        kernel = self.param("kernel", xavier_uniform,
                            (3, 3, self.in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ch = h.shape[-1]
        cdt = self.dtype or jnp.result_type(h.dtype, kernel.dtype)
        k = kernel.astype(cdt)
        y = upconv2x_fused(h.astype(cdt), k[:, :, :ch])
        if skip is not None:
            if skip.shape[1:3] != (2 * h.shape[1], 2 * h.shape[2]):
                raise ValueError(
                    "fused_upsample needs exact 2x stage geometry "
                    f"(input dims divisible by 32); got h {h.shape} "
                    f"vs skip {skip.shape}")
            y = y + jax.lax.conv_general_dilated(
                skip.astype(cdt), k[:, :, ch:], (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(cdt)


class _FusedUpConvELU3(nn.Module):
    """Fused replacement for (resize 2x -> concat skip -> _ConvELU3): the
    child is named ``Conv_0`` so the param tree is identical to the
    unfused stage — every checkpoint/converter works on both paths."""

    features: int
    in_features: int
    dtype: object = None

    @nn.compact
    def __call__(self, h, skip=None):
        y = _FusedUpConvParams(self.features, self.in_features,
                               dtype=self.dtype, name="Conv_0")(h, skip)
        return nn.elu(y)


class DispResNet(nn.Module):
    """__call__(x, train) ->
      head='disp':  [disp1, disp2, disp3, disp4] finest first.
      head='classification': (B, H, W, num_bins) logits at full resolution
        (decode with losses.classification.logits_to_depth).
    """

    encoder_depth: int = 18
    head: str = "disp"  # 'disp' | 'classification'
    num_bins: int = 64
    multiscale_classification: bool = False  # bin logits at all 4 decoder
    #   scales (like the disp heads; reference classification variant
    #   supervises per-scale — SURVEY §2.2)
    dtype: object = None  # compute dtype (e.g. jnp.bfloat16); params fp32
    remat: bool = False  # checkpoint encoder blocks (memory for FLOPs)
    fold_bn: bool = False  # serving: BN absorbed into conv weights
    fused_upsample: bool = False  # decoder (resize 2x -> conv) as ONE
    #   lhs-dilated conv (exact; ops/fused_upconv.py) — kills the
    #   materialized full-res resize intermediates; same param tree

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        enc = ResNetEncoder(self.encoder_depth, dtype=self.dtype,
                            remat=self.remat, fold_bn=self.fold_bn,
                            name="encoder")(x, train=train)
        # enc: strides [2, 4, 8, 16, 32]

        outputs_feats = {}
        h = enc[-1]
        for i in range(4, -1, -1):
            h = _ConvELU3(DEC_PLANES[i], dtype=self.dtype, name=f"upconv{i}_0")(h)
            skip = enc[i - 1] if i > 0 else None
            if self.fused_upsample:
                # (resize -> concat -> conv) as one lhs-dilated conv + a
                # skip conv, summed pre-bias — exact (tests/test_dispresnet
                # fused parity); identical param tree
                h = _FusedUpConvELU3(
                    DEC_PLANES[i],
                    h.shape[-1] + (skip.shape[-1] if skip is not None else 0),
                    dtype=self.dtype, name=f"upconv{i}_1")(h, skip)
            else:
                # upsample 2x (bilinear; the reference decoder upsamples
                # with interpolate)
                if skip is not None:
                    h = resize_bilinear(h, skip.shape[1], skip.shape[2])
                    h = jnp.concatenate([h, skip], axis=-1)
                else:
                    h = resize_bilinear(h, x.shape[1], x.shape[2])
                h = _ConvELU3(DEC_PLANES[i], dtype=self.dtype,
                              name=f"upconv{i}_1")(h)
            outputs_feats[i] = h

        if self.head == "classification":
            def bin_head(s: int) -> jax.Array:
                # s=0 keeps the name 'bin_head' so single-scale checkpoints
                # and converters stay compatible
                name = "bin_head" if s == 0 else f"bin_head{s}"
                return nn.Conv(
                    self.num_bins, (3, 3), padding=1,
                    kernel_init=xavier_uniform, dtype=jnp.float32, name=name,
                )(outputs_feats[s].astype(jnp.float32))

            if self.multiscale_classification:
                return [bin_head(s) for s in range(4)]
            return bin_head(0)

        disps = []
        for s in range(4):  # scales 1/1, 1/2, 1/4, 1/8
            disps.append(DispHead(name=f"disp_head{s}")(outputs_feats[s]))
        return disps
