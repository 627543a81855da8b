"""DispNetS — conv+ELU encoder-decoder with skip-concat and 4 multi-scale
sigmoid-scaled disparity heads.

TPU-native rebuild of the reference architecture (reference:
``models/DispNetS.py::DispNetS``): 7-stage encoder (32..512 channels,
kernels 7/5/3...), transposed-conv decoder, skip concatenation, and
disparity predicted at 1/1, 1/2, 1/4, 1/8 scale; coarser disparities are
upsampled and fed into the next decoder stage.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from supervised_dispnet_tpu.models.common import (
    ConvELU,
    DownsampleConv,
    UpConvELU,
    DispHead,
    crop_like,
    remat_wrap,
)
from supervised_dispnet_tpu.ops.resize import resize_bilinear

ENC_PLANES = (32, 64, 128, 256, 512, 512, 512)
DEC_PLANES = (512, 512, 256, 128, 64, 32, 16)
ENC_KERNELS = (7, 5, 3, 3, 3, 3, 3)


class DispNetS(nn.Module):
    """Returns [disp1, disp2, disp3, disp4] (finest first), each
    (B, H/2^s, W/2^s, 1)."""

    dtype: object = None  # compute dtype (e.g. jnp.bfloat16); params fp32
    remat: bool = False  # jax.checkpoint each conv stage: recompute the
    #   intra-stage intermediates (conv_a activations, upconv/concat
    #   buffers) in the backward pass instead of holding them in HBM —
    #   the self-sup B=64 working-set cliff is activation-bound
    #   (BASELINE.md batch sweep). Param tree is unchanged: the flag
    #   toggles freely on existing checkpoints (grad-parity tested).
    fused_upsample: bool = False  # decoder ConvTranspose stages in
    #   pixel-shuffle form (ops/fused_deconv.py) — exact to fp summation
    #   order, identical param tree; DispNetS's analog of the DispResNet
    #   fused decoder. Measured NEGATIVE on TPU (-19% e2e, BASELINE.md
    #   round 5) — kept for study, not exposed via the registry/CLI.

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        Down = remat_wrap(DownsampleConv, self.remat)
        _Up = remat_wrap(UpConvELU, self.remat)

        def Up(features, **kw):
            return _Up(features, fused=self.fused_upsample, **kw)

        IConv = remat_wrap(ConvELU, self.remat)

        # ---- encoder ----
        feats = []
        h = x
        for n, (planes, k) in enumerate(zip(ENC_PLANES, ENC_KERNELS)):
            h = Down(planes, k, dtype=self.dtype, name=f"conv{n + 1}")(h)
            feats.append(h)
        c1, c2, c3, c4, c5, c6, c7 = feats

        # ---- decoder ----
        def iconv(n, features, *parts):
            cat = jnp.concatenate(parts, axis=-1)
            return IConv(features, dtype=self.dtype, name=f"iconv{n}")(cat)

        u7 = crop_like(Up(DEC_PLANES[0], dtype=self.dtype, name="upconv7")(c7), c6)
        i7 = iconv(7, DEC_PLANES[0], u7, c6)

        u6 = crop_like(Up(DEC_PLANES[1], dtype=self.dtype, name="upconv6")(i7), c5)
        i6 = iconv(6, DEC_PLANES[1], u6, c5)

        u5 = crop_like(Up(DEC_PLANES[2], dtype=self.dtype, name="upconv5")(i6), c4)
        i5 = iconv(5, DEC_PLANES[2], u5, c4)

        u4 = crop_like(Up(DEC_PLANES[3], dtype=self.dtype, name="upconv4")(i5), c3)
        i4 = iconv(4, DEC_PLANES[3], u4, c3)
        disp4 = DispHead(name="predict_disp4")(i4)

        u3 = crop_like(Up(DEC_PLANES[4], dtype=self.dtype, name="upconv3")(i4), c2)
        d4up = crop_like(resize_bilinear(disp4, c2.shape[1], c2.shape[2]), c2)
        i3 = iconv(3, DEC_PLANES[4], u3, c2, d4up)
        disp3 = DispHead(name="predict_disp3")(i3)

        u2 = crop_like(Up(DEC_PLANES[5], dtype=self.dtype, name="upconv2")(i3), c1)
        d3up = crop_like(resize_bilinear(disp3, c1.shape[1], c1.shape[2]), c1)
        i2 = iconv(2, DEC_PLANES[5], u2, c1, d3up)
        disp2 = DispHead(name="predict_disp2")(i2)

        u1 = crop_like(Up(DEC_PLANES[6], dtype=self.dtype, name="upconv1")(i2), x)
        d2up = crop_like(resize_bilinear(disp2, x.shape[1], x.shape[2]), x)
        i1 = iconv(1, DEC_PLANES[6], u1, d2up)
        disp1 = DispHead(name="predict_disp1")(i1)

        return [disp1, disp2, disp3, disp4]
