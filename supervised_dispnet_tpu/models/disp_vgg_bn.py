"""VGG16-BN disparity network — the paper's encoder ablation variant.

Rebuild of the reference's VGG variant (reference: ``models/disp_vgg_BN.py``):
VGG16-BN convolutional encoder (torchvision-compatible stage widths so
checkpoints convert), DispNet-style decoder with skip-concat and 4
multi-scale disparity heads.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from supervised_dispnet_tpu.models.common import DispHead, remat_wrap, xavier_uniform
from supervised_dispnet_tpu.models.dispresnet import _FusedUpConvParams
from supervised_dispnet_tpu.ops.resize import resize_bilinear

# VGG16: conv widths per stage (two or three 3x3 convs then 2x2 maxpool)
VGG16_STAGES = ((64, 64), (128, 128), (256, 256, 256), (512, 512, 512), (512, 512, 512))
DEC_PLANES = (16, 32, 64, 128, 256)


class _VGGStage(nn.Module):
    widths: tuple
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, w in enumerate(self.widths):
            x = nn.Conv(w, (3, 3), padding=1, kernel_init=xavier_uniform,
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class DispVggBN(nn.Module):
    """__call__(x, train) -> [disp1..disp4] finest first."""

    dtype: object = None  # compute dtype (e.g. jnp.bfloat16); params fp32
    remat: bool = False  # jax.checkpoint each VGG stage (the full-res
    #   64-ch conv+BN pre-activations dominate the working set)
    fused_upsample: bool = False  # decoder (resize 2x -> concat -> conv)
    #   as ONE lhs-dilated conv + a skip conv summed pre-bias (exact;
    #   ops/fused_upconv.py, same module as the DispResNet fused decoder
    #   so the int8 path engages) — the full-res resize intermediates
    #   never hit HBM; identical param tree to the unfused decoder

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        stage_cls = remat_wrap(_VGGStage, self.remat, static_argnums=(2,))
        feats = []
        h = x
        for s, widths in enumerate(VGG16_STAGES):
            h = stage_cls(widths, dtype=self.dtype, name=f"stage{s}")(h, train)
            feats.append(h)  # strides 1, 2, 4, 8, 16 (pre-pool)
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
        # bottleneck at stride 32
        bottleneck = h

        def up_block(h, skip, planes, name):
            h = nn.Conv(planes, (3, 3), padding=1, kernel_init=xavier_uniform,
                        dtype=self.dtype, name=f"{name}_0")(h)
            h = nn.elu(h)
            if self.fused_upsample:
                # (resize 2x -> concat skip -> conv) as one lhs-dilated
                # conv + a skip conv, summed pre-bias — exact
                # reparametrization of the same weights; the (B, 2H, 2W, C)
                # resize output never materializes (ops/fused_upconv.py)
                h = _FusedUpConvParams(planes, h.shape[-1] + skip.shape[-1],
                                       dtype=self.dtype, name=f"{name}_1")(h, skip)
            else:
                h = resize_bilinear(h, skip.shape[1], skip.shape[2])
                h = jnp.concatenate([h, skip], axis=-1)
                h = nn.Conv(planes, (3, 3), padding=1, dtype=self.dtype,
                            kernel_init=xavier_uniform, name=f"{name}_1")(h)
            return nn.elu(h)

        h = up_block(bottleneck, feats[4], DEC_PLANES[4], "up4")
        h = up_block(h, feats[3], DEC_PLANES[3], "up3")
        d4 = h  # stride 8
        h = up_block(h, feats[2], DEC_PLANES[2], "up2")
        d3 = h  # stride 4
        h = up_block(h, feats[1], DEC_PLANES[1], "up1")
        d2 = h  # stride 2
        h = up_block(h, feats[0], DEC_PLANES[0], "up0")
        d1 = h  # full

        return [
            DispHead(name="disp_head0")(d1),
            DispHead(name="disp_head1")(d2),
            DispHead(name="disp_head2")(d3),
            DispHead(name="disp_head3")(d4),
        ]
