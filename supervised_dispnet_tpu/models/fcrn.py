"""FCRN — Laina-style fully convolutional residual network for depth.

Rebuild of the reference's FCRN variant (reference: ``models/FCRN.py``;
Laina et al. 2016): ResNet-50 encoder to stride 32, 1x1 conv to halve
channels, four up-projection blocks (residual two-branch upsample convs),
and a direct metric-depth head (ReLU, not sigmoid-disparity).

The original "up-projection" unpools with interleaved zeros then convolves
5x5. Materializing the zero-stuffed image and convolving it densely would
waste 3/4 of the MXU work on zeros; instead we express the exact same
operator as an input-dilated convolution (``lhs_dilation=2`` — the same
mechanism XLA uses for conv gradients, which TPU executes natively without
materializing zeros). Bit-level torch parity of unpool+conv is verified in
tests/test_checkpoint_convert.py, and reference checkpoints convert 1:1.
"""

from __future__ import annotations

import jax
import flax.linen as nn

from supervised_dispnet_tpu.models.common import remat_wrap, xavier_uniform
from supervised_dispnet_tpu.models.resnet import ResNetEncoder
from supervised_dispnet_tpu.ops.resize import resize_bilinear


class UpProjection(nn.Module):
    """Residual up-projection block (Laina et al. fig. 3).

    The unpool(zero-stuff)+5x5-conv of the paper is computed as one
    input-dilated conv: with y[2i]=x[i] (zeros elsewhere) and a 5x5 conv of
    padding 2, out == Conv(x, input_dilation=2, padding=((2,3),(2,3))) —
    identical math, no zero-stuffed tensor ever materialized.
    """

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
        )
        unpool_conv = lambda name: nn.Conv(
            self.features, (5, 5), padding=((2, 3), (2, 3)),
            input_dilation=(2, 2), kernel_init=xavier_uniform, name=name,
        )
        a = unpool_conv("conv_a")(x)
        a = nn.relu(norm("bn_a")(a))
        a = nn.Conv(self.features, (3, 3), padding=1, kernel_init=xavier_uniform,
                    name="conv_a2")(a)
        a = norm("bn_a2")(a)
        b = unpool_conv("conv_b")(x)
        b = norm("bn_b")(b)
        return nn.relu(a + b)


class FCRN(nn.Module):
    """__call__(x, train) -> (B, H, W, 1) metric depth (single scale)."""

    encoder_depth: int = 50
    remat: bool = False  # jax.checkpoint encoder blocks + UpProjections

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        up_cls = remat_wrap(UpProjection, self.remat, static_argnums=(2,))
        enc = ResNetEncoder(self.encoder_depth, remat=self.remat,
                            name="encoder")(x, train=train)
        h = enc[-1]  # stride 32
        ch = h.shape[-1] // 2
        h = nn.Conv(ch, (1, 1), kernel_init=xavier_uniform, name="conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn2")(h)
        for i in range(4):
            ch //= 2
            h = up_cls(ch, name=f"up{i}")(h, train)  # stride 32 -> 2
        h = nn.Conv(1, (3, 3), padding=1, kernel_init=xavier_uniform, name="conv3")(h)
        h = nn.relu(h)
        return resize_bilinear(h, x.shape[1], x.shape[2])
