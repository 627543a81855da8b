"""ResNet-18/50 feature encoders (flax, NHWC, BatchNorm).

Structure (stem / BasicBlock / Bottleneck, stage widths, strides) is
torchvision-compatible so reference checkpoints convert 1:1
(reference: DispResNet's torchvision ResNet encoder,
``models/DispResNet.py``). BN uses torch conventions (momentum 0.1 ->
flax 0.9, eps 1e-5) for conversion parity.
"""

from __future__ import annotations

from typing import Sequence

import jax
import flax.linen as nn

from supervised_dispnet_tpu.models.common import remat_wrap

kaiming_normal = nn.initializers.kaiming_normal()


def _make_norm(fold_bn, train, dtype):
    """BatchNorm, or identity when running with folded (absorbed) BN."""
    if fold_bn:
        return lambda name: (lambda h: h)
    return lambda name: nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5,
        dtype=dtype, name=name,
    )


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: object = None
    fold_bn: bool = False  # inference: BN absorbed into conv weights/bias

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = _make_norm(self.fold_bn, train, self.dtype)
        identity = x
        h = nn.Conv(self.features, (3, 3), (self.stride, self.stride), padding=1,
                    use_bias=self.fold_bn, kernel_init=kaiming_normal, dtype=self.dtype, name="conv1")(x)
        h = norm("bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, use_bias=self.fold_bn,
                    kernel_init=kaiming_normal, dtype=self.dtype, name="conv2")(h)
        h = norm("bn2")(h)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1), (self.stride, self.stride),
                               use_bias=self.fold_bn, kernel_init=kaiming_normal,
                               dtype=self.dtype, name="downsample_conv")(x)
            identity = norm("downsample_bn")(identity)
        return nn.relu(h + identity)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is features * 4
    stride: int = 1
    expansion: int = 4
    dtype: object = None
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = _make_norm(self.fold_bn, train, self.dtype)
        out_ch = self.features * self.expansion
        identity = x
        h = nn.Conv(self.features, (1, 1), use_bias=self.fold_bn,
                    kernel_init=kaiming_normal, dtype=self.dtype, name="conv1")(x)
        h = nn.relu(norm("bn1")(h))
        h = nn.Conv(self.features, (3, 3), (self.stride, self.stride), padding=1,
                    use_bias=self.fold_bn, kernel_init=kaiming_normal,
                    dtype=self.dtype, name="conv2")(h)
        h = nn.relu(norm("bn2")(h))
        h = nn.Conv(out_ch, (1, 1), use_bias=self.fold_bn,
                    kernel_init=kaiming_normal, dtype=self.dtype, name="conv3")(h)
        h = norm("bn3")(h)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = nn.Conv(out_ch, (1, 1), (self.stride, self.stride),
                               use_bias=self.fold_bn, kernel_init=kaiming_normal,
                               dtype=self.dtype, name="downsample_conv")(x)
            identity = norm("downsample_bn")(identity)
        return nn.relu(h + identity)


RESNET_SPECS = {
    18: (BasicBlock, (2, 2, 2, 2), (64, 64, 128, 256, 512)),
    34: (BasicBlock, (3, 4, 6, 3), (64, 64, 128, 256, 512)),
    50: (Bottleneck, (3, 4, 6, 3), (64, 256, 512, 1024, 2048)),
}


class ResNetEncoder(nn.Module):
    """Returns 5 feature maps at strides 2, 4, 8, 16, 32 (finest first)."""

    depth: int = 18
    dtype: object = None
    remat: bool | str = False  # jax.checkpoint each block: True/'full'
    #   recomputes everything (FLOPs for HBM); 'conv' saves conv outputs
    #   and recomputes only the elementwise tail (HBM for ~free FLOPs)
    fold_bn: bool = False  # inference: BN absorbed (see utils/fold_bn.py)

    @property
    def feature_channels(self) -> Sequence[int]:
        return RESNET_SPECS[self.depth][2]

    @nn.compact
    def __call__(self, x, train: bool = False) -> list[jax.Array]:
        block_cls, stage_sizes, _ = RESNET_SPECS[self.depth]
        block_cls = remat_wrap(block_cls, self.remat, static_argnums=(2,))
        feats = []
        h = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=self.fold_bn,
                    kernel_init=kaiming_normal, dtype=self.dtype, name="conv1")(x)
        h = _make_norm(self.fold_bn, train, self.dtype)("bn1")(h)
        h = nn.relu(h)
        feats.append(h)  # 1/2
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        widths = (64, 128, 256, 512)
        for stage, (n_blocks, width) in enumerate(zip(stage_sizes, widths)):
            for b in range(n_blocks):
                stride = 2 if (b == 0 and stage > 0) else 1
                h = block_cls(width, stride, dtype=self.dtype,
                              fold_bn=self.fold_bn,
                              name=f"layer{stage + 1}_{b}")(h, train)
            feats.append(h)  # 1/4, 1/8, 1/16, 1/32
        return feats
