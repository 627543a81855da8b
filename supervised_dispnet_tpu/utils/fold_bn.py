"""BatchNorm folding for inference/serving.

At eval time BatchNorm is an affine map with frozen statistics; absorbing
it into the preceding conv (W' = W * s/sqrt(v+eps), b' = beta - m*s/
sqrt(v+eps)) removes one elementwise pass per conv and shrinks the
exported-model parameter tree. Use with ``ResNetEncoder(fold_bn=True)`` /
``DispResNet(fold_bn=True)``.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np


def _fold_pair(conv: dict, bn_params: dict, bn_stats: dict, eps: float = 1e-5):
    """conv {kernel[, bias]} + bn {scale, bias} + stats {mean, var} ->
    folded conv {kernel, bias}. Kernel layout HWIO (output channel last)."""
    k = np.asarray(conv["kernel"], dtype=np.float32)
    scale = np.asarray(bn_params["scale"], dtype=np.float32)
    beta = np.asarray(bn_params["bias"], dtype=np.float32)
    mean = np.asarray(bn_stats["mean"], dtype=np.float32)
    var = np.asarray(bn_stats["var"], dtype=np.float32)
    g = scale / np.sqrt(var + eps)
    new_kernel = k * g  # broadcasts over the trailing (output) axis
    bias = np.asarray(conv.get("bias", 0.0), dtype=np.float32)
    new_bias = (bias - mean) * g + beta
    # return device arrays: numpy leaves would be re-transferred to the
    # device on every jitted call (catastrophic over a remote tunnel)
    return {"kernel": jnp.asarray(new_kernel), "bias": jnp.asarray(new_bias)}


def fold_resnet_encoder(params: dict, batch_stats: dict, eps: float = 1e-5) -> dict:
    """(params, batch_stats) of ``ResNetEncoder`` (BN variant) -> params for
    ``ResNetEncoder(fold_bn=True)``."""
    out: dict[str, Any] = {}
    out["conv1"] = _fold_pair(params["conv1"], params["bn1"],
                              batch_stats["bn1"], eps)
    for name, blk in params.items():
        if not name.startswith("layer"):
            continue
        stats = batch_stats[name]
        folded: dict[str, Any] = {}
        for c in ("conv1", "conv2", "conv3"):
            if c in blk:
                bn = "bn" + c[-1]
                folded[c] = _fold_pair(blk[c], blk[bn], stats[bn], eps)
        if "downsample_conv" in blk:
            folded["downsample_conv"] = _fold_pair(
                blk["downsample_conv"], blk["downsample_bn"],
                stats["downsample_bn"], eps)
        out[name] = folded
    return out


def fold_dispresnet(params: dict, batch_stats: dict, eps: float = 1e-5) -> dict:
    """DispResNet (params, batch_stats) -> params for
    ``DispResNet(fold_bn=True)`` (decoder is BN-free and passes through)."""
    out = dict(params)
    out["encoder"] = fold_resnet_encoder(params["encoder"],
                                         batch_stats["encoder"], eps)
    return out
