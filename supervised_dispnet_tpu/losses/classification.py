"""Depth-as-classification: binned-depth cross-entropy + soft decode.

Rebuild of the reference's classification head loss (reference:
``loss_functions.py`` depth-discretization CE and the soft-weighted-sum
decode used by ``test_disp.py``; per the WACV 2020 paper "Towards Good
Practice for CNN-Based Monocular Depth Estimation").

Bin spacing options:
- 'linear': uniform in depth.
- 'log' (SID): uniform in log depth (DORN-style) — default.
- 'inverse': uniform in disparity (1/depth).

The per-pixel CE over num_bins is a lane-aligned softmax reduction — it
rides the VPU with the bin axis on the 128-lane dimension.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DepthBins:
    """Static depth discretization config."""

    num_bins: int = 64
    min_depth: float = 1.0
    max_depth: float = 80.0
    spacing: str = "log"  # 'linear' | 'log' | 'inverse'

    def edges(self) -> jnp.ndarray:
        """(num_bins + 1,) bin edges in depth space."""
        n = self.num_bins
        if self.spacing == "linear":
            return jnp.linspace(self.min_depth, self.max_depth, n + 1)
        if self.spacing == "log":
            return jnp.exp(
                jnp.linspace(math.log(self.min_depth), math.log(self.max_depth), n + 1)
            )
        if self.spacing == "inverse":
            inv = jnp.linspace(1.0 / self.max_depth, 1.0 / self.min_depth, n + 1)
            return (1.0 / inv)[::-1]
        raise ValueError(f"unknown spacing: {self.spacing!r}")

    def centers(self) -> jnp.ndarray:
        """(num_bins,) representative depth per bin (geometric/arithmetic mid)."""
        e = self.edges()
        if self.spacing == "log":
            return jnp.sqrt(e[:-1] * e[1:])
        return 0.5 * (e[:-1] + e[1:])

    def depth_to_index(self, depth: jax.Array) -> jax.Array:
        """Map metric depth to bin indices (clipped to range)."""
        d = jnp.clip(depth, self.min_depth, self.max_depth)
        n = self.num_bins
        if self.spacing == "linear":
            t = (d - self.min_depth) / (self.max_depth - self.min_depth)
        elif self.spacing == "log":
            t = (jnp.log(d) - math.log(self.min_depth)) / (
                math.log(self.max_depth) - math.log(self.min_depth)
            )
        else:  # inverse
            lo, hi = 1.0 / self.max_depth, 1.0 / self.min_depth
            t = 1.0 - (1.0 / d - lo) / (hi - lo)
        idx = jnp.floor(t * n).astype(jnp.int32)
        return jnp.clip(idx, 0, n - 1)


def depth_classification_loss(
    logits: jax.Array,
    gt_depth: jax.Array,
    mask: jax.Array,
    bins: DepthBins,
) -> jax.Array:
    """Masked per-pixel cross-entropy over depth bins.

    logits: (B, H, W, num_bins); gt_depth, mask: (B, H, W).
    (reference: ``loss_functions.py`` classification CE over discretized
    depth bins)
    """
    labels = bins.depth_to_index(gt_depth)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    m = mask.astype(jnp.float32)
    return (nll * m).sum() / jnp.maximum(m.sum(), 1.0)


def multiscale_classification_loss(
    logits_list: list[jax.Array],
    gt_depth: jax.Array,
    mask: jax.Array,
    bins: DepthBins,
    ce_fn=None,
    weights: tuple[float, ...] = (1.0, 0.5, 0.25, 0.125),
) -> jax.Array:
    """Per-scale bin-logit supervision (reference: the classification-head
    variant trains per-scale logits — SURVEY §2.2 DispResNet row). Each
    scale's logits are bilinearly upsampled to GT resolution before the
    masked CE (the sparse GT cannot be downsampled), mirroring
    ``multiscale_supervised_loss`` for the disp heads."""
    from supervised_dispnet_tpu.ops.resize import resize_bilinear

    if ce_fn is None:
        ce_fn = depth_classification_loss
    H, W = gt_depth.shape[1], gt_depth.shape[2]
    total = jnp.float32(0.0)
    for logits, w in zip(logits_list, weights):
        total = total + w * ce_fn(resize_bilinear(logits, H, W), gt_depth,
                                  mask, bins)
    return total


def logits_to_depth(logits: jax.Array, bins: DepthBins) -> jax.Array:
    """Soft-weighted-sum decode: depth = sum_i p_i * center_i.

    (reference: ``test_disp.py`` softmax-bins soft inference)
    """
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    centers = bins.centers().astype(jnp.float32)
    return jnp.einsum("...k,k->...", p, centers)
