"""Supervised depth losses over sparse GT masks.

TPU-native rebuild of the reference's supervised losses
(reference: ``loss_functions.py`` — L1, BerHu reverse-Huber with adaptive
threshold, Eigen scale-invariant log loss). All reductions are masked
``where``-style with explicit valid-pixel counts — never boolean indexing —
so they stay static-shape inside ``jit`` (SURVEY.md §7 hard part #5).

Conventions: ``pred`` and ``gt`` are (B, H, W) metric depth; ``mask`` is a
(B, H, W) bool/float validity mask (KITTI GT is sparse LiDAR). Returns
scalar fp32 losses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _masked_mean(x: jax.Array, mask: jax.Array) -> jax.Array:
    m = mask.astype(jnp.float32)
    count = jnp.maximum(m.sum(), 1.0)
    return (x.astype(jnp.float32) * m).sum() / count


def l1_loss(pred: jax.Array, gt: jax.Array, mask: jax.Array) -> jax.Array:
    """Masked mean absolute depth error (reference: ``loss_functions.py``)."""
    return _masked_mean(jnp.abs(pred - gt), mask)


def berhu_loss(pred: jax.Array, gt: jax.Array, mask: jax.Array, c_frac: float = 0.2) -> jax.Array:
    """Reverse Huber (BerHu) with adaptive threshold c = c_frac * max|d|.

    L(d) = |d|                 if |d| <= c
         = (d^2 + c^2) / (2c)  otherwise
    (reference: ``loss_functions.py::berhu``; Laina et al. 2016)
    """
    m = mask.astype(jnp.float32)
    d = (pred - gt).astype(jnp.float32) * m
    absd = jnp.abs(d)
    c = jnp.maximum(c_frac * absd.max(), 1e-6)
    # the threshold is data-dependent but scalar — fine under jit
    c = jax.lax.stop_gradient(c)
    quad = (d * d + c * c) / (2.0 * c)
    per_px = jnp.where(absd <= c, absd, quad)
    return _masked_mean(per_px, mask)


def scale_invariant_loss(
    pred: jax.Array, gt: jax.Array, mask: jax.Array, lam: float = 0.5
) -> jax.Array:
    """Eigen et al. (2014) scale-invariant log loss.

    D = mean(d^2) - lam * mean(d)^2 with d = log(pred) - log(gt) over valid
    pixels (reference: ``loss_functions.py::scale_invariant``).
    """
    m = mask.astype(jnp.float32)
    count = jnp.maximum(m.sum(), 1.0)
    safe_pred = jnp.maximum(pred.astype(jnp.float32), 1e-6)
    safe_gt = jnp.maximum(gt.astype(jnp.float32), 1e-6)
    d = (jnp.log(safe_pred) - jnp.log(safe_gt)) * m
    mean_sq = (d * d).sum() / count
    sq_mean = (d.sum() / count) ** 2
    return mean_sq - lam * sq_mean


def multiscale_supervised_loss(
    preds: list[jax.Array],
    gt: jax.Array,
    mask: jax.Array,
    loss_fn,
    weights: tuple[float, ...] = (1.0, 0.5, 0.25, 0.125),
) -> jax.Array:
    """Apply a supervised loss to each scale's prediction.

    Each prediction (B, h, w) is bilinearly upsampled to GT resolution
    before the masked loss (the sparse GT cannot be downsampled without
    corrupting it). Mirrors the reference's multi-scale supervision in
    ``train.py::train``.
    """
    from supervised_dispnet_tpu.ops.resize import resize_bilinear

    H, W = gt.shape[1], gt.shape[2]
    total = jnp.float32(0.0)
    for pred, w in zip(preds, weights):
        if pred.ndim == 3:
            pred = pred[..., None]
        pred_up = resize_bilinear(pred, H, W)[..., 0]
        total = total + w * loss_fn(pred_up, gt, mask)
    return total
