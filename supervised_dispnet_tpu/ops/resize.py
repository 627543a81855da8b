"""Resizing / pyramid helpers (NHWC), replacing ``F.interpolate`` +
``F.adaptive_avg_pool2d`` usage in the reference.

(reference: multi-scale disparity resize in ``loss_functions.py`` and the
DispResNet decoder's bilinear upsampling)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(x: jax.Array, h: int, w: int, align_corners: bool = False) -> jax.Array:
    """Bilinear resize of (B, H, W, C) to (B, h, w, C).

    ``align_corners=False`` matches torch ``F.interpolate(mode='bilinear')``
    defaults (half-pixel centers). jax.image.resize implements exactly the
    half-pixel convention, so use it on that path; the align_corners=True
    path is built on our sampler.
    """
    B, H, W, C = x.shape
    if (H, W) == (h, w):
        return x
    if not align_corners:
        return jax.image.resize(x, (B, h, w, C), method="bilinear")
    from supervised_dispnet_tpu.ops.sampling import bilinear_sample

    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) * ((H - 1) / max(h - 1, 1))
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) * ((W - 1) / max(w - 1, 1))
    xs = jnp.broadcast_to(xs[None], (B, h, w))
    ys = jnp.broadcast_to(ys[None], (B, h, w))
    return bilinear_sample(x, xs, ys, padding_mode="border")


def resize_like(x: jax.Array, ref: jax.Array, align_corners: bool = False) -> jax.Array:
    """Resize x to ref's spatial size."""
    return resize_bilinear(x, ref.shape[1], ref.shape[2], align_corners=align_corners)


def crop_like(x: jax.Array, ref: jax.Array) -> jax.Array:
    """Crop x's spatial dims down to ref's (reference: ``models/*::crop_like``
    for deconv outputs that overshoot odd input sizes)."""
    return x[:, : ref.shape[1], : ref.shape[2], :]


def downsample2x_avg(x: jax.Array) -> jax.Array:
    """2x2 average-pool downsample of (B, H, W, C) — the multi-scale image
    pyramid op (reference: ``F.adaptive_avg_pool2d`` per-scale resizing in
    ``loss_functions.py::photometric_reconstruction_loss``)."""
    B, H, W, C = x.shape
    return x.reshape(B, H // 2, 2, W // 2, 2, C).mean(axis=(2, 4))


def scale_pyramid(x: jax.Array, num_scales: int) -> list[jax.Array]:
    """[x, x/2, x/4, ...] via repeated 2x average pooling."""
    out = [x]
    for _ in range(num_scales - 1):
        out.append(downsample2x_avg(out[-1]))
    return out
