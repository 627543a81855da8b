"""Resizing / pyramid helpers (NHWC), replacing ``F.interpolate`` +
``F.adaptive_avg_pool2d`` usage in the reference.

(reference: multi-scale disparity resize in ``loss_functions.py`` and the
DispResNet decoder's bilinear upsampling)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def upsample2x_bilinear(x: jax.Array) -> jax.Array:
    """Exact 2x bilinear upsample (half-pixel centers), written as the
    2-tap stencil it is: out[2i] = 0.25 in[i-1] + 0.75 in[i],
    out[2i+1] = 0.75 in[i] + 0.25 in[i+1] (edges clamped).

    NEGATIVE RESULT (kept for the record, not wired in): profiling showed
    the decoder's jax.image.resize calls at 4.6 ms of a 37.8 ms forward, so
    this stencil form was tried — and LOST at the model level (bench 6545
    -> 5311 img/s). XLA fuses the resize's implicit conv into the adjacent
    decoder convs, while the stack+reshape interleave here materializes a
    badly-tiled intermediate it cannot fuse. Matches
    jax.image.resize(..., 'bilinear') to fp rounding (tested); see
    BASELINE.md round-2 table.
    """
    def axis_up(v, axis):
        prev = jnp.concatenate(
            [jax.lax.slice_in_dim(v, 0, 1, axis=axis),
             jax.lax.slice_in_dim(v, 0, v.shape[axis] - 1, axis=axis)], axis)
        nxt = jnp.concatenate(
            [jax.lax.slice_in_dim(v, 1, v.shape[axis], axis=axis),
             jax.lax.slice_in_dim(v, v.shape[axis] - 1, v.shape[axis], axis=axis)],
            axis)
        even = 0.25 * prev + 0.75 * v
        odd = 0.75 * v + 0.25 * nxt
        inter = jnp.stack([even, odd], axis=axis + 1)
        shape = list(v.shape)
        shape[axis] *= 2
        return inter.reshape(shape)

    return axis_up(axis_up(x, 1), 2)


def resize_bilinear(x: jax.Array, h: int, w: int, align_corners: bool = False) -> jax.Array:
    """Bilinear resize of (B, H, W, C) to (B, h, w, C).

    ``align_corners=False`` matches torch ``F.interpolate(mode='bilinear')``
    defaults (half-pixel centers). jax.image.resize implements exactly the
    half-pixel convention (and fuses into adjacent convs — see the
    ``upsample2x_bilinear`` negative result); the align_corners=True path
    is built on our sampler.
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
