"""Fused on-device augmentation (the TPU rebuild of the reference's
``custom_transforms.py``).

The reference augments on host CPU in DataLoader workers
(reference: ``custom_transforms.py::{RandomHorizontalFlip, RandomScaleCrop,
ColorJitter-equivalent, Normalize, ArrayToTensor}``). Here the whole chain
is ONE jitted device stage fused into the train step:

- Random horizontal flip and RandomScaleCrop (scale in [1, 1.15], crop back
  to the original size, intrinsics rescaled accordingly) collapse into a
  single affine coordinate map. Because the map is affine and axis-aligned,
  the bilinear resample is SEPARABLE: per sample it is two small tent-weight
  matmuls (A_y @ img @ A_x^T) that run on the MXU — profiling showed the
  naive 4-corner gather formulation cost ~20 ms/frame-set on v5e (the
  single largest item in the train step), while the matmul form is
  sub-millisecond. No intermediate resized image is ever materialized.
- Color jitter (brightness/contrast/saturation, shared across the snippet)
  and normalization are elementwise VPU work XLA fuses into the same pass.
- Sparse GT depth rides the same coordinate map with nearest-neighbor taps
  (bilinear would bleed zeros into the sparse LiDAR points).

Everything is static-shape; randomness comes from explicit jax.random keys.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
HALF_MEAN = (0.5, 0.5, 0.5)
HALF_STD = (0.5, 0.5, 0.5)


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    flip: bool = True
    scale_crop: bool = True
    max_scale: float = 1.15
    color_jitter: bool = True
    brightness: float = 0.2
    contrast: float = 0.2
    saturation: float = 0.2
    hue: float = 0.0  # max hue rotation as a fraction of the color wheel
    # reference default is 0.5/0.5 normalization; --imagenet-normalization
    # switches to ImageNet stats (reference: train.py flag)
    mean: tuple[float, float, float] = HALF_MEAN
    std: tuple[float, float, float] = HALF_STD


@partial(jax.jit, static_argnames=("config",))
def augment_batch(
    key: jax.Array,
    imgs: jax.Array,
    intrinsics: jax.Array,
    depth: jax.Array | None = None,
    config: AugmentConfig = AugmentConfig(),
):
    """Augment a batch of snippets on device.

    Args:
      key: PRNG key.
      imgs: (B, S, H, W, 3) float in [0, 1] — S frames per snippet (S=1 for
        supervised single-frame training).
      intrinsics: (B, 3, 3).
      depth: optional (B, H, W) sparse GT depth (zeros = missing),
        geometrically transformed alongside the images.

    Returns:
      (imgs, intrinsics[, depth]) with imgs normalized; same shapes.
    """
    B, S, H, W, _ = imgs.shape
    k_scale, k_ox, k_oy, k_flip, k_b, k_c, k_s = jax.random.split(key, 7)
    # hue key derived by fold_in so enabling hue does not perturb the other
    # subkeys (keeps previously recorded seeded runs reproducible)
    k_h = jax.random.fold_in(key, 99)
    f32 = jnp.float32

    if config.scale_crop:
        # independent x/y scalings, as the reference draws
        # np.random.uniform(1, 1.15, 2) (custom_transforms.py::RandomScaleCrop)
        sc = jax.random.uniform(k_scale, (B, 2), f32, 1.0, config.max_scale)
        scale_x, scale_y = sc[:, 0], sc[:, 1]
    else:
        scale_x = scale_y = jnp.ones((B,), f32)
    # crop offset within the up-scaled image: [0, (s-1) * dim]
    ox = jax.random.uniform(k_ox, (B,), f32) * (scale_x - 1.0) * W
    oy = jax.random.uniform(k_oy, (B,), f32) * (scale_y - 1.0) * H
    if config.flip:
        do_flip = jax.random.bernoulli(k_flip, 0.5, (B,))
    else:
        do_flip = jnp.zeros((B,), bool)

    # output pixel (i, j) samples source at ((oy + i) / s, (ox + j) / s);
    # flip mirrors the output x axis first. The map is affine and
    # axis-aligned, so resampling is separable: out = A_y @ img @ A_x^T
    # with per-sample tent-weight matrices (2 taps per row) — MXU work
    # instead of a 4-corner gather (the gather formulation dominated the
    # whole train step on v5e).
    jj = jax.lax.broadcasted_iota(f32, (B, W), 1)
    ii = jax.lax.broadcasted_iota(f32, (B, H), 1)
    jj = jnp.where(do_flip[:, None], (W - 1.0) - jj, jj)
    xs = jnp.clip((jj + ox[:, None]) / scale_x[:, None], 0.0, W - 1)  # (B, W)
    ys = jnp.clip((ii + oy[:, None]) / scale_y[:, None], 0.0, H - 1)  # (B, H)

    # tent weights: row i has taps floor(c) and floor(c)+1 with bilinear
    # weights (identical to the gather sampler's corner weighting)
    h_iota = jax.lax.broadcasted_iota(f32, (1, 1, H), 2)
    w_iota = jax.lax.broadcasted_iota(f32, (1, 1, W), 2)
    Ay = jnp.maximum(0.0, 1.0 - jnp.abs(ys[:, :, None] - h_iota))  # (B, H, H)
    Ax = jnp.maximum(0.0, 1.0 - jnp.abs(xs[:, :, None] - w_iota))  # (B, W, W)

    # exact (HIGHEST) contractions: A is a 2-tap selector; default bf16
    # rounding would perturb pixel values by ~1e-2
    tmp = jnp.einsum("bih,bshwc->bsiwc", Ay, imgs,
                     precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("bjw,bsiwc->bsijc", Ax, tmp,
                     precision=jax.lax.Precision.HIGHEST)

    # intrinsics: scale then crop then flip
    # (reference: custom_transforms.py::RandomScaleCrop intrinsics rescale)
    fx = intrinsics[:, 0, 0] * scale_x
    fy = intrinsics[:, 1, 1] * scale_y
    cx = intrinsics[:, 0, 2] * scale_x - ox
    cy = intrinsics[:, 1, 2] * scale_y - oy
    cx = jnp.where(do_flip, (W - 1.0) - cx, cx)
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    new_K = jnp.stack(
        [fx, zeros, cx, zeros, fy, cy, zeros, zeros, ones], axis=-1
    ).reshape(B, 3, 3)

    if config.color_jitter:
        b = jax.random.uniform(k_b, (B, 1, 1, 1, 1), f32,
                               1.0 - config.brightness, 1.0 + config.brightness)
        c = jax.random.uniform(k_c, (B, 1, 1, 1, 1), f32,
                               1.0 - config.contrast, 1.0 + config.contrast)
        s = jax.random.uniform(k_s, (B, 1, 1, 1, 1), f32,
                               1.0 - config.saturation, 1.0 + config.saturation)
        out = jnp.clip(out * b, 0.0, 1.0)
        mean_px = out.mean(axis=(2, 3, 4), keepdims=True)
        out = jnp.clip((out - mean_px) * c + mean_px, 0.0, 1.0)
        gray = (
            0.299 * out[..., 0:1] + 0.587 * out[..., 1:2] + 0.114 * out[..., 2:3]
        )
        out = jnp.clip((out - gray) * s + gray, 0.0, 1.0)
        if config.hue > 0:
            # hue rotation in YIQ space (torch ColorJitter hue equivalent)
            theta = jax.random.uniform(
                k_h, (B, 1, 1, 1), f32,
                -config.hue * 2 * jnp.pi, config.hue * 2 * jnp.pi)
            to_yiq = jnp.array([[0.299, 0.587, 0.114],
                                [0.596, -0.274, -0.322],
                                [0.211, -0.523, 0.312]], f32)
            to_rgb = jnp.linalg.inv(to_yiq)
            yiq = jnp.einsum("ij,bshwj->bshwi", to_yiq, out)
            cos_t = jnp.cos(theta)[:, None]
            sin_t = jnp.sin(theta)[:, None]
            i_rot = yiq[..., 1:2] * cos_t - yiq[..., 2:3] * sin_t
            q_rot = yiq[..., 1:2] * sin_t + yiq[..., 2:3] * cos_t
            yiq = jnp.concatenate([yiq[..., 0:1], i_rot, q_rot], axis=-1)
            out = jnp.clip(jnp.einsum("ij,bshwj->bshwi", to_rgb, yiq), 0.0, 1.0)

    mean = jnp.asarray(config.mean, f32)
    std = jnp.asarray(config.std, f32)
    out = (out - mean) / std

    if depth is None:
        return out, new_K
    # sparse depth: nearest-neighbor taps via one-hot selector matmuls
    # (bilinear would bleed zeros into the sparse LiDAR points); scale-crop
    # coordinates are always in-bounds by construction (scale >= 1)
    Ny = (jnp.round(ys)[:, :, None] == h_iota).astype(f32)  # (B, H, H)
    Nx = (jnp.round(xs)[:, :, None] == w_iota).astype(f32)  # (B, W, W)
    dtmp = jnp.einsum("bih,bhw->biw", Ny, depth,
                      precision=jax.lax.Precision.HIGHEST)
    d = jnp.einsum("bjw,biw->bij", Nx, dtmp,
                   precision=jax.lax.Precision.HIGHEST)
    return out, new_K, d


@partial(jax.jit, static_argnames=("mean", "std"))
def normalize_images(
    imgs: jax.Array,
    mean: tuple[float, float, float] = HALF_MEAN,
    std: tuple[float, float, float] = HALF_STD,
) -> jax.Array:
    """Eval-time normalization only (no augmentation)."""
    m = jnp.asarray(mean, jnp.float32)
    s = jnp.asarray(std, jnp.float32)
    return (imgs - m) / s
