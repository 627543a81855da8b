"""Bilinear image sampling (the TPU replacement for ``F.grid_sample``).

The reference delegates warping to ``torch.nn.functional.grid_sample``
(reference: ``inverse_warp.py::inverse_warp``). JAX has no built-in
equivalent, so we implement a gather-based bilinear sampler that XLA lowers
to a small number of fused gathers — static shapes, no scatter, no
data-dependent control flow, so it tiles cleanly on TPU.

Layout is NHWC throughout (TPU-native); the channel axis rides the 128-wide
lane dimension so the 4-corner blend is pure VPU work.

Two entry points:

- :func:`bilinear_sample` — sample at *pixel-space* coordinates. This is the
  primitive the geometry stack uses directly (no normalized-coordinate
  round-trip, which is where torch convention bugs hide).
- :func:`grid_sample` — torch-compatible wrapper taking normalized [-1, 1]
  grids with ``align_corners`` / ``padding_mode`` semantics, used by the
  parity tests against torch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_2d(img: jax.Array, ix: jax.Array, iy: jax.Array) -> jax.Array:
    """Gather img[b, iy, ix, :] for integer index maps.

    img: (B, H, W, C); ix, iy: (B, *S) int32 already clipped in-range.
    Returns (B, *S, C).

    A single flattened gather (iy * W + ix) keeps this one XLA gather op
    instead of two chained ones.
    """
    B, H, W, C = img.shape
    flat = img.reshape(B, H * W, C)
    idx = (iy * W + ix).reshape(B, -1)
    out = jnp.take_along_axis(flat, idx[..., None], axis=1)
    return out.reshape(*ix.shape, C)


def bilinear_sample(
    img: jax.Array,
    x: jax.Array,
    y: jax.Array,
    padding_mode: str = "zeros",
) -> jax.Array:
    """Bilinearly sample ``img`` at float pixel coordinates ``(x, y)``.

    Args:
      img: (B, H, W, C) source image.
      x, y: (B, Ho, Wo) float pixel coordinates (x along width, y along
        height; (0, 0) is the center of the top-left pixel).
      padding_mode: 'zeros' — out-of-bounds corner taps contribute 0 (per
        corner, matching torch); 'border' — coordinates are clamped to the
        edge before sampling.

    Returns:
      (B, Ho, Wo, C) sampled image.

    Implementation: TPU gathers are index-count-bound, not byte-bound — a
    v5e profile of the photometric warp showed each per-corner
    ``take_along_axis`` running ~170x slower than its memory traffic
    (≈6.9 ns/index regardless of row width). So instead of 4 corner
    gathers we pack every 2x2 neighborhood into a 4C-channel patch image
    and fetch all four corners with ONE gather (4x fewer indices), then
    blend with tent weights computed from the patch base — exactly
    equivalent to per-corner weighting for both padding modes (the clipped
    base puts every patch cell in-bounds; tent(x - cell_x) reproduces the
    per-corner weight incl. the out-of-bounds zeroing). Measured: the
    self-supervised train step dropped ~40% wall clock from this packing.
    """
    if padding_mode not in ("zeros", "border"):
        raise ValueError(f"unknown padding_mode: {padding_mode!r}")
    B, H, W, C = img.shape
    if H >= 2 and W >= 2:
        return _bilinear_sample_patch(img, x, y, padding_mode)
    return _bilinear_sample_4gather(img, x, y, padding_mode)


def _bilinear_sample_patch(
    img: jax.Array, x: jax.Array, y: jax.Array, padding_mode: str
) -> jax.Array:
    B, H, W, C = img.shape
    compute_dtype = img.dtype if jnp.issubdtype(img.dtype, jnp.floating) else jnp.float32
    x = x.astype(compute_dtype)
    y = y.astype(compute_dtype)
    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)

    # patch image: P[b, i, j] = [img[i,j], img[i,j+1], img[i+1,j],
    # img[i+1,j+1]] — (B, H-1, W-1, 4C), pure fused elementwise copies
    patches = jnp.concatenate(
        [img[:, :-1, :-1], img[:, :-1, 1:], img[:, 1:, :-1], img[:, 1:, 1:]],
        axis=-1,
    ).reshape(B, (H - 1) * (W - 1), 4 * C)

    # clipped patch base: every cell of the fetched patch is in-bounds
    bx = jnp.clip(jnp.floor(x), 0, W - 2).astype(jnp.int32)
    by = jnp.clip(jnp.floor(y), 0, H - 2).astype(jnp.int32)
    idx = (by * (W - 1) + bx).reshape(B, -1)
    p = jnp.take_along_axis(patches, idx[..., None], axis=1)
    p = p.reshape(*x.shape, 4, C)

    # tent weights vs each cell's absolute coordinate: max(0, 1 - |x - a|).
    # For in-bounds corners this is exactly the bilinear corner weight; for
    # out-of-bounds corners ('zeros' mode) the tent is 0 — same zeroing the
    # per-corner in-bounds mask produced. Gradients match too (piecewise
    # slope ±1 inside the support, 0 outside).
    bxf = bx.astype(compute_dtype)
    byf = by.astype(compute_dtype)
    wx0 = jnp.maximum(0.0, 1.0 - jnp.abs(x - bxf))
    wx1 = jnp.maximum(0.0, 1.0 - jnp.abs(x - (bxf + 1.0)))
    wy0 = jnp.maximum(0.0, 1.0 - jnp.abs(y - byf))
    wy1 = jnp.maximum(0.0, 1.0 - jnp.abs(y - (byf + 1.0)))
    w = jnp.stack([wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1], axis=-1)
    out = (p * w[..., None]).sum(axis=-2)
    return out.astype(img.dtype)


def _bilinear_sample_4gather(
    img: jax.Array, x: jax.Array, y: jax.Array, padding_mode: str
) -> jax.Array:
    """Per-corner gather fallback (H or W < 2) — reference semantics."""
    B, H, W, C = img.shape
    compute_dtype = img.dtype if jnp.issubdtype(img.dtype, jnp.floating) else jnp.float32
    x = x.astype(compute_dtype)
    y = y.astype(compute_dtype)

    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx1 = x - x0f
    wy1 = y - y0f
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    def corner(ix, iy, w):
        ixc = jnp.clip(ix, 0, W - 1)
        iyc = jnp.clip(iy, 0, H - 1)
        v = _gather_2d(img, ixc, iyc)
        if padding_mode == "zeros":
            inb = ((ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1))
            w = w * inb.astype(compute_dtype)
        return v * w[..., None]

    out = (
        corner(x0, y0, wx0 * wy0)
        + corner(x1, y0, wx1 * wy0)
        + corner(x0, y1, wx0 * wy1)
        + corner(x1, y1, wx1 * wy1)
    )
    return out.astype(img.dtype)


def unnormalize_coords(
    gx: jax.Array, gy: jax.Array, H: int, W: int, align_corners: bool
) -> tuple[jax.Array, jax.Array]:
    """Map normalized [-1, 1] grid coords to pixel coords (torch convention)."""
    if align_corners:
        x = (gx + 1.0) * 0.5 * (W - 1)
        y = (gy + 1.0) * 0.5 * (H - 1)
    else:
        x = ((gx + 1.0) * W - 1.0) * 0.5
        y = ((gy + 1.0) * H - 1.0) * 0.5
    return x, y


def grid_sample(
    img: jax.Array,
    grid: jax.Array,
    padding_mode: str = "zeros",
    align_corners: bool = False,
) -> jax.Array:
    """Torch-compatible ``F.grid_sample`` (bilinear, NHWC).

    Args:
      img: (B, H, W, C).
      grid: (B, Ho, Wo, 2) with grid[..., 0] = x, grid[..., 1] = y in
        [-1, 1] (torch convention).
      padding_mode: 'zeros' | 'border'.
      align_corners: torch semantics (modern torch defaults to False).

    Returns: (B, Ho, Wo, C).
    """
    B, H, W, C = img.shape
    x, y = unnormalize_coords(grid[..., 0], grid[..., 1], H, W, align_corners)
    return bilinear_sample(img, x, y, padding_mode=padding_mode)
