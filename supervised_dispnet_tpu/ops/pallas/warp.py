"""Pallas TPU kernel: bilinear image sampling (the ``grid_sample`` hot path).

SURVEY.md §7 hard part #1. TPU has no native gather worth using here —
scalar gathers serialize on the VPU. Instead the sample is decomposed so
the irregular access rides the MXU:

  1. Row gather as a matmul: two one-hot row-selection matrices
     A0[p, h] = (h == y0[p]), A1[p, h] = (h == y1[p]) multiply the source
     image (H, W*C), giving each output pixel its two source rows. A
     (BLOCK, H) @ (H, W*C) matmul is exactly what the systolic array wants.
  2. Column selection as a masked VPU reduce: one-hot column masks
     (x == x0/x1) pick the 4 corner values; bilinear weights blend them.

Zeros/border padding is applied per corner (torch semantics). The custom
VJP reuses the corner values for the coordinate gradients
(dout/dx = wy0 (c01 - c00) + wy1 (c11 - c10), etc.) and transposes the
row-gather matmuls (A^T @ masked-cotangent) for the image gradient — the
scatter is also a matmul.

The pure-XLA fallback is ``ops.sampling.bilinear_sample`` (parity-tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# output pixels per grid step; coords ride (ROWS, 128) f32 tiles
BLOCK_ROWS = 8
LANES = 128
BLOCK_P = BLOCK_ROWS * LANES  # 1024


def _is_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _corner_setup(x, y, H, W, padding_mode):
    """Shared corner math: integer corners, weights, per-corner validity."""
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
    if padding_mode == "zeros":
        # invalid corners get zero weight; indices may stay OOB (the one-hot
        # compare never fires for OOB indices, so their value is 0 anyway)
        vx0 = ((x0 >= 0) & (x0 <= W - 1)).astype(jnp.float32)
        vx1 = ((x1 >= 0) & (x1 <= W - 1)).astype(jnp.float32)
        vy0 = ((y0 >= 0) & (y0 <= H - 1)).astype(jnp.float32)
        vy1 = ((y1 >= 0) & (y1 <= H - 1)).astype(jnp.float32)
        wx0, wx1, wy0, wy1 = wx0 * vx0, wx1 * vx1, wy0 * vy0, wy1 * vy1
    else:  # border: clamp
        x0 = jnp.clip(x0, 0, W - 1)
        x1 = jnp.clip(x1, 0, W - 1)
        y0 = jnp.clip(y0, 0, H - 1)
        y1 = jnp.clip(y1, 0, H - 1)
    return x0, x1, y0, y1, wx0, wx1, wy0, wy1


def _row_gather(img2d, yidx, H):
    """(BLOCK,) row indices -> (BLOCK, W*C) rows via one-hot matmul (MXU)."""
    P = yidx.shape[0]
    h_iota = jax.lax.broadcasted_iota(jnp.int32, (P, H), 1)
    A = (h_iota == yidx[:, None]).astype(jnp.float32)
    # HIGHEST: one-hot selection must be exact — default MXU bf16 rounding
    # would corrupt the gathered pixels by ~1e-2
    return jnp.dot(A, img2d, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _col_select(rows, xidx, wx, W, C):
    """Per-channel masked column reduce: picks column xidx[p] (weight wx[p])
    out of a (BLOCK, W*C) row bundle -> (BLOCK, C)."""
    P = rows.shape[0]
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (P, W * C), 1)
    x_of_col = col_iota // C
    sel = (x_of_col == xidx[:, None]).astype(jnp.float32) * rows
    outs = []
    for c in range(C):
        cmask = (col_iota % C == c).astype(jnp.float32)
        outs.append(jnp.sum(sel * cmask, axis=1))
    return jnp.stack(outs, axis=1) * wx[:, None]


def _corners(img2d, x, y, H, W, C, padding_mode):
    """All four corner values (BLOCK, C each) + weights."""
    x0, x1, y0, y1, wx0, wx1, wy0, wy1 = _corner_setup(x, y, H, W, padding_mode)
    rows0 = _row_gather(img2d, y0, H)
    rows1 = _row_gather(img2d, y1, H)
    one = jnp.ones_like(wx0)
    c00 = _col_select(rows0, x0, one, W, C)
    c01 = _col_select(rows0, x1, one, W, C)
    c10 = _col_select(rows1, x0, one, W, C)
    c11 = _col_select(rows1, x1, one, W, C)
    return (c00, c01, c10, c11), (wx0, wx1, wy0, wy1)


def _fwd_kernel(img_ref, x_ref, y_ref, out_ref, *, H, W, C, padding_mode):
    img2d = img_ref[0].astype(jnp.float32)  # (H, W*C)
    x = x_ref[0].astype(jnp.float32).reshape(BLOCK_P)  # (ROWS, 128) -> flat
    y = y_ref[0].astype(jnp.float32).reshape(BLOCK_P)
    (c00, c01, c10, c11), (wx0, wx1, wy0, wy1) = _corners(
        img2d, x, y, H, W, C, padding_mode)
    out = (
        (c00 * wx0[:, None] + c01 * wx1[:, None]) * wy0[:, None]
        + (c10 * wx0[:, None] + c11 * wx1[:, None]) * wy1[:, None]
    )
    out_ref[0] = out


def _coord_grads(img2d, x, y, g, H, W, C, padding_mode):
    """Shared coordinate-gradient math for both backward kernels:
    dout/dx = wy0 (c01 - c00) + wy1 (c11 - c10) (and symmetric for dy),
    with border-clip saturation zeroing."""
    x0, x1, y0, y1, wx0, wx1, wy0, wy1 = _corner_setup(x, y, H, W, padding_mode)
    rows0 = _row_gather(img2d, y0, H)
    rows1 = _row_gather(img2d, y1, H)
    one = jnp.ones_like(wx0)
    c00 = _col_select(rows0, x0, one, W, C)
    c01 = _col_select(rows0, x1, one, W, C)
    c10 = _col_select(rows1, x0, one, W, C)
    c11 = _col_select(rows1, x1, one, W, C)
    dx = jnp.sum(g * (wy0[:, None] * (c01 - c00) + wy1[:, None] * (c11 - c10)),
                 axis=1)
    dy = jnp.sum(g * (wx0[:, None] * (c10 - c00) + wx1[:, None] * (c11 - c01)),
                 axis=1)
    if padding_mode == "border":
        # clip saturates outside [0, dim-1]: d clip/d coord = 0 there
        dx = dx * ((x >= 0) & (x <= W - 1)).astype(jnp.float32)
        dy = dy * ((y >= 0) & (y <= H - 1)).astype(jnp.float32)
    return dx, dy, (x0, x1, y0, y1, wx0, wx1, wy0, wy1)


def _bwd_kernel(img_ref, x_ref, y_ref, g_ref, dimg_ref, dx_ref, dy_ref,
                *, H, W, C, padding_mode, n_blocks):
    """Image gradient (transposed one-hot matmuls, accumulated over the
    per-batch grid steps) + coordinate gradients."""
    p = pl.program_id(1)

    img2d = img_ref[0].astype(jnp.float32)
    x = x_ref[0].astype(jnp.float32).reshape(BLOCK_P)
    y = y_ref[0].astype(jnp.float32).reshape(BLOCK_P)
    g = g_ref[0].astype(jnp.float32)  # (BLOCK_P, C)

    dx, dy, (x0, x1, y0, y1, wx0, wx1, wy0, wy1) = _coord_grads(
        img2d, x, y, g, H, W, C, padding_mode)
    P = x.shape[0]
    dx_ref[0] = dx.reshape(BLOCK_ROWS, LANES)
    dy_ref[0] = dy.reshape(BLOCK_ROWS, LANES)

    # ---- image gradient: scatter = A^T @ (column-scattered cotangent) ----
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (P, W * C), 1)
    x_of_col = col_iota // C
    g_cols = jnp.zeros((P, W * C), jnp.float32)
    for c in range(C):
        cmask = (col_iota % C == c).astype(jnp.float32)
        g_cols += g[:, c:c + 1] * cmask
    m_x0 = (x_of_col == x0[:, None]).astype(jnp.float32)
    m_x1 = (x_of_col == x1[:, None]).astype(jnp.float32)

    h_iota = jax.lax.broadcasted_iota(jnp.int32, (P, H), 1)
    A0 = (h_iota == y0[:, None]).astype(jnp.float32)
    A1 = (h_iota == y1[:, None]).astype(jnp.float32)

    d_rows0 = g_cols * (m_x0 * (wy0 * wx0)[:, None] + m_x1 * (wy0 * wx1)[:, None])
    d_rows1 = g_cols * (m_x0 * (wy1 * wx0)[:, None] + m_x1 * (wy1 * wx1)[:, None])
    # default (bf16 MXU) precision: this is a gradient scatter — exactness
    # buys nothing here and HIGHEST costs a 3-pass emulation per matmul
    dimg = (
        jnp.dot(A0.T, d_rows0, preferred_element_type=jnp.float32)
        + jnp.dot(A1.T, d_rows1, preferred_element_type=jnp.float32)
    )

    @pl.when(p == 0)
    def _():
        dimg_ref[0] = jnp.zeros_like(dimg_ref[0])

    dimg_ref[0] += dimg


def _bwd_coords_kernel(img_ref, x_ref, y_ref, g_ref, dx_ref, dy_ref,
                       *, H, W, C, padding_mode):
    """Coordinate gradients only — skips the image-gradient scatter
    matmuls entirely (refs in photometric training are inputs, not
    parameters, so their cotangent is dead work)."""
    img2d = img_ref[0].astype(jnp.float32)
    x = x_ref[0].astype(jnp.float32).reshape(BLOCK_P)
    y = y_ref[0].astype(jnp.float32).reshape(BLOCK_P)
    g = g_ref[0].astype(jnp.float32)

    dx, dy, _ = _coord_grads(img2d, x, y, g, H, W, C, padding_mode)
    dx_ref[0] = dx.reshape(BLOCK_ROWS, LANES)
    dy_ref[0] = dy.reshape(BLOCK_ROWS, LANES)


def _pad_to(x, mult, axis=1):
    n = x.shape[axis]
    rem = (-n) % mult
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad)


def bilinear_sample_pallas(
    img: jax.Array,
    x: jax.Array,
    y: jax.Array,
    padding_mode: str = "zeros",
    interpret: bool | None = None,
    diff_img: bool = True,
) -> jax.Array:
    """Drop-in Pallas version of ``ops.sampling.bilinear_sample``.

    img: (B, H, W, C); x, y: (B, Ho, Wo) pixel coords. Returns
    (B, Ho, Wo, C) fp32.

    diff_img=True: differentiable in img, x, and y. diff_img=False: img is
    treated as a constant; the backward pass computes only the coordinate
    gradients (skipping the A^T scatter matmuls) — use for photometric
    losses where the sampled image is data.
    """
    if interpret is None:
        interpret = not _is_tpu()
    B, H, W, C = img.shape
    out_spatial = x.shape[1:]
    P = 1
    for s in out_spatial:
        P *= s

    img2d = img.reshape(B, H, W * C).astype(jnp.float32)
    xf = _pad_to(x.reshape(B, P).astype(jnp.float32), BLOCK_P)
    yf = _pad_to(y.reshape(B, P).astype(jnp.float32), BLOCK_P)
    Pp = xf.shape[1]
    n_blocks = Pp // BLOCK_P
    # coords as (B, Pp/128, 128) so blocks tile as (ROWS, LANES)
    xf = xf.reshape(B, Pp // LANES, LANES)
    yf = yf.reshape(B, Pp // LANES, LANES)

    kernel_fwd = functools.partial(
        _fwd_kernel, H=H, W=W, C=C, padding_mode=padding_mode)
    kernel_bwd = functools.partial(
        _bwd_kernel, H=H, W=W, C=C, padding_mode=padding_mode,
        n_blocks=n_blocks)
    kernel_bwd_coords = functools.partial(
        _bwd_coords_kernel, H=H, W=W, C=C, padding_mode=padding_mode)

    def run_fwd(img2d, xf, yf):
        return pl.pallas_call(
            kernel_fwd,
            grid=(B, n_blocks),
            in_specs=[
                pl.BlockSpec((1, H, W * C), lambda b, p: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BLOCK_ROWS, LANES), lambda b, p: (b, p, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BLOCK_ROWS, LANES), lambda b, p: (b, p, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, BLOCK_P, C), lambda b, p: (b, p, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, Pp, C), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(img2d, xf, yf)

    @jax.custom_vjp
    def sample(img2d, xf, yf):
        return run_fwd(img2d, xf, yf)

    def sample_fwd(img2d, xf, yf):
        return run_fwd(img2d, xf, yf), (img2d, xf, yf)

    def sample_bwd(res, g):
        img2d, xf, yf = res
        dimg2d, dx, dy = pl.pallas_call(
            kernel_bwd,
            grid=(B, n_blocks),
            in_specs=[
                pl.BlockSpec((1, H, W * C), lambda b, p: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BLOCK_ROWS, LANES), lambda b, p: (b, p, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BLOCK_ROWS, LANES), lambda b, p: (b, p, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BLOCK_P, C), lambda b, p: (b, p, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, H, W * C), lambda b, p: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BLOCK_ROWS, LANES), lambda b, p: (b, p, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BLOCK_ROWS, LANES), lambda b, p: (b, p, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((B, H, W * C), jnp.float32),
                jax.ShapeDtypeStruct((B, Pp // LANES, LANES), jnp.float32),
                jax.ShapeDtypeStruct((B, Pp // LANES, LANES), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(img2d, xf, yf, g.astype(jnp.float32))
        return dimg2d, dx, dy

    sample.defvjp(sample_fwd, sample_bwd)

    coord_specs = [
        pl.BlockSpec((1, BLOCK_ROWS, LANES), lambda b, p: (b, p, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BLOCK_ROWS, LANES), lambda b, p: (b, p, 0),
                     memory_space=pltpu.VMEM),
    ]

    @jax.custom_vjp
    def sample_coords(xf, yf):
        return run_fwd(img2d, xf, yf)

    def sample_coords_fwd(xf, yf):
        return run_fwd(img2d, xf, yf), (xf, yf)

    def sample_coords_bwd(res, g):
        xf, yf = res
        dx, dy = pl.pallas_call(
            kernel_bwd_coords,
            grid=(B, n_blocks),
            in_specs=[
                pl.BlockSpec((1, H, W * C), lambda b, p: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                *coord_specs,
                pl.BlockSpec((1, BLOCK_P, C), lambda b, p: (b, p, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=tuple(coord_specs),
            out_shape=(
                jax.ShapeDtypeStruct((B, Pp // LANES, LANES), jnp.float32),
                jax.ShapeDtypeStruct((B, Pp // LANES, LANES), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(img2d, xf, yf, g.astype(jnp.float32))
        return dx, dy

    sample_coords.defvjp(sample_coords_fwd, sample_coords_bwd)

    if diff_img:
        out = sample(img2d, xf, yf)
    else:
        img2d = jax.lax.stop_gradient(img2d)
        out = sample_coords(xf, yf)
    out = out[:, :P].reshape(B, *out_spatial, C)
    return out
