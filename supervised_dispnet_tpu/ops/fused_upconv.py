"""Fused (2x bilinear upsample -> 3x3 zero-pad conv) as ONE lhs-dilated
conv — EXACT, including borders.

The DispResNet decoder's hot pattern is ``resize_bilinear(h, 2x)`` feeding
a 3x3 conv (reference: the decoder's ``F.interpolate`` + conv in
``models/DispResNet.py``). XLA materializes the upsampled tensor
(B, 2H, 2W, C) in HBM between the resize matmuls and the conv — at serving
batch 256 that is the dominant decoder-structural traffic left in the int8
graph (BASELINE.md round-3 roofline). Composing the resize's per-axis
transposed-conv taps g = [1/4, 3/4, 3/4, 1/4] into the conv kernel gives a
6x6 kernel applied with ``lhs_dilation=(2, 2)`` directly to the HALF-res
tensor: the full-res intermediate never exists.

Exactness: the composition is identical in the interior, but at the 1-px
output border the composed conv "sees through" what should be the conv's
zero padding: with the edge-clamped input pad the composed window
evaluates phantom upsample rows/cols u[-1] / u[2H] (which equal the
edge-row/col of x, themselves upsampled) where the 3x3 conv saw zeros.
The phantom contribution is subtracted with four 1-D border convs (+ a
corner double-count restore), making the op bit-accurate to fp rounding
vs (resize -> conv) — tested in tests/test_fused_upconv.py.

All pieces are differentiable; the composed kernel is linear in the
learned kernel, so the same function serves training and inference.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")

# Run the main lhs-dilated conv in its pixel-shuffle form (4 dense 3x3
# phase convs + depth-to-space, `lhs_dilated_conv_ps`) — a bit-identical
# reordering that is 16-26% faster per conv on v5e (benchmarks/
# ps_probe.py: XLA:TPU does not skip the dilation zeros, so the dilated
# form pays 4x the MAC-taps). End-to-end bf16 serving: 6774 -> 6926
# img/s (+2.2%). The INT8 serving path (ops/quant.py) deliberately does
# NOT use this form: there the depth-to-space reorder breaks the
# conv epilogue fusion and loses 18% (BASELINE.md round 5).
# Env escape hatch for A/B: DISPNET_TPU_PS_FORM=0.
PS_FORM = os.environ.get("DISPNET_TPU_PS_FORM", "1") != "0"
# half-pixel 2x bilinear as a transposed conv, per axis
_TENT = np.array([0.25, 0.75, 0.75, 0.25], np.float32)


def compose_upsample_kernel(kernel: jax.Array) -> jax.Array:
    """(3, 3, Cin, Cout) -> (6, 6, Cin, Cout): convolve the kernel with the
    2x bilinear tent taps per spatial axis (q[m] = sum_s k[s] g[m-s])."""
    g = jnp.asarray(_TENT, kernel.dtype)
    t2 = g[:, None] * g[None, :]  # (4, 4)
    kc = jnp.zeros((6, 6) + kernel.shape[2:], kernel.dtype)
    for s in range(3):
        for t in range(3):
            kc = kc.at[s:s + 4, t:t + 4].add(
                t2[..., None, None] * kernel[s, t][None, None])
    return kc


def compose_to_phase_kernels(kc: jax.Array) -> jax.Array:
    """(6, 6, Cin, Cout) composed kernel -> (3, 3, Cin, 4*Cout) phase
    kernels for the pixel-shuffle form of the lhs_dilation=(2, 2) conv.

    Derivation: with the fused decoder's exact geometry (edge-padded input
    ``xp``, lhs_dilation 2, conv padding 1), output row m = 2i + p draws
    kernel rows of parity 1-p over ``xp[i : i+3]``:
      phase p=0 rows -> kc[1::2], p=1 rows -> kc[0::2] (same per column).
    Each of the 4 (py, px) phases is therefore a dense 3x3 VALID conv over
    ``xp`` — 9 MAC-taps per low-res pixel per phase (36 total) vs the
    dilated form's 36 taps per HIGH-res pixel (144 per low-res pixel) when
    the backend does not skip the inserted zeros. Phases stack on the
    output-channel axis (py-major), ready for one conv + depth-to-space.
    """
    rows = [kc[1::2], kc[0::2]]  # output-row parity 0, 1
    phases = []
    for py in range(2):
        for px in range(2):
            phases.append(rows[py][:, 1 - px::2])  # (3, 3, Cin, Cout)
    return jnp.concatenate(phases, axis=-1)


def lhs_dilated_conv_ps(xp: jax.Array, kc: jax.Array, precision) -> jax.Array:
    """Pixel-shuffle equivalent of the fused decoder's main conv
    ``conv(xp, kc, lhs_dilation=(2,2), padding=((1,1),(1,1)))``.

    xp: (B, H+2, W+2, Cin) edge-padded half-res input;
    kc: (6, 6, Cin, Cout). Returns (B, 2H, 2W, Cout) — bit-identical
    reordering of the same fp contractions (tests/test_fused_upconv.py).
    """
    B, Hp, Wp, Cin = xp.shape
    H, W = Hp - 2, Wp - 2
    Cout = kc.shape[-1]
    pk = compose_to_phase_kernels(kc)
    y = lax.conv_general_dilated(
        xp, pk, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=_DN, precision=precision)  # (B, H, W, 4*Cout)
    # depth-to-space, py-major then px: out[2i+py, 2j+px] = y[i, j, phase]
    y = y.reshape(B, H, W, 2, 2, Cout)
    y = y.transpose(0, 1, 3, 2, 4, 5)  # (B, H, 2, W, 2, Cout)
    return y.reshape(B, 2 * H, 2 * W, Cout)


def _strip_up_phantom(v: jax.Array) -> jax.Array:
    """Phantom-extended 1-D 2x upsample of a strip.

    v: (B, L, C) -> (B, 2L + 2, C): clamped half-pixel upsample with the
    out-of-range phantom samples u[-1] = v[0], u[2L] = v[L-1] appended —
    the values the composed conv's padding window evaluates past the edge.
    """
    prev = jnp.concatenate([v[:, :1], v[:, :-1]], axis=1)
    nxt = jnp.concatenate([v[:, 1:], v[:, -1:]], axis=1)
    even = 0.25 * prev + 0.75 * v
    odd = 0.75 * v + 0.25 * nxt
    B, L, C = v.shape
    inter = jnp.stack([even, odd], axis=2).reshape(B, 2 * L, C)
    return jnp.concatenate([v[:, :1], inter, v[:, -1:]], axis=1)


def _border_conv(strip: jax.Array, krow: jax.Array, precision) -> jax.Array:
    """VALID 1-D conv of a phantom-extended strip (B, 2L+2, Cin) with one
    kernel row/col (3, Cin, Cout) -> (B, 2L, Cout)."""
    return lax.conv_general_dilated(
        strip[:, None], krow[None], (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=_DN, precision=precision)[:, 0]


def upconv2x_fused(
    x: jax.Array,
    kernel: jax.Array,
    precision=None,
    composed_kernel: jax.Array | None = None,
) -> jax.Array:
    """Exactly ``conv3x3_zeropad(resize_bilinear_2x(x), kernel)`` without
    materializing the upsampled tensor.

    Args:
      x: (B, H, W, Cin) half-resolution input.
      kernel: (3, 3, Cin, Cout) conv kernel (HWIO).
      composed_kernel: optional (6, 6, Cin, Cout) override for the MAIN
        lhs-dilated conv (default: ``compose_upsample_kernel(kernel)``).
        The QAT fake-quant path passes the quantize-dequantized composed
        kernel here — mirroring the serving int8 path, which quantizes
        the composed kernel per-output-channel while the 1-px border
        corrections stay fp with the raw 3x3 ``kernel``.

    Returns: (B, 2H, 2W, Cout). Bias/activation are the caller's.
    """
    B, H, W, Cin = x.shape
    Cout = kernel.shape[-1]
    kc = (compose_upsample_kernel(kernel)
          if composed_kernel is None else composed_kernel)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    if PS_FORM:
        y = lhs_dilated_conv_ps(xp, kc, precision)
    else:
        y = lax.conv_general_dilated(
            xp, kc, (1, 1), ((1, 1), (1, 1)), lhs_dilation=(2, 2),
            dimension_numbers=_DN, precision=precision)

    # ---- border corrections: subtract the phantom-row/col contributions
    # the 3x3 conv's zero padding would have zeroed ----
    r_top = _strip_up_phantom(x[:, 0])        # u_ph(-1, :)  == x row 0 up'd
    r_bot = _strip_up_phantom(x[:, -1])       # u_ph(2H, :)
    c_left = _strip_up_phantom(x[:, :, 0])    # u_ph(:, -1)
    c_right = _strip_up_phantom(x[:, :, -1])  # u_ph(:, 2W)

    corr_top = _border_conv(r_top, kernel[0], precision)      # (B, 2W, Cout)
    corr_bot = _border_conv(r_bot, kernel[2], precision)
    corr_left = _border_conv(c_left, kernel[:, 0], precision)  # (B, 2H, Cout)
    corr_right = _border_conv(c_right, kernel[:, 2], precision)

    # corner phantoms u_ph(-1,-1) = x[0,0] etc. are in BOTH the row and col
    # corrections — restore the double-subtraction inside the strips
    def dot(px, kk):  # (B, Cin) x (Cin, Cout)
        return jnp.tensordot(px, kk, axes=([-1], [0]))

    corr_top = corr_top.at[:, 0].add(-dot(x[:, 0, 0], kernel[0, 0]))
    corr_top = corr_top.at[:, -1].add(-dot(x[:, 0, -1], kernel[0, 2]))
    corr_bot = corr_bot.at[:, 0].add(-dot(x[:, -1, 0], kernel[2, 0]))
    corr_bot = corr_bot.at[:, -1].add(-dot(x[:, -1, -1], kernel[2, 2]))

    y = y - jnp.pad(corr_top[:, None], ((0, 0), (0, 2 * H - 1), (0, 0), (0, 0)))
    y = y - jnp.pad(corr_bot[:, None], ((0, 0), (2 * H - 1, 0), (0, 0), (0, 0)))
    y = y - jnp.pad(corr_left[:, :, None], ((0, 0), (0, 0), (0, 2 * W - 1), (0, 0)))
    y = y - jnp.pad(corr_right[:, :, None], ((0, 0), (0, 0), (2 * W - 1, 0), (0, 0)))
    return y
