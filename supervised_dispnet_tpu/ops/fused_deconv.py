"""Pixel-shuffle form of DispNetS's stride-2 ConvTranspose decoder stages.

The reference decoder upsamples with ``ConvTranspose2d(k=3, s=2, p=1,
output_padding=1)`` (reference: ``models/DispNetS.py::upconv``); our exact
analog is flax ``ConvTranspose((3, 3), strides=(2, 2),
padding=((1, 2), (1, 2)))``, which XLA lowers to a conv with
``lhs_dilation=(2, 2)`` over the zero-dilated input — 36 MAC-taps per
low-res pixel if the zeros are multiplied, of which only {1, 2, 2, 4}
taps per output phase are structurally nonzero (9 total).

This module re-orders the SAME fp contractions into one dense 2x2 VALID
conv producing all 4 output phases stacked on the channel axis, followed
by a depth-to-space: 16 MAC-taps per low-res pixel (2.25x fewer), no
dilated intermediate, and the conv is a dense MXU-friendly matmul.

MEASURED NEGATIVE on TPU (BASELINE.md round 5, ``ps_probe --deconv`` +
``fused_decoder_bench --network dispnet``): per-kernel NEUTRAL (+-2% —
unlike the DispResNet 6x6 fused-upconv case, XLA:TPU's stride-2
ConvTranspose lowering does not pay the 2.25x zero-tap penalty), and
end-to-end -19% (12157 -> 9794 img/s bf16 B=256): the depth-to-space
reorder is an extra full-resolution memory pass that also evicts
bias+ELU from the conv's fused epilogue. Kept as a parity-proven
recorded negative; the model registry does not route to it.

Derivation (per axis, kernel rows k[0..2], dilated pad (1, 2)): output
row m = 2j draws only k[1] at x[j]; row m = 2j + 1 draws k[0] at x[j] and
k[2] at x[j + 1] (zero past the edge -> pad x bottom/right by one zero
row/col). Padding each phase's taps into a common 2x2 window over
``pad(x)`` gives ONE VALID conv. Bit-exact reordering vs the dilated
form up to fp summation order (tests/test_fused_deconv.py).

The composition is linear in the learned kernel, so the same function
serves training and inference; the phase-kernel build is O(k^2 Cin Cout)
and fuses into the surrounding jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")


def phase_kernels_from_deconv(kernel: jax.Array) -> jax.Array:
    """(3, 3, Cin, Cout) ConvTranspose kernel -> (2, 2, Cin, 4*Cout)
    phase kernels (py-major then px on the output-channel axis).

    Window position (wy, wx) in {0, 1}^2 indexes pad(x)[j + wy, i + wx].
    Phase (py, px) of the output draws kernel taps of row parity 1 - py
    and column parity 1 - px:
      (0, 0): k[1, 1] @ (0, 0)
      (0, 1): k[1, 0] @ (0, 0), k[1, 2] @ (0, 1)
      (1, 0): k[0, 1] @ (0, 0), k[2, 1] @ (1, 0)
      (1, 1): k[0, 0] @ (0, 0), k[0, 2] @ (0, 1), k[2, 0] @ (1, 0),
              k[2, 2] @ (1, 1)
    """
    Cin, Cout = kernel.shape[2], kernel.shape[3]
    pk = jnp.zeros((2, 2, Cin, 4 * Cout), kernel.dtype)

    def sl(py, px):
        o = (py * 2 + px) * Cout
        return slice(o, o + Cout)

    pk = pk.at[0, 0, :, sl(0, 0)].set(kernel[1, 1])
    pk = pk.at[0, 0, :, sl(0, 1)].set(kernel[1, 0])
    pk = pk.at[0, 1, :, sl(0, 1)].set(kernel[1, 2])
    pk = pk.at[0, 0, :, sl(1, 0)].set(kernel[0, 1])
    pk = pk.at[1, 0, :, sl(1, 0)].set(kernel[2, 1])
    pk = pk.at[0, 0, :, sl(1, 1)].set(kernel[0, 0])
    pk = pk.at[0, 1, :, sl(1, 1)].set(kernel[0, 2])
    pk = pk.at[1, 0, :, sl(1, 1)].set(kernel[2, 0])
    pk = pk.at[1, 1, :, sl(1, 1)].set(kernel[2, 2])
    return pk


def deconv2x_ps(x: jax.Array, kernel: jax.Array, precision=None) -> jax.Array:
    """Exactly ``ConvTranspose(k=3, s=2, padding=((1, 2), (1, 2)))(x)``
    (no bias) in pixel-shuffle form.

    x: (B, H, W, Cin); kernel: (3, 3, Cin, Cout) in flax ConvTranspose
    HWIO layout (not flipped). Returns (B, 2H, 2W, Cout).
    """
    B, H, W, _ = x.shape
    Cout = kernel.shape[-1]
    pk = phase_kernels_from_deconv(kernel)
    xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    y = lax.conv_general_dilated(
        xp, pk, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=_DN, precision=precision)  # (B, H, W, 4*Cout)
    y = y.reshape(B, H, W, 2, 2, Cout)
    y = y.transpose(0, 1, 3, 2, 4, 5)  # (B, H, 2, W, 2, Cout)
    return y.reshape(B, 2 * H, 2 * W, Cout)
