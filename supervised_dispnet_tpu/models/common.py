"""Shared model building blocks (flax.linen, NHWC).

Conv blocks mirror the reference's conv+ELU vocabulary (reference:
``models/DispNetS.py::{downsample_conv, conv, upconv, predict_disp}``) but
are NHWC/HWIO so XLA tiles them straight onto the MXU; weights are
xavier-uniform like the reference's ``init_weights``.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import flax.linen as nn

# Disparity head output scaling (reference: DispNetS alpha/beta constants).
DISP_ALPHA = 10.0
DISP_BETA = 0.01

xavier_uniform = nn.initializers.xavier_uniform()


def _save_convs_policy(prim, *_, **__):
    """jax.checkpoint policy for ``remat='conv'``: conv/matmul outputs are
    saveable residuals; everything else (BN, ELU, adds) is recomputed in
    the backward pass. Hypothesis (from the round-5 training closure: the
    step is HBM-bound at ~100% of nominal roofline): dropping the saved
    elementwise activations cuts the dominant traffic term while avoiding
    full remat's conv re-execution (measured NEGATIVE, round 4).

    MEASURED NEGATIVE TOO (BASELINE.md round-5 training closure, -8.3%
    at B=128 with bytes/step UP 67.2->75.9 GB): XLA's default autodiff
    residual selection already recomputes cheap elementwise tails inside
    backward fusions where profitable; forcing the policy materializes
    the recompute instead. Kept as a measured knob (grad-parity tested),
    not a recommendation."""
    return prim.name in ("conv_general_dilated", "dot_general")


def remat_wrap(cls, remat, static_argnums=()):
    """``remat`` falsy -> ``cls`` unchanged; ``True``/``'full'`` ->
    ``nn.remat`` with the default save-nothing policy; ``'conv'`` ->
    ``nn.remat`` saving conv outputs only (see ``_save_convs_policy``)."""
    if not remat:
        return cls
    policy = _save_convs_policy if remat == "conv" else None
    return nn.remat(cls, static_argnums=static_argnums, policy=policy)


def model_takes_train(model) -> bool:
    """Whether the model's ``__call__`` accepts a ``train=`` kwarg
    (BN-bearing models do; plain conv+ELU ones don't). Signature-based so
    callers never have to catch TypeError around a full forward pass —
    which would silently swallow and re-run a genuine TypeError raised
    inside the model (ADVICE r1)."""
    import inspect

    try:
        sig = inspect.signature(type(model).__call__)
    except (TypeError, ValueError):
        return False
    return "train" in sig.parameters


def apply_model(model, variables, *args):
    """Eval-mode forward that passes ``train=False`` only when the model's
    signature takes it."""
    if model_takes_train(model):
        return model.apply(variables, *args, train=False)
    return model.apply(variables, *args)


class ConvELU(nn.Module):
    """3x3 (or kxk) conv + ELU."""

    features: int
    kernel: int = 3
    stride: int = 1
    dtype: object = None  # compute dtype (bf16 for MXU speed); params stay fp32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((self.kernel - 1) // 2, (self.kernel - 1) // 2),
            kernel_init=xavier_uniform,
            dtype=self.dtype,
        )(x)
        return nn.elu(x)


class DownsampleConv(nn.Module):
    """stride-2 conv + ELU, then stride-1 conv + ELU.

    (reference: ``models/DispNetS.py::downsample_conv``)
    """

    features: int
    kernel: int = 3
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        x = ConvELU(self.features, self.kernel, stride=2, dtype=self.dtype, name="conv_a")(x)
        x = ConvELU(self.features, self.kernel, stride=1, dtype=self.dtype, name="conv_b")(x)
        return x


class _PSConvTranspose(nn.Module):
    """Parameter-compatible stand-in for the ``nn.ConvTranspose`` inside
    ``UpConvELU`` (parent names it ``ConvTranspose_0``): declares the SAME
    ``kernel``/``bias``, but computes the transposed conv in its
    pixel-shuffle form (``ops.fused_deconv.deconv2x_ps``) — one dense 2x2
    conv to 4*Cout + depth-to-space, 2.25x fewer MAC-taps than the
    lhs-dilated form. MEASURED NEGATIVE on TPU (BASELINE.md round 5):
    kernel-level neutral (XLA:TPU's ConvTranspose lowering already skips
    the dilation zeros, unlike the 6x6 fused-upconv case), end-to-end
    -19% (the depth-to-space reorder is an extra full-res memory pass
    that evicts bias+ELU from the conv epilogue). Kept for study; the
    registry does not expose it."""

    features: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        from supervised_dispnet_tpu.ops.fused_deconv import deconv2x_ps

        kernel = self.param("kernel", xavier_uniform,
                            (3, 3, x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        cdt = self.dtype or jnp.result_type(x.dtype, kernel.dtype)
        y = deconv2x_ps(x.astype(cdt), kernel.astype(cdt))
        return y + bias.astype(cdt)


class UpConvELU(nn.Module):
    """2x transposed-conv upsample + ELU.

    (reference: ``models/DispNetS.py::upconv`` — ConvTranspose2d(k=3, s=2))
    """

    features: int
    dtype: object = None
    fused: bool = False  # pixel-shuffle form of the same transposed conv
    #   (exact to fp summation order, identical param tree) — DispNetS's
    #   analog of the DispResNet fused decoder

    @nn.compact
    def __call__(self, x):
        # padding ((1, 2), (1, 2)) reproduces torch ConvTranspose2d(k=3, s=2,
        # p=1, output_padding=1) pixel alignment exactly (converter flips the
        # kernel spatially); output is exactly 2x input
        if self.fused:
            x = _PSConvTranspose(self.features, dtype=self.dtype,
                                 name="ConvTranspose_0")(x)
        else:
            x = nn.ConvTranspose(
                self.features,
                (3, 3),
                strides=(2, 2),
                padding=((1, 2), (1, 2)),
                kernel_init=xavier_uniform,
                dtype=self.dtype,
            )(x)
        return nn.elu(x)


class DispHead(nn.Module):
    """3x3 conv -> sigmoid -> alpha * s + beta disparity head.

    (reference: ``models/DispNetS.py::predict_disp``)
    """

    alpha: float = DISP_ALPHA
    beta: float = DISP_BETA

    @nn.compact
    def __call__(self, x):
        # head always computes/emits fp32 (disparity feeds 1/d and losses)
        x = nn.Conv(1, (3, 3), padding=1, kernel_init=xavier_uniform,
                    dtype=jnp.float32)(x.astype(jnp.float32))
        return self.alpha * nn.sigmoid(x) + self.beta


def crop_like(x: jax.Array, ref: jax.Array) -> jax.Array:
    """Crop spatial dims of x down to ref's (deconv overshoot on odd sizes)."""
    return x[:, : ref.shape[1], : ref.shape[2], :]
