"""Pixel-shuffle ConvTranspose (ops/fused_deconv.py) parity: the fused
DispNetS decoder must be a pure reordering of flax ConvTranspose's fp
contractions — same outputs (to fp rounding), same gradients, same param
tree."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from supervised_dispnet_tpu.models.dispnet import DispNetS
from supervised_dispnet_tpu.ops.fused_deconv import deconv2x_ps


def _ref_deconv(x, kernel):
    """The exact op UpConvELU uses (flax ConvTranspose lowering)."""
    return jax.lax.conv_transpose(
        x, kernel, (2, 2), ((1, 2), (1, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)


@pytest.mark.quick
def test_deconv2x_ps_matches_conv_transpose():
    rng = np.random.default_rng(0)
    for (h, w, cin, cout) in [(8, 12, 5, 7), (16, 16, 4, 4), (3, 5, 2, 3)]:
        x = jnp.asarray(rng.normal(size=(2, h, w, cin)).astype(np.float32))
        k = jnp.asarray(
            rng.normal(size=(3, 3, cin, cout)).astype(np.float32))
        ref = _ref_deconv(x, k)
        got = deconv2x_ps(x, k, precision=jax.lax.Precision.HIGHEST)
        assert got.shape == (2, 2 * h, 2 * w, cout)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_deconv2x_ps_grad_parity():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 6, 9, 4)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 4, 5)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(2, 12, 18, 5)).astype(np.float32))

    def loss_ref(x, k):
        return jnp.sum(_ref_deconv(x, k) * cot)

    def loss_ps(x, k):
        return jnp.sum(
            deconv2x_ps(x, k, precision=jax.lax.Precision.HIGHEST) * cot)

    gx_r, gk_r = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    gx_p, gk_p = jax.grad(loss_ps, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_r),
                               rtol=1e-4, atol=1e-4)


def test_dispnet_fused_upsample_forward_parity_and_param_tree():
    """DispNetS(fused_upsample=True): identical param tree, outputs equal
    to fp rounding — the fused decoder is the same weights, reordered."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 96, 3)).astype(np.float32))
    m0 = DispNetS()
    m1 = DispNetS(fused_upsample=True)
    v0 = m0.init(jax.random.PRNGKey(0), x)
    v1 = m1.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(v0)
            == jax.tree_util.tree_structure(v1))
    for (p0, a), (p1, b) in zip(
            jax.tree_util.tree_leaves_with_path(v0),
            jax.tree_util.tree_leaves_with_path(v1)):
        assert p0 == p1 and a.shape == b.shape
    outs0 = m0.apply(v0, x)
    outs1 = m1.apply(v0, x)  # same params through the fused graph
    for d0, d1 in zip(outs0, outs1):
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d0),
                                   rtol=2e-4, atol=2e-5)


def test_dispnet_fused_upsample_odd_sizes():
    """Non-multiple-of-64 input: crop_like handles the 2x stage geometry
    the same way on both paths."""
    x = jnp.asarray(
        np.random.default_rng(3).uniform(
            0, 1, (1, 72, 104, 3)).astype(np.float32))
    m1 = DispNetS(fused_upsample=True)
    v1 = m1.init(jax.random.PRNGKey(0), x)
    outs = m1.apply(v1, x)
    assert outs[0].shape == (1, 72, 104, 1)
    m0 = DispNetS()
    outs0 = m0.apply(v1, x)
    for d0, d1 in zip(outs0, outs):
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d0),
                                   rtol=2e-4, atol=2e-5)
