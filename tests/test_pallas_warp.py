"""Pallas bilinear warp kernel vs XLA sampler (value + all three grads)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from supervised_dispnet_tpu.ops.pallas.warp import bilinear_sample_pallas
from supervised_dispnet_tpu.ops.sampling import bilinear_sample


def _case(B=2, H=12, W=20, C=3, Ho=7, Wo=9, seed=0, spread=1.3):
    rng = np.random.default_rng(seed)
    img = rng.standard_normal((B, H, W, C)).astype(np.float32)
    x = (rng.uniform(-0.2, 1.2, (B, Ho, Wo)) * (W - 1) * spread - 2).astype(np.float32)
    y = (rng.uniform(-0.2, 1.2, (B, Ho, Wo)) * (H - 1) * spread - 2).astype(np.float32)
    return jnp.asarray(img), jnp.asarray(x), jnp.asarray(y)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_forward_matches_xla(padding_mode):
    img, x, y = _case()
    ref = bilinear_sample(img, x, y, padding_mode=padding_mode)
    got = bilinear_sample_pallas(img, x, y, padding_mode=padding_mode,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_forward_single_channel():
    img, x, y = _case(C=1, seed=3)
    ref = bilinear_sample(img, x, y)
    got = bilinear_sample_pallas(img, x, y, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_grads_match_xla(padding_mode):
    img, x, y = _case(B=1, H=10, W=14, C=2, Ho=5, Wo=6, seed=1, spread=1.0)

    def loss_ref(img, x, y):
        out = bilinear_sample(img, x, y, padding_mode=padding_mode)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    def loss_got(img, x, y):
        out = bilinear_sample_pallas(img, x, y, padding_mode=padding_mode,
                                     interpret=True)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(img, x, y)
    g_got = jax.grad(loss_got, argnums=(0, 1, 2))(img, x, y)
    for a, b, name in zip(g_got, g_ref, ("img", "x", "y")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_grads_border_integer_coords_subgradient():
    """At exact integer coords the XLA and kernel subgradients must agree
    (both use floor-based corners)."""
    img = jnp.asarray(np.random.default_rng(2).standard_normal((1, 8, 8, 1)).astype(np.float32))
    x = jnp.asarray(np.array([[[2.0, 3.5]]], np.float32))
    y = jnp.asarray(np.array([[[4.0, 1.5]]], np.float32))

    g_ref = jax.grad(lambda i: jnp.sum(bilinear_sample(i, x, y) ** 2))(img)
    g_got = jax.grad(lambda i: jnp.sum(
        bilinear_sample_pallas(i, x, y, interpret=True) ** 2))(img)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)


def test_coords_only_grads_match_diff_img_variant():
    """diff_img=False must give identical x/y grads to the full variant."""
    img, x, y = _case(B=1, H=10, W=14, C=2, Ho=5, Wo=6, seed=4, spread=1.0)

    def loss(fn):
        return lambda x, y: jnp.sum(fn(x, y) ** 2)

    full = loss(lambda x, y: bilinear_sample_pallas(img, x, y, interpret=True))
    coords = loss(lambda x, y: bilinear_sample_pallas(
        img, x, y, interpret=True, diff_img=False))

    g_full = jax.grad(full, argnums=(0, 1))(x, y)
    g_coords = jax.grad(coords, argnums=(0, 1))(x, y)
    for a, b in zip(g_coords, g_full):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    # forward equal too
    np.testing.assert_allclose(
        np.asarray(bilinear_sample_pallas(img, x, y, interpret=True, diff_img=False)),
        np.asarray(bilinear_sample_pallas(img, x, y, interpret=True)),
        rtol=1e-6)
