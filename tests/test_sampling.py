"""Parity tests: ops.sampling vs torch.nn.functional.grid_sample (CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn.functional as F

from supervised_dispnet_tpu.ops.sampling import bilinear_sample, grid_sample


def _rand_img(B=2, H=13, W=17, C=3, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((B, H, W, C)).astype(np.float32)


def _rand_grid(B=2, Ho=9, Wo=11, seed=1, scale=1.3):
    rng = np.random.default_rng(seed)
    # includes out-of-bounds coords (scale > 1) to exercise padding
    return (rng.uniform(-1, 1, (B, Ho, Wo, 2)) * scale).astype(np.float32)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
@pytest.mark.parametrize("align_corners", [False, True])
def test_grid_sample_matches_torch(padding_mode, align_corners):
    img = _rand_img()
    grid = _rand_grid()

    ours = grid_sample(
        jnp.asarray(img), jnp.asarray(grid),
        padding_mode=padding_mode, align_corners=align_corners,
    )

    t_img = torch.from_numpy(img).permute(0, 3, 1, 2)  # NCHW
    t_out = F.grid_sample(
        t_img, torch.from_numpy(grid),
        mode="bilinear", padding_mode=padding_mode, align_corners=align_corners,
    ).permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(np.asarray(ours), t_out, rtol=1e-5, atol=1e-5)


@pytest.mark.quick
def test_grid_sample_identity():
    """An align_corners=True identity grid must reproduce the image."""
    img = _rand_img(B=1, H=8, W=8, C=2)
    H = W = 8
    ys, xs = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W), indexing="ij")
    grid = np.stack([xs, ys], axis=-1)[None].astype(np.float32)
    out = grid_sample(jnp.asarray(img), jnp.asarray(grid), align_corners=True)
    np.testing.assert_allclose(np.asarray(out), img, rtol=1e-5, atol=1e-5)


@pytest.mark.quick
def test_bilinear_sample_pixel_space():
    """Integer pixel coords return exact pixels; OOB returns 0 under zeros."""
    img = _rand_img(B=1, H=6, W=7, C=4)
    x = np.array([[[0.0, 3.0, 6.0, -2.0, 9.0]]], dtype=np.float32)
    y = np.array([[[0.0, 2.0, 5.0, -2.0, 9.0]]], dtype=np.float32)
    out = np.asarray(bilinear_sample(jnp.asarray(img), jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(out[0, 0, 0], img[0, 0, 0], rtol=1e-6)
    np.testing.assert_allclose(out[0, 0, 1], img[0, 2, 3], rtol=1e-6)
    np.testing.assert_allclose(out[0, 0, 2], img[0, 5, 6], rtol=1e-6)
    np.testing.assert_allclose(out[0, 0, 3], 0.0, atol=1e-7)
    np.testing.assert_allclose(out[0, 0, 4], 0.0, atol=1e-7)


def test_bilinear_sample_border_clamps():
    img = _rand_img(B=1, H=6, W=7, C=1)
    x = np.array([[[-5.0, 100.0]]], dtype=np.float32)
    y = np.array([[[-5.0, 100.0]]], dtype=np.float32)
    out = np.asarray(
        bilinear_sample(jnp.asarray(img), jnp.asarray(x), jnp.asarray(y), padding_mode="border")
    )
    np.testing.assert_allclose(out[0, 0, 0], img[0, 0, 0], rtol=1e-6)
    np.testing.assert_allclose(out[0, 0, 1], img[0, 5, 6], rtol=1e-6)


def test_grid_sample_gradients_flow():
    import jax

    img = jnp.asarray(_rand_img(B=1, H=8, W=8, C=1))
    grid = jnp.asarray(_rand_grid(B=1, Ho=4, Wo=4, scale=0.9))

    def loss_fn(g):
        return jnp.sum(grid_sample(img, g) ** 2)

    g = jax.grad(loss_fn)(grid)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_upsample2x_bilinear_parity():
    """The (unwired, negative-result) stencil upsample matches
    jax.image.resize and torch F.interpolate exactly."""
    import jax

    from supervised_dispnet_tpu.ops.resize import upsample2x_bilinear

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 7, 9, 3)).astype(np.float32)
    ours = np.asarray(upsample2x_bilinear(jnp.asarray(x)))
    ref = np.asarray(jax.image.resize(jnp.asarray(x), (2, 14, 18, 3), "bilinear"))
    tref = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                         scale_factor=2, mode="bilinear",
                         align_corners=False).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-6)
    np.testing.assert_allclose(ours, tref, atol=1e-6)
