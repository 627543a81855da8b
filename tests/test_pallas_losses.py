"""Pallas loss kernels vs XLA reference implementations (interpret mode on
the CPU backend; compiled path is exercised on TPU by the bench)."""

import numpy as np
import jax.numpy as jnp

from supervised_dispnet_tpu.losses import berhu_loss, depth_classification_loss
from supervised_dispnet_tpu.losses.classification import DepthBins
from supervised_dispnet_tpu.ops.pallas import (
    berhu_loss_pallas,
    depth_classification_loss_pallas,
)


def _depth_pair(B=2, H=24, W=40, seed=0):
    rng = np.random.default_rng(seed)
    gt = rng.uniform(1.0, 60.0, (B, H, W)).astype(np.float32)
    pred = gt * rng.uniform(0.7, 1.4, (B, H, W)).astype(np.float32)
    mask = rng.uniform(size=(B, H, W)) > 0.6
    return jnp.asarray(gt), jnp.asarray(pred), jnp.asarray(mask)


def test_berhu_pallas_matches_xla():
    gt, pred, mask = _depth_pair(seed=1)
    ref = float(berhu_loss(pred, gt, mask))
    got = float(berhu_loss_pallas(pred, gt, mask, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_berhu_pallas_nondivisible_sizes():
    gt, pred, mask = _depth_pair(B=1, H=17, W=23, seed=2)
    ref = float(berhu_loss(pred, gt, mask))
    got = float(berhu_loss_pallas(pred, gt, mask, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_ce_pallas_matches_xla():
    B, H, W, K = 2, 16, 24, 64
    bins = DepthBins(num_bins=K)
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.standard_normal((B, H, W, K)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(1, 80, (B, H, W)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=(B, H, W)) > 0.5)
    ref = float(depth_classification_loss(logits, gt, mask, bins))
    got = float(depth_classification_loss_pallas(logits, gt, mask, bins,
                                                 interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_ce_pallas_nonpadded_bins():
    """K=48 (not a lane multiple) exercises the -inf bin padding."""
    B, H, W, K = 1, 8, 8, 48
    bins = DepthBins(num_bins=K)
    rng = np.random.default_rng(4)
    logits = jnp.asarray(rng.standard_normal((B, H, W, K)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(1, 80, (B, H, W)).astype(np.float32))
    mask = jnp.asarray(np.ones((B, H, W), bool))
    ref = float(depth_classification_loss(logits, gt, mask, bins))
    got = float(depth_classification_loss_pallas(logits, gt, mask, bins,
                                                 interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_berhu_pallas_grad_matches_xla():
    import jax

    gt, pred, mask = _depth_pair(seed=5)

    def xla_fn(p):
        return berhu_loss(p, gt, mask)

    def pallas_fn(p):
        return berhu_loss_pallas(p, gt, mask, interpret=True)

    g_ref = jax.grad(xla_fn)(pred)
    g_got = jax.grad(pallas_fn)(pred)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-7)


def test_ce_pallas_grad_matches_xla():
    import jax

    B, H, W, K = 1, 8, 16, 64
    bins = DepthBins(num_bins=K)
    rng = np.random.default_rng(6)
    logits = jnp.asarray(rng.standard_normal((B, H, W, K)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(1, 80, (B, H, W)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=(B, H, W)) > 0.4)

    g_ref = jax.grad(lambda l: depth_classification_loss(l, gt, mask, bins))(logits)
    g_got = jax.grad(lambda l: depth_classification_loss_pallas(
        l, gt, mask, bins, interpret=True))(logits)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-7)
