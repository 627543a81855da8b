"""Golden-value tests for losses vs torch/numpy implementations."""

import pytest

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from supervised_dispnet_tpu.losses import (
    l1_loss, berhu_loss, scale_invariant_loss, multiscale_supervised_loss,
    DepthBins, depth_classification_loss, logits_to_depth,
    photometric_reconstruction_loss, explainability_loss, smooth_loss,
    compute_errors,
)


def _depth_pair(B=2, H=12, W=16, seed=0):
    rng = np.random.default_rng(seed)
    gt = rng.uniform(1.0, 60.0, (B, H, W)).astype(np.float32)
    pred = gt * rng.uniform(0.7, 1.4, (B, H, W)).astype(np.float32)
    mask = (rng.uniform(size=(B, H, W)) > 0.6)  # sparse like LiDAR
    return gt, pred, mask


def test_l1_masked():
    gt, pred, mask = _depth_pair()
    ours = float(l1_loss(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask)))
    ref = np.abs(pred - gt)[mask].mean()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


@pytest.mark.quick
def test_berhu_matches_manual():
    gt, pred, mask = _depth_pair(seed=1)
    ours = float(berhu_loss(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask)))
    d = (pred - gt) * mask
    c = 0.2 * np.abs(d).max()
    absd = np.abs(d)
    per = np.where(absd <= c, absd, (d * d + c * c) / (2 * c))
    ref = per[mask].mean()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


@pytest.mark.quick
def test_scale_invariant_matches_manual():
    gt, pred, mask = _depth_pair(seed=2)
    ours = float(scale_invariant_loss(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask)))
    d = (np.log(pred) - np.log(gt))[mask]
    ref = (d ** 2).mean() - 0.5 * d.mean() ** 2
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_scale_invariant_is_scale_invariant():
    gt, pred, mask = _depth_pair(seed=3)
    a = float(scale_invariant_loss(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask), lam=1.0))
    b = float(scale_invariant_loss(jnp.asarray(pred * 3.7), jnp.asarray(gt), jnp.asarray(mask), lam=1.0))
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5)


def test_classification_ce_matches_torch():
    B, H, W, K = 2, 8, 10, 32
    bins = DepthBins(num_bins=K, min_depth=1.0, max_depth=80.0, spacing="log")
    rng = np.random.default_rng(4)
    logits = rng.standard_normal((B, H, W, K)).astype(np.float32)
    gt = rng.uniform(1.0, 80.0, (B, H, W)).astype(np.float32)
    mask = rng.uniform(size=(B, H, W)) > 0.5

    ours = float(depth_classification_loss(
        jnp.asarray(logits), jnp.asarray(gt), jnp.asarray(mask), bins))

    labels = np.asarray(bins.depth_to_index(jnp.asarray(gt)))
    t_logits = torch.from_numpy(logits).reshape(-1, K)
    t_labels = torch.from_numpy(labels).reshape(-1).long()
    t_mask = torch.from_numpy(mask).reshape(-1)
    ce = F.cross_entropy(t_logits[t_mask], t_labels[t_mask])
    np.testing.assert_allclose(ours, float(ce), rtol=1e-5)


@pytest.mark.quick
def test_soft_decode_recovers_bin_center():
    bins = DepthBins(num_bins=16, min_depth=1.0, max_depth=80.0, spacing="log")
    centers = np.asarray(bins.centers())
    logits = np.full((1, 2, 2, 16), -30.0, dtype=np.float32)
    logits[..., 5] = 30.0
    depth = np.asarray(logits_to_depth(jnp.asarray(logits), bins))
    np.testing.assert_allclose(depth, centers[5], rtol=1e-4)


def test_depth_to_index_roundtrip_monotone():
    bins = DepthBins(num_bins=64, spacing="log")
    d = jnp.linspace(1.0, 80.0, 500)
    idx = np.asarray(bins.depth_to_index(d))
    assert (np.diff(idx) >= 0).all()
    assert idx.min() == 0 and idx.max() == 63
    # centers land inside their own bin
    c = bins.centers()
    ci = np.asarray(bins.depth_to_index(c))
    np.testing.assert_array_equal(ci, np.arange(64))


@pytest.mark.quick
def test_compute_errors_matches_numpy_reference():
    gt, pred, mask = _depth_pair(seed=5)
    out = {k: float(v) for k, v in compute_errors(
        jnp.asarray(gt), jnp.asarray(pred), jnp.asarray(mask)).items()}
    g, p = gt[mask], pred[mask]
    thresh = np.maximum(g / p, p / g)
    np.testing.assert_allclose(out["a1"], (thresh < 1.25).mean(), rtol=1e-5)
    np.testing.assert_allclose(out["a2"], (thresh < 1.25**2).mean(), rtol=1e-5)
    np.testing.assert_allclose(out["a3"], (thresh < 1.25**3).mean(), rtol=1e-5)
    np.testing.assert_allclose(out["abs_rel"], (np.abs(g - p) / g).mean(), rtol=1e-5)
    np.testing.assert_allclose(out["sq_rel"], ((g - p) ** 2 / g).mean(), rtol=1e-5)
    np.testing.assert_allclose(out["rmse"], np.sqrt(((g - p) ** 2).mean()), rtol=1e-5)
    np.testing.assert_allclose(
        out["rmse_log"], np.sqrt(((np.log(g) - np.log(p)) ** 2).mean()), rtol=1e-4)


def test_smooth_loss_matches_torch_impl():
    rng = np.random.default_rng(6)
    maps = [rng.standard_normal((2, 16 // 2**s, 24 // 2**s)).astype(np.float32) for s in range(3)]
    ours = float(smooth_loss([jnp.asarray(m) for m in maps]))

    def t_gradient(pred):
        d_dy = pred[:, 1:] - pred[:, :-1]
        d_dx = pred[:, :, 1:] - pred[:, :, :-1]
        return d_dx, d_dy

    loss, weight = 0.0, 1.0
    for m in maps:
        t = torch.from_numpy(m)
        dx, dy = t_gradient(t)
        dx2, dxdy = t_gradient(dx)
        dydx, dy2 = t_gradient(dy)
        loss += float(dx2.abs().mean() + dxdy.abs().mean() + dydx.abs().mean() + dy2.abs().mean()) * weight
        weight /= 2.3
    np.testing.assert_allclose(ours, loss, rtol=1e-5)


def test_explainability_loss_golden():
    m = [jnp.full((1, 4, 4, 2), 0.5)]
    ours = float(explainability_loss(m))
    np.testing.assert_allclose(ours, np.log(2.0), rtol=1e-5)


@pytest.mark.quick
def test_photometric_zero_for_identity():
    """Same image, zero pose, correct depth -> near-zero photometric loss."""
    B, H, W = 1, 16, 32
    rng = np.random.default_rng(7)
    img = rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)
    K = np.array([[[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]]], dtype=np.float32)
    depths = [jnp.full((B, H // 2**s, W // 2**s), 5.0) for s in range(3)]
    pose = np.zeros((B, 1, 6), dtype=np.float32)
    loss, warped = jax.jit(
        lambda tgt, refs, K, d, pose: photometric_reconstruction_loss(
            tgt, refs, K, d, None, pose)
    )(jnp.asarray(img), [jnp.asarray(img)], jnp.asarray(K),
      depths, jnp.asarray(pose))
    assert float(loss) < 1e-4
    assert warped[0].shape == (B, H, W, 3)


def test_photometric_nonzero_for_shifted():
    B, H, W = 1, 16, 32
    rng = np.random.default_rng(8)
    img = rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)
    K = np.array([[[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]]], dtype=np.float32)
    depths = [jnp.full((B, H, W), 5.0)]
    pose = np.zeros((B, 1, 6), dtype=np.float32)
    pose[0, 0, 0] = 0.5
    loss, _ = photometric_reconstruction_loss(
        jnp.asarray(img), [jnp.asarray(img)], jnp.asarray(K),
        depths, None, jnp.asarray(pose))
    assert float(loss) > 1e-2


def test_photometric_remat_loss_and_grads_equal():
    """remat=True (checkpoint each (scale, ref) photometric term) must
    change neither the loss value nor the gradients wrt depth, pose, and
    explainability masks (the --remat self-sup path)."""
    B, H, W = 2, 16, 32
    rng = np.random.default_rng(9)
    tgt = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    refs = [jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
            for _ in range(2)]
    K = jnp.asarray(np.broadcast_to(
        np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]],
                 np.float32), (B, 3, 3)).copy())
    depths0 = [jnp.asarray(rng.uniform(3, 8, (B, H // 2**s, W // 2**s))
                           .astype(np.float32)) for s in range(3)]
    masks0 = [jnp.asarray(rng.uniform(0.2, 1, (B, H // 2**s, W // 2**s, 2))
                          .astype(np.float32)) for s in range(3)]
    pose0 = jnp.asarray(rng.uniform(-0.05, 0.05, (B, 2, 6))
                        .astype(np.float32))

    def loss_fn(depths, masks, pose, remat):
        l, _ = photometric_reconstruction_loss(
            tgt, refs, K, depths, masks, pose, remat=remat)
        return l

    v0, g0 = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(
        depths0, masks0, pose0, False)
    v1, g1 = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(
        depths0, masks0, pose0, True)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_photometric_batched_refs_loss_and_grads_equal():
    """batch_refs=True (ONE (R*B)-batched inverse_warp per scale — the
    measured-slower A/B arm, BASELINE.md round-4) must equal the per-ref
    loop (batch_refs=False, the default) in loss, gradients, and the
    logged finest warps: sum_r mean_r == R * mean(concat).

    Full tier (not `quick`): the non-default arm's grad compile costs
    ~40 s; quick's losses representative is the identity-pose golden
    test above."""
    B, H, W = 2, 16, 32
    rng = np.random.default_rng(11)
    tgt = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    refs = [jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
            for _ in range(2)]
    K = jnp.asarray(np.broadcast_to(
        np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]],
                 np.float32), (B, 3, 3)).copy())
    depths0 = [jnp.asarray(rng.uniform(3, 8, (B, H // 2**s, W // 2**s))
                           .astype(np.float32)) for s in range(3)]
    masks0 = [jnp.asarray(rng.uniform(0.2, 1, (B, H // 2**s, W // 2**s, 2))
                          .astype(np.float32)) for s in range(3)]
    pose0 = jnp.asarray(rng.uniform(-0.05, 0.05, (B, 2, 6))
                        .astype(np.float32))

    def loss_fn(depths, masks, pose, batch_refs):
        l, _ = photometric_reconstruction_loss(
            tgt, refs, K, depths, masks, pose, batch_refs=batch_refs)
        return l

    v0, g0 = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(
        depths0, masks0, pose0, False)
    v1, g1 = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(
        depths0, masks0, pose0, True)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    _, w0 = photometric_reconstruction_loss(
        tgt, refs, K, depths0, masks0, pose0, batch_refs=False)
    _, w1 = photometric_reconstruction_loss(
        tgt, refs, K, depths0, masks0, pose0, batch_refs=True)
    assert len(w0) == len(w1) == 2
    for a, b in zip(w0, w1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_photometric_stochastic_unbiased_and_runs():
    """stochastic_stride=2 (the --stochastic-photo lever): each phase's
    loss must be the full photometric loss restricted to that phase's
    pixel subset — the phase-adjusted intrinsics make the subsampled warp
    EXACTLY the full warp at those pixels — so the average over all 4
    phases equals the full-pixel loss to fp rounding (unbiased
    estimator). Also: the rng arm jits and differentiates finite."""
    B, H, W = 2, 16, 32
    rng = np.random.default_rng(12)
    tgt = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    refs = [jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
            for _ in range(2)]
    K = jnp.asarray(np.broadcast_to(
        np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]],
                 np.float32), (B, 3, 3)).copy())
    depths0 = [jnp.asarray(rng.uniform(3, 8, (B, H // 2**s, W // 2**s))
                           .astype(np.float32)) for s in range(3)]
    masks0 = [jnp.asarray(rng.uniform(0.2, 1, (B, H // 2**s, W // 2**s, 2))
                          .astype(np.float32)) for s in range(3)]
    pose0 = jnp.asarray(rng.uniform(-0.05, 0.05, (B, 2, 6))
                        .astype(np.float32))

    full, _ = photometric_reconstruction_loss(
        tgt, refs, K, depths0, masks0, pose0)
    phase_losses = []
    for oy in range(2):
        for ox in range(2):
            l, w = photometric_reconstruction_loss(
                tgt, refs, K, depths0, masks0, pose0,
                stochastic_stride=2,
                stochastic_phases=(((oy, ox),) * 3))
            phase_losses.append(float(l))
            assert w[0].shape == (B, H // 2, W // 2, 3)
    np.testing.assert_allclose(np.mean(phase_losses), float(full),
                               rtol=1e-5)
    # the estimator varies across phases (it is a subsample, not a copy)
    assert np.std(phase_losses) > 0

    # rng arm: jitted value_and_grad, finite, and phase actually varies
    @jax.jit
    def vg(depths, pose, key):
        def f(depths, pose):
            l, _ = photometric_reconstruction_loss(
                tgt, refs, K, depths, masks0, pose,
                stochastic_stride=2, rng=key)
            return l
        return jax.value_and_grad(f, argnums=(0, 1))(depths, pose)

    v1, g1 = vg(depths0, pose0, jax.random.PRNGKey(0))
    v2, _ = vg(depths0, pose0, jax.random.PRNGKey(3))
    assert np.isfinite(float(v1)) and np.isfinite(float(v2))
    for g in jax.tree_util.tree_leaves(g1):
        assert np.isfinite(np.asarray(g)).all()


def test_multiscale_supervised_loss_runs():
    gt, pred, mask = _depth_pair(B=1, H=16, W=32, seed=9)
    preds = [jnp.asarray(pred[:, ::2**s, ::2**s]) for s in range(4)]
    out = float(multiscale_supervised_loss(
        preds, jnp.asarray(gt), jnp.asarray(mask), l1_loss))
    assert np.isfinite(out) and out > 0


def test_soft_decode_golden_all_spacings():
    """Pin the soft-weighted-sum decode against independently computed
    numpy centers for every bin spacing (round-3: previously only the
    default log spacing had a decode test)."""
    K = 8
    lo, hi = 2.0, 40.0
    edges = {
        "linear": np.linspace(lo, hi, K + 1),
        "log": np.exp(np.linspace(np.log(lo), np.log(hi), K + 1)),
        "inverse": 1.0 / np.linspace(1.0 / hi, 1.0 / lo, K + 1)[::-1],
    }
    centers = {
        "linear": 0.5 * (edges["linear"][:-1] + edges["linear"][1:]),
        # log spacing uses the geometric midpoint
        "log": np.sqrt(edges["log"][:-1] * edges["log"][1:]),
        "inverse": 0.5 * (edges["inverse"][:-1] + edges["inverse"][1:]),
    }
    rng = np.random.default_rng(11)
    logits = rng.standard_normal((2, 3, 4, K)).astype(np.float32)
    e = np.exp(logits - logits.max(axis=-1, keepdims=True))
    p = e / e.sum(axis=-1, keepdims=True)
    for spacing in ("linear", "log", "inverse"):
        bins = DepthBins(num_bins=K, min_depth=lo, max_depth=hi,
                         spacing=spacing)
        want = (p * centers[spacing]).sum(axis=-1)
        got = np.asarray(logits_to_depth(jnp.asarray(logits), bins))
        np.testing.assert_allclose(got, want, rtol=1e-5,
                                   err_msg=f"spacing={spacing}")
        # and a one-hot delta decodes to that bin's center exactly
        hot = np.full((1, 1, 1, K), -30.0, np.float32)
        hot[..., 3] = 30.0
        np.testing.assert_allclose(
            np.asarray(logits_to_depth(jnp.asarray(hot), bins)),
            centers[spacing][3], rtol=1e-4, err_msg=f"spacing={spacing}")
