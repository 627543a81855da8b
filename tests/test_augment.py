"""On-device augmentation: geometric/intrinsics consistency."""

import pytest

import numpy as np
import jax
import jax.numpy as jnp

from supervised_dispnet_tpu.data.augment import AugmentConfig, augment_batch, normalize_images


def _batch(B=4, S=3, H=32, W=64, seed=0):
    rng = np.random.default_rng(seed)
    imgs = rng.uniform(0, 1, (B, S, H, W, 3)).astype(np.float32)
    K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]], dtype=np.float32)
    K = np.broadcast_to(K, (B, 3, 3)).copy()
    return jnp.asarray(imgs), jnp.asarray(K)


def test_no_aug_is_normalize_only():
    imgs, K = _batch()
    cfg = AugmentConfig(flip=False, scale_crop=False, color_jitter=False)
    out, new_K = augment_batch(jax.random.PRNGKey(0), imgs, K, config=cfg)
    np.testing.assert_allclose(np.asarray(new_K), np.asarray(K), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out), (np.asarray(imgs) - 0.5) / 0.5, atol=1e-5
    )


def test_shapes_preserved_with_full_aug():
    imgs, K = _batch()
    out, new_K = augment_batch(jax.random.PRNGKey(1), imgs, K)
    assert out.shape == imgs.shape
    assert new_K.shape == K.shape
    assert np.isfinite(np.asarray(out)).all()


def test_depth_rides_same_transform():
    B, S, H, W = 2, 1, 32, 64
    imgs, K = _batch(B=B, S=S, H=H, W=W)
    rng = np.random.default_rng(3)
    depth = np.zeros((B, H, W), dtype=np.float32)
    pts = rng.integers(0, min(H, W), size=(40, 2))
    depth[:, pts[:, 0], pts[:, 1]] = rng.uniform(5, 50, 40).astype(np.float32)
    out, new_K, d = augment_batch(
        jax.random.PRNGKey(2), imgs, K, jnp.asarray(depth)
    )
    d = np.asarray(d)
    assert d.shape == depth.shape
    # nearest-neighbor: every output value must exactly match some input
    # value (no bilinear blending of the sparse map)
    vals = np.unique(depth[depth > 0])
    out_vals = d[d > 0]
    if out_vals.size:
        dist = np.abs(out_vals[:, None] - vals[None, :]).min(axis=1)
        assert dist.max() < 1e-6, dist.max()


@pytest.mark.quick
def test_flip_only_mirrors_and_updates_cx():
    B, S, H, W = 8, 1, 16, 32
    imgs, K = _batch(B=B, S=S, H=H, W=W, seed=5)
    cfg = AugmentConfig(flip=True, scale_crop=False, color_jitter=False,
                        mean=(0, 0, 0), std=(1, 1, 1))
    out, new_K = augment_batch(jax.random.PRNGKey(3), imgs, K, config=cfg)
    out = np.asarray(out)
    imgs_n = np.asarray(imgs)
    cx = np.asarray(K)[:, 0, 2]
    new_cx = np.asarray(new_K)[:, 0, 2]
    flipped = ~np.isclose(new_cx, cx)
    assert flipped.any() and (~flipped).any()  # both outcomes among 8 samples
    for b in range(B):
        if flipped[b]:
            np.testing.assert_allclose(out[b], imgs_n[b, :, :, ::-1], atol=1e-5)
            np.testing.assert_allclose(new_cx[b], (W - 1) - cx[b], atol=1e-5)
        else:
            np.testing.assert_allclose(out[b], imgs_n[b], atol=1e-5)


def test_scale_crop_intrinsics_consistency():
    """A 3D point projected with old K into the source must land at the
    pixel the augmented image sampled it from (projective consistency)."""
    B, S, H, W = 6, 1, 32, 64
    imgs, K = _batch(B=B, S=S, H=H, W=W, seed=6)
    cfg = AugmentConfig(flip=False, scale_crop=True, color_jitter=False,
                        mean=(0, 0, 0), std=(1, 1, 1))
    out, new_K = augment_batch(jax.random.PRNGKey(7), imgs, K, config=cfg)
    out, new_K = np.asarray(out), np.asarray(new_K)
    imgs_n = np.asarray(imgs)
    Kn = np.asarray(K)
    for b in range(B):
        s = new_K[b, 0, 0] / Kn[b, 0, 0]
        ox = Kn[b, 0, 2] * s - new_K[b, 0, 2]
        oy = Kn[b, 1, 2] * s - new_K[b, 1, 2]
        # sample a few interior output pixels; source coord = (j + ox) / s
        for (i, j) in [(8, 10), (16, 40), (20, 20)]:
            src_x = (j + ox) / s
            src_y = (i + oy) / s
            xi, yi = int(round(src_x)), int(round(src_y))
            if 1 <= xi < W - 1 and 1 <= yi < H - 1 and abs(src_x - xi) < 0.05 and abs(src_y - yi) < 0.05:
                np.testing.assert_allclose(
                    out[b, 0, i, j], imgs_n[b, 0, yi, xi], atol=0.05
                )


def test_color_jitter_shared_across_snippet_frames():
    """Identical frames in a snippet must stay identical after photometric
    jitter (transform is per-snippet, matching the reference)."""
    B, S, H, W = 4, 3, 16, 16
    rng = np.random.default_rng(8)
    one = rng.uniform(0, 1, (B, 1, H, W, 3)).astype(np.float32)
    imgs = jnp.asarray(np.repeat(one, S, axis=1))
    _, K = _batch(B=B, S=S, H=H, W=W)
    cfg = AugmentConfig(flip=False, scale_crop=False, color_jitter=True)
    out = np.asarray(augment_batch(jax.random.PRNGKey(9), imgs, K, config=cfg)[0])
    for s in range(1, S):
        np.testing.assert_allclose(out[:, s], out[:, 0], atol=1e-5)


def test_normalize_images():
    x = jnp.full((1, 4, 4, 3), 0.5)
    out = np.asarray(normalize_images(x))
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_augmentation_statistics():
    """Statistical parity (SURVEY §7 hard part #3): flip rate ~0.5, scale
    ~U[1, 1.15], crop offsets within bounds across many samples."""
    B, S, H, W = 512, 1, 16, 32
    imgs, K = _batch(B=B, S=S, H=H, W=W, seed=12)
    cfg = AugmentConfig(color_jitter=False)
    _, new_K = augment_batch(jax.random.PRNGKey(123), imgs, K, config=cfg)
    new_K = np.asarray(new_K)
    K = np.asarray(K)

    # independent x/y scalings, each uniform on [1, 1.15] (reference draws
    # np.random.uniform(1, 1.15, 2) in RandomScaleCrop)
    scale = new_K[:, 0, 0] / K[:, 0, 0]
    scale_y = new_K[:, 1, 1] / K[:, 1, 1]
    for s in (scale, scale_y):
        assert s.min() >= 1.0 - 1e-5 and s.max() <= 1.15 + 1e-5
        assert abs(s.mean() - 1.075) < 0.01  # uniform on [1, 1.15]
    # anisotropic: x and y draws differ on essentially every sample
    assert (np.abs(scale - scale_y) > 1e-4).mean() > 0.9

    # use fy/cy (unaffected by flip) to invert the crop and check bounds
    oy = K[:, 1, 2] * scale_y - new_K[:, 1, 2]
    assert (oy >= -1e-3).all() and (oy <= (scale_y - 1) * H + 1e-3).all()

    # flips: cx either = cx*s - ox (no flip, decreasing-ish) or mirrored;
    # reconstruct both hypotheses and count which fits
    cx_nf_min = K[:, 0, 2] * scale - (scale - 1) * W  # min possible cx (no flip)
    cx_nf_max = K[:, 0, 2] * scale
    no_flip = (new_K[:, 0, 2] >= cx_nf_min - 1e-3) & (new_K[:, 0, 2] <= cx_nf_max + 1e-3)
    flipped_cx = (W - 1.0) - new_K[:, 0, 2]
    flip = (flipped_cx >= cx_nf_min - 1e-3) & (flipped_cx <= cx_nf_max + 1e-3)
    # ambiguous samples satisfy both; count definite flips among definite
    definite = no_flip ^ flip
    if definite.sum() > 50:
        rate = flip[definite].mean()
        assert 0.3 < rate < 0.7, rate


def test_hue_jitter_rotates_chroma_preserves_luma():
    B, S, H, W = 4, 1, 8, 8
    rng = np.random.default_rng(13)
    imgs = jnp.asarray(rng.uniform(0.2, 0.8, (B, S, H, W, 3)).astype(np.float32))
    _, K = _batch(B=B, S=S, H=H, W=W)
    cfg = AugmentConfig(flip=False, scale_crop=False, color_jitter=True,
                        brightness=0.0, contrast=0.0, saturation=0.0, hue=0.3,
                        mean=(0, 0, 0), std=(1, 1, 1))
    out = np.asarray(augment_batch(jax.random.PRNGKey(21), imgs, K, config=cfg)[0])
    inp = np.asarray(imgs)
    assert not np.allclose(out, inp, atol=1e-3)  # hue actually rotated
    # luma (Y) is invariant under hue rotation (up to [0,1] clipping)
    def luma(a):
        return 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
    np.testing.assert_allclose(luma(out), luma(inp), atol=5e-2)
