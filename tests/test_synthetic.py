"""Synthetic ego-motion scene (data/synthetic.py): the analytic GT must
be consistent with ops/warp.py's conventions — warping a rendered ref
view with the GT depth + pose must reproduce the rendered target view."""

import numpy as np

import jax.numpy as jnp

from supervised_dispnet_tpu.data.synthetic import (
    PlaneSceneConfig,
    pose_errors,
    render_batch,
    render_sequence,
    render_snippet,
    scaled_abs_rel,
)
from supervised_dispnet_tpu.ops.warp import inverse_warp

CFG = PlaneSceneConfig(height=64, width=128, focal=100.0)


def _warp_err(snip, pose):
    warped, valid = inverse_warp(
        jnp.asarray(snip["refs"][0][None]),
        jnp.asarray(snip["depth"][None]),
        jnp.asarray(pose[None]),
        jnp.asarray(snip["intrinsics"][None]),
    )
    w = np.asarray(warped[0])
    v = np.asarray(valid[0])
    return float(np.abs(w - snip["tgt"])[v].mean()), float(v.mean())


def test_gt_depth_pose_reconstructs_target():
    snip = render_snippet(np.random.default_rng(0), CFG)
    err, valid_frac = _warp_err(snip, snip["poses"][0])
    assert valid_frac > 0.7
    # bilinear-resample error only: the texture is smooth
    assert err < 0.02, f"GT warp error {err}"


def test_wrong_pose_is_much_worse():
    snip = render_snippet(np.random.default_rng(1), CFG)
    err_gt, _ = _warp_err(snip, snip["poses"][0])
    bad = snip["poses"][0].copy()
    bad[0] += 0.5  # half-meter translation error
    err_bad, _ = _warp_err(snip, bad)
    assert err_bad > 5 * err_gt, (err_gt, err_bad)


def test_depth_analytic_properties():
    snip = render_snippet(np.random.default_rng(2), CFG)
    d = snip["depth"]
    assert (d > 1.0).all() and (d < 80.0).all()
    # the plane is tilted: depth varies smoothly, not constant
    assert d.std() > 0.01


def test_render_batch_shapes():
    b = render_batch(np.random.default_rng(3), 2, CFG)
    H, W = CFG.height, CFG.width
    assert b["tgt"].shape == (2, H, W, 3)
    assert b["ref_imgs"].shape == (2, 2, H, W, 3)
    assert b["depth"].shape == (2, H, W)
    assert b["poses"].shape == (2, 2, 6)
    assert b["intrinsics"].shape == (2, 3, 3)
    assert b["tgt"].min() >= 0.0 and b["tgt"].max() <= 1.0


def test_fg_occluders_add_depth_structure():
    """fg_planes>0 (the convergence-check scene): analytic depth gains
    real structure (occluders well in front of the background) and the
    GT warp stays accurate away from the disocclusion fringes."""
    cfg = PlaneSceneConfig(height=64, width=128, focal=100.0, fg_planes=2,
                           tilt=0.35, center_depth=(5.0, 16.0))
    from supervised_dispnet_tpu.data.synthetic import scaled_abs_rel as sar

    const_errs = []
    for seed in range(4):
        snip = render_snippet(np.random.default_rng(seed), cfg)
        d = snip["depth"]
        assert (d > 0.5).all() and np.isfinite(d).all()
        # a constant-depth prediction median-scales onto a lone plane at
        # ~0.15 abs_rel; the occluders must push that well up
        const_errs.append(sar(np.full((1,) + d.shape, 8.0), d[None]))
        # occlusion fringes are a minority: median GT-warp error stays
        # at the bilinear-resample level even though the mean can't
        warped, valid = inverse_warp(
            jnp.asarray(snip["refs"][0][None]),
            jnp.asarray(d[None]),
            jnp.asarray(snip["poses"][0][None]),
            jnp.asarray(snip["intrinsics"][None]),
        )
        err = np.abs(np.asarray(warped[0]) - snip["tgt"])
        v = np.asarray(valid[0])
        assert np.median(err[v]) < 0.03
    assert np.mean(const_errs) > 0.25, const_errs


def test_room_scene_warp_consistency_and_structure():
    """room=True (the convergence-check scene): the corridor's GT depth +
    pose must still reproduce the target from a ref view (the analytic
    nearest-hit depth is what the warp consumes), and the scene must have
    strong non-planar depth structure — the property that breaks the
    single-plane homography degeneracy."""
    cfg = PlaneSceneConfig(height=64, width=128, focal=100.0, room=True,
                           fg_planes=2, tilt=0.35, center_depth=(5.0, 16.0),
                           rot=0.04)
    for seed in range(3):
        snip = render_snippet(np.random.default_rng(seed), cfg)
        d = snip["depth"]
        assert np.isfinite(d).all() and (d > 0.3).all() and (d < 100).all()
        # corridor depth spans a wide range (walls near, back plane far)
        assert np.percentile(d, 95) / np.percentile(d, 5) > 2.0
        warped, valid = inverse_warp(
            jnp.asarray(snip["refs"][0][None]),
            jnp.asarray(d[None]),
            jnp.asarray(snip["poses"][0][None]),
            jnp.asarray(snip["intrinsics"][None]),
        )
        err = np.abs(np.asarray(warped[0]) - snip["tgt"])
        v = np.asarray(valid[0])
        # depth discontinuities (wall/plane seams, occluders) break
        # photometric consistency only on fringes: median stays at the
        # bilinear-resample level
        assert np.median(err[v]) < 0.03, np.median(err[v])


def test_render_sequence_poses_and_warp_consistency():
    """The odometry-style sequence: poses are valid cam-to-world 3x4
    (KITTI poses.txt convention — first row identity, orthonormal R),
    and a zero-rotation sequence's relative translations warp frame i+1
    back onto frame i through the analytic depth."""
    cfg = PlaneSceneConfig(height=64, width=128, focal=100.0, room=True,
                           fg_planes=2, rot=0.03)
    seq = render_sequence(np.random.default_rng(0), 6, cfg)
    assert seq["frames"].shape == (6, 64, 128, 3)
    assert seq["poses"].shape == (6, 3, 4)
    assert np.allclose(seq["poses"][0], np.eye(3, 4), atol=1e-6)
    for P in seq["poses"]:
        R = P[:, :3]
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-5)
        assert abs(np.linalg.det(R) - 1) < 1e-5

    # warp check with rotation off: relative pose i->i+1 is a pure
    # translation readable from the cam-to-world columns
    cfg0 = PlaneSceneConfig(height=64, width=128, focal=100.0, room=True,
                            fg_planes=1, rot=0.0)
    seq0 = render_sequence(np.random.default_rng(1), 3, cfg0)
    for i in range(2):
        t_cw_i = seq0["poses"][i][:, 3]
        t_cw_j = seq0["poses"][i + 1][:, 3]
        t_rel = t_cw_i - t_cw_j  # X_cam_j = X_cam_i + (t_wc_j - t_wc_i)
        pose6 = np.concatenate([t_rel, np.zeros(3)]).astype(np.float32)
        warped, valid = inverse_warp(
            jnp.asarray(seq0["frames"][i + 1][None]),
            jnp.asarray(seq0["depth"][i][None]),
            jnp.asarray(pose6[None]),
            jnp.asarray(seq0["intrinsics"][None]),
        )
        err = np.abs(np.asarray(warped[0]) - seq0["frames"][i])
        v = np.asarray(valid[0])
        assert v.mean() > 0.7
        assert np.median(err[v]) < 0.03, np.median(err[v])


def test_pose_errors_zero_for_exact_and_scaled():
    gt = np.random.default_rng(4).uniform(-0.5, 0.5, (3, 2, 6)).astype(np.float32)
    ate, rot = pose_errors(gt, gt)
    assert ate < 1e-6 and rot < 1e-5
    # translation scale ambiguity is factored out
    scaled = gt.copy()
    scaled[..., :3] *= 3.7
    ate, rot = pose_errors(scaled, gt)
    assert ate < 1e-6


def test_scaled_abs_rel_ignores_global_scale():
    g = np.random.default_rng(5).uniform(2, 20, (2, 8, 8))
    assert scaled_abs_rel(g * 4.2, g) < 1e-6
    assert scaled_abs_rel(g * np.random.default_rng(6).uniform(0.5, 2, g.shape), g) > 0.05


def test_render_sequence_rotating_pose_matrix_warp():
    """Rotating trajectory: the relative transform recovered from the
    cam-to-world poses.txt rows must reproduce frame i from frame i+1
    through the warp primitives (matrix path — no euler round trip), so
    the dump's pose convention is pinned including rotation."""
    from supervised_dispnet_tpu.ops.sampling import bilinear_sample
    from supervised_dispnet_tpu.ops.warp import cam2pixel, pixel2cam

    cfg = PlaneSceneConfig(height=64, width=128, focal=100.0, room=True,
                           fg_planes=0, rot=0.04)
    seq = render_sequence(np.random.default_rng(2), 4, cfg)
    K = seq["intrinsics"].astype(np.float64)
    for i in range(3):
        P_i, P_j = seq["poses"][i].astype(np.float64), \
            seq["poses"][i + 1].astype(np.float64)
        # cam-to-world [R_cw | t_cw] -> world-to-cam, then relative i->j
        R_wc_i, t_wc_i = P_i[:, :3].T, -P_i[:, :3].T @ P_i[:, 3]
        R_wc_j, t_wc_j = P_j[:, :3].T, -P_j[:, :3].T @ P_j[:, 3]
        R_rel = R_wc_j @ R_wc_i.T
        t_rel = t_wc_j - R_rel @ t_wc_i
        cam = pixel2cam(jnp.asarray(seq["depth"][i][None]),
                        jnp.asarray(np.linalg.inv(K)[None].astype(np.float32)))
        proj = K @ np.concatenate([R_rel, t_rel[:, None]], 1)
        x, y, valid = cam2pixel(
            cam,
            jnp.asarray(proj[:, :3][None].astype(np.float32)),
            jnp.asarray(proj[:, 3:][None].astype(np.float32)))
        warped = bilinear_sample(jnp.asarray(seq["frames"][i + 1][None]), x, y)
        err = np.abs(np.asarray(warped[0]) - seq["frames"][i])
        v = np.asarray(valid[0])
        assert v.mean() > 0.6, v.mean()
        assert np.median(err[v]) < 0.03, np.median(err[v])
