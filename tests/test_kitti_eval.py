"""KITTI eval harness tests: velodyne projection on synthetic calib,
Eigen protocol (crop/cap/median-scaling), pose ATE/RE."""

import numpy as np
import pytest

from supervised_dispnet_tpu.kitti_eval.depth_evaluation_utils import (
    EvalConfig,
    evaluate_depth,
    garg_crop_mask,
    generate_depth_map,
    read_calib_file,
    velo2cam_matrix,
)
from supervised_dispnet_tpu.kitti_eval.pose_evaluation_utils import (
    compute_ate,
    compute_re,
    evaluate_pose_snippets,
    read_odometry_poses,
    snippet_from_poses,
)


@pytest.fixture
def calib_dir(tmp_path):
    """Synthetic KITTI calib: identity velo->cam rotation, simple K."""
    fx, fy, cx, cy = 100.0, 100.0, 60.0, 20.0
    P = np.array([[fx, 0, cx, 0], [0, fy, cy, 0], [0, 0, 1, 0]])
    lines = ["R_rect_00: " + " ".join(map(str, np.eye(3).ravel())),
             "P_rect_02: " + " ".join(map(str, P.ravel()))]
    (tmp_path / "calib_cam_to_cam.txt").write_text("\n".join(lines))
    # velo -> cam: x_cam = -y_velo, y_cam = -z_velo, z_cam = x_velo
    R = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], dtype=float)
    (tmp_path / "calib_velo_to_cam.txt").write_text(
        "R: " + " ".join(map(str, R.ravel())) + "\nT: 0 0 0\n"
    )
    return tmp_path


def test_read_calib_file(calib_dir):
    d = read_calib_file(calib_dir / "calib_cam_to_cam.txt")
    assert d["P_rect_02"].shape == (12,)


def test_generate_depth_map_projects_known_point(calib_dir, tmp_path):
    # velodyne point 10m ahead (x=10), y=-1 (right), z=0.5 (up)
    pts = np.array([[10.0, -1.0, 0.5, 0.7]], dtype=np.float32)
    velo_file = tmp_path / "scan.bin"
    pts.tofile(velo_file)
    H, W = 40, 120
    depth = generate_depth_map(calib_dir, velo_file, (H, W))
    # cam coords: x=1, y=-0.5, z=10 -> u = 100*1/10 + 60 = 70; v = 100*(-0.5)/10 + 20 = 15
    assert depth[15, 70] == pytest.approx(10.0, rel=1e-5)
    assert (depth > 0).sum() == 1


def test_generate_depth_map_zbuffer(calib_dir, tmp_path):
    # two points projecting to the same pixel: nearer wins
    pts = np.array([[10.0, -1.0, 0.5, 1], [20.0, -2.0, 1.0, 1]], dtype=np.float32)
    velo_file = tmp_path / "scan.bin"
    pts.tofile(velo_file)
    depth = generate_depth_map(calib_dir, velo_file, (40, 120))
    assert depth[15, 70] == pytest.approx(10.0, rel=1e-5)


@pytest.mark.quick
def test_garg_crop():
    m = garg_crop_mask(100, 300)
    assert m[50, 150]
    assert not m[5, 150]  # above crop
    assert not m[50, 2]   # left of crop
    assert abs(m.mean() - (0.9919 - 0.4081) * (0.9641 - 0.0359)) < 0.02


@pytest.mark.quick
def test_evaluate_depth_perfect_prediction():
    rng = np.random.default_rng(0)
    gts = [rng.uniform(2, 70, (50, 150)).astype(np.float32) for _ in range(3)]
    res = evaluate_depth(gts, [g.copy() for g in gts])
    assert res["abs_rel"] == pytest.approx(0.0, abs=1e-7)
    assert res["a1"] == pytest.approx(1.0)
    assert res["n_images"] == 3


def test_evaluate_depth_median_scaling_fixes_global_scale():
    rng = np.random.default_rng(1)
    gts = [rng.uniform(2, 70, (60, 200)).astype(np.float32) for _ in range(2)]
    preds = [g / 7.3 for g in gts]  # globally mis-scaled
    no_scale = evaluate_depth(gts, preds, EvalConfig(median_scaling=False))
    scaled = evaluate_depth(gts, preds, EvalConfig(median_scaling=True))
    assert no_scale["abs_rel"] > 0.5
    assert scaled["abs_rel"] == pytest.approx(0.0, abs=1e-5)
    assert scaled["median_scale_mean"] == pytest.approx(7.3, rel=1e-3)


def test_evaluate_depth_caps_and_crop():
    gt = np.zeros((100, 300), dtype=np.float32)
    gt[50, 150] = 200.0  # beyond 80m cap -> excluded
    gt[60, 160] = 10.0
    pred = np.full_like(gt, 10.0)
    res = evaluate_depth([gt], [pred])
    assert res["abs_rel"] == pytest.approx(0.0, abs=1e-6)


# --- pose ---------------------------------------------------------------

def _traj(n=5, seed=0):
    """First-frame-relative trajectory (t[0] = 0, reference protocol)."""
    rng = np.random.default_rng(seed)
    poses = []
    t = np.zeros(3)
    R = np.eye(3)
    for i in range(n):
        poses.append(np.hstack([R, t[:, None]]))
        t = t + rng.uniform(-1, 1, 3)
    return np.stack(poses)


@pytest.mark.quick
def test_ate_zero_for_identical():
    tr = _traj()
    assert compute_ate(tr, tr.copy()) == pytest.approx(0.0, abs=1e-9)
    assert compute_re(tr, tr.copy()) == pytest.approx(0.0, abs=1e-6)


def test_ate_nonzero_matches_reference_formula():
    """Reference protocol: ATE = ||gt_xyz - s*pred_xyz||_F / N (NOT an RMSE;
    an RMSE form would be sqrt(N)x larger — ADVICE r1 medium finding)."""
    rng = np.random.default_rng(7)
    gt = _traj(n=5, seed=5)
    pred = gt.copy()
    pred[:, :, 3] = pred[:, :, 3] + rng.normal(0, 0.3, (5, 3))
    # hand-evaluate the reference formula on the aligned/scaled trajectories
    gt_xyz = gt[:, :, 3]
    pr = pred[:, :, 3] + (gt_xyz[0] - pred[0, :, 3])
    s = np.sum(gt_xyz * pr) / np.sum(pr**2)
    expected = np.sqrt(np.sum((gt_xyz - s * pr) ** 2)) / 5.0
    assert compute_ate(gt, pred) == pytest.approx(expected, rel=1e-9)
    # and explicitly NOT the sqrt(mean-per-frame) RMSE variant
    rmse = np.sqrt(np.mean(np.sum((gt_xyz - s * pr) ** 2, axis=1)))
    assert abs(compute_ate(gt, pred) - rmse) > 1e-6


def test_ate_scale_invariant():
    tr = _traj(seed=2)
    scaled = tr.copy()
    scaled[:, :, 3] *= 0.13  # mis-scaled translations (monocular ambiguity)
    assert compute_ate(tr, scaled) == pytest.approx(0.0, abs=1e-9)


def test_snippet_from_poses_anchor_identity():
    tr = _traj(n=7, seed=3)
    snip = snippet_from_poses(tr, np.array([2, 3, 4]))  # first-frame relative
    np.testing.assert_allclose(snip[0][:, :3], np.eye(3), atol=1e-9)
    np.testing.assert_allclose(snip[0][:, 3], 0.0, atol=1e-9)
    snip_mid = snippet_from_poses(tr, np.array([2, 3, 4]), relative_to="mid")
    np.testing.assert_allclose(snip_mid[1][:, 3], 0.0, atol=1e-9)


def test_read_odometry_and_evaluate(tmp_path):
    tr = _traj(n=10, seed=4)
    f = tmp_path / "09.txt"
    np.savetxt(f, tr.reshape(10, 12))
    loaded = read_odometry_poses(f)
    np.testing.assert_allclose(loaded, tr, rtol=1e-6)
    res = evaluate_pose_snippets([tr[:3], tr[3:6]], [tr[:3], tr[3:6]])
    assert res["ate_mean"] == pytest.approx(0.0, abs=1e-9)
    assert res["n_snippets"] == 2


def test_pose_vec_to_snippet_convention_roundtrip():
    """A perfect network (predicting exact tgt->ref transforms) must yield
    snippets identical to the GT snippets — translations and rotations."""
    from supervised_dispnet_tpu.cli.test_pose import pose_vec_to_snippet

    # pure-translation trajectory (cam-to-world, first-frame anchored)
    t = np.array([[0, 0, 0], [1.0, 0.2, 3.0], [2.5, -0.3, 6.0]])
    T = np.stack([np.hstack([np.eye(3), ti[:, None]]) for ti in t])
    gt_snip = snippet_from_poses(T, np.array([0, 1, 2]))
    # network predicts M_j = inv(T_j) @ T_mid -> translation = -(t_j - t_mid)
    mid = 1
    vecs = []
    for j in (0, 2):
        vecs.append(np.concatenate([t[mid] - t[j], np.zeros(3)]))
    pred = pose_vec_to_snippet(np.asarray(vecs, np.float32), "euler")
    np.testing.assert_allclose(pred, gt_snip, atol=1e-5)

    # pure-z-rotation trajectory
    th = np.array([0.0, 0.05, 0.12])

    def Rz(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])

    T = np.stack([np.hstack([Rz(a), np.zeros((3, 1))]) for a in th])
    gt_snip = snippet_from_poses(T, np.array([0, 1, 2]))
    vecs = []
    for j in (0, 2):
        # M_j = Rz(th_mid - th_j); euler (x,y,z)=(0,0,phi) gives Rz(phi)
        vecs.append(np.array([0, 0, 0, 0, 0, th[1] - th[j]], np.float32))
    pred = pose_vec_to_snippet(np.asarray(vecs, np.float32), "euler")
    np.testing.assert_allclose(pred, gt_snip, atol=1e-5)
