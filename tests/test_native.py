"""Native C++ velodyne projector vs the numpy reference implementation."""

import numpy as np
import pytest

from supervised_dispnet_tpu.native import (
    get_lib,
    project_velodyne_batch_native,
    project_velodyne_native,
)

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native toolchain unavailable"
)


def _numpy_project(velo, P, H, W):
    velo = velo[velo[:, 0] >= 1e-3]
    pts = (P @ velo.T).T
    z = pts[:, 2]
    u = np.round(pts[:, 0] / z).astype(np.int64)
    v = np.round(pts[:, 1] / z).astype(np.int64)
    ok = (u >= 0) & (u < W) & (v >= 0) & (v < H) & (z > 0)
    u, v, z = u[ok], v[ok], z[ok]
    depth = np.zeros((H, W), dtype=np.float32)
    order = np.argsort(-z)
    depth[v[order], u[order]] = z[order]
    return depth


def _rand_scan(n=5000, seed=0):
    rng = np.random.default_rng(seed)
    return np.hstack([
        rng.uniform(-5, 60, (n, 1)),   # x (mostly forward)
        rng.uniform(-15, 15, (n, 1)),
        rng.uniform(-3, 2, (n, 1)),
        np.ones((n, 1)),
    ]).astype(np.float32)


def _proj(H=64, W=208):
    """K @ velo-to-cam rotation (x_velo forward -> z_cam)."""
    K = np.array([[100.0, 0, W / 2, 0], [0, 100.0, H / 2, 0], [0, 0, 1, 0]])
    R = np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0], [0, 0, 0, 1.0]])
    return K @ R


@pytest.mark.quick
def test_native_matches_numpy():
    H, W = 64, 208
    velo = _rand_scan(seed=1)
    P = _proj(H, W)
    ref = _numpy_project(velo.copy(), P, H, W)
    got = project_velodyne_native(velo, P, (H, W))
    assert got is not None
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    assert (got > 0).sum() > 100


def test_native_batch_matches_single():
    H, W = 48, 160
    P = _proj(H, W)
    frames = [_rand_scan(n, seed=s) for s, n in enumerate([3000, 5000, 1234])]
    Ps = np.stack([P] * 3)
    batch = project_velodyne_batch_native(frames, Ps, (H, W), n_threads=3)
    assert batch is not None
    for i, f in enumerate(frames):
        single = project_velodyne_native(f, P, (H, W))
        np.testing.assert_array_equal(batch[i], single)


def test_generate_depth_map_uses_native(tmp_path):
    """kitti_eval.generate_depth_map native path == numpy path."""
    from supervised_dispnet_tpu.kitti_eval.depth_evaluation_utils import (
        generate_depth_map,
    )

    H, W = 40, 120
    fx, fy, cx, cy = 100.0, 100.0, 60.0, 20.0
    P = np.array([[fx, 0, cx, 0], [0, fy, cy, 0], [0, 0, 1, 0]])
    lines = ["R_rect_00: " + " ".join(map(str, np.eye(3).ravel())),
             "P_rect_02: " + " ".join(map(str, P.ravel()))]
    (tmp_path / "calib_cam_to_cam.txt").write_text("\n".join(lines))
    R = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], dtype=float)
    (tmp_path / "calib_velo_to_cam.txt").write_text(
        "R: " + " ".join(map(str, R.ravel())) + "\nT: 0 0 0\n")
    rng = np.random.default_rng(3)
    pts = np.hstack([
        rng.uniform(2, 50, (2000, 1)), rng.uniform(-10, 10, (2000, 1)),
        rng.uniform(-2, 2, (2000, 1)), np.ones((2000, 1)),
    ]).astype(np.float32)
    velo_file = tmp_path / "scan.bin"
    pts.tofile(velo_file)

    native = generate_depth_map(tmp_path, velo_file, (H, W), use_native=True)
    ref = generate_depth_map(tmp_path, velo_file, (H, W), use_native=False)
    np.testing.assert_allclose(native, ref, rtol=1e-5, atol=1e-5)
