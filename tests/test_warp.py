"""Geometry tests: rotation parameterizations vs scipy, warp invariants."""

import pytest

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from supervised_dispnet_tpu.ops.warp import (
    euler2mat, quat2mat, pose_vec2mat, pixel2cam, inverse_warp,
)


@pytest.mark.quick
def test_euler2mat_matches_scipy():
    rng = np.random.default_rng(0)
    ang = rng.uniform(-0.5, 0.5, (8, 3)).astype(np.float32)
    ours = np.asarray(euler2mat(jnp.asarray(ang)))
    # R = Rx @ Ry @ Rz == scipy intrinsic 'XYZ'
    ref = Rotation.from_euler("XYZ", ang).as_matrix()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_quat2mat_unit_norm_and_identity():
    q = np.zeros((3, 3), dtype=np.float32)
    R = np.asarray(quat2mat(jnp.asarray(q)))
    np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), (3, 3, 3)), atol=1e-6)

    rng = np.random.default_rng(1)
    v = rng.uniform(-0.3, 0.3, (5, 3)).astype(np.float32)
    R = np.asarray(quat2mat(jnp.asarray(v)))
    # valid rotations: orthonormal, det 1
    eye = np.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (5, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
    # matches scipy for the same (w=1, xyz) quaternion
    w = np.ones((5, 1), dtype=np.float32)
    quat_xyzw = np.concatenate([v, w], axis=1)
    ref = Rotation.from_quat(quat_xyzw / np.linalg.norm(quat_xyzw, axis=1, keepdims=True)).as_matrix()
    np.testing.assert_allclose(R, ref, rtol=1e-5, atol=1e-5)


def test_pose_vec2mat_shapes_and_translation():
    vec = jnp.asarray(np.array([[1.0, 2.0, 3.0, 0, 0, 0]], dtype=np.float32))
    T = np.asarray(pose_vec2mat(vec))
    assert T.shape == (1, 3, 4)
    np.testing.assert_allclose(T[0, :, :3], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(T[0, :, 3], [1, 2, 3], atol=1e-6)


def _intrinsics(B, fx=100.0, fy=110.0, cx=8.0, cy=6.0):
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], dtype=np.float32)
    return np.broadcast_to(K, (B, 3, 3)).copy()


def test_pixel2cam_roundtrip():
    """K @ pixel2cam(depth) / z must return the pixel grid."""
    B, H, W = 2, 12, 16
    rng = np.random.default_rng(2)
    depth = rng.uniform(1, 10, (B, H, W)).astype(np.float32)
    K = _intrinsics(B)
    cam = np.asarray(pixel2cam(jnp.asarray(depth), jnp.asarray(np.linalg.inv(K))))
    assert cam.shape == (B, H, W, 3)
    np.testing.assert_allclose(cam[..., 2], depth, rtol=1e-4)
    proj = np.einsum("bij,bhwj->bhwi", K, cam)
    xs = proj[..., 0] / proj[..., 2]
    ys = proj[..., 1] / proj[..., 2]
    gx, gy = np.meshgrid(np.arange(W), np.arange(H))
    np.testing.assert_allclose(xs, np.broadcast_to(gx, (B, H, W)), atol=1e-3)
    np.testing.assert_allclose(ys, np.broadcast_to(gy, (B, H, W)), atol=1e-3)


@pytest.mark.quick
def test_inverse_warp_identity_pose():
    """Zero pose must reproduce the source image (valid everywhere)."""
    B, H, W = 1, 16, 24
    rng = np.random.default_rng(3)
    img = rng.standard_normal((B, H, W, 3)).astype(np.float32)
    depth = rng.uniform(2, 10, (B, H, W)).astype(np.float32)
    pose = np.zeros((B, 6), dtype=np.float32)
    K = _intrinsics(B, cx=W / 2, cy=H / 2)
    warped, valid = inverse_warp(
        jnp.asarray(img), jnp.asarray(depth), jnp.asarray(pose), jnp.asarray(K)
    )
    assert np.asarray(valid).all()
    np.testing.assert_allclose(np.asarray(warped), img, rtol=1e-3, atol=1e-3)


def test_inverse_warp_translation_shifts():
    """Pure x-translation of the camera at constant depth shifts the image by
    fx * tx / z pixels."""
    B, H, W = 1, 16, 32
    rng = np.random.default_rng(4)
    img = rng.standard_normal((B, H, W, 1)).astype(np.float32)
    z = 5.0
    depth = np.full((B, H, W), z, dtype=np.float32)
    fx = 50.0
    tx = 0.5
    pose = np.array([[tx, 0, 0, 0, 0, 0]], dtype=np.float32)
    K = _intrinsics(B, fx=fx, fy=fx, cx=W / 2, cy=H / 2)
    warped, valid = inverse_warp(
        jnp.asarray(img), jnp.asarray(depth), jnp.asarray(pose), jnp.asarray(K)
    )
    shift = fx * tx / z  # = 5 px
    assert float(shift) == 5.0
    w = np.asarray(warped)[0, :, :, 0]
    v = np.asarray(valid)[0]
    # warped(x) == img(x + shift) where valid
    expect = img[0, :, int(shift):, 0]
    got = w[:, : W - int(shift)]
    mask = v[:, : W - int(shift)]
    np.testing.assert_allclose(got[mask], expect[mask], rtol=1e-3, atol=1e-3)


def test_inverse_warp_rotation_modes_agree_small_angles():
    B, H, W = 1, 12, 16
    rng = np.random.default_rng(5)
    img = rng.standard_normal((B, H, W, 1)).astype(np.float32)
    depth = rng.uniform(3, 8, (B, H, W)).astype(np.float32)
    K = _intrinsics(B, cx=W / 2, cy=H / 2)
    # small rotation: euler ~ 2 * quat imaginary part
    r = np.array([0.002, -0.004, 0.003], dtype=np.float32)
    pose_e = np.concatenate([[0.1, 0, 0], r]).astype(np.float32)[None]
    pose_q = np.concatenate([[0.1, 0, 0], r / 2]).astype(np.float32)[None]
    we, _ = inverse_warp(jnp.asarray(img), jnp.asarray(depth), jnp.asarray(pose_e), jnp.asarray(K), rotation_mode="euler")
    wq, _ = inverse_warp(jnp.asarray(img), jnp.asarray(depth), jnp.asarray(pose_q), jnp.asarray(K), rotation_mode="quat")
    np.testing.assert_allclose(np.asarray(we), np.asarray(wq), atol=2e-2)
