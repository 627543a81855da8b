"""Differentiable camera geometry: pose parameterizations and inverse warp.

TPU-native re-derivation of the reference geometry stack
(reference: ``inverse_warp.py::{euler2mat,quat2mat,pose_vec2mat,pixel2cam,
cam2pixel,inverse_warp}``). Everything is batched, NHWC, static-shape, and
built from einsum + one fused gather so XLA maps it onto MXU (the 3x3
projections become small batched matmuls) and VPU (the per-pixel blend).

Conventions
-----------
- depth: (B, H, W) metric depth of the *target* view.
- pose: (B, 6) = [tx, ty, tz, r1, r2, r3]; rotation is Euler angles
  (x, y, z, composed R = Rx @ Ry @ Rz) or the imaginary part of a unit
  quaternion with w reconstructed (both per the reference).
- intrinsics: (B, 3, 3) pinhole K.
- Pixel (0, 0) is the center of the top-left pixel; cam2pixel returns raw
  pixel coordinates, and the sampler consumes them directly — no normalized
  [-1, 1] round trip (the reference normalizes then un-normalizes through
  ``F.grid_sample``; we skip the detour, which is equivalent to its
  align_corners=True normalization at metric level).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from supervised_dispnet_tpu.ops.sampling import bilinear_sample

# Geometry is tiny-matmul work (3x3 poses, per-pixel projections) where
# bf16 MXU rounding would cost whole pixels of warp accuracy for zero
# speedup — force full fp32 accumulation on all contractions here.
_HIGHEST = jax.lax.Precision.HIGHEST


def euler2mat(angle: jax.Array) -> jax.Array:
    """Euler angles (B, 3) = (x, y, z) -> rotation matrices (B, 3, 3).

    Composition R = Rx @ Ry @ Rz (intrinsic XYZ), matching the reference
    (reference: ``inverse_warp.py::euler2mat``).
    """
    x, y, z = angle[:, 0], angle[:, 1], angle[:, 2]
    cx, sx = jnp.cos(x), jnp.sin(x)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cz, sz = jnp.cos(z), jnp.sin(z)
    ones = jnp.ones_like(x)
    zeros = jnp.zeros_like(x)

    xmat = jnp.stack(
        [ones, zeros, zeros,
         zeros, cx, -sx,
         zeros, sx, cx], axis=-1).reshape(-1, 3, 3)
    ymat = jnp.stack(
        [cy, zeros, sy,
         zeros, ones, zeros,
         -sy, zeros, cy], axis=-1).reshape(-1, 3, 3)
    zmat = jnp.stack(
        [cz, -sz, zeros,
         sz, cz, zeros,
         zeros, zeros, ones], axis=-1).reshape(-1, 3, 3)
    return jnp.matmul(
        jnp.matmul(xmat, ymat, precision=_HIGHEST), zmat, precision=_HIGHEST
    )


def quat2mat(quat: jax.Array) -> jax.Array:
    """Quaternion imaginary part (B, 3) -> rotation matrices (B, 3, 3).

    w is fixed to 1 before normalization, per the reference
    (reference: ``inverse_warp.py::quat2mat``).
    """
    B = quat.shape[0]
    q = jnp.concatenate([jnp.ones((B, 1), quat.dtype), quat], axis=1)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]

    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z

    rot = jnp.stack(
        [w2 + x2 - y2 - z2, 2 * (xy - wz), 2 * (xz + wy),
         2 * (xy + wz), w2 - x2 + y2 - z2, 2 * (yz - wx),
         2 * (xz - wy), 2 * (yz + wx), w2 - x2 - y2 + z2],
        axis=-1).reshape(B, 3, 3)
    return rot


def pose_vec2mat(vec: jax.Array, rotation_mode: str = "euler") -> jax.Array:
    """6-DoF pose vector (B, 6) -> (B, 3, 4) transform [R | t].

    (reference: ``inverse_warp.py::pose_vec2mat``)
    """
    translation = vec[:, :3, None]  # (B, 3, 1)
    rot = vec[:, 3:]
    if rotation_mode == "euler":
        rot_mat = euler2mat(rot)
    elif rotation_mode == "quat":
        rot_mat = quat2mat(rot)
    else:
        raise ValueError(f"unknown rotation_mode: {rotation_mode!r}")
    return jnp.concatenate([rot_mat, translation], axis=2)


def pixel2cam(depth: jax.Array, intrinsics_inv: jax.Array) -> jax.Array:
    """Back-project pixels to camera-frame 3D points.

    depth: (B, H, W); intrinsics_inv: (B, 3, 3).
    Returns cam coords (B, H, W, 3).
    (reference: ``inverse_warp.py::pixel2cam``)
    """
    B, H, W = depth.shape
    dtype = depth.dtype
    ys = jax.lax.broadcasted_iota(dtype, (H, W), 0)
    xs = jax.lax.broadcasted_iota(dtype, (H, W), 1)
    pix = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1)  # (H, W, 3)
    # rays[b, h, w, i] = K_inv[b, i, j] * pix[h, w, j]  — small batched matmul
    rays = jnp.einsum("bij,hwj->bhwi", intrinsics_inv, pix, precision=_HIGHEST)
    return rays * depth[..., None]


def cam2pixel(
    cam_coords: jax.Array,
    proj_rot: jax.Array,
    proj_tr: jax.Array,
    bounds: tuple[int, int] | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Project camera-frame points into another camera's pixel plane.

    cam_coords: (B, H, W, 3); proj_rot: (B, 3, 3) = K @ R;
    proj_tr: (B, 3, 1) = K @ t.
    bounds: optional (H_src, W_src) extent of the SOURCE image plane for
      the validity test — defaults to cam_coords' spatial shape (identical
      when target and source are same-resolution; they differ under the
      stochastic-photometric subsampled target grid).
    Returns (x, y, valid): float pixel coords (B, H, W) and an in-view &
    in-front mask (B, H, W) bool.
    (reference: ``inverse_warp.py::cam2pixel`` — which additionally
    normalizes to [-1, 1]; we stay in pixel space, see module docstring.)
    """
    B, H, W, _ = cam_coords.shape
    if bounds is not None:
        H, W = bounds
    p = (
        jnp.einsum("bij,bhwj->bhwi", proj_rot, cam_coords, precision=_HIGHEST)
        + proj_tr[:, None, None, :, 0]
    )
    X, Y, Z = p[..., 0], p[..., 1], p[..., 2]
    Zc = jnp.clip(Z, 1e-3, None)
    x = X / Zc
    y = Y / Zc
    # small tolerance so exact-boundary projections don't flicker invalid
    # under fp32 rounding
    eps = 1e-3
    valid = (
        (x >= -eps) & (x <= W - 1 + eps) & (y >= -eps) & (y <= H - 1 + eps) & (Z > 1e-3)
    )
    return x, y, valid


def inverse_warp(
    img: jax.Array,
    depth: jax.Array,
    pose: jax.Array,
    intrinsics: jax.Array,
    rotation_mode: str = "euler",
    padding_mode: str = "zeros",
    use_pallas: bool = False,
    diff_img: bool = True,
    tgt_intrinsics: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Inverse-warp a source image to the target frame.

    Args:
      img: (B, H, W, C) source (reference frame) image.
      depth: (B, Ht, Wt) target-frame depth. Usually (Ht, Wt) == (H, W);
        the stochastic-photometric path passes a phase-subsampled target
        grid (smaller) with ``tgt_intrinsics`` mapping grid indices to the
        true full-resolution pixel coordinates.
      pose: (B, 6) target->source 6-DoF pose vector.
      intrinsics: (B, 3, 3) of the SOURCE image plane (projection side).
      tgt_intrinsics: optional (B, 3, 3) for the TARGET back-projection
        (pixel2cam); defaults to ``intrinsics``.
      rotation_mode: 'euler' | 'quat'.
      padding_mode: 'zeros' | 'border' for out-of-view samples.
      use_pallas: sample with the Pallas MXU-gather kernel
        (ops/pallas/warp.py) instead of the XLA gather path.
      diff_img: propagate gradients to ``img``. The photometric loss passes
        False (the warped source is training data there — its gradient is
        dead), which also selects the cheaper coords-only Pallas VJP. Any
        caller differentiating through the warped image must leave it True.

    Returns:
      (warped, valid): warped (B, H, W, C) source image resampled at the
      target pixels, and valid (B, H, W) bool in-view mask.
    (reference: ``inverse_warp.py::inverse_warp``)
    """
    intrinsics_inv = jnp.linalg.inv(
        intrinsics if tgt_intrinsics is None else tgt_intrinsics)
    cam_coords = pixel2cam(depth, intrinsics_inv)  # (B, Ht, Wt, 3)
    pose_mat = pose_vec2mat(pose, rotation_mode)  # (B, 3, 4)
    # K @ [R|t]: rot part (B,3,3), translation part (B,3,1)
    proj = jnp.matmul(intrinsics, pose_mat, precision=_HIGHEST)
    x, y, valid = cam2pixel(cam_coords, proj[:, :, :3], proj[:, :, 3:],
                            bounds=img.shape[1:3])
    if not diff_img:
        img = jax.lax.stop_gradient(img)
    if use_pallas:
        from supervised_dispnet_tpu.ops.pallas.warp import bilinear_sample_pallas

        warped = bilinear_sample_pallas(img, x, y, padding_mode=padding_mode,
                                        diff_img=diff_img)
    else:
        warped = bilinear_sample(img, x, y, padding_mode=padding_mode)
    return warped, valid
