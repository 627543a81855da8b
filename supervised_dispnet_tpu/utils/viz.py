"""Visualization helpers (reference: ``utils.py::tensor2array`` colormapped
disparity/depth images for tensorboard)."""

from __future__ import annotations

import numpy as np


def tensor2array(
    arr: np.ndarray,
    max_value: float | None = None,
    colormap: str = "magma",
) -> np.ndarray:
    """(H, W) scalar map -> (H, W, 3) float RGB in [0, 1] via matplotlib
    colormap; (H, W, 3) images are denormalized from [-1, 1]."""
    arr = np.asarray(arr)
    if arr.ndim == 2 or (arr.ndim == 3 and arr.shape[-1] == 1):
        arr = arr.reshape(arr.shape[0], arr.shape[1])
        if max_value is None:
            max_value = float(arr.max()) or 1.0
        norm = np.clip(arr / max_value, 0, 1)
        try:
            import matplotlib

            rgba = matplotlib.colormaps[colormap](norm)
        except Exception:
            rgba = np.stack([norm, norm, norm, np.ones_like(norm)], -1)
        return rgba[..., :3].astype(np.float32)
    # image: assume normalized with 0.5/0.5
    return np.clip(arr * 0.5 + 0.5, 0, 1).astype(np.float32)


def save_depth_png(path, depth: np.ndarray, max_value: float | None = None):
    import imageio.v2 as imageio

    rgb = (tensor2array(depth, max_value) * 255).astype(np.uint8)
    imageio.imwrite(path, rgb)
