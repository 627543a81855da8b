"""Native (C++) runtime components, built on demand with the system
toolchain and loaded via ctypes.

Currently: the velodyne->depth projection ETL hot loop
(velodyne_projection.cpp). Falls back to the numpy implementation in
``kitti_eval.depth_evaluation_utils`` when no compiler is available.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_LIB_PATH = _HERE / "_velodyne_projection.so"
_lib = None
_tried = False


def _build() -> bool:
    src = _HERE / "velodyne_projection.cpp"
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
             str(src), "-o", str(_LIB_PATH)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.project_velodyne.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.project_velodyne_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def project_velodyne_native(
    points: np.ndarray, P: np.ndarray, im_shape: tuple[int, int]
) -> np.ndarray | None:
    """(n, 4) float32 points + (3, 4) projection -> (H, W) float32 depth.
    Returns None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    H, W = im_shape
    pts = np.ascontiguousarray(points, dtype=np.float32)
    Pm = np.ascontiguousarray(P, dtype=np.float64)
    out = np.zeros((H, W), dtype=np.float32)
    lib.project_velodyne(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(pts.shape[0]),
        Pm.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(H), ctypes.c_int64(W),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def project_velodyne_batch_native(
    points_list: list[np.ndarray], Ps: np.ndarray, im_shape: tuple[int, int],
    n_threads: int = 8,
) -> np.ndarray | None:
    """Project many frames in parallel C++ threads (no GIL).
    points_list: per-frame (n_i, 4) arrays; Ps: (n_frames, 3, 4)."""
    lib = get_lib()
    if lib is None:
        return None
    H, W = im_shape
    n_frames = len(points_list)
    offsets = np.zeros(n_frames + 1, dtype=np.int64)
    for i, p in enumerate(points_list):
        offsets[i + 1] = offsets[i] + p.shape[0]
    flat = np.ascontiguousarray(
        np.concatenate([p.reshape(-1, 4) for p in points_list], axis=0),
        dtype=np.float32,
    )
    Pm = np.ascontiguousarray(Ps.reshape(n_frames, 12), dtype=np.float64)
    out = np.zeros((n_frames, H, W), dtype=np.float32)
    lib.project_velodyne_batch(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        Pm.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(n_frames), ctypes.c_int64(H), ctypes.c_int64(W),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(n_threads),
    )
    return out
