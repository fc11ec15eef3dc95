"""Point-cloud file loaders for offline datasets."""

from __future__ import annotations

import os

import numpy as np


def load_kitti_bin(path: str) -> np.ndarray:
    """KITTI velodyne .bin: packed float32 [x, y, z, reflectance] rows.
    Returns (N, 4)."""
    data = np.fromfile(path, dtype=np.float32)
    return data.reshape(-1, 4)


def load_scan_file(path: str) -> np.ndarray:
    """Dispatch by extension: .npy | .bin (KITTI) | .ply. Returns (N, 3|4)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".npy":
        return np.load(path)
    if ext == ".bin":
        return load_kitti_bin(path)
    if ext == ".ply":
        from glim_tpu.native import ply_read
        return ply_read(path)
    raise ValueError(f"unsupported scan format: {path}")
