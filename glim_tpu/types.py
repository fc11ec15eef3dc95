"""Core data model: raw scans, preprocessed frames, estimation frames, submaps.

Equivalent surface to the reference's data structs (reference:
include/glim/util/raw_points.hpp:12-27, preprocess/preprocessed_frame.hpp:14-37,
odometry/estimation_frame.hpp:14-107, mapping/sub_map.hpp:16-95), re-designed
for TPU: point clouds are padded fixed-capacity SoA jnp arrays with validity
masks so every downstream jit sees static shapes. Capacity classes are powers
of two, which bounds the number of distinct compiled programs.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def capacity_for(n: int, minimum: int = 512) -> int:
    """Round n up to the next power-of-two capacity class."""
    c = minimum
    while c < n:
        c *= 2
    return c


@jax.tree_util.register_dataclass
@dataclass
class PointBatch:
    """Padded SoA point cloud resident on device.

    Plays the role of gtsam_points::PointCloud (CPU and GPU variants collapse
    into one device-resident structure; reference attribute layout:
    src/glim/viewer/standard_viewer_mem.cpp:34-59). Invalid (padding) lanes are
    masked; all ops must honor ``mask``.
    """

    points: jnp.ndarray          # (C, 3) f32
    mask: jnp.ndarray            # (C,) bool
    times: Optional[jnp.ndarray] = None        # (C,) f32, relative to frame stamp
    intensities: Optional[jnp.ndarray] = None  # (C,) f32
    covs: Optional[jnp.ndarray] = None         # (C, 3, 3) f32
    normals: Optional[jnp.ndarray] = None      # (C, 3) f32

    @property
    def capacity(self) -> int:
        return int(self.points.shape[0])

    def num_valid(self) -> int:
        return int(jnp.sum(self.mask))

    @staticmethod
    def from_numpy(points: np.ndarray, times: Optional[np.ndarray] = None,
                   intensities: Optional[np.ndarray] = None,
                   covs: Optional[np.ndarray] = None,
                   normals: Optional[np.ndarray] = None,
                   capacity: Optional[int] = None) -> "PointBatch":
        pts = np.asarray(points, dtype=np.float32).reshape(-1, 3 if points.shape[-1] == 3 else points.shape[-1])
        if pts.shape[-1] == 4:
            pts = pts[:, :3]
        n = pts.shape[0]
        cap = capacity if capacity is not None else capacity_for(n)
        if cap < n:
            raise ValueError(f"capacity {cap} < n {n}")

        def pad(a, shape_tail, dtype=np.float32):
            if a is None:
                return None
            a = np.asarray(a, dtype=dtype).reshape((n,) + shape_tail)
            out = np.zeros((cap,) + shape_tail, dtype=dtype)
            out[:n] = a
            return jnp.asarray(out)

        mask = np.zeros(cap, dtype=bool)
        mask[:n] = True
        return PointBatch(
            points=pad(pts, (3,)),
            mask=jnp.asarray(mask),
            times=pad(times, ()),
            intensities=pad(intensities, ()),
            covs=pad(covs, (3, 3)),
            normals=pad(normals, (3,)),
        )

    def to_numpy(self) -> Dict[str, np.ndarray]:
        mask = np.asarray(self.mask)
        out = {"points": np.asarray(self.points)[mask]}
        for name in ("times", "intensities", "normals"):
            v = getattr(self, name)
            if v is not None:
                out[name] = np.asarray(v)[mask]
        if self.covs is not None:
            out["covs"] = np.asarray(self.covs)[mask]
        return out


@dataclass
class RawPoints:
    """One raw sensor scan (reference: util/raw_points.hpp:12-27)."""

    stamp: float
    points: np.ndarray                       # (N, 3) or (N, 4) f64
    times: Optional[np.ndarray] = None       # (N,) per-point times (semantics sanitized by TimeKeeper)
    intensities: Optional[np.ndarray] = None
    colors: Optional[np.ndarray] = None      # (N, 4)
    rings: Optional[np.ndarray] = None       # (N,) int

    @property
    def size(self) -> int:
        return int(self.points.shape[0])


@dataclass
class PreprocessedFrame:
    """Downsampled/filtered scan + kNN graph (reference: preprocess/preprocessed_frame.hpp:14-37).

    Arrays are PADDED to the preprocessor's output capacity; ``device_mask``
    marks valid lanes. Host mirrors (``points``/``times``/``neighbors``) share
    that padding.
    """

    stamp: float
    scan_end_time: float
    points: np.ndarray                      # (C, 3) f32 (host mirror, padded)
    times: np.ndarray                       # (C,) f32 relative times
    intensities: Optional[np.ndarray]
    k_neighbors: int
    neighbors: Optional[np.ndarray]         # (C, k) int32 kNN indices
    raw_points: Optional[RawPoints] = None
    # Device-resident padded arrays (set by CloudPreprocessor).
    device_points: Optional[jnp.ndarray] = None   # (C, 3)
    device_times: Optional[jnp.ndarray] = None    # (C,)
    device_mask: Optional[jnp.ndarray] = None     # (C,)
    device_neighbors: Optional[jnp.ndarray] = None  # (C, k)

    @property
    def size(self) -> int:
        if self.device_mask is not None:
            return int(np.asarray(self.device_mask).sum())
        return int(self.points.shape[0])


class FrameID(enum.Enum):
    WORLD = "world"
    LIDAR = "lidar"
    IMU = "imu"


@dataclass
class EstimationFrame:
    """One odometry estimation frame (reference: odometry/estimation_frame.hpp:14-107)."""

    id: int = -1
    stamp: float = 0.0

    T_lidar_imu: np.ndarray = field(default_factory=lambda: np.eye(4))
    T_world_lidar: np.ndarray = field(default_factory=lambda: np.eye(4))
    T_world_imu: np.ndarray = field(default_factory=lambda: np.eye(4))

    v_world_imu: np.ndarray = field(default_factory=lambda: np.zeros(3))
    imu_bias: np.ndarray = field(default_factory=lambda: np.zeros(6))  # [acc, gyro]
    imu_rate_trajectory: Optional[np.ndarray] = None  # (8, N) rows: t x y z qx qy qz qw

    cov_pose: Optional[np.ndarray] = None   # (6, 6)
    cov_velocity: Optional[np.ndarray] = None
    cov_bias: Optional[np.ndarray] = None

    frame_id: FrameID = FrameID.LIDAR
    frame: Optional[PointBatch] = None      # deskewed points (+covs/normals)
    raw_frame: Optional[PreprocessedFrame] = None
    voxelmaps: List[Any] = field(default_factory=list)  # multi-resolution GaussianVoxelMaps
    custom_data: Dict[str, Any] = field(default_factory=dict)

    def T_world_sensor(self) -> np.ndarray:
        if self.frame_id == FrameID.LIDAR:
            return self.T_world_lidar
        if self.frame_id == FrameID.IMU:
            return self.T_world_imu
        return np.eye(4)

    def set_T_world_sensor(self, T: np.ndarray) -> None:
        if self.frame_id == FrameID.LIDAR:
            self.T_world_lidar = T
            self.T_world_imu = T @ self.T_lidar_imu
        elif self.frame_id == FrameID.IMU:
            self.T_world_imu = T
            self.T_world_lidar = T @ np.linalg.inv(self.T_lidar_imu)
        else:
            raise ValueError("cannot set world pose for WORLD frame")

    def clone(self) -> "EstimationFrame":
        import copy as _copy

        return _copy.copy(self)

    def clone_wo_points(self) -> "EstimationFrame":
        c = self.clone()
        c.frame = None
        c.raw_frame = None
        c.voxelmaps = []
        return c


@dataclass
class SubMap:
    """A bundle of optimized frames merged into one map node
    (reference: mapping/sub_map.hpp:16-95)."""

    id: int = -1
    session_id: int = 0

    T_world_origin: np.ndarray = field(default_factory=lambda: np.eye(4))
    T_origin_endpoint_L: np.ndarray = field(default_factory=lambda: np.eye(4))
    T_origin_endpoint_R: np.ndarray = field(default_factory=lambda: np.eye(4))

    frame: Optional[PointBatch] = None       # merged + downsampled points
    voxelmaps: List[Any] = field(default_factory=list)

    frames: List[EstimationFrame] = field(default_factory=list)       # optimized
    odom_frames: List[EstimationFrame] = field(default_factory=list)  # raw odometry
    custom_data: Dict[str, Any] = field(default_factory=dict)

    def drop_frame_points(self) -> None:
        self.frames = [f.clone_wo_points() for f in self.frames]
        self.odom_frames = [f.clone_wo_points() for f in self.odom_frames]
