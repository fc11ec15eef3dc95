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


class PreprocessedFrame:
    """Downsampled/filtered scan + kNN graph (reference: preprocess/preprocessed_frame.hpp:14-37).

    Arrays are PADDED to the preprocessor's output capacity; ``device_mask``
    marks valid lanes. The hot path is fully device-resident — host mirrors
    (``points``/``times``/``neighbors``) are fetched LAZILY on first access so
    the pipeline never blocks on a device->host transfer it does not need.
    """

    def __init__(self, stamp: float, scan_end_time: float, k_neighbors: int,
                 device_points=None, device_times=None, device_mask=None,
                 device_neighbors=None, raw_points: Optional[RawPoints] = None,
                 points: Optional[np.ndarray] = None,
                 times: Optional[np.ndarray] = None,
                 intensities: Optional[np.ndarray] = None,
                 neighbors: Optional[np.ndarray] = None):
        self.stamp = stamp
        self.scan_end_time = scan_end_time
        self.k_neighbors = k_neighbors
        self.device_points = device_points      # (C, 3)
        self.device_times = device_times        # (C,)
        self.device_mask = device_mask          # (C,)
        self.device_neighbors = device_neighbors  # (C, k)
        self.raw_points = raw_points
        self.intensities = intensities
        self._points = points
        self._times = times
        self._neighbors = neighbors

    @property
    def points(self) -> Optional[np.ndarray]:
        if self._points is None and self.device_points is not None:
            self._points = np.asarray(self.device_points)
        return self._points

    @property
    def times(self) -> Optional[np.ndarray]:
        if self._times is None and self.device_times is not None:
            self._times = np.asarray(self.device_times)
        return self._times

    @property
    def neighbors(self) -> Optional[np.ndarray]:
        if self._neighbors is None and self.device_neighbors is not None:
            self._neighbors = np.asarray(self.device_neighbors)
        return self._neighbors

    @property
    def size(self) -> int:
        if self.device_mask is not None:
            return int(np.asarray(self.device_mask).sum())
        return int(self._points.shape[0]) if self._points is not None else 0


class FrameID(enum.Enum):
    WORLD = "world"
    LIDAR = "lidar"
    IMU = "imu"


class EstimationFrame:
    """One odometry estimation frame (reference: odometry/estimation_frame.hpp:14-107).

    World poses may be backed by device arrays (``device_T_world_lidar``) and
    are fetched lazily, so the odometry hot loop never blocks on the pose
    transfer — only consumers that actually read ``T_world_lidar`` do.
    """

    def __init__(self, id: int = -1, stamp: float = 0.0,
                 T_lidar_imu: Optional[np.ndarray] = None,
                 T_world_lidar: Optional[np.ndarray] = None,
                 T_world_imu: Optional[np.ndarray] = None,
                 device_T_world_lidar=None,
                 v_world_imu: Optional[np.ndarray] = None,
                 device_v_world_imu=None,
                 imu_bias: Optional[np.ndarray] = None,
                 device_imu_bias=None,
                 imu_rate_trajectory: Optional[np.ndarray] = None,
                 cov_pose: Optional[np.ndarray] = None,
                 cov_velocity: Optional[np.ndarray] = None,
                 cov_bias: Optional[np.ndarray] = None,
                 frame_id: FrameID = FrameID.LIDAR,
                 frame: Optional[PointBatch] = None,
                 raw_frame: Optional[PreprocessedFrame] = None,
                 voxelmaps: Optional[List[Any]] = None,
                 custom_data: Optional[Dict[str, Any]] = None):
        self.id = id
        self.stamp = stamp
        self.T_lidar_imu = np.eye(4) if T_lidar_imu is None else T_lidar_imu
        self._T_world_lidar = T_world_lidar
        self._T_world_imu = T_world_imu
        self.device_T_world_lidar = device_T_world_lidar
        self._v_world_imu = v_world_imu
        self.device_v_world_imu = device_v_world_imu
        self._imu_bias = imu_bias
        self.device_imu_bias = device_imu_bias
        self._imu_rate_trajectory = imu_rate_trajectory
        # Device-resident IMU-rate trajectory: (packed (8, CAP) [stamps_rel;
        # trans(3); quats(4)], n_valid, stamp0) — materialized lazily so the
        # per-scan hot loops never pay a blocking device->host fetch for it.
        self.device_imu_rate_trajectory = None
        self.cov_pose = cov_pose
        self.cov_velocity = cov_velocity
        self.cov_bias = cov_bias
        self.frame_id = frame_id
        self.frame = frame
        self.raw_frame = raw_frame
        self.voxelmaps = [] if voxelmaps is None else voxelmaps
        self.custom_data = {} if custom_data is None else custom_data
        # In-flight async packed-state copy: (packed_dev, need_T, need_v,
        # need_b) — see fetch_state_async().
        self._state_pending = None

    @property
    def T_world_lidar(self) -> np.ndarray:
        if self._T_world_lidar is None:
            if self.device_T_world_lidar is not None:
                self._T_world_lidar = np.asarray(self.device_T_world_lidar, np.float64)
            else:
                self._T_world_lidar = np.eye(4)
        return self._T_world_lidar

    @T_world_lidar.setter
    def T_world_lidar(self, T) -> None:
        self._T_world_lidar = np.asarray(T, np.float64)

    @property
    def T_world_imu(self) -> np.ndarray:
        # Reference convention (config_sensors.json): p_lidar = T_lidar_imu *
        # p_imu, hence T_world_imu = T_world_lidar * T_lidar_imu.
        if self._T_world_imu is None:
            self._T_world_imu = self.T_world_lidar @ self.T_lidar_imu
        return self._T_world_imu

    @T_world_imu.setter
    def T_world_imu(self, T) -> None:
        self._T_world_imu = np.asarray(T, np.float64)

    @property
    def imu_rate_trajectory(self):
        """(8, n) [abs stamps; trans xyz; quat xyzw] or None. Materialized
        lazily from ``device_imu_rate_trajectory`` on first host access."""
        if self._imu_rate_trajectory is None \
                and self.device_imu_rate_trajectory is not None:
            packed, n, stamp0 = self.device_imu_rate_trajectory
            arr = np.asarray(packed, np.float64)[:, :n].copy()
            arr[0] += stamp0
            self._imu_rate_trajectory = arr
        return self._imu_rate_trajectory

    @imu_rate_trajectory.setter
    def imu_rate_trajectory(self, traj) -> None:
        self._imu_rate_trajectory = traj

    def _pack_state(self):
        """Build the packed 25-float device state (or None if no host
        cache is missing). Even a SINGLE missing field goes through the
        packed path: the async prefetch at hand-off makes it free, while a
        lazy property read would serialize ~25-40 ms behind the in-flight
        window program on the device queue (measured: end-of-sequence
        frames arrive with pose+velocity host-filled but bias device-only)."""
        need_T = self._T_world_lidar is None and self.device_T_world_lidar is not None
        need_v = self._v_world_imu is None and self.device_v_world_imu is not None
        need_b = self._imu_bias is None and self.device_imu_bias is not None
        if not (need_T or need_v or need_b):
            return None
        import jax.numpy as jnp
        parts = [
            jnp.reshape(self.device_T_world_lidar, (-1,)) if need_T
            else jnp.zeros(16, jnp.float32),
            jnp.reshape(self.device_v_world_imu, (-1,)) if need_v
            else jnp.zeros(3, jnp.float32),
            jnp.reshape(self.device_imu_bias, (-1,)) if need_b
            else jnp.zeros(6, jnp.float32),
        ]
        packed = jnp.concatenate([p.astype(jnp.float32) for p in parts])
        return packed, need_T, need_v, need_b

    def fetch_state_async(self) -> None:
        """Start a non-blocking device->host copy of the packed state.
        A later ``fetch_state()`` consumes the landed buffer instead of
        paying a full blocking roundtrip behind the device queue — the
        producer thread (odometry) calls this at hand-off so the copy
        overlaps the consumer's queue latency."""
        if self._state_pending is not None:
            return
        ps = self._pack_state()
        if ps is None:
            return
        packed = ps[0]
        try:
            packed.copy_to_host_async()
        except AttributeError:
            pass                       # backend without async copies
        self._state_pending = ps

    def fetch_state(self) -> None:
        """Materialize pose/velocity/bias host caches in ONE device->host
        roundtrip (a packed 25-float fetch) instead of three; no-op for
        values already cached. Uses the in-flight async copy when
        ``fetch_state_async`` was called earlier."""
        ps = self._state_pending
        if ps is None:
            ps = self._pack_state()
            if ps is None:
                return
        self._state_pending = None
        packed_dev, need_T, need_v, need_b = ps
        packed = np.asarray(packed_dev, np.float64)
        if need_T and self._T_world_lidar is None:
            self._T_world_lidar = packed[:16].reshape(4, 4)
        if need_v and self._v_world_imu is None:
            self._v_world_imu = packed[16:19]
        if need_b and self._imu_bias is None:
            self._imu_bias = packed[19:25]

    @property
    def imu_bias(self) -> np.ndarray:
        if self._imu_bias is None:
            if self.device_imu_bias is not None:
                self._imu_bias = np.asarray(self.device_imu_bias, np.float64)
            else:
                self._imu_bias = np.zeros(6)
        return self._imu_bias

    @imu_bias.setter
    def imu_bias(self, b) -> None:
        self._imu_bias = np.asarray(b, np.float64)

    @property
    def v_world_imu(self) -> np.ndarray:
        if self._v_world_imu is None:
            if self.device_v_world_imu is not None:
                self._v_world_imu = np.asarray(self.device_v_world_imu, np.float64)
            else:
                self._v_world_imu = np.zeros(3)
        return self._v_world_imu

    @v_world_imu.setter
    def v_world_imu(self, v) -> None:
        self._v_world_imu = np.asarray(v, np.float64)

    def prefetch(self) -> None:
        """Start asynchronous device->host copies of the device-backed pose/
        velocity/bias fields so later lazy property reads find the copy
        already landed.

        CAUTION (measured on the remoted axon chip): requesting an async
        copy of a NOT-yet-computed array behaves like a queue flush there —
        calling this right after dispatch in a deep pipeline COSTS ~0.5 s
        per frame rather than saving the fetch roundtrip. Only call it when
        the producing program has likely finished (e.g. from a consumer
        thread one item behind)."""
        for a in (self.device_T_world_lidar, self.device_v_world_imu,
                  self.device_imu_bias):
            if a is not None:
                try:
                    a.copy_to_host_async()
                except AttributeError:
                    pass

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
            self.T_world_lidar = T @ np.linalg.inv(self.T_lidar_imu)  # T_world_imu * T_imu_lidar
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
