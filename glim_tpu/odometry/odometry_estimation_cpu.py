"""Frame-to-model LiDAR odometry (GICP / VGICP matching).

Equivalent capability to the reference's ``OdometryEstimationCPU``
(reference: src/glim/odometry/odometry_estimation_cpu.cpp:77-224, params from
config/config_odometry_cpu.json): per-frame standalone registration of the
deskewed scan against an incremental model — an iVox-style bounded point map
in GICP mode, a Gaussian voxel map in VGICP mode — followed by model update
with random sampling and LRU horizon.

The name keeps the reference's registry key ("cpu" = the non-voxelized-GPU
configuration); the compute here runs on TPU either way. The per-frame solve
is a fully-on-device Gauss-Newton scan (fixed iterations, no host sync);
motion prediction is constant-velocity twist extrapolation which also drives
deskewing. IMU tight coupling lives in odometry_estimation_imu.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from glim_tpu.odometry.callbacks import OdometryEstimationCallbacks as CB
from glim_tpu.odometry.estimation_base import OdometryEstimationBase
from glim_tpu.ops import covariance as cov_ops
from glim_tpu.ops import deskew as deskew_ops
from glim_tpu.ops import gicp, lie, lie_np, pointops, solver
from glim_tpu.ops import voxelmap as vmx
from glim_tpu.types import EstimationFrame, FrameID, PointBatch, PreprocessedFrame
from glim_tpu.utils.logging import create_module_logger
from glim_tpu.utils.registry import register_module

logger = create_module_logger("odom")


@dataclass
class OdometryEstimationCPUParams:
    registration_type: str = "GICP"          # GICP | VGICP
    max_iterations: int = 8
    smoother_lag: float = 5.0
    target_downsampling_rate: float = 0.1
    lru_thresh: int = 100
    ivox_resolution: float = 1.0
    ivox_min_dist: float = 0.1
    vgicp_resolution: float = 0.5
    vgicp_voxelmap_levels: int = 1
    max_correspondence_distance: float = 2.0
    model_capacity: int = 131072             # GICP model points
    voxel_capacity: int = 65536              # VGICP voxels
    enable_deskew: bool = True
    twist_smoothing: float = 0.25            # EMA gain on the twist estimate

    @staticmethod
    def from_config(config) -> "OdometryEstimationCPUParams":
        p = OdometryEstimationCPUParams()
        g = lambda k, d: config.param("odometry_estimation", k, d)
        p.registration_type = g("registration_type", "GICP")
        p.max_iterations = int(g("max_iterations", 8))
        p.smoother_lag = g("smoother_lag", 5.0)
        p.target_downsampling_rate = g("target_downsampling_rate", 0.1)
        p.lru_thresh = int(g("lru_thresh", 100))
        p.ivox_resolution = g("ivox_resolution", 1.0)
        p.ivox_min_dist = g("ivox_min_dist", 0.1)
        p.vgicp_resolution = g("vgicp_resolution", 0.5)
        p.vgicp_voxelmap_levels = int(g("vgicp_voxelmap_levels", 1))
        return p


@partial(jax.jit, static_argnames=("iters",))
def _register_gicp(T_init, pts, covs, mask, m_pts, m_covs, m_mask, max_dist, iters):
    def linearize(T):
        s = gicp.gicp_linearize(jnp.eye(4), T, pts, covs, mask,
                                m_pts, m_covs, m_mask, max_dist)
        return s.H_ss, s.b_s, s.error

    return solver.gn_optimize_scan(linearize, lambda T, d: T @ lie.se3_exp(d),
                                   T_init, num_iters=iters)


@partial(jax.jit, static_argnames=("iters",))
def _register_vgicp(T_init, pts, covs, mask, vm, iters):
    def linearize(T):
        s = gicp.vgicp_linearize(jnp.eye(4), T, pts, covs, mask, vm)
        return s.H_ss, s.b_s, s.error

    return solver.gn_optimize_scan(linearize, lambda T, d: T @ lie.se3_exp(d),
                                   T_init, num_iters=iters)


@jax.jit
def _prepare_frame(pts, times, mask, neighbors, twist):
    """Deskew (constant twist) + per-point covariance estimation, fused."""
    deskewed = deskew_ops.deskew_twist(pts, times, mask, twist)
    covs, normals = cov_ops.estimate_covariances(deskewed, mask, neighbors, "plane")
    return deskewed, covs, normals


@jax.jit
def _world_points(T, pts):
    return pts @ T[:3, :3].T + T[:3, 3]


class OdometryEstimationCPU(OdometryEstimationBase):
    def __init__(self, params: Optional[OdometryEstimationCPUParams] = None):
        self.params = params or OdometryEstimationCPUParams()
        p = self.params
        self.use_vgicp = p.registration_type.upper().startswith("VGICP")
        if self.use_vgicp:
            self.model = vmx.empty_gaussian_voxelmap(p.voxel_capacity, p.vgicp_resolution)
        else:
            self.model = vmx.empty_point_voxelmap(p.model_capacity, p.ivox_min_dist)
        self._rng = jax.random.PRNGKey(1)

        self.frame_count = 0
        self.last_stamp: Optional[float] = None
        self.T_world_lidar = np.eye(4)
        self.twist = np.zeros(6)             # body twist/sec [omega, v]
        self.frames: List[EstimationFrame] = []
        self.imu_queue: List[np.ndarray] = []

    def requires_imu(self) -> bool:
        return False

    def insert_imu(self, stamp, linear_acc, angular_vel) -> None:
        CB.on_insert_imu(stamp, linear_acc, angular_vel)
        # LiDAR-only module: IMU currently unused (see odometry_estimation_imu).

    def insert_frame(self, frame: PreprocessedFrame,
                     marginalized: Optional[List[EstimationFrame]] = None
                     ) -> Optional[EstimationFrame]:
        CB.on_insert_frame(frame)
        p = self.params
        pts = frame.device_points
        times = frame.device_times
        mask = frame.device_mask
        neighbors = frame.device_neighbors

        dt = 0.1 if self.last_stamp is None else max(frame.stamp - self.last_stamp, 1e-3)

        twist = self.twist if p.enable_deskew else np.zeros(6)
        deskewed, covs, normals = _prepare_frame(
            pts, times, mask, neighbors, jnp.asarray(twist, jnp.float32))

        if self.frame_count == 0:
            T_new = jnp.eye(4)
        else:
            T_pred = self.T_world_lidar @ lie_np.se3_exp(self.twist * dt)
            T_new, errs = self._register(jnp.asarray(T_pred, jnp.float32),
                                         deskewed, covs, mask)
            T_new_np = np.asarray(T_new, np.float64)
            twist_new = lie_np.se3_log(np.linalg.inv(self.T_world_lidar) @ T_new_np) / dt
            # EMA-smooth the twist: raw per-step twists feed deskewing, and an
            # unfiltered estimate closes a positive feedback loop (pose noise
            # -> twist noise -> deskew corruption -> amplified pose noise).
            a = self.params.twist_smoothing
            self.twist = a * twist_new + (1.0 - a) * self.twist
            self.T_world_lidar = _orthonormalize(T_new_np)

        self._update_model(T_new if self.frame_count > 0 else jnp.eye(4),
                           deskewed, covs, mask)

        est = EstimationFrame(
            id=self.frame_count,
            stamp=frame.stamp,
            T_world_lidar=self.T_world_lidar.copy(),
            T_world_imu=self.T_world_lidar.copy(),
            v_world_imu=(self.T_world_lidar[:3, :3] @ self.twist[3:]).copy(),
            frame_id=FrameID.LIDAR,
            frame=PointBatch(points=deskewed, mask=mask, times=times,
                             covs=covs, normals=normals),
            raw_frame=frame,
        )
        self.frames.append(est)
        self.frame_count += 1
        self.last_stamp = frame.stamp
        CB.on_new_frame(est)
        CB.on_update_frames(self.frames)

        # Time-based marginalization (the fixed-lag window boundary,
        # reference: odometry_estimation_imu.cpp:343-355).
        margs = []
        while self.frames and self.frames[0].stamp < frame.stamp - p.smoother_lag:
            margs.append(self.frames.pop(0))
        if margs:
            CB.on_marginalized_frames(margs)
            if marginalized is not None:
                marginalized.extend(margs)
        return est

    def get_remaining_frames(self) -> List[EstimationFrame]:
        out = self.frames
        self.frames = []
        return out

    # -- internals --

    def _register(self, T_init, pts, covs, mask):
        p = self.params
        if self.use_vgicp:
            return _register_vgicp(T_init, pts, covs, mask, self.model,
                                   iters=p.max_iterations)
        return _register_gicp(T_init, pts, covs, mask,
                              self.model.points, self.model.covs, self.model.mask,
                              jnp.float32(p.max_correspondence_distance),
                              iters=p.max_iterations)

    def _update_model(self, T, pts, covs, mask):
        p = self.params
        w_pts = _world_points(T, pts)
        if self.frame_count >= 5 and p.target_downsampling_rate < 1.0:
            self._rng, sub = jax.random.split(self._rng)
            target = int(pts.shape[0] * p.target_downsampling_rate)
            w_pts, mask, idx = pointops.random_sampling(w_pts, mask, target, sub)
            covs = covs[idx]
        # Rotate covariances into world frame.
        R = T[:3, :3]
        covs_w = jnp.einsum("ij,cjk,lk->cil", R, covs, R)
        step = jnp.int32(self.frame_count)
        if self.use_vgicp:
            self.model = vmx.voxelmap_insert(self.model, w_pts, mask, covs_w, step)
        else:
            self.model = vmx.pointmap_insert(self.model, w_pts, mask, covs_w, step)


def _orthonormalize(T: np.ndarray) -> np.ndarray:
    U, _, Vt = np.linalg.svd(T[:3, :3])
    out = np.eye(4)
    out[:3, :3] = U @ np.diag([1, 1, np.sign(np.linalg.det(U @ Vt))]) @ Vt
    out[:3, 3] = T[:3, 3]
    return out


@register_module("odometry", "odometry_estimation_cpu")
def create_odometry_estimation_module(config=None):
    params = (OdometryEstimationCPUParams.from_config(config)
              if config is not None else OdometryEstimationCPUParams())
    return OdometryEstimationCPU(params)
