"""Tightly-coupled LiDAR-IMU odometry (the flagship estimator).

Equivalent capability to the reference's ``OdometryEstimationIMU`` /
``OdometryEstimationGPU`` (reference:
src/glim/odometry/odometry_estimation_imu.cpp:35-457,
odometry/odometry_estimation_gpu.cpp:76-412, params from
config/config_odometry_gpu.json): per-scan IMU preintegration + NavState
prediction, IMU-rate deskewing, multi-resolution VGICP matching against a
keyframe voxel map, joint optimization of pose/velocity/bias over a sliding
window with marginalization priors (the fixed-lag smoother replacement), and
keyframe management by map overlap.

The ENTIRE per-scan pipeline is one fused jitted program
(window_estimator.window_scan_step); the host builds the padded IMU window,
dispatches, and never blocks — status (corruption, IMU validation inputs)
returns through a small packed vector fetched one scan late when its
transfer has already landed.

Registered as ``odometry_estimation_gpu`` — the reference's "gpu" module is
its VGICP-accelerated configuration, which is exactly what the TPU runs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from glim_tpu.odometry.callbacks import OdometryEstimationCallbacks as CB
from glim_tpu.odometry.estimation_base import OdometryEstimationBase
from glim_tpu.odometry.window_estimator import (OLD_SUBSAMPLE, WindowState,
                                                empty_window, window_scan_step)
from glim_tpu.ops import covariance as cov_ops
from glim_tpu.ops import voxelmap as vmx
from glim_tpu.types import EstimationFrame, FrameID, PointBatch, PreprocessedFrame
from glim_tpu.utils.logging import create_module_logger
from glim_tpu.utils.registry import register_module

logger = create_module_logger("odom")

GRAVITY = np.array([0.0, 0.0, -9.80665])


@dataclass
class OdometryEstimationIMUParams:
    # Initialization (reference config_odometry_gpu.json keys)
    initialization_mode: str = "LOOSE"      # LOOSE (default, as reference) | NAIVE
    initialization_window_size: float = 1.0
    init_pose_damping_scale: float = 1e10
    # Optimization
    smoother_lag: float = 5.0
    fix_imu_bias: bool = False
    compute_covs: bool = False
    window_size: int = 4
    outer_iterations: int = 2
    inner_iterations: int = 2
    # Voxel params
    voxel_resolution: float = 0.25
    voxel_resolution_max: float = 0.5
    voxel_resolution_dmin: float = 5.0
    voxel_resolution_dmax: float = 20.0
    voxelmap_levels: int = 2
    voxelmap_scaling_factor: float = 2.0
    full_connection_window_size: int = 2
    voxel_capacity: int = 131072
    # Keyframes
    keyframe_update_strategy: str = "OVERLAP"
    max_num_keyframes: int = 15
    keyframe_min_overlap: float = 0.01
    keyframe_max_overlap: float = 0.7
    keyframe_delta_trans: float = 2.0
    keyframe_delta_rot: float = 0.5
    # Sensors
    imu_acc_noise: float = 0.05
    imu_gyro_noise: float = 0.02
    imu_int_noise: float = 0.001
    imu_bias_noise: float = 1e-5
    T_lidar_imu: np.ndarray = None
    # Misc
    validate_imu: bool = True
    save_imu_rate_trajectory: bool = False
    imu_window_capacity: int = 256
    matching_weight: float = 1.0
    bootstrap_frames: int = 5

    @staticmethod
    def from_config(config, sensors_config=None) -> "OdometryEstimationIMUParams":
        p = OdometryEstimationIMUParams()
        g = lambda k, d: config.param("odometry_estimation", k, d)
        p.initialization_mode = g("initialization_mode", "LOOSE")
        p.initialization_window_size = g("initialization_window_size", 1.0)
        p.init_pose_damping_scale = g("init_pose_damping_scale", 1e10)
        p.smoother_lag = g("smoother_lag", 5.0)
        p.fix_imu_bias = g("fix_imu_bias", False)
        p.compute_covs = g("compute_covs", False)
        p.voxel_resolution = g("voxel_resolution", 0.25)
        p.voxel_resolution_max = g("voxel_resolution_max", p.voxel_resolution)
        p.voxel_resolution_dmin = g("voxel_resolution_dmin", 5.0)
        p.voxel_resolution_dmax = g("voxel_resolution_dmax", 20.0)
        p.voxelmap_levels = int(g("voxelmap_levels", 2))
        p.voxelmap_scaling_factor = g("voxelmap_scaling_factor", 2.0)
        p.full_connection_window_size = int(g("full_connection_window_size", 2))
        p.keyframe_update_strategy = g("keyframe_update_strategy", "OVERLAP")
        p.max_num_keyframes = int(g("max_num_keyframes", 15))
        p.keyframe_min_overlap = g("keyframe_min_overlap", 0.01)
        p.keyframe_max_overlap = g("keyframe_max_overlap", 0.7)
        p.keyframe_delta_trans = g("keyframe_delta_trans", 2.0)
        p.keyframe_delta_rot = g("keyframe_delta_rot", 0.5)
        p.validate_imu = g("validate_imu", True)
        p.save_imu_rate_trajectory = g("save_imu_rate_trajectory", False)
        p.imu_window_capacity = int(g("imu_window_capacity", 256))
        if sensors_config is not None:
            s = lambda k, d: sensors_config.param("sensors", k, d)
            p.imu_acc_noise = s("imu_acc_noise", 0.05)
            p.imu_gyro_noise = s("imu_gyro_noise", 0.02)
            p.imu_int_noise = s("imu_int_noise", 0.001)
            p.imu_bias_noise = s("imu_bias_noise", 1e-5)
            p.T_lidar_imu = sensors_config.param_se3("sensors", "T_lidar_imu")
        return p


class OdometryEstimationIMU(OdometryEstimationBase):
    def __init__(self, params: Optional[OdometryEstimationIMUParams] = None):
        self.params = params or OdometryEstimationIMUParams()
        p = self.params
        self.T_lidar_imu = np.eye(4) if p.T_lidar_imu is None else np.asarray(p.T_lidar_imu)
        self.W = p.window_size

        # Multi-resolution keyframe maps (reference: 2-3 levels x scaling
        # factor widen the VGICP convergence basin, gpu.cpp:97-106).
        self.model = tuple(
            vmx.empty_gaussian_voxelmap(max(p.voxel_capacity >> lvl, 8192),
                                        p.voxel_resolution * (p.voxelmap_scaling_factor ** lvl))
            for lvl in range(max(p.voxelmap_levels, 1)))
        self.window: Optional[WindowState] = None   # lazy (needs capacity)
        self._est_frames: List[EstimationFrame] = []

        self.imu_buffer: List[np.ndarray] = []   # rows [t, ax..az, wx..wz]
        self._init_odom = None
        self._init_poses: List = []
        self._pending_status = None
        self.initialized = False
        self.frame_count = 0
        self.last_frame_stamp: Optional[float] = None
        if p.validate_imu:
            from glim_tpu.common.imu_validation import IMUValidation
            self.imu_validation = IMUValidation()
        else:
            self.imu_validation = None

    def requires_imu(self) -> bool:
        return True

    def insert_imu(self, stamp, linear_acc, angular_vel) -> None:
        CB.on_insert_imu(stamp, linear_acc, angular_vel)
        self.imu_buffer.append(np.concatenate([[stamp], linear_acc, angular_vel]))

    # -- main entry --

    def insert_frame(self, frame: PreprocessedFrame,
                     marginalized: Optional[List[EstimationFrame]] = None
                     ) -> Optional[EstimationFrame]:
        CB.on_insert_frame(frame)
        p = self.params

        if not self.initialized:
            if not self._try_initialize(frame):
                return None
            self.last_frame_stamp = frame.stamp
            return self._est_frames[-1]

        imu_args = self._imu_window(self.last_frame_stamp, frame.stamp,
                                    frame.scan_end_time)

        bootstrap = self.frame_count < p.bootstrap_frames
        self.window, self.model, out = window_scan_step(
            self.window, self.model,
            frame.device_points, frame.device_times, frame.device_mask,
            frame.device_neighbors, *imu_args,
            jnp.float32(frame.stamp - self._t0),
            jnp.asarray(self.T_lidar_imu, jnp.float32),
            jnp.asarray(GRAVITY, jnp.float32),
            jnp.float32(p.imu_acc_noise), jnp.float32(p.imu_gyro_noise),
            jnp.float32(p.imu_int_noise),
            # Bias random-walk stiffness: the density-exact 1/sigma^2 walk
            # freezes initialization errors in a short window (the reference
            # amortizes them over a 5 s / ~50-state smoother lag); 1/sqrt(s)
            # keeps the walk tight while letting the window absorb init error.
            jnp.full(6, 1.0 / max(np.sqrt(p.imu_bias_noise), 1e-6), jnp.float32),
            jnp.float32(p.matching_weight), jnp.float32(p.keyframe_max_overlap),
            W=self.W, outer_iters=p.outer_iterations,
            inner_iters=p.inner_iterations, bootstrap=bootstrap)
        CB.on_smoother_update(self)

        # Marginalization bookkeeping: the step evicted the oldest state iff
        # the ring was full before this insert.
        if len(self._est_frames) == self.W:
            marg_est = self._est_frames.pop(0)
            marg_est.device_T_world_lidar = out["marg"]["T_wl"]
            marg_est._T_world_lidar = None
            marg_est._T_world_imu = None
            marg_est.device_v_world_imu = out["marg"]["v"]
            marg_est._v_world_imu = None
            marg_est.device_imu_bias = out["marg"]["b"]
            marg_est._imu_bias = None
            CB.on_marginalized_frames([marg_est])
            if marginalized is not None:
                marginalized.append(marg_est)

        est = EstimationFrame(
            id=self.frame_count, stamp=frame.stamp,
            T_lidar_imu=self.T_lidar_imu.copy(),
            device_T_world_lidar=out["T_wl"],
            device_v_world_imu=out["v"],
            device_imu_bias=out["b"],
            frame_id=FrameID.LIDAR,
            frame=PointBatch(points=out["deskewed"], mask=frame.device_mask,
                             times=frame.device_times, covs=out["covs"],
                             normals=out["normals"]),
            raw_frame=frame)
        if p.save_imu_rate_trajectory:
            stamps_t, quats_t, trans_t = out["pose_table"]
            q_np = np.asarray(quats_t)
            est.imu_rate_trajectory = np.vstack([
                np.asarray(stamps_t)[None, :] + frame.stamp,
                np.asarray(trans_t).T, q_np.T])
        self._est_frames.append(est)
        CB.on_new_frame(est)
        CB.on_update_frames(self._est_frames)
        CB.on_smoother_update_finish(self)

        # Process LAST scan's status (its transfer has landed by now): the
        # corruption flag + IMU-validation inputs lag one scan by design.
        self._process_status()
        self._pending_status = (out["status"], frame.stamp,
                                frame.stamp - self.last_frame_stamp)

        self.frame_count += 1
        self.last_frame_stamp = frame.stamp
        return est

    def get_remaining_frames(self) -> List[EstimationFrame]:
        self._process_status()
        if self.window is not None and self._est_frames:
            # Final pose refresh from the optimized window.
            n = len(self._est_frames)
            T_wl_all = np.asarray(self.window.T, np.float64) @ np.linalg.inv(self.T_lidar_imu)
            v_all = np.asarray(self.window.v, np.float64)
            for i, e in enumerate(self._est_frames):
                k = self.W - n + i
                e.T_world_lidar = T_wl_all[k]
                e.v_world_imu = v_all[k]
        out = self._est_frames
        self._est_frames = []
        return out

    # -- internals --

    def _process_status(self) -> None:
        if self._pending_status is None:
            return
        status, stamp, dt = self._pending_status
        self._pending_status = None
        s = np.asarray(status)
        finite = s[0] > 0.5
        if not finite:
            logger.error("window optimization corrupted at %.3f; IMU-prediction "
                         "fallback engaged", stamp)
            CB.on_smoother_corruption(stamp)
        if self.imu_validation is not None and finite:
            T_pred = np.eye(4)
            T_pred[:] = s[4:20].reshape(4, 4)
            v_pred = s[20:23]
            T_opt = s[23:39].reshape(4, 4)
            v_opt = s[39:42]
            self.imu_validation.validate(T_pred, v_pred, T_opt, v_opt, dt)

    def _imu_window(self, t_prev: float, t_scan: float, t_end: float):
        """Padded IMU arrays covering (t_prev, t_end], stamps relative to
        t_scan (device masks split preintegration vs deskew use)."""
        cap = self.params.imu_window_capacity
        rows = [r for r in self.imu_buffer if t_prev < r[0] <= t_end + 0.02]
        self.imu_buffer = [r for r in self.imu_buffer if r[0] > t_prev - 0.2]
        if len(rows) > cap and not getattr(self, "_warned_imu_trunc", False):
            self._warned_imu_trunc = True
            logger.warning("IMU window truncated: %d samples > capacity %d "
                           "(raise imu_window_capacity for high-rate IMUs; "
                           "warning shown once)", len(rows), cap)
        n = min(len(rows), cap)
        acc = np.zeros((cap, 3), np.float32)
        gyro = np.zeros((cap, 3), np.float32)
        rel = np.zeros(cap, np.float32)
        dts = np.zeros(cap, np.float32)
        mask = np.zeros(cap, bool)
        prev = t_prev
        for i in range(n):
            acc[i] = rows[i][1:4]
            gyro[i] = rows[i][4:7]
            rel[i] = rows[i][0] - t_scan
            dts[i] = max(rows[i][0] - prev, 0.0)
            prev = rows[i][0]
            mask[i] = True
        return (jnp.asarray(acc), jnp.asarray(gyro), jnp.asarray(rel),
                jnp.asarray(dts), jnp.asarray(mask))

    def _try_initialize(self, frame: PreprocessedFrame) -> bool:
        """Initialization hand-off (reference:
        odometry/initial_state_estimation.cpp:12-88 NAIVE,
        odometry/loose_initial_state_estimation.cpp:27-197 LOOSE)."""
        from glim_tpu.odometry.initial_state_estimation import (
            loose_initial_state, naive_initial_state)

        if not self.imu_buffer:
            return False
        p = self.params
        imu = np.stack(self.imu_buffer)
        span = imu[-1, 0] - imu[0, 0]

        init = None
        if p.initialization_mode.upper() == "LOOSE":
            if self._init_odom is None:
                from glim_tpu.odometry.odometry_estimation_cpu import (
                    OdometryEstimationCPU, OdometryEstimationCPUParams)
                self._init_odom = OdometryEstimationCPU(OdometryEstimationCPUParams(
                    registration_type="VGICP",
                    vgicp_resolution=max(p.voxel_resolution * 2, 0.5),
                    voxel_capacity=min(p.voxel_capacity, 65536)))
                self._init_poses = []
            est0 = self._init_odom.insert_frame(frame)
            self._init_poses.append((frame.stamp, est0.T_world_lidar))
            if (self._init_poses[-1][0] - self._init_poses[0][0]
                    < p.initialization_window_size):
                return False
            init = loose_initial_state(self._init_poses, imu, self.T_lidar_imu)
            if init is None:
                logger.warning("LOOSE initialization failed; falling back to NAIVE")

        if init is None:
            if span < min(p.initialization_window_size, 0.3):
                return False
            init = naive_initial_state(imu, frame.stamp, p.fix_imu_bias)

        T0 = init.T_world_imu
        v0 = init.v_world
        b0 = np.zeros(6) if p.fix_imu_bias else init.bias

        C = int(frame.device_points.shape[0])
        self._t0 = frame.stamp
        win = empty_window(self.W, C // OLD_SUBSAMPLE)

        # First frame: no motion reference yet — covariances on the raw scan.
        covs, normals = cov_ops.estimate_covariances(
            frame.device_points, frame.device_mask, frame.device_neighbors, "plane")

        W = self.W
        T0_d = jnp.asarray(T0, jnp.float32)
        self.window = WindowState(
            T=win.T.at[W - 1].set(T0_d),
            v=win.v.at[W - 1].set(jnp.asarray(v0, jnp.float32)),
            b=win.b.at[W - 1].set(jnp.asarray(b0, jnp.float32)),
            stamp=win.stamp.at[W - 1].set(0.0),
            valid=win.valid.at[W - 1].set(True),
            pts=win.pts.at[W - 1].set(frame.device_points[::OLD_SUBSAMPLE]),
            covs=win.covs.at[W - 1].set(covs[::OLD_SUBSAMPLE]),
            mask=win.mask.at[W - 1].set(frame.device_mask[::OLD_SUBSAMPLE]),
            preints=win.preints,
            H_prior=jnp.eye(15) * p.init_pose_damping_scale,
            b_prior=jnp.zeros(15),
            T_anchor=T0_d,
            v_anchor=jnp.asarray(v0, jnp.float32),
            b_anchor=jnp.asarray(b0, jnp.float32),
            H_marg=jnp.zeros((30, 30)), b_marg=jnp.zeros(30),
            step=jnp.int32(0))

        # Seed the keyframe maps with the first frame.
        T_wl = T0_d @ jnp.asarray(np.linalg.inv(self.T_lidar_imu), jnp.float32)
        w_pts = frame.device_points @ T_wl[:3, :3].T + T_wl[:3, 3]
        covs_w = jnp.einsum("ij,cjk,lk->cil", T_wl[:3, :3], covs, T_wl[:3, :3])
        self.model = tuple(
            vmx.voxelmap_insert(vm, w_pts, frame.device_mask, covs_w, jnp.int32(0))
            for vm in self.model)

        est = EstimationFrame(
            id=0, stamp=frame.stamp, T_lidar_imu=self.T_lidar_imu.copy(),
            device_T_world_lidar=T_wl, frame_id=FrameID.LIDAR,
            frame=PointBatch(points=frame.device_points, mask=frame.device_mask,
                             times=frame.device_times, covs=covs, normals=normals),
            raw_frame=frame)
        est.v_world_imu = v0
        est.imu_bias = b0
        self._est_frames.append(est)
        self.initialized = True
        self._init_odom = None
        self.frame_count = 1
        logger.info("initialized (%s): |v|=%.2f bias=%s",
                    p.initialization_mode, np.linalg.norm(v0), b0.round(4))
        return True


@register_module("odometry", "odometry_estimation_gpu")
def create_odometry_estimation_gpu_module(config=None, sensors_config=None):
    params = (OdometryEstimationIMUParams.from_config(config, sensors_config)
              if config is not None else OdometryEstimationIMUParams())
    return OdometryEstimationIMU(params)
