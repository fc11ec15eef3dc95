"""Tightly-coupled LiDAR-IMU odometry (the flagship estimator).

Equivalent capability to the reference's ``OdometryEstimationIMU`` /
``OdometryEstimationGPU`` (reference:
src/glim/odometry/odometry_estimation_imu.cpp:35-457,
odometry/odometry_estimation_gpu.cpp:76-412, params from
config/config_odometry_gpu.json): per-scan IMU preintegration + NavState
prediction, IMU-rate deskewing, VGICP matching against a keyframe voxel map,
joint optimization of pose/velocity/bias over a sliding window with
marginalization priors (the fixed-lag smoother replacement — see
window_estimator.py), keyframe management by map overlap, and adaptive voxel
resolution from the median point distance (:89-93).

Registered as ``odometry_estimation_gpu`` — the reference's "gpu" module is
its VGICP-accelerated configuration, which is exactly what the TPU runs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from glim_tpu.odometry.callbacks import OdometryEstimationCallbacks as CB
from glim_tpu.odometry.estimation_base import OdometryEstimationBase
from glim_tpu.odometry.window_estimator import (WindowState, empty_window,
                                                window_marginalize,
                                                window_optimize)
from glim_tpu.ops import covariance as cov_ops
from glim_tpu.ops import deskew as deskew_ops
from glim_tpu.ops import imu as imu_ops
from glim_tpu.ops import lie, lie_np, pointops
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
    outer_iterations: int = 3
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

        self.window = empty_window(self.W)
        # Multi-resolution keyframe maps (reference: 2-3 levels x scaling
        # factor widen the VGICP convergence basin, gpu.cpp:97-106).
        self.model = tuple(
            vmx.empty_gaussian_voxelmap(max(p.voxel_capacity >> lvl, 8192),
                                        p.voxel_resolution * (p.voxelmap_scaling_factor ** lvl))
            for lvl in range(max(p.voxelmap_levels, 1)))
        self._frame_slots: List[dict] = []   # device arrays per window slot
        self._preints: List = []             # PreintegratedImu between slots
        self._est_frames: List[EstimationFrame] = []

        self.imu_buffer: List[np.ndarray] = []   # rows [t, ax..az, wx..wz]
        self._init_odom = None
        self._init_poses: List = []
        self._last_init_frame = None
        self.initialized = False
        self.frame_count = 0
        self.last_frame_stamp: Optional[float] = None
        self._rng = jax.random.PRNGKey(3)
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

        pre = self._preintegrate(self.last_frame_stamp, frame.stamp)

        # Predict the new state from the last one.
        k_last = self._num_states() - 1
        T_last = np.asarray(self.window.T[k_last], np.float64)
        v_last = np.asarray(self.window.v[k_last], np.float64)
        b_last = np.asarray(self.window.b[k_last], np.float64)
        R_j, p_j, v_j = imu_ops.predict(
            jnp.asarray(T_last[:3, :3], jnp.float32), jnp.asarray(T_last[:3, 3], jnp.float32),
            jnp.asarray(v_last, jnp.float32), pre, jnp.asarray(b_last, jnp.float32),
            jnp.asarray(GRAVITY, jnp.float32))
        T_pred = jnp.eye(4).at[:3, :3].set(R_j).at[:3, 3].set(p_j)

        # Deskew with IMU-rate poses over the scan interval.
        deskewed, covs, normals = self._prepare_scan(frame, T_last, v_last, b_last)

        # Push the new state + frame into the window.
        self._push_state(frame, T_pred, v_j, pre, deskewed, covs)

        # Optimize the window.
        W = self.W
        pre_stack = self._stack_preints()
        f_pts, f_covs, f_mask = self._stack_frames()
        self.window, H, err = window_optimize(
            self.window, pre_stack, f_pts, f_covs, f_mask, self.model,
            jnp.asarray(self.T_lidar_imu, jnp.float32),
            jnp.asarray(GRAVITY, jnp.float32),
            jnp.full(6, 1.0 / max(p.imu_bias_noise, 1e-8), jnp.float32),
            jnp.float32(p.matching_weight),
            W=W, outer_iters=p.outer_iterations, inner_iters=p.inner_iterations)
        CB.on_smoother_update(self)

        k_new = self._num_states() - 1
        # Corruption detection + recovery (the reference's smoother-fallback
        # path, odometry_estimation_imu.cpp:375,412-419): if the window solve
        # produced non-finite states, discard the update, fall back to the
        # IMU prediction and reset the prior.
        if not bool(jnp.all(jnp.isfinite(self.window.T[k_new]))):
            logger.error("window optimization corrupted at %.3f; falling back "
                         "to IMU prediction", frame.stamp)
            CB.on_smoother_corruption(frame.stamp)
            self.window = WindowState(
                T=self.window.T.at[k_new].set(T_pred),
                v=self.window.v.at[k_new].set(v_j),
                b=self.window.b.at[k_new].set(self.window.b[max(k_new - 1, 0)]),
                stamp=self.window.stamp, valid=self.window.valid,
                H_prior=jnp.eye(15) * 1e4, b_prior=jnp.zeros(15),
                T_anchor=self.window.T[0], v_anchor=self.window.v[0],
                b_anchor=self.window.b[0])
            H = jnp.eye(self.W * 15)
        if self.imu_validation is not None:
            dt_f = frame.stamp - float(self.window.stamp[k_new - 1]) if k_new > 0 else 0.0
            self.imu_validation.validate(
                np.asarray(T_pred, np.float64), np.asarray(v_j, np.float64),
                np.asarray(self.window.T[k_new], np.float64),
                np.asarray(self.window.v[k_new], np.float64), dt_f)
        est = self._make_estimation_frame(frame, k_new, deskewed, covs, normals)
        self._est_frames.append(est)
        CB.on_new_frame(est)

        # Keyframe / model update.
        self._update_model(k_new, deskewed, covs)

        # Marginalize when the window overflows.
        if self._num_states() > self.W - 1 and len(self._frame_slots) == self.W:
            marg_est = self._est_frames.pop(0)
            # Refresh the marginalized frame's pose from the optimized window.
            self._sync_frame_pose(marg_est, 0)
            self.window = window_marginalize(self.window, H, W=self.W)
            self._frame_slots.pop(0)
            self._preints.pop(0)
            CB.on_marginalized_frames([marg_est])
            if marginalized is not None:
                marginalized.append(marg_est)

        # Refresh in-window published poses.
        for off, e in enumerate(self._est_frames):
            self._sync_frame_pose(e, off)
        CB.on_update_frames(self._est_frames)
        CB.on_smoother_update_finish(self)

        self.frame_count += 1
        self.last_frame_stamp = frame.stamp
        return est

    def get_remaining_frames(self) -> List[EstimationFrame]:
        for off, e in enumerate(self._est_frames):
            self._sync_frame_pose(e, off)
        out = self._est_frames
        self._est_frames = []
        return out

    # -- internals --

    def _num_states(self) -> int:
        return len(self._frame_slots)

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
            # LiDAR-only odometry over the init window.
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
            self._last_init_frame = (frame, est0)
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

        self.window = WindowState(
            T=self.window.T.at[0].set(jnp.asarray(T0, jnp.float32)),
            v=self.window.v.at[0].set(jnp.asarray(v0, jnp.float32)),
            b=self.window.b.at[0].set(jnp.asarray(b0, jnp.float32)),
            stamp=self.window.stamp.at[0].set(frame.stamp),
            valid=self.window.valid.at[0].set(True),
            H_prior=jnp.eye(15) * self.params.init_pose_damping_scale,
            b_prior=jnp.zeros(15),
            T_anchor=jnp.asarray(T0, jnp.float32),
            v_anchor=jnp.asarray(v0, jnp.float32),
            b_anchor=jnp.asarray(b0, jnp.float32))

        deskewed, covs, normals = self._prepare_scan(frame, T0, v0, b0)
        self._frame_slots.append(dict(pts=deskewed, covs=covs, mask=frame.device_mask,
                                      stamp=frame.stamp))
        self._update_model(0, deskewed, covs)
        est = self._make_estimation_frame(frame, 0, deskewed, covs, normals)
        self._est_frames.append(est)
        self.initialized = True
        self._init_odom = None
        self.last_frame_stamp = frame.stamp
        self.frame_count = 1
        logger.info("initialized (%s): |v|=%.2f bias=%s",
                    p.initialization_mode, np.linalg.norm(v0), b0.round(4))
        return True

    def _imu_slice(self, t0: float, t1: float):
        """Padded (cap, 7) IMU samples covering (t0, t1]."""
        cap = self.params.imu_window_capacity
        rows = [r for r in self.imu_buffer if t0 < r[0] <= t1 + 1e-9]
        # Drop consumed history (keep a small margin for the next deskew).
        self.imu_buffer = [r for r in self.imu_buffer if r[0] > t0 - 0.2]
        n = min(len(rows), cap)
        out = np.zeros((cap, 7), np.float32)
        dts = np.zeros(cap, np.float32)
        prev = t0
        for i, r in enumerate(rows[:n]):
            out[i] = r
            dts[i] = max(r[0] - prev, 0.0)
            prev = r[0]
        mask = np.zeros(cap, bool)
        mask[:n] = True
        return (jnp.asarray(out[:, 1:4]), jnp.asarray(out[:, 4:7]),
                jnp.asarray(dts), jnp.asarray(mask), rows[:n])

    def _preintegrate(self, t0: float, t1: float):
        p = self.params
        acc, gyro, dts, mask, _ = self._imu_slice(t0, t1)
        k_last = self._num_states() - 1
        bias = self.window.b[k_last]
        return imu_ops.preintegrate(acc, gyro, dts, mask, bias,
                                    jnp.float32(p.imu_acc_noise),
                                    jnp.float32(p.imu_gyro_noise),
                                    jnp.float32(p.imu_int_noise))

    def _prepare_scan(self, frame: PreprocessedFrame, T_last, v_last, b_last):
        """IMU-rate deskew + covariance estimation."""
        t0 = frame.stamp
        t1 = frame.scan_end_time
        cap = self.params.imu_window_capacity
        rows = [r for r in self.imu_buffer if t0 - 0.05 < r[0] <= t1 + 0.05]
        if len(rows) >= 2:
            imu = np.stack(rows)[:cap]
            dts = np.diff(imu[:, 0], prepend=imu[0, 0])
            Rs, ps, vs = imu_ops.integrate_poses(
                jnp.asarray(np.asarray(T_last)[:3, :3], jnp.float32),
                jnp.asarray(np.asarray(T_last)[:3, 3], jnp.float32),
                jnp.asarray(v_last, jnp.float32), jnp.asarray(b_last, jnp.float32),
                jnp.asarray(GRAVITY, jnp.float32),
                jnp.asarray(imu[:, 1:4], jnp.float32), jnp.asarray(imu[:, 4:7], jnp.float32),
                jnp.asarray(dts, jnp.float32), jnp.ones(len(imu), bool))
            stamps, quats, trans = deskew_ops.imu_pose_table(
                jnp.asarray(imu[:, 0] - t0, jnp.float32), Rs, ps)
            deskewed = deskew_ops.deskew_imu(
                frame.device_points, frame.device_times, frame.device_mask,
                stamps, quats, trans, jnp.asarray(self.T_lidar_imu, jnp.float32))
            if self.params.save_imu_rate_trajectory:
                # IMU-rate trajectory rows: t x y z qx qy qz qw (reference
                # estimation_frame.hpp imu_rate_trajectory, 8xN).
                q_np = np.asarray(quats)
                p_np = np.asarray(trans)
                self._last_imu_rate_traj = np.vstack([
                    imu[:, 0][None, :], p_np.T, q_np.T])
        else:
            deskewed = frame.device_points
            self._last_imu_rate_traj = None
        covs, normals = cov_ops.estimate_covariances(
            deskewed, frame.device_mask, frame.device_neighbors, "plane")
        return deskewed, covs, normals

    def _push_state(self, frame, T_pred, v_pred, pre, deskewed, covs):
        k = self._num_states()
        if k >= self.W:
            raise RuntimeError("window overflow — marginalization out of sync")
        self.window = WindowState(
            T=self.window.T.at[k].set(T_pred),
            v=self.window.v.at[k].set(v_pred),
            b=self.window.b.at[k].set(self.window.b[k - 1]),
            stamp=self.window.stamp.at[k].set(frame.stamp),
            valid=self.window.valid.at[k].set(True),
            H_prior=self.window.H_prior, b_prior=self.window.b_prior,
            T_anchor=self.window.T_anchor, v_anchor=self.window.v_anchor,
            b_anchor=self.window.b_anchor)
        self._frame_slots.append(dict(pts=deskewed, covs=covs, mask=frame.device_mask,
                                      stamp=frame.stamp))
        self._preints.append(pre)

    def _stack_preints(self):
        import jax.tree_util as jtu
        pres = list(self._preints)
        while len(pres) < self.W - 1:
            pres.append(jtu.tree_map(jnp.zeros_like, pres[-1]) if pres else None)
        if pres and pres[0] is None:
            raise RuntimeError("no preintegrations available")
        return jtu.tree_map(lambda *xs: jnp.stack(xs), *pres)

    def _stack_frames(self):
        pts = jnp.stack([s["pts"] for s in self._pad_slots()])
        covs = jnp.stack([s["covs"] for s in self._pad_slots()])
        mask = jnp.stack([s["mask"] for s in self._pad_slots()])
        return pts, covs, mask

    def _pad_slots(self):
        slots = list(self._frame_slots)
        while len(slots) < self.W:
            s0 = slots[-1]
            slots.append(dict(pts=s0["pts"], covs=s0["covs"],
                              mask=jnp.zeros_like(s0["mask"]), stamp=0.0))
        return slots

    def _update_model(self, k: int, deskewed, covs):
        p = self.params
        T_wi = self.window.T[k]
        T_wl = T_wi @ jnp.asarray(np.linalg.inv(self.T_lidar_imu), jnp.float32)
        mask = self._frame_slots[k]["mask"] if k < len(self._frame_slots) else None
        if mask is None:
            return
        ov = float(vmx.voxelmap_overlap(self.model[0], deskewed, mask, T_wl))
        if self.frame_count > 0 and ov > p.keyframe_max_overlap:
            return
        w_pts = deskewed @ T_wl[:3, :3].T + T_wl[:3, 3]
        R = T_wl[:3, :3]
        covs_w = jnp.einsum("ij,cjk,lk->cil", R, covs, R)
        self.model = tuple(
            vmx.voxelmap_insert(vm, w_pts, mask, covs_w, jnp.int32(self.frame_count))
            for vm in self.model)
        CB.on_update_keyframes(self._est_frames[-1:])

    def _sync_frame_pose(self, est: EstimationFrame, k: int) -> None:
        T_wi = np.asarray(self.window.T[k], np.float64)
        est.T_world_imu = T_wi
        est.T_world_lidar = T_wi @ np.linalg.inv(self.T_lidar_imu)
        est.v_world_imu = np.asarray(self.window.v[k], np.float64)
        est.imu_bias = np.asarray(self.window.b[k], np.float64)

    def _make_estimation_frame(self, frame, k, deskewed, covs, normals) -> EstimationFrame:
        est = EstimationFrame(
            id=self.frame_count, stamp=frame.stamp,
            T_lidar_imu=self.T_lidar_imu.copy(),
            frame_id=FrameID.LIDAR,
            frame=PointBatch(points=deskewed, mask=frame.device_mask,
                             times=frame.device_times, covs=covs, normals=normals),
            raw_frame=frame,
            imu_rate_trajectory=getattr(self, "_last_imu_rate_traj", None))
        self._sync_frame_pose(est, k)
        return est


@register_module("odometry", "odometry_estimation_gpu")
def create_odometry_estimation_gpu_module(config=None, sensors_config=None):
    params = (OdometryEstimationIMUParams.from_config(config, sensors_config)
              if config is not None else OdometryEstimationIMUParams())
    return OdometryEstimationIMU(params)
