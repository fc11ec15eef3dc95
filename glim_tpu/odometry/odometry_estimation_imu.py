"""Tightly-coupled LiDAR-IMU odometry (the flagship estimator).

Equivalent capability to the reference's ``OdometryEstimationIMU`` /
``OdometryEstimationGPU`` (reference:
src/glim/odometry/odometry_estimation_imu.cpp:35-457,
odometry/odometry_estimation_gpu.cpp:76-412, params from
config/config_odometry_gpu.json): per-scan IMU preintegration + NavState
prediction, IMU-rate deskewing, multi-resolution VGICP matching against a
keyframe voxel map, joint optimization of pose/velocity/bias over a
``smoother_lag``-sized sliding window with marginalization priors (the
fixed-lag smoother replacement, odometry_estimation_imu.cpp:343-355),
keyframe management with the reference's OVERLAP / DISPLACEMENT / ENTROPY
strategies (odometry_estimation_gpu.cpp:208-412), and on-request marginal
covariances (odometry_estimation_imu.cpp:399-428).

The ENTIRE per-scan pipeline is one fused jitted program
(window_estimator.window_scan_step); the host builds the padded IMU window,
dispatches, and never blocks — status (corruption, IMU validation and
keyframe-strategy inputs) returns through a small packed vector fetched one
scan late when its transfer has already landed. Keyframe insertions /
evictions are decided from that lagged status and dispatched as separate
device programs off the per-scan path (keyframe_manager.py).

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
from glim_tpu.odometry.keyframe_manager import KeyframeManager
from glim_tpu.odometry.window_estimator import (
    OLD_SUBSAMPLE, STATUS_DROT, STATUS_DTRANS, STATUS_ERR, STATUS_FINITE,
    STATUS_LOGDET, STATUS_OVERLAP, STATUS_POSES, WindowState, empty_window,
    window_scan_step)
from glim_tpu.ops import covariance as cov_ops
from glim_tpu.ops import voxelmap as vmx
from glim_tpu.types import EstimationFrame, FrameID, PointBatch, PreprocessedFrame
from glim_tpu.utils.logging import create_module_logger
from glim_tpu.utils.registry import register_module

logger = create_module_logger("odom")

GRAVITY = np.array([0.0, 0.0, -9.80665])


@jax.jit
def _adaptive_base_resolution(points, mask, res_min, res_max, dmin, dmax):
    """Traced adaptive base resolution from a frame's median point distance
    (reference odometry_estimation_gpu.cpp:89-93): linear ramp res_min →
    res_max over median distance dmin → dmax. All-scalar device program —
    dispatched per KEYFRAME insert, never fetched to host."""
    from glim_tpu.ops.pointops import median_distance
    med = median_distance(points, mask)
    t = jnp.clip((med - dmin) / jnp.maximum(dmax - dmin, 1e-6), 0.0, 1.0)
    return res_min + t * (res_max - res_min)

# Window capacity buckets (compile cache classes). smoother_lag at the
# nominal 10 Hz scan rate picks the smallest bucket >= lag * 10, so the
# default 5 s lag runs a 48-state window (reference: ~50 states,
# odometry_estimation_imu.cpp:343-355); eviction inside the bucket is
# time-based, so slower scan rates still honor the lag exactly.
WINDOW_BUCKETS = (8, 12, 16, 24, 32, 48)
NOMINAL_SCAN_HZ = 10.0


def _window_bucket(smoother_lag: float) -> int:
    want = int(np.ceil(smoother_lag * NOMINAL_SCAN_HZ))
    for b in WINDOW_BUCKETS:
        if b >= want:
            return b
    return WINDOW_BUCKETS[-1]


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
    window_size: Optional[int] = None       # None -> bucket from smoother_lag
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
    keyframe_entropy_thresh: float = 0.99
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
        ws = g("window_size", 0)
        p.window_size = int(ws) if ws else None
        p.outer_iterations = int(g("outer_iterations", 2))
        p.inner_iterations = int(g("inner_iterations", 2))
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
        p.keyframe_entropy_thresh = g("keyframe_entropy_thresh", 0.99)
        p.validate_imu = g("validate_imu", True)
        p.save_imu_rate_trajectory = g("save_imu_rate_trajectory", False)
        p.imu_window_capacity = int(g("imu_window_capacity", 256))
        p.matching_weight = g("matching_weight", 1.0)
        p.bootstrap_frames = int(g("bootstrap_frames", 5))
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
        self.W = p.window_size or _window_bucket(p.smoother_lag)

        # Multi-resolution keyframe maps (reference: 2-3 levels x scaling
        # factor widen the VGICP convergence basin, gpu.cpp:97-106).
        self._model_caps = [max(p.voxel_capacity >> lvl, 8192)
                            for lvl in range(max(p.voxelmap_levels, 1))]
        self._model_res = [p.voxel_resolution * (p.voxelmap_scaling_factor ** lvl)
                           for lvl in range(max(p.voxelmap_levels, 1))]
        self.model = self._make_model()
        self._matching = "vgicp"            # window_scan_step matching mode
        self._max_corr_dist = 2.0           # used by the "gicp" mode only
        self.keyframes: Optional[KeyframeManager] = None  # lazy (needs C)
        self.window: Optional[WindowState] = None          # lazy (needs C)
        self._est_frames: List[EstimationFrame] = []

        # Constant step arguments, uploaded ONCE and reused every scan: on
        # remoted chips every host->device transfer costs ~2 ms of tunnel
        # latency, so per-scan jnp.float32(...) re-uploads of constants are
        # a real throughput tax (~15-20 ms/scan at 10 small args).
        self._d_T_lidar_imu = jnp.asarray(self.T_lidar_imu, jnp.float32)
        self._d_gravity = jnp.asarray(GRAVITY, jnp.float32)
        self._d_acc_noise = jnp.float32(p.imu_acc_noise)
        self._d_gyro_noise = jnp.float32(p.imu_gyro_noise)
        self._d_int_noise = jnp.float32(p.imu_int_noise)
        # Bias random-walk stiffness: 1/sqrt(sigma) rather than the
        # density-exact 1/sigma^2 — the window absorbs initialization
        # error instead of freezing it (validated in the window study).
        self._d_bias_rw_info = jnp.full(
            6, 1.0 / max(np.sqrt(p.imu_bias_noise), 1e-6), jnp.float32)
        self._d_matching_weight = jnp.float32(p.matching_weight)
        self._d_max_corr_dist = jnp.float32(self._max_corr_dist)
        # Optional velocity regulation (glim_ext velocity_suppressor role):
        # device (2,) [weight, v_max] or None (absent from the program).
        self._d_vel_reg = None

        self.imu_buffer: List[np.ndarray] = []   # rows [t, ax..az, wx..wz]
        self._init_odom = None
        self._init_poses: List = []
        # Status entries (status_array, stamp, dt, frame) decoded LAZILY,
        # `_status_lag` scans late: the packed status D2H copy of scan N
        # rides the tunnel while scans N+1..N+lag dispatch, so by decode
        # time it has landed and np.asarray() never blocks. lag=1 was
        # measured to still block ~20 ms/scan at max feed rate (the copy
        # completes ~one roundtrip after the step finishes); lag=2 makes
        # the decode free and costs only one extra scan of keyframe-
        # decision latency.
        self._pending: List[tuple] = []
        self._status_lag = 2
        self._last_state_covs = None
        self._covs_requested = bool(p.compute_covs)
        self.initialized = False
        self.frame_count = 0
        self.last_frame_stamp: Optional[float] = None
        if p.validate_imu:
            from glim_tpu.common.imu_validation import IMUValidation
            self.imu_validation = IMUValidation()
        else:
            self.imu_validation = None
        CB.request_to_compute_covariances.add(self._on_request_covs)

    # -- model hooks (overridden by the cpu-parity frame-to-model variant) --

    def _make_model(self):
        return tuple(vmx.empty_gaussian_voxelmap(c, r)
                     for c, r in zip(self._model_caps, self._model_res))

    def _last_kf_pose_dev(self):
        return self.keyframes.last_kf_T_wi

    def _init_model(self, frame, covs, T_wl_dev, T_wi_dev, T0_host) -> None:
        """First-frame model seeding: first keyframe = first frame
        (reference seeds `keyframes` with the first estimation frame)."""
        p = self.params
        # Adaptive voxel resolution from the median point distance
        # (reference odometry_estimation_gpu.cpp:89-93). The INITIAL scale
        # comes from the first frame (a one-off host fetch before the hot
        # loop starts); afterwards every keyframe insert re-derives the
        # traced rebuild resolution from its own geometry in
        # _maybe_update_model, so the accumulated model re-scales across
        # indoor→outdoor transitions at the next rebuild.
        if p.voxel_resolution_max > p.voxel_resolution and \
                getattr(self, "_adaptive_resolution", True):
            from glim_tpu.ops.pointops import median_distance
            med = float(median_distance(frame.device_points,
                                        frame.device_mask))
            t = float(np.clip((med - p.voxel_resolution_dmin)
                              / max(p.voxel_resolution_dmax
                                    - p.voxel_resolution_dmin, 1e-6),
                              0.0, 1.0))
            base = p.voxel_resolution + t * (p.voxel_resolution_max
                                             - p.voxel_resolution)
            if abs(base - self._model_res[0]) > 1e-6:
                self._model_res = [base * (p.voxelmap_scaling_factor ** lvl)
                                   for lvl in range(max(p.voxelmap_levels, 1))]
                self.model = self._make_model()
                logger.info("adaptive voxel resolution: median dist %.2f m "
                            "-> base resolution %.3f m", med, base)
        self.keyframes = KeyframeManager(
            strategy=p.keyframe_update_strategy,
            max_num_keyframes=p.max_num_keyframes,
            min_overlap=p.keyframe_min_overlap,
            max_overlap=p.keyframe_max_overlap,
            delta_trans=p.keyframe_delta_trans,
            delta_rot=p.keyframe_delta_rot,
            entropy_thresh=p.keyframe_entropy_thresh,
            C=int(frame.device_points.shape[0]),
            model_capacities=self._model_caps,
            model_resolutions=self._model_res)
        self.keyframes.marginalized_callback = CB.on_marginalized_keyframes
        self.model = self.keyframes.insert(
            frame.device_points, covs, frame.device_mask, T_wl_dev, T_wi_dev,
            T0_host, self.model, 0)

    def _maybe_update_model(self, prev: EstimationFrame, s: np.ndarray) -> None:
        """Keyframe-strategy decision for the previous frame (its status has
        landed), then map insert/evict via the manager."""
        kfm = self.keyframes
        p = self.params
        force = prev.id < self.params.bootstrap_frames
        if force or kfm.should_insert(float(s[STATUS_OVERLAP]),
                                      float(s[STATUS_DTRANS]),
                                      float(s[STATUS_DROT]),
                                      float(s[STATUS_LOGDET])):
            # Per-keyframe adaptive resolution (reference re-derives the
            # voxel scale from each frame's median distance,
            # odometry_estimation_gpu.cpp:89-93): update the manager's
            # traced rebuild resolutions from THIS keyframe's geometry.
            # Takes effect at the next eviction-triggered model rebuild —
            # in steady state (store at capacity) that is every insert —
            # so indoor→outdoor transitions re-scale the whole model map
            # without a host sync or a recompile.
            if p.voxel_resolution_max > p.voxel_resolution and \
                    getattr(self, "_adaptive_resolution", True) and \
                    getattr(self, "_adaptive_per_keyframe", True):
                base = _adaptive_base_resolution(
                    prev.frame.points, prev.frame.mask,
                    jnp.float32(p.voxel_resolution),
                    jnp.float32(p.voxel_resolution_max),
                    jnp.float32(p.voxel_resolution_dmin),
                    jnp.float32(p.voxel_resolution_dmax))
                kfm.set_model_resolutions(
                    [base * (p.voxelmap_scaling_factor ** lvl)
                     for lvl in range(max(p.voxelmap_levels, 1))])
            T_opt = s[STATUS_POSES + 19:STATUS_POSES + 35].reshape(4, 4)
            self.model = kfm.insert(
                prev.frame.points, prev.frame.covs, prev.frame.mask,
                prev.device_T_world_lidar,
                prev.custom_data["device_T_world_imu"],
                T_opt, self.model, prev.id)
            CB.on_update_keyframes(list(np.where(kfm.h_order >= 0)[0]))

    def _on_request_covs(self, *args) -> None:
        """Service slot: switch to the covariance-producing program variant
        (reference: request_to_compute_covariances -> marginal covariances,
        odometry/callbacks.hpp:144, odometry_estimation_imu.cpp:399-428)."""
        self._covs_requested = True

    def requires_imu(self) -> bool:
        return True

    def insert_imu(self, stamp, linear_acc, angular_vel) -> None:
        CB.on_insert_imu(stamp, linear_acc, angular_vel)
        self.imu_buffer.append(np.concatenate([[stamp], linear_acc, angular_vel]))

    def set_velocity_regulation(self, weight: float,
                                max_velocity: float) -> None:
        """Enable (weight > 0) or disable the velocity-regulation term in
        the fused window step (glim_ext velocity_suppressor role): a
        quadratic pull of the newest state's velocity back into the
        |v| <= max_velocity ball. Takes effect from the next scan; the
        weight/limit are traced device values (changing them never
        recompiles)."""
        self._d_vel_reg = None if weight <= 0 else \
            jnp.asarray([weight, max_velocity], jnp.float32)

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

        # Keyframe decisions for frames whose status has landed (lag scans
        # back); must run BEFORE this scan's dispatch so the map includes
        # them.
        self._process_status()

        # Host-side eviction decision (mirrors the device ring exactly).
        evict = len(self._est_frames) >= 2 and (
            len(self._est_frames) == self.W
            or self._est_frames[0].stamp < frame.stamp - p.smoother_lag)

        imu_packed = self._imu_packed(self.last_frame_stamp, frame.stamp,
                                      frame.scan_end_time,
                                      frame.stamp - self._t0, evict)

        self.window, out = window_scan_step(
            self.window, self.model,
            frame.device_points, frame.device_times, frame.device_mask,
            frame.device_neighbors, imu_packed,
            self._d_T_lidar_imu, self._d_gravity,
            self._d_acc_noise, self._d_gyro_noise, self._d_int_noise,
            self._d_bias_rw_info, self._d_matching_weight,
            self._last_kf_pose_dev(), self._d_max_corr_dist,
            vel_reg=self._d_vel_reg,
            W=self.W, outer_iters=p.outer_iterations,
            inner_iters=p.inner_iterations,
            compute_covs=self._covs_requested, matching=self._matching,
            full_connection=p.full_connection_window_size)
        CB.on_smoother_update(self)

        # Marginalization bookkeeping: mirrors the device-side eviction.
        if evict:
            marg_est = self._est_frames.pop(0)
            marg_est.device_T_world_lidar = out["marg"]["T_wl"]
            marg_est._T_world_lidar = None
            marg_est._T_world_imu = None
            marg_est.device_v_world_imu = out["marg"]["v"]
            marg_est._v_world_imu = None
            marg_est.device_imu_bias = out["marg"]["b"]
            marg_est._imu_bias = None
            if self._last_state_covs is not None:
                # The evicted frame sat at slot W - n_prev (pre-roll).
                slot = self.W - (len(self._est_frames) + 1)
                self._attach_covs(marg_est, self._last_state_covs[slot])
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
        est.custom_data["device_T_world_imu"] = out["T_wi"]
        if "state_covs" in out:
            self._last_state_covs = out["state_covs"]
            self._attach_covs(est, out["state_covs"][self.W - 1])
        if p.save_imu_rate_trajectory:
            # Device-resident packed table; materialized lazily (dump time)
            # instead of three blocking per-scan fetches in the hot loop.
            stamps_t, quats_t, trans_t = out["pose_table"]
            packed = jnp.concatenate(
                [stamps_t[None, :], trans_t.T, quats_t.T], axis=0)
            est.device_imu_rate_trajectory = (
                packed, int(stamps_t.shape[0]), frame.stamp)
        self._est_frames.append(est)
        CB.on_new_frame(est)
        CB.on_update_frames(self._est_frames)
        CB.on_smoother_update_finish(self)

        # Stash this scan's status; it is decoded `_status_lag` scans later.
        # Start the device->host copy NOW so the decode never pays the
        # tunnel roundtrip (~30 ms on remoted chips).
        status = out["status"]
        try:
            status.copy_to_host_async()
        except AttributeError:
            pass
        self._pending.append((status, frame.stamp,
                              frame.stamp - self.last_frame_stamp, est))

        self.frame_count += 1
        self.last_frame_stamp = frame.stamp
        return est

    def get_remaining_frames(self) -> List[EstimationFrame]:
        self._process_status(drain=True)
        if self.window is not None and self._est_frames:
            # Final pose refresh from the optimized window.
            n = len(self._est_frames)
            T_wl_all = np.asarray(self.window.T, np.float64) @ np.linalg.inv(self.T_lidar_imu)
            v_all = np.asarray(self.window.v, np.float64)
            # Bias too: leaving it device-only makes every drained frame pay
            # an individual blocking fetch downstream (sub-mapping reads
            # imu_bias per frame; measured ~40 ms each on the tunneled chip).
            b_all = np.asarray(self.window.b, np.float64)
            for i, e in enumerate(self._est_frames):
                k = self.W - n + i
                e.T_world_lidar = T_wl_all[k]
                e.v_world_imu = v_all[k]
                e.imu_bias = b_all[k]
        out = self._est_frames
        self._est_frames = []
        return out

    # -- internals --

    @staticmethod
    def _attach_covs(est: EstimationFrame, cov15) -> None:
        est.cov_pose = cov15[:6, :6]        # device-backed, fetched lazily
        est.cov_velocity = cov15[6:9, 6:9]
        est.cov_bias = cov15[9:15, 9:15]

    def _process_status(self, drain: bool = False) -> None:
        """Decode landed statuses (``_status_lag`` scans back): corruption
        check, IMU validation, and the keyframe-strategy decision for each
        decoded frame."""
        while self._pending and (drain
                                 or len(self._pending) >= self._status_lag):
            self._decode_status(*self._pending.pop(0))

    def _decode_status(self, status, stamp, dt,
                       prev: Optional[EstimationFrame]) -> None:
        s = np.asarray(status)
        finite = s[STATUS_FINITE] > 0.5
        if not finite:
            logger.error("window optimization corrupted at %.3f; IMU-prediction "
                         "fallback engaged", stamp)
            CB.on_smoother_corruption(stamp)
        if finite:
            # The optimized pose/velocity ride along in the lagged status
            # vector — fill the frame's host caches so downstream consumers
            # (trajectory bookkeeping, viewers) never pay a blocking device
            # fetch that would serialize behind the odometry program queue.
            T_opt = np.asarray(
                s[STATUS_POSES + 19:STATUS_POSES + 35], np.float64).reshape(4, 4)
            v_opt = np.asarray(s[STATUS_POSES + 35:STATUS_POSES + 38], np.float64)
            if prev is not None:
                if prev._T_world_imu is None:
                    prev._T_world_imu = T_opt
                if prev._T_world_lidar is None:
                    prev._T_world_lidar = T_opt @ np.linalg.inv(prev.T_lidar_imu)
                if prev._v_world_imu is None:
                    prev._v_world_imu = v_opt
        if self.imu_validation is not None and finite:
            T_pred = s[STATUS_POSES:STATUS_POSES + 16].reshape(4, 4)
            v_pred = s[STATUS_POSES + 16:STATUS_POSES + 19]
            T_opt32 = s[STATUS_POSES + 19:STATUS_POSES + 35].reshape(4, 4)
            v_opt32 = s[STATUS_POSES + 35:STATUS_POSES + 38]
            self.imu_validation.validate(T_pred, v_pred, T_opt32, v_opt32, dt)

        if prev is None or not finite:
            return
        self._maybe_update_model(prev, s)

    def _imu_packed(self, t_prev: float, t_scan: float, t_end: float,
                    scan_stamp_rel: float, evict: bool) -> jnp.ndarray:
        """ONE packed per-scan upload (cap+1, 8): IMU rows [acc, gyro,
        stamp_rel, dt] covering (t_prev, t_end] with stamps relative to
        t_scan, plus a metadata row [n, scan_stamp, evict, 0...] — a single
        host->device transfer instead of seven (each costs ~2 ms of tunnel
        latency on remoted chips)."""
        cap = self.params.imu_window_capacity
        rows = [r for r in self.imu_buffer if t_prev < r[0] <= t_end + 0.02]
        self.imu_buffer = [r for r in self.imu_buffer if r[0] > t_prev - 0.2]
        if len(rows) > cap and not getattr(self, "_warned_imu_trunc", False):
            self._warned_imu_trunc = True
            logger.warning("IMU window truncated: %d samples > capacity %d "
                           "(raise imu_window_capacity for high-rate IMUs; "
                           "warning shown once)", len(rows), cap)
        n = min(len(rows), cap)
        packed = np.zeros((cap + 1, 8), np.float32)
        if n:
            arr = np.stack(rows[:n])                     # (n, 7) [t, acc, gyro]
            packed[:n, 0:3] = arr[:, 1:4]
            packed[:n, 3:6] = arr[:, 4:7]
            packed[:n, 6] = arr[:, 0] - t_scan
            packed[:n, 7] = np.maximum(np.diff(arr[:, 0], prepend=t_prev), 0.0)
        packed[cap, 0] = n
        packed[cap, 1] = scan_stamp_rel
        packed[cap, 2] = 1.0 if evict else 0.0
        return jnp.asarray(packed)

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
            m_H=win.m_H, m_g=win.m_g, m_e=win.m_e,
            m_Tlin=win.m_Tlin.at[W - 1].set(T0_d),
            m_valid=win.m_valid,
            H_prior=jnp.eye(15) * p.init_pose_damping_scale,
            b_prior=jnp.zeros(15),
            # Uniquely-owned copy: window_scan_step donates the window, and
            # T0_d is also handed to the keyframe manager (whose
            # last_kf_T_wi becomes the step's T_last_keyframe argument) —
            # sharing one buffer between a donated and a regular argument
            # of the same Execute() is invalid.
            T_anchor=jnp.array(T0_d),
            v_anchor=jnp.asarray(v0, jnp.float32),
            b_anchor=jnp.asarray(b0, jnp.float32),
            H_marg=jnp.zeros((30, 30)), b_marg=jnp.zeros(30),
            step=jnp.int32(0))

        T_wl = T0_d @ jnp.asarray(np.linalg.inv(self.T_lidar_imu), jnp.float32)
        self._init_model(frame, covs, T_wl, T0_d, np.asarray(T0, np.float64))

        est = EstimationFrame(
            id=0, stamp=frame.stamp, T_lidar_imu=self.T_lidar_imu.copy(),
            device_T_world_lidar=T_wl, frame_id=FrameID.LIDAR,
            frame=PointBatch(points=frame.device_points, mask=frame.device_mask,
                             times=frame.device_times, covs=covs, normals=normals),
            raw_frame=frame)
        est.v_world_imu = v0
        est.imu_bias = b0
        est.custom_data["device_T_world_imu"] = T0_d
        self._est_frames.append(est)
        self.initialized = True
        self._init_odom = None
        self.frame_count = 1
        logger.info("initialized (%s): |v|=%.2f bias=%s W=%d",
                    p.initialization_mode, np.linalg.norm(v0), b0.round(4),
                    self.W)
        return True


@register_module("odometry", "odometry_estimation_gpu")
def create_odometry_estimation_gpu_module(config=None, sensors_config=None):
    params = (OdometryEstimationIMUParams.from_config(config, sensors_config)
              if config is not None else OdometryEstimationIMUParams())
    return OdometryEstimationIMU(params)
