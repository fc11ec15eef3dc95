"""Sub-mapping: bundle marginalized odometry frames into submaps.

Equivalent capability to the reference's ``SubMapping``
(reference: src/glim/mapping/sub_mapping.cpp:104-500, params from
config/config_sub_mapping_{cpu,gpu}.json):

  * 1-frame delayed input queue with IMU-rate trajectory smoothing between
    consecutive frame poses (:108-162 — here the chain mini-LM is solved in
    closed form, ops/imu.py::smooth_pose_chain);
  * per-frame factor bookkeeping — odometry Between factors with
    GICP-Hessian information (:193-210), the IMU factor chain with
    velocity/bias priors and insufficient-IMU fallbacks (:219-243);
  * keyframe selection by OVERLAP (vs the LAST keyframe's coarsest
    voxelmap, :245-267) / DISPLACEMENT, with keyframe re-deskewing using
    the smoothed IMU-rate poses + covariance re-estimation + random
    sampling + per-keyframe multi-level voxelmaps (:339-419);
  * submap creation at ``max_num_keyframes``: one fused batch LM over ALL
    frame states with the full factor graph (mapping/submap_refine.py —
    the :421-452 optimization), then merge + downsample at the refined
    poses with origin at the central FRAME and endpoint offsets for global
    mapping's IMU chain (:454-500).

TPU design: heavy ops (GICP Hessians, preintegration, deskewing, the batch
refinement, the merge) are jitted device programs padded to static
capacities; the host side runs in the sub-mapping worker thread where pose
fetches are off the odometry hot path.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from glim_tpu.mapping.callbacks import SubMappingCallbacks as CB
from glim_tpu.mapping.sub_mapping_base import SubMappingBase
from glim_tpu.mapping.submap_refine import submap_refine
from glim_tpu.ops import deskew as deskew_ops
from glim_tpu.ops import gicp, lie_np, pointops
from glim_tpu.ops import imu as imu_ops
from glim_tpu.ops import voxelmap as vmx
from glim_tpu.types import EstimationFrame, PointBatch, SubMap
from glim_tpu.utils.logging import create_module_logger
from glim_tpu.utils.registry import register_module

logger = create_module_logger("sub")

GRAVITY = np.array([0.0, 0.0, -9.80665])
IMU_CHAIN_CAP = 64          # padded IMU samples per inter-frame interval
FRAME_BUCKETS = (32, 64, 128, 256)


@dataclass
class SubMappingParams:
    enable_imu: bool = True
    enable_optimization: bool = False
    max_num_keyframes: int = 15
    keyframe_update_strategy: str = "OVERLAP"     # OVERLAP | DISPLACEMENT
    keyframe_update_min_points: int = 500
    keyframe_update_interval_rot: float = 3.14
    keyframe_update_interval_trans: float = 1.0
    max_keyframe_overlap: float = 0.6
    create_between_factors: bool = False
    between_registration_type: str = "GICP"       # GICP | NONE
    keyframe_randomsampling_rate: float = 1.0
    keyframe_voxel_resolution: float = 0.25
    keyframe_voxelmap_levels: int = 2
    keyframe_voxelmap_scaling_factor: float = 2.0
    submap_downsample_resolution: float = 0.25
    submap_voxel_resolution: float = 0.5
    submap_target_num_points: int = 50000
    submap_point_capacity: int = 65536
    keyframe_voxel_capacity: int = 16384
    refine_subsample: int = 4          # refinement-cloud stride (Cs = C/this)
    optimization_outer: int = 3
    optimization_inner: int = 3

    @staticmethod
    def from_config(config) -> "SubMappingParams":
        p = SubMappingParams()
        g = lambda k, d: config.param("sub_mapping", k, d)
        p.enable_imu = g("enable_imu", True)
        p.enable_optimization = g("enable_optimization", False)
        p.max_num_keyframes = int(g("max_num_keyframes", 15))
        p.keyframe_update_strategy = g("keyframe_update_strategy", "OVERLAP")
        p.keyframe_update_min_points = int(g("keyframe_update_min_points", 500))
        p.keyframe_update_interval_rot = g("keyframe_update_interval_rot", 3.14)
        p.keyframe_update_interval_trans = g("keyframe_update_interval_trans", 1.0)
        p.max_keyframe_overlap = g("max_keyframe_overlap", 0.6)
        p.create_between_factors = g("create_between_factors", False)
        p.between_registration_type = g("between_registration_type", "GICP")
        p.keyframe_randomsampling_rate = g("keyframe_randomsampling_rate", 1.0)
        p.keyframe_voxel_resolution = g("keyframe_voxel_resolution", 0.25)
        p.keyframe_voxelmap_levels = int(g("keyframe_voxelmap_levels", 2))
        p.keyframe_voxelmap_scaling_factor = g("keyframe_voxelmap_scaling_factor", 2.0)
        p.submap_downsample_resolution = g("submap_downsample_resolution", 0.25)
        p.submap_voxel_resolution = g("submap_voxel_resolution", 0.5)
        p.submap_target_num_points = int(g("submap_target_num_points", 50000))
        return p


@partial(jax.jit, static_argnames=("k_max", "out_cap"))
def _merge_keyframes(kf_points, kf_covs, kf_masks, kf_T_origin_kf, kf_valid,
                     resolution, *, k_max: int, out_cap: int):
    """Transform up to k_max keyframe clouds (points + covariances) into the
    origin frame and voxel-grid downsample into one padded submap cloud.
    Covariances ride through the merge (rotated, voxel-averaged) — the
    merged frame is the global backend's matching source, and a VGICP factor
    with zero source/target covariances is a no-op (Mahalanobis weight
    inv(0) = 0), so dropping them here would silently disable every implicit
    loop-closure factor downstream."""
    R = kf_T_origin_kf[:, :3, :3]
    t = kf_T_origin_kf[:, :3, 3]
    pts = jnp.einsum("kij,kcj->kci", R, kf_points) + t[:, None, :]
    covs = jnp.einsum("kij,kcjl,kml->kcim", R, kf_covs, R)
    mask = kf_masks & kf_valid[:, None]
    return pointops.voxelgrid_sampling_covs(
        pts.reshape(-1, 3), covs.reshape(-1, 3, 3), mask.reshape(-1),
        resolution, out_capacity=out_cap)


@jax.jit
def _between_info_gicp(T_last, T_cur, last_pts, last_covs, last_mask,
                       cur_pts, cur_covs, cur_mask, max_dist):
    """6x6 information of the odometry delta from a GICP linearization of
    the current frame against the last frame's points (reference
    sub_mapping.cpp:193-210: hessianBlockDiagonal at the current pose)."""
    s = gicp.gicp_linearize(T_last, T_cur, cur_pts, cur_covs, cur_mask,
                            last_pts, last_covs, last_mask, max_dist)
    return s.H_ss, s.num_inliers


@jax.jit
def _keyframe_gate(vm, points, mask, T_rel):
    """[n_valid_points, overlap-vs-last-keyframe] as ONE device scalar pair
    (one dispatch + one fetch instead of two blocking fetches)."""
    ov = vmx.voxelmap_overlap(vm, points, mask, T_rel)
    return jnp.stack([jnp.sum(mask).astype(jnp.float32), ov])


@jax.jit
def _keyframe_gate_dev(vm, points, mask, T_frame, inv_last_T):
    """Gate variant taking the frame pose as a DEVICE value: dispatched at
    the top of per-frame processing (before any host state is needed) so
    the tiny result copy overlaps the rest of the frame's work instead of
    forcing a blocking fetch at decision time."""
    T_rel = inv_last_T @ T_frame
    ov = vmx.voxelmap_overlap(vm, points, mask, T_rel)
    return jnp.stack([jnp.sum(mask).astype(jnp.float32), ov])


def _rot_to_quat_dev(R):
    from glim_tpu.ops import lie
    return lie.rot_to_quat(R)


@jax.jit
def _sub_frame_program(packed, T_lidar_imu, acc_noise, gyro_noise, int_noise):
    """ONE fused per-frame program on ONE packed upload (remoted chips pay
    ~2-4 ms of tunnel latency per host->device transfer; the separate
    preintegrate/smooth paths cost ~12 small uploads per frame).

    ``packed`` (2*CAP+7, 8) f32:
      rows [0, CAP):      window A (prev->cur)  [acc(3), gyro(3), dt, rel]
      rows [CAP, 2*CAP):  window B (cur->next)  same layout
      row 2*CAP:          [spanB, 0, biasA(6)]
      rows 2*CAP+1..+2:   T_cur  (16 floats)
      rows 2*CAP+3..+4:   T_next (16 floats)
      row 2*CAP+5:        [v_cur(3), ...]
      row 2*CAP+6:        [bias_cur(6), ...]
    Padding rows carry rel = 1e9 (the mask sentinel; also keeps the packed
    trajectory stamps monotone for deskew's searchsorted).

    Returns (traj (8, CAP) for window B, preintegration pytree for window A).
    """
    CAP = IMU_CHAIN_CAP
    A, B = packed[:CAP], packed[CAP:2 * CAP]
    maskA, maskB = A[:, 7] < 1e8, B[:, 7] < 1e8
    biasA = packed[2 * CAP, 2:8]
    T_cur = packed[2 * CAP + 1:2 * CAP + 3].reshape(4, 4)
    T_next = packed[2 * CAP + 3:2 * CAP + 5].reshape(4, 4)
    v_cur = packed[2 * CAP + 5, :3]
    b_cur = packed[2 * CAP + 6, :6]
    span = packed[2 * CAP, 0]

    pre = imu_ops.preintegrate(A[:, :3], A[:, 3:6], A[:, 6], maskA, biasA,
                               acc_noise, gyro_noise, int_noise)

    T_wi0 = T_cur @ T_lidar_imu
    T_wi1 = T_next @ T_lidar_imu
    Rs, ps, _ = imu_ops.integrate_poses(
        T_wi0[:3, :3], T_wi0[:3, 3], v_cur, b_cur,
        jnp.asarray(GRAVITY, jnp.float32), B[:, :3], B[:, 3:6], B[:, 6],
        maskB)
    sigmas = B[:, 6] / jnp.maximum(span, 1e-3) + 1e-2
    Rs2, ps2 = imu_ops.smooth_pose_chain(Rs, ps, maskB, sigmas, T_wi1)
    quats = jax.vmap(_rot_to_quat_dev)(Rs2)
    stamps_safe = jnp.where(maskB, B[:, 7], 1e9)
    traj = jnp.concatenate([stamps_safe[None, :], ps2.T, quats.T], axis=0)
    return traj, pre


@partial(jax.jit, static_argnames=("stride", "levels", "cap", "res0",
                                   "scale"))
def _kf_build_deskew(raw_pts, raw_times, raw_mask, neighbors, traj_packed,
                     T_li, *, stride: int, levels: int, cap: int,
                     res0: float, scale: float):
    """ONE fused keyframe build: IMU-rate re-deskew + covariance
    re-estimation + stride sampling + all per-keyframe voxelmap levels
    (reference sub_mapping.cpp:339-419) — a single dispatch instead of
    four-plus (each dispatch pays tunnel latency on remoted chips)."""
    from glim_tpu.ops import covariance as cov_ops
    stamps_rel = traj_packed[0]
    trans = traj_packed[1:4].T
    quats = traj_packed[4:8].T
    pts = deskew_ops.deskew_imu(raw_pts, raw_times, raw_mask,
                                stamps_rel, quats, trans, T_li)
    covs, _ = cov_ops.estimate_covariances(pts, raw_mask, neighbors, "plane")
    s_pts, s_covs, s_mask = pts[::stride], covs[::stride], raw_mask[::stride]
    vms = []
    for lvl in range(levels):
        vm = vmx.empty_gaussian_voxelmap(cap, res0 * (scale ** lvl))
        vms.append(vmx.voxelmap_insert(vm, s_pts, s_mask, s_covs,
                                       jnp.int32(0)))
    return pts, covs, s_pts, s_covs, s_mask, vms


@partial(jax.jit, static_argnames=("stride", "levels", "cap", "res0",
                                   "scale"))
def _kf_build_plain(pts, covs, mask, *, stride: int, levels: int, cap: int,
                    res0: float, scale: float):
    """Keyframe build without re-deskew (no IMU-rate trajectory): stride
    sampling + voxelmap levels in one dispatch."""
    s_pts, s_covs, s_mask = pts[::stride], covs[::stride], mask[::stride]
    vms = []
    for lvl in range(levels):
        vm = vmx.empty_gaussian_voxelmap(cap, res0 * (scale ** lvl))
        vms.append(vmx.voxelmap_insert(vm, s_pts, s_mask, s_covs,
                                       jnp.int32(0)))
    return s_pts, s_covs, s_mask, vms


class SubMapping(SubMappingBase):
    def __init__(self, params: Optional[SubMappingParams] = None):
        self.params = params or SubMappingParams()
        self.submap_count = 0
        self._delayed: List[EstimationFrame] = []
        self.odom_frames: List[EstimationFrame] = []
        self.frames: List[EstimationFrame] = []     # every frame in the submap
        self.keyframes: List[dict] = []             # device keyframe records
        self.submap_queue: List[SubMap] = []
        self.imu_buffer: List[np.ndarray] = []
        # Per-edge factor data, entry i connects frames (i-1, i).
        self._bt_delta: List[np.ndarray] = []
        self._bt_info: List = []
        self._bt_valid: List[bool] = []
        self._preints: List = []
        self._pre_valid: List[bool] = []
        self._last_frame_full = dict(T=np.eye(4), pts=None, covs=None, mask=None)
        # Deferred keyframe decisions: deque of (gate_dev, frame, frame_idx),
        # resolved once each gate's D2H copy has LANDED (is_ready) — the
        # shared device FIFO holds odometry window programs ~15-30 ms deep,
        # so a same-frame read would block behind them. Depth-bounded by
        # `gate_keep`; the async wrapper raises it across input bursts
        # (end-of-sequence drain) so back-to-back frames never block on a
        # gate copy that is still behind freshly dispatched programs.
        self._kf_pending: List[tuple] = []
        self.gate_keep = 3
        # Device-resident constants for the fused per-frame IMU program
        # (fresh tiny uploads every call would each pay tunnel latency).
        self._d_T_li = None
        self._d_T_li_fwd = None
        self._d_acc_noise = jnp.float32(0.05)
        self._d_gyro_noise = jnp.float32(0.02)
        self._d_int_noise = jnp.float32(0.001)
        self._rng = np.random.default_rng(7)

    def insert_imu(self, stamp, linear_acc, angular_vel) -> None:
        CB.on_insert_imu(stamp, linear_acc, angular_vel)
        if self.params.enable_imu:
            self.imu_buffer.append(
                np.concatenate([[stamp], linear_acc, angular_vel]))

    def insert_frame(self, frame: EstimationFrame) -> None:
        CB.on_insert_frame(frame)
        # 1-frame delayed queue: frame k is processed when k+1 arrives so
        # the IMU-rate trajectory between them can be smoothed
        # (reference sub_mapping.cpp:108-115).
        self._delayed.append(frame)
        if len(self._delayed) < 2:
            return
        cur = self._delayed.pop(0)
        nxt = self._delayed[0]
        self._process_frame(cur, nxt)

    def _process_frame(self, frame: EstimationFrame,
                       next_frame: Optional[EstimationFrame]) -> None:
        from glim_tpu.utils.profiling import profile_scope
        with profile_scope("sub/process_frame"):
            self._process_frame_impl(frame, next_frame)

    def _process_frame_impl(self, frame: EstimationFrame,
                            next_frame: Optional[EstimationFrame]) -> None:
        p = self.params
        from glim_tpu.utils.profiling import profile_scope
        # Resolve the PREVIOUS frame's deferred keyframe decision first: its
        # overlap-gate program had a full inter-frame interval to clear the
        # shared device queue, so the 2-float read is free (reading the gate
        # within the same frame measured ~35 ms/frame stuck behind the
        # odometry thread's in-flight window programs). Resolving BEFORE
        # this frame's gate dispatch also keeps the gate's reference
        # keyframe current when the previous frame just became one.
        with profile_scope("sub/gate_read"):
            self._resolve_pending_keyframes()
        # Dispatch this frame's keyframe overlap gate from the frame's
        # DEVICE pose (no host state needed); decided once landed.
        with profile_scope("sub/gate_dispatch"):
            gate_pending = self._dispatch_keyframe_gate(frame)
        # One packed fetch for pose+velocity+bias instead of three lazy
        # roundtrips (each would serialize behind the odometry device
        # queue); the producer thread already started these copies at
        # hand-off (fetch_state_async).
        with profile_scope("sub/fetch_state"):
            frame.fetch_state()
            if next_frame is not None:
                next_frame.fetch_state()

        # One fused IMU program per frame (preintegration of the prev->cur
        # window + cur->next chain smoothing) on ONE packed upload.
        traj_dev = pre_dev = None
        nA = nB = 0
        if p.enable_imu:
            with profile_scope("sub/smooth"):
                traj_dev, pre_dev, nA, nB = self._dispatch_imu_program(
                    frame, next_frame)
            if traj_dev is not None:
                frame.imu_rate_trajectory = None
                frame.device_imu_rate_trajectory = (traj_dev, nB, frame.stamp)

        current = len(self.frames)
        self.odom_frames.append(frame.clone_wo_points())
        # Reference semantics: submap.frames holds EVERY scan of the submap
        # (the optimized per-scan trajectory feeding traj_lidar.txt).
        self.frames.append(frame.clone_wo_points())
        self.frames[-1].frame = None

        # -- factor bookkeeping for the batch refinement --
        if current == 0:
            self._bt_delta.append(np.eye(4))
            self._bt_info.append(np.eye(6))
            self._bt_valid.append(False)
        else:
            last = self._last_frame_full
            delta = np.linalg.inv(last["T"]) @ frame.T_world_sensor()
            info = None
            if (p.create_between_factors
                    and p.between_registration_type.upper() == "GICP"
                    and last["pts"] is not None and frame.frame is not None):
                last_covs = last["covs"]
                if last_covs is None:
                    last_covs = jnp.zeros(last["pts"].shape[:1] + (3, 3),
                                          jnp.float32)
                H, n_in = _between_info_gicp(
                    jnp.asarray(last["T"], jnp.float32),
                    jnp.asarray(frame.T_world_sensor(), jnp.float32),
                    last["pts"], last_covs, last["mask"],
                    frame.frame.points, frame.frame.covs, frame.frame.mask,
                    jnp.float32(1.0))
                # NOTE: do NOT copy_to_host_async here — on the remoted
                # axon chip an async-copy request on a just-dispatched
                # (in-flight) array behaves like a device-queue flush
                # (see EstimationFrame.prefetch). The copies are requested
                # in bulk at _refine() start instead, when the producing
                # programs finished long ago.
                info = (H, n_in)
            self._bt_delta.append(delta)
            self._bt_info.append(info)       # resolved (fetched) at create
            self._bt_valid.append(p.create_between_factors)
        if p.enable_imu and current > 0:
            if nA >= 2:
                self._preints.append(pre_dev)
                self._pre_valid.append(True)
            else:
                logger.warning("insufficient IMU data between LiDAR frames!! "
                               "(sub_mapping)")
                self._preints.append(None)
                self._pre_valid.append(False)
        else:
            self._preints.append(None)
            self._pre_valid.append(False)

        # Keep the full cloud of the last frame only (between factors).
        self._last_frame_full = dict(
            T=frame.T_world_sensor(),
            pts=frame.frame.points if frame.frame is not None else None,
            covs=frame.frame.covs if frame.frame is not None else None,
            mask=frame.frame.mask if frame.frame is not None else None)

        # Defer the keyframe decision until the gate copy lands (resolved at
        # the top of later _process_frame calls, or at end of sequence).
        self._kf_pending.append((gate_pending, frame, current))

    @staticmethod
    def _gate_ready(gate) -> bool:
        if gate is None:
            return True
        try:
            return bool(gate.is_ready())
        except AttributeError:
            return True     # backend without readiness queries: read now

    def _resolve_pending_keyframes(self, force_all: bool = False,
                                   keep: int = None) -> None:
        """Decide deferred keyframe questions whose gate copies have landed
        (non-blocking readiness check), keeping decision latency bounded:
        pendings deeper than ``keep`` (default ``self.gate_keep``) are
        resolved even if the read blocks. Before a submap roll, ALL pendings
        are resolved so every frame's keyframe candidacy lands in the submap
        it belongs to."""
        from glim_tpu.utils.profiling import profile_scope
        if keep is None:
            keep = self.gate_keep
        while self._kf_pending:
            if (not force_all and len(self._kf_pending) <= keep
                    and not self._gate_ready(self._kf_pending[0][0])):
                return
            gate, frame, current = self._kf_pending.pop(0)
            if not self._should_insert_keyframe(frame, gate):
                continue
            with profile_scope("sub/kf_insert"):
                self._insert_keyframe(current, frame)
            CB.on_new_keyframe(current, frame)
            if (len(self.keyframes) >= self.params.max_num_keyframes
                    and not force_all):
                # Frames after `current` are already in self.frames and will
                # be swept into this submap: decide their candidacy first so
                # the roll closes over a fully-decided keyframe set (the
                # force_all guard keeps the recursion from rolling inside).
                self._resolve_pending_keyframes(force_all=True)
                self._create_submap()
                return

    def get_submaps(self) -> List[SubMap]:
        out = self.submap_queue
        self.submap_queue = []
        return out

    def submit_end_of_sequence(self) -> List[SubMap]:
        if self._delayed:
            self._process_frame(self._delayed.pop(0), None)
        self._resolve_pending_keyframes(force_all=True)   # flush decisions
        if self.keyframes:
            self._create_submap()
        out = self.submap_queue
        self.submap_queue = []
        return out

    # -- internals --

    def _imu_between(self, t0: float, t1: float):
        """Padded IMU arrays covering (t0, t1]."""
        rows = [r for r in self.imu_buffer if t0 < r[0] <= t1 + 1e-6]
        self.imu_buffer = [r for r in self.imu_buffer if r[0] > t0 - 0.5]
        n = min(len(rows), IMU_CHAIN_CAP)
        acc = np.zeros((IMU_CHAIN_CAP, 3), np.float32)
        gyro = np.zeros((IMU_CHAIN_CAP, 3), np.float32)
        dts = np.zeros(IMU_CHAIN_CAP, np.float32)
        rel = np.zeros(IMU_CHAIN_CAP, np.float32)
        mask = np.zeros(IMU_CHAIN_CAP, bool)
        prev = t0
        for i in range(n):
            acc[i] = rows[i][1:4]
            gyro[i] = rows[i][4:7]
            dts[i] = max(rows[i][0] - prev, 0.0)
            rel[i] = rows[i][0] - t0
            prev = rows[i][0]
            mask[i] = True
        return acc, gyro, dts, mask, rel

    def _imu_window_block(self, t0: float, t1: float):
        """(CAP, 8) [acc(3), gyro(3), dt, rel] block covering (t0, t1];
        padding rows carry rel = 1e9 (mask sentinel). Returns (block, n)."""
        acc, gyro, dts, mask, rel = self._imu_between(t0, t1)
        block = np.full((IMU_CHAIN_CAP, 8), 0.0, np.float32)
        block[:, :3] = acc
        block[:, 3:6] = gyro
        block[:, 6] = dts
        block[:, 7] = np.where(mask, rel, 1e9)
        return block, int(mask.sum())

    def _dispatch_imu_program(self, frame: EstimationFrame,
                              next_frame: Optional[EstimationFrame]):
        """Build the packed per-frame IMU upload and run the fused program.
        Returns (traj_dev or None, pre_dev or None, nA, nB): the cur->next
        smoothed IMU-rate trajectory (device) and the prev->cur
        preintegration (device pytree). Keeping both device-resident means
        the per-frame loop never pays a blocking fetch; host copies
        (dump/export) materialize lazily."""
        from glim_tpu.utils.profiling import profile_scope
        CAP = IMU_CHAIN_CAP
        prev = self.frames[-1] if self.frames else None
        packed = np.zeros((2 * CAP + 7, 8), np.float32)
        packed[:CAP, 7] = 1e9
        packed[CAP:2 * CAP, 7] = 1e9
        nA = nB = 0
        if prev is not None:
            with profile_scope("sub/smooth.blockA"):
                packed[:CAP], nA = self._imu_window_block(prev.stamp, frame.stamp)
            with profile_scope("sub/smooth.biasA"):
                biasA = prev.imu_bias
            if biasA is not None:
                packed[2 * CAP, 2:8] = biasA
        if next_frame is not None:
            with profile_scope("sub/smooth.blockB"):
                packed[CAP:2 * CAP], nB = self._imu_window_block(
                    frame.stamp, next_frame.stamp)
            packed[2 * CAP, 0] = next_frame.stamp - frame.stamp
            with profile_scope("sub/smooth.Tnext"):
                packed[2 * CAP + 3:2 * CAP + 5] = np.asarray(
                    next_frame.T_world_sensor(), np.float32).reshape(2, 8)
        if nA < 2 and nB < 2:
            return None, None, nA, nB
        with profile_scope("sub/smooth.Tcur"):
            packed[2 * CAP + 1:2 * CAP + 3] = np.asarray(
                frame.T_world_sensor(), np.float32).reshape(2, 8)
        with profile_scope("sub/smooth.vb"):
            v = frame.v_world_imu
            b = frame.imu_bias
        if v is not None:
            packed[2 * CAP + 5, :3] = v
        if b is not None:
            packed[2 * CAP + 6, :6] = b
        if self._d_T_li is None:
            # Matches the previous per-call transform handed to the chain.
            self._d_T_li = jnp.asarray(np.linalg.inv(frame.T_lidar_imu),
                                       jnp.float32)
        with profile_scope("sub/smooth.prog"):
            traj, pre = _sub_frame_program(jnp.asarray(packed), self._d_T_li,
                                           self._d_acc_noise, self._d_gyro_noise,
                                           self._d_int_noise)
        return (traj if (nB >= 2 and next_frame is not None) else None,
                pre if nA >= 2 else None, nA, nB)

    def _dispatch_keyframe_gate(self, frame: EstimationFrame):
        """Early OVERLAP-gate dispatch from the device pose; returns the
        in-flight (2,) device value (async copy started) or None when the
        gate doesn't apply this frame."""
        p = self.params
        if (p.keyframe_update_strategy.upper() == "DISPLACEMENT"
                or not self.keyframes
                or frame.frame is None or frame.frame.points is None
                or frame.device_T_world_lidar is None):
            return None
        last = self.keyframes[-1]
        gate = _keyframe_gate_dev(
            last["vms"][-1], frame.frame.points, frame.frame.mask,
            frame.device_T_world_lidar,
            jnp.asarray(np.linalg.inv(last["T"]), jnp.float32))
        try:
            gate.copy_to_host_async()
        except AttributeError:
            pass
        return gate

    def _should_insert_keyframe(self, frame: EstimationFrame,
                                gate_pending=None) -> bool:
        p = self.params
        if not self.keyframes:
            return True
        if frame.frame is None or frame.frame.points is None:
            return False
        last = self.keyframes[-1]
        if p.keyframe_update_strategy.upper() == "DISPLACEMENT":
            if int(np.asarray(jnp.sum(frame.frame.mask))) \
                    <= p.keyframe_update_min_points:
                return False
            delta = lie_np.se3_log(np.linalg.inv(last["T"]) @ frame.T_world_sensor())
            return (np.linalg.norm(delta[3:]) > p.keyframe_update_interval_trans
                    or np.linalg.norm(delta[:3]) > p.keyframe_update_interval_rot)
        # OVERLAP vs the LAST keyframe's coarsest voxelmap (reference
        # sub_mapping.cpp:249-255 uses keyframes.back()->voxelmaps.back()).
        # One fused dispatch + ONE fetch for both gate scalars; normally the
        # early-dispatched copy (gate_pending) has already landed.
        if gate_pending is not None:
            gate = np.asarray(gate_pending)
        else:
            T = jnp.asarray(frame.T_world_sensor(), jnp.float32)
            T_rel = jnp.asarray(np.linalg.inv(last["T"]), jnp.float32) @ T
            gate = np.asarray(_keyframe_gate(last["vms"][-1],
                                             frame.frame.points,
                                             frame.frame.mask, T_rel))
        if int(gate[0]) <= p.keyframe_update_min_points:
            return False
        return float(gate[1]) < p.max_keyframe_overlap

    def _insert_keyframe(self, current: int, frame: EstimationFrame) -> None:
        """Re-deskew with the smoothed IMU-rate poses, re-estimate
        covariances, random-sample, and build per-keyframe voxelmaps
        (reference sub_mapping.cpp:339-419)."""
        p = self.params
        pts = frame.frame.points
        covs = frame.frame.covs
        mask = frame.frame.mask
        raw = frame.raw_frame

        dev_irt = frame.device_imu_rate_trajectory
        host_irt = frame._imu_rate_trajectory
        has_irt = ((dev_irt is not None and dev_irt[1] >= 2)
                   or (host_irt is not None and host_irt.shape[1] >= 2))
        stride = max(1, int(round(1.0 / max(p.keyframe_randomsampling_rate, 1e-3))))
        static = dict(stride=stride,
                      levels=max(p.keyframe_voxelmap_levels, 1),
                      cap=p.keyframe_voxel_capacity,
                      res0=p.keyframe_voxel_resolution,
                      scale=p.keyframe_voxelmap_scaling_factor)
        if (p.enable_imu and raw is not None and has_irt
                and getattr(raw, "device_points", None) is not None):
            if dev_irt is not None:
                # Device-resident packed table: zero host roundtrips
                # (padding stamps sit at +1e9, monotone for searchsorted).
                traj_packed, _n, _s0 = dev_irt
            else:
                traj = host_irt
                traj_packed = jnp.asarray(np.concatenate(
                    [(traj[0:1] - frame.stamp), traj[1:8]]), jnp.float32)
            if self._d_T_li_fwd is None:
                self._d_T_li_fwd = jnp.asarray(frame.T_lidar_imu, jnp.float32)
            # ONE fused dispatch: deskew + covariances + sample + voxelmaps.
            pts, covs, s_pts, s_covs, s_mask, vms = _kf_build_deskew(
                raw.device_points, raw.device_times, raw.device_mask,
                raw.device_neighbors, traj_packed, self._d_T_li_fwd, **static)
            mask = raw.device_mask
        else:
            if covs is None:
                covs = jnp.zeros(pts.shape[:1] + (3, 3), jnp.float32)
            s_pts, s_covs, s_mask, vms = _kf_build_plain(pts, covs, mask,
                                                         **static)

        self.keyframes.append(dict(
            fidx=current, T=frame.T_world_sensor(), id=frame.id,
            pts=s_pts, covs=s_covs, mask=s_mask,
            full_pts=pts, full_covs=covs, full_mask=mask, vms=vms))

    def _refine(self) -> Optional[tuple]:
        """Batch LM over all frame states (submap_refine). Returns
        (T (N,4,4), v, b) numpy or None when disabled/degenerate."""
        p = self.params
        N = len(self.frames)
        if not p.enable_optimization or N < 2 or len(self.keyframes) < 2:
            return None
        Np = next((b for b in FRAME_BUCKETS if b >= N), None)
        if Np is None:
            logger.warning("submap has %d frames > %d; skipping batch "
                           "refinement", N, FRAME_BUCKETS[-1])
            return None

        # Bulk-request the between-info D2H copies up front (their programs
        # ran one frame after dispatch, many frames ago — pure copies now);
        # the int(n_in)/np.asarray(H) reads below then find landed buffers
        # instead of paying one blocking roundtrip per frame.
        for info in self._bt_info:
            if isinstance(info, tuple):
                for a in info:
                    try:
                        a.copy_to_host_async()
                    except AttributeError:
                        pass

        T0 = np.tile(np.eye(4, dtype=np.float32), (Np, 1, 1))
        v0 = np.zeros((Np, 3), np.float32)
        b0 = np.zeros((Np, 6), np.float32)
        valid = np.zeros(Np, bool)
        btd = np.tile(np.eye(4, dtype=np.float32), (Np, 1, 1))
        bti = np.tile(np.eye(6, dtype=np.float32), (Np, 1, 1))
        btv = np.zeros(Np, bool)
        for i, fr in enumerate(self.frames):
            T0[i] = fr.T_world_sensor()
            if fr.v_world_imu is not None:
                v0[i] = fr.v_world_imu
            if fr.imu_bias is not None:
                b0[i] = fr.imu_bias
            valid[i] = True
            btd[i] = self._bt_delta[i]
            if self._bt_valid[i]:
                info = self._bt_info[i]
                if isinstance(info, tuple):
                    H, n_in = info
                    if int(n_in) >= 500:
                        bti[i] = np.asarray(H)
                    else:
                        bti[i] = np.eye(6) * 1e3
                else:
                    bti[i] = np.eye(6) * 1e3
                btv[i] = True

        # Stack preintegrations (identity-padded where invalid).
        from glim_tpu.odometry.window_estimator import _zero_preints
        pre0 = _zero_preints(Np)
        pre_np = jax.tree_util.tree_map(lambda x: np.asarray(x), pre0)
        pre_valid = np.zeros(Np - 1, bool)
        for i in range(1, min(N, Np)):
            if self._pre_valid[i] and self._preints[i] is not None:
                src = self._preints[i]
                pre_np = jax.tree_util.tree_map(
                    lambda buf, val: _set_row(buf, i - 1, np.asarray(val)),
                    pre_np, src)
                pre_valid[i - 1] = True

        Kp = p.max_num_keyframes
        kfs = self.keyframes[:Kp]
        # Extra stride for the pairwise factor clouds only (the Kp^2 lookup
        # fan-out is the expensive part; the voxelmap targets stay dense).
        rs = max(1, p.refine_subsample)
        kf_fidx = np.zeros(Kp, np.int32)
        kf_valid = np.zeros(Kp, bool)
        L = max(p.keyframe_voxelmap_levels, 1)
        vms_stacked = []
        for lvl in range(L):
            vms_stacked.append(jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs),
                *[kf["vms"][lvl] for kf in kfs],
                *([kfs[0]["vms"][lvl]] * (Kp - len(kfs)))))
        # One stacking dispatch per tensor (vs Kp sequential .at[].set).
        pad_k = Kp - len(kfs)
        zp = jnp.zeros_like(kfs[0]["pts"][::rs])
        zc = jnp.zeros_like(kfs[0]["covs"][::rs])
        zm = jnp.zeros_like(kfs[0]["mask"][::rs])
        kf_pts = jnp.stack([kf["pts"][::rs] for kf in kfs] + [zp] * pad_k)
        kf_covs = jnp.stack([kf["covs"][::rs] for kf in kfs] + [zc] * pad_k)
        kf_mask = jnp.stack([kf["mask"][::rs] for kf in kfs] + [zm] * pad_k)
        for i, kf in enumerate(kfs):
            kf_fidx[i] = kf["fidx"]
            kf_valid[i] = True

        T, v, b, err = submap_refine(
            jnp.asarray(T0), jnp.asarray(v0), jnp.asarray(b0),
            jnp.asarray(valid),
            jnp.asarray(btd), jnp.asarray(bti), jnp.asarray(btv),
            jax.tree_util.tree_map(jnp.asarray, pre_np),
            jnp.asarray(pre_valid),
            kf_pts, kf_covs, kf_mask, jnp.asarray(kf_fidx),
            jnp.asarray(kf_valid), tuple(vms_stacked),
            jnp.asarray(GRAVITY, jnp.float32),
            Np=Np, Kp=Kp, outer=p.optimization_outer,
            inner=p.optimization_inner)
        CB.on_optimization_status(dict(error=float(err)), None)
        return (np.asarray(T, np.float64)[:N], np.asarray(v, np.float64)[:N],
                np.asarray(b, np.float64)[:N])

    def _create_submap(self) -> None:
        from glim_tpu.utils.profiling import profile_scope
        with profile_scope("sub/create_submap"):
            self._create_submap_impl()

    def _create_submap_impl(self) -> None:
        p = self.params
        K = len(self.keyframes)
        N = len(self.frames)
        if K == 0 or N == 0:
            return

        refined = self._refine()
        if refined is not None:
            T_all, v_all, b_all = refined
            for i, fr in enumerate(self.frames):
                fr.set_T_world_sensor(T_all[i])
                fr.v_world_imu = v_all[i]
                fr.imu_bias = b_all[i]
        poses = {kf["fidx"]: self.frames[kf["fidx"]].T_world_sensor()
                 for kf in self.keyframes}

        # Origin at the central FRAME (reference: odom_frames.size()/2).
        center = N // 2
        T_world_origin = self.frames[center].T_world_sensor()
        T_origin_world = np.linalg.inv(T_world_origin)

        k_max = p.max_num_keyframes
        # ONE stacking dispatch per tensor (a .at[i].set loop would chain
        # k_max sequential full-buffer copies on the device queue).
        kfs = self.keyframes[:k_max]
        pad = k_max - len(kfs)
        zp = jnp.zeros_like(kfs[0]["full_pts"])
        zc = jnp.zeros_like(kfs[0]["full_covs"])
        zm = jnp.zeros_like(kfs[0]["full_mask"])
        kf_pts = jnp.stack([kf["full_pts"] for kf in kfs] + [zp] * pad)
        kf_cvs = jnp.stack([kf["full_covs"] for kf in kfs] + [zc] * pad)
        kf_msk = jnp.stack([kf["full_mask"] for kf in kfs] + [zm] * pad)
        kf_T_np = np.tile(np.eye(4, dtype=np.float32), (k_max, 1, 1))
        kf_valid = np.zeros(k_max, bool)
        for i, kf in enumerate(kfs):
            kf_T_np[i] = T_origin_world @ poses[kf["fidx"]]
            kf_valid[i] = True
        kf_T = jnp.asarray(kf_T_np)

        out_cap = min(p.submap_point_capacity,
                      int(2 ** np.ceil(np.log2(max(p.submap_target_num_points, 1024)))))
        m_pts, m_covs, m_mask = _merge_keyframes(
            kf_pts, kf_cvs, kf_msk, kf_T, jnp.asarray(kf_valid),
            jnp.float32(p.submap_downsample_resolution),
            k_max=k_max, out_cap=out_cap)

        T_first = self.frames[0].T_world_sensor()
        T_last = self.frames[-1].T_world_sensor()
        submap = SubMap(
            id=self.submap_count,
            T_world_origin=T_world_origin,
            T_origin_endpoint_L=T_origin_world @ T_first,
            T_origin_endpoint_R=T_origin_world @ T_last,
            frame=PointBatch(points=m_pts, mask=m_mask, covs=m_covs),
            frames=self.frames,
            odom_frames=self.odom_frames,
        )
        # Creation-time origin (global mapping overwrites T_world_origin in
        # place; frame poses stay in the odometry frame and are re-anchored
        # through this for globally-optimized trajectories).
        submap.custom_data["T_world_origin_pre"] = T_world_origin.copy()

        self.submap_count += 1
        self.keyframes = []
        self.frames = []
        self.odom_frames = []
        self._bt_delta = []
        self._bt_info = []
        self._bt_valid = []
        self._preints = []
        self._pre_valid = []
        self.submap_queue.append(submap)
        CB.on_new_submap(submap)
        logger.info("submap %d created (%d keyframes, %d frames%s)",
                    submap.id, K, N,
                    ", refined" if refined is not None else "")


def _set_row(buf: np.ndarray, i: int, val: np.ndarray) -> np.ndarray:
    buf = buf.copy()
    buf[i] = val
    return buf


@register_module("sub_mapping", "sub_mapping")
def create_sub_mapping_module(config=None):
    params = SubMappingParams.from_config(config) if config is not None else SubMappingParams()
    return SubMapping(params)
