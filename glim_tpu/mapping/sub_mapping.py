"""Sub-mapping: bundle marginalized odometry frames into submaps.

Equivalent capability to the reference's ``SubMapping``
(reference: src/glim/mapping/sub_mapping.cpp:104-500, params from
config/config_sub_mapping_{cpu,gpu}.json): keyframe selection by OVERLAP /
DISPLACEMENT over the marginalized-frame stream, optional batch refinement of
keyframe poses with a fully-connected VGICP factor graph, then a merged and
downsampled submap with origin at the central keyframe and endpoint offsets
for the IMU factor chain of global mapping.

TPU design: keyframe clouds stay on device; the merge (transform K clouds
into the origin frame + voxel-grid downsample) is one jitted program padded to
``max_num_keyframes``; the optional refinement is a dense batch LM over
K x 6 dof with VGICP factors between all keyframe pairs — on-device
linearization, host LM loop (K <= 15 keeps the system tiny).
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
from glim_tpu.ops import gicp, lie, lie_np, pointops, solver
from glim_tpu.ops import voxelmap as vmx
from glim_tpu.types import EstimationFrame, PointBatch, SubMap
from glim_tpu.utils.logging import create_module_logger
from glim_tpu.utils.registry import register_module

logger = create_module_logger("sub")


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
    keyframe_randomsampling_rate: float = 1.0
    keyframe_voxel_resolution: float = 0.25
    keyframe_voxelmap_levels: int = 2
    keyframe_voxelmap_scaling_factor: float = 2.0
    submap_downsample_resolution: float = 0.25
    submap_voxel_resolution: float = 0.5
    submap_target_num_points: int = 50000
    submap_point_capacity: int = 65536
    keyframe_voxel_capacity: int = 65536
    optimization_iterations: int = 5

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
        p.keyframe_randomsampling_rate = g("keyframe_randomsampling_rate", 1.0)
        p.keyframe_voxel_resolution = g("keyframe_voxel_resolution", 0.25)
        p.keyframe_voxelmap_levels = int(g("keyframe_voxelmap_levels", 2))
        p.keyframe_voxelmap_scaling_factor = g("keyframe_voxelmap_scaling_factor", 2.0)
        p.submap_downsample_resolution = g("submap_downsample_resolution", 0.25)
        p.submap_voxel_resolution = g("submap_voxel_resolution", 0.5)
        p.submap_target_num_points = int(g("submap_target_num_points", 50000))
        return p


@partial(jax.jit, static_argnames=("k_max", "out_cap"))
def _merge_keyframes(kf_points, kf_masks, kf_T_origin_kf, kf_valid, resolution,
                     *, k_max: int, out_cap: int):
    """Transform up to k_max keyframe clouds into the origin frame and
    voxel-grid downsample into one padded submap cloud."""
    # (K, C, 3) batched transform.
    R = kf_T_origin_kf[:, :3, :3]
    t = kf_T_origin_kf[:, :3, 3]
    pts = jnp.einsum("kij,kcj->kci", R, kf_points) + t[:, None, :]
    mask = kf_masks & kf_valid[:, None]
    flat_pts = pts.reshape(-1, 3)
    flat_mask = mask.reshape(-1)
    return pointops.voxelgrid_sampling(flat_pts, flat_mask, resolution,
                                       out_capacity=out_cap)


class SubMapping(SubMappingBase):
    def __init__(self, params: Optional[SubMappingParams] = None):
        self.params = params or SubMappingParams()
        self.submap_count = 0
        self.odom_frames: List[EstimationFrame] = []
        self.frames: List[EstimationFrame] = []     # every frame in the submap
        self.keyframes: List[EstimationFrame] = []
        self.submap_queue: List[SubMap] = []
        self._kf_voxelmap = None
        self._rng = jax.random.PRNGKey(7)

    def insert_imu(self, stamp, linear_acc, angular_vel) -> None:
        CB.on_insert_imu(stamp, linear_acc, angular_vel)

    def insert_frame(self, frame: EstimationFrame) -> None:
        CB.on_insert_frame(frame)
        p = self.params
        self.odom_frames.append(frame.clone_wo_points())
        # Reference semantics: submap.frames holds EVERY scan of the submap
        # (the optimized per-scan trajectory feeding traj_lidar.txt), not
        # just the keyframes (reference: sub_mapping.cpp:183-243).
        self.frames.append(frame.clone_wo_points())

        if self._should_insert_keyframe(frame):
            self._insert_keyframe(frame)
            CB.on_new_keyframe(len(self.keyframes) - 1, frame)
            if len(self.keyframes) >= p.max_num_keyframes:
                self._create_submap()

    def get_submaps(self) -> List[SubMap]:
        out = self.submap_queue
        self.submap_queue = []
        return out

    def submit_end_of_sequence(self) -> List[SubMap]:
        if self.keyframes:
            self._create_submap()
        out = self.submap_queue
        self.submap_queue = []
        return out

    # -- internals --

    def _should_insert_keyframe(self, frame: EstimationFrame) -> bool:
        p = self.params
        if not self.keyframes:
            return True
        if frame.frame is None or frame.frame.points is None:
            return False
        if p.keyframe_update_strategy.upper() == "DISPLACEMENT":
            T_last = self.keyframes[-1].T_world_sensor()
            delta = lie_np.se3_log(np.linalg.inv(T_last) @ frame.T_world_sensor())
            return (np.linalg.norm(delta[3:]) > p.keyframe_update_interval_trans
                    or np.linalg.norm(delta[:3]) > p.keyframe_update_interval_rot)
        # OVERLAP: insert when the new frame's overlap with the accumulated
        # keyframe map drops below max_keyframe_overlap.
        ov = float(vmx.voxelmap_overlap(
            self._kf_voxelmap, frame.frame.points, frame.frame.mask,
            jnp.asarray(frame.T_world_sensor(), jnp.float32)))
        return ov < p.max_keyframe_overlap

    def _insert_keyframe(self, frame: EstimationFrame) -> None:
        p = self.params
        if self._kf_voxelmap is None:
            self._kf_voxelmap = vmx.empty_gaussian_voxelmap(
                p.keyframe_voxel_capacity, p.submap_voxel_resolution)
        if frame.frame is not None and frame.frame.points is not None:
            covs = frame.frame.covs
            if covs is None:
                covs = jnp.zeros(frame.frame.points.shape[:1] + (3, 3), jnp.float32)
            T = jnp.asarray(frame.T_world_sensor(), jnp.float32)
            w_pts = frame.frame.points @ T[:3, :3].T + T[:3, 3]
            self._kf_voxelmap = vmx.voxelmap_insert(
                self._kf_voxelmap, w_pts, frame.frame.mask, covs,
                jnp.int32(len(self.keyframes)))
        self.keyframes.append(frame)

    def _optimize_keyframes(self) -> List[np.ndarray]:
        """Optional batch refinement: fully-connected VGICP between keyframes
        (reference: sub_mapping.cpp:421-452). Returns refined world poses."""
        p = self.params
        K = len(self.keyframes)
        poses0 = [kf.T_world_sensor() for kf in self.keyframes]
        if not p.enable_optimization or K < 2:
            return poses0

        vms = []
        for kf in self.keyframes:
            vm = vmx.empty_gaussian_voxelmap(16384, p.keyframe_voxel_resolution * 2)
            covs = kf.frame.covs if kf.frame.covs is not None else \
                jnp.zeros(kf.frame.points.shape[:1] + (3, 3), jnp.float32)
            vms.append(vmx.voxelmap_insert(vm, kf.frame.points, kf.frame.mask,
                                           covs, jnp.int32(0)))

        def linearize(x):
            # x: (K, 4, 4) world poses.
            H = jnp.zeros((K * 6, K * 6))
            b = jnp.zeros(K * 6)
            err = 0.0
            for i in range(K):
                for j in range(K):
                    if i == j:
                        continue
                    kf_j = self.keyframes[j]
                    covs_j = kf_j.frame.covs if kf_j.frame.covs is not None else \
                        jnp.zeros(kf_j.frame.points.shape[:1] + (3, 3), jnp.float32)
                    s = gicp.vgicp_linearize(x[i], x[j], kf_j.frame.points,
                                             covs_j, kf_j.frame.mask, vms[i])
                    H = H.at[i * 6:(i + 1) * 6, i * 6:(i + 1) * 6].add(s.H_tt)
                    H = H.at[i * 6:(i + 1) * 6, j * 6:(j + 1) * 6].add(s.H_ts)
                    H = H.at[j * 6:(j + 1) * 6, i * 6:(i + 1) * 6].add(s.H_ts.T)
                    H = H.at[j * 6:(j + 1) * 6, j * 6:(j + 1) * 6].add(s.H_ss)
                    b = b.at[i * 6:(i + 1) * 6].add(s.b_t)
                    b = b.at[j * 6:(j + 1) * 6].add(s.b_s)
                    err = err + s.error
            # Gauge fixing: damp the first pose.
            H = H.at[:6, :6].add(jnp.eye(6) * 1e6)
            return H, b, err

        def retract(x, delta):
            return x @ lie.se3_exp(delta.reshape(K, 6))

        x0 = jnp.asarray(np.stack(poses0), jnp.float32)
        res = solver.lm_optimize(
            jax.jit(linearize), retract, x0,
            solver.TerminationCriteria(max_iterations=p.optimization_iterations),
            callback=lambda st: CB.on_optimization_status(st, None))
        return [np.asarray(T, np.float64) for T in res.x]

    def _create_submap(self) -> None:
        p = self.params
        K = len(self.keyframes)
        if K == 0:
            return
        poses = self._optimize_keyframes()

        center = K // 2
        T_world_origin = poses[center]
        T_origin_world = np.linalg.inv(T_world_origin)

        k_max = p.max_num_keyframes
        C = self.keyframes[0].frame.points.shape[0]
        kf_pts = jnp.zeros((k_max, C, 3), jnp.float32)
        kf_msk = jnp.zeros((k_max, C), bool)
        kf_T = jnp.tile(jnp.eye(4), (k_max, 1, 1))
        kf_valid = np.zeros(k_max, bool)
        for i, kf in enumerate(self.keyframes[:k_max]):
            kf_pts = kf_pts.at[i].set(kf.frame.points)
            kf_msk = kf_msk.at[i].set(kf.frame.mask)
            kf_T = kf_T.at[i].set(jnp.asarray(T_origin_world @ poses[i], jnp.float32))
            kf_valid[i] = True

        out_cap = min(p.submap_point_capacity,
                      int(2 ** np.ceil(np.log2(max(p.submap_target_num_points, 1024)))))
        m_pts, m_mask = _merge_keyframes(kf_pts, kf_msk, kf_T, jnp.asarray(kf_valid),
                                         jnp.float32(p.submap_downsample_resolution),
                                         k_max=k_max, out_cap=out_cap)

        # Endpoints span the FULL frame set (reference: sub_map.hpp endpoint
        # geometry over frames.front()/back()).
        all_frames = self.frames if self.frames else self.keyframes
        T_first = all_frames[0].T_world_sensor()
        T_last = all_frames[-1].T_world_sensor()
        submap = SubMap(
            id=self.submap_count,
            T_world_origin=T_world_origin,
            T_origin_endpoint_L=T_origin_world @ T_first,
            T_origin_endpoint_R=T_origin_world @ T_last,
            frame=PointBatch(points=m_pts, mask=m_mask),
            frames=all_frames,
            odom_frames=self.odom_frames,
        )
        # Refined keyframe poses onto the corresponding stored frames.
        kf_ids = {kf.id: T for kf, T in zip(self.keyframes, poses)}
        for fr in submap.frames:
            if fr.id in kf_ids:
                fr.set_T_world_sensor(kf_ids[fr.id])

        self.submap_count += 1
        self.keyframes = []
        self.frames = []
        self.odom_frames = []
        self._kf_voxelmap = None
        self.submap_queue.append(submap)
        CB.on_new_submap(submap)
        logger.info("submap %d created (%d keyframes)", submap.id, K)


@register_module("sub_mapping", "sub_mapping")
def create_sub_mapping_module(config=None):
    params = SubMappingParams.from_config(config) if config is not None else SubMappingParams()
    return SubMapping(params)
