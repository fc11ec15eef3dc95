"""Lightweight non-optimizing sub-mapping.

Equivalent capability to the reference's ``SubMappingPassthrough``
(reference: src/glim/mapping/sub_mapping_passthrough.cpp:16-156, params from
config/config_sub_mapping_passthrough.json): displacement-gated keyframes
accumulated into one incremental point voxel map; a submap is emitted when
the keyframe count or voxel occupancy budget is hit; submap points come from
the voxel container randomly downsampled to the target.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from glim_tpu.mapping.callbacks import SubMappingCallbacks as CB
from glim_tpu.mapping.sub_mapping_base import SubMappingBase
from glim_tpu.ops import lie_np, pointops
from glim_tpu.ops import voxelmap as vmx
from glim_tpu.types import EstimationFrame, PointBatch, SubMap
from glim_tpu.utils.logging import create_module_logger
from glim_tpu.utils.registry import register_module

logger = create_module_logger("sub")


@dataclass
class SubMappingPassthroughParams:
    keyframe_update_interval_rot: float = 0.01
    keyframe_update_interval_trans: float = 0.1
    max_num_keyframes: int = 50
    max_num_voxels: int = -1
    adaptive_max_num_voxels: float = 2.5
    submap_voxel_resolution: float = 0.5
    min_dist_in_voxel: float = 0.2
    max_num_points_in_voxel: int = 100
    submap_target_num_points: int = 50000
    point_capacity: int = 131072

    @staticmethod
    def from_config(config) -> "SubMappingPassthroughParams":
        p = SubMappingPassthroughParams()
        g = lambda k, d: config.param("sub_mapping", k, d)
        p.keyframe_update_interval_rot = g("keyframe_update_interval_rot", 0.01)
        p.keyframe_update_interval_trans = g("keyframe_update_interval_trans", 0.1)
        p.max_num_keyframes = int(g("max_num_keyframes", 50))
        p.max_num_voxels = int(g("max_num_voxels", -1))
        p.adaptive_max_num_voxels = g("adaptive_max_num_voxels", 2.5)
        p.submap_voxel_resolution = g("submap_voxel_resolution", 0.5)
        p.min_dist_in_voxel = g("min_dist_in_voxel", 0.2)
        p.max_num_points_in_voxel = int(g("max_num_points_in_voxel", 100))
        p.submap_target_num_points = int(g("submap_target_num_points", 50000))
        return p


class SubMappingPassthrough(SubMappingBase):
    def __init__(self, params: Optional[SubMappingPassthroughParams] = None):
        self.params = params or SubMappingPassthroughParams()
        self.submap_count = 0
        self.keyframes: List[EstimationFrame] = []
        self.odom_frames: List[EstimationFrame] = []
        self.submap_queue: List[SubMap] = []
        self._map: Optional[vmx.PointVoxelMap] = None
        # Occupied-voxel count after each keyframe insert; entry [2] is the
        # reference's init_num_voxels for the adaptive emission check
        # (sub_mapping_passthrough.cpp:117-124).
        self._num_voxels_history: List[int] = []
        self._rng = jax.random.PRNGKey(11)
        # Whether every keyframe batch so far carried covariances — if so
        # the emitted submap carries them through (saving the downstream
        # re-estimation the covariance-less path pays), else covs=None and
        # the consumer re-estimates.
        self._covs_complete = True

    def insert_frame(self, frame: EstimationFrame) -> None:
        CB.on_insert_frame(frame)
        p = self.params
        self.odom_frames.append(frame.clone_wo_points())

        if self.keyframes:
            T_last = self.keyframes[-1].T_world_sensor()
            delta = lie_np.se3_log(np.linalg.inv(T_last) @ frame.T_world_sensor())
            if (np.linalg.norm(delta[3:]) < p.keyframe_update_interval_trans
                    and np.linalg.norm(delta[:3]) < p.keyframe_update_interval_rot):
                return

        self._insert_keyframe(frame)
        CB.on_new_keyframe(len(self.keyframes) - 1, frame)

        full = len(self.keyframes) >= p.max_num_keyframes
        if self._map is not None and (p.max_num_voxels > 0
                                      or p.adaptive_max_num_voxels > 0):
            nv = int(self._map.num_points())   # one point per sub-voxel
            self._num_voxels_history.append(nv)
            if p.max_num_voxels > 0:
                full = full or nv >= p.max_num_voxels
            # Adaptive growth budget: emit when the map outgrew the voxel
            # count it had after its third keyframe by the configured factor
            # (reference sub_mapping_passthrough.cpp:117-124,128).
            if (p.adaptive_max_num_voxels > 0
                    and len(self._num_voxels_history) >= 3):
                full = full or nv >= (self._num_voxels_history[2]
                                      * p.adaptive_max_num_voxels)
        if full:
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

    def _insert_keyframe(self, frame: EstimationFrame) -> None:
        p = self.params
        if self._map is None:
            # The per-cell point cap (reference FlatContainer
            # max_num_points_in_cell) maps to a minimum point spacing here:
            # one point per min_dist sub-voxel means a resolution-sized cell
            # holds at most (resolution/min_dist)^3 points, so the cap
            # tightens the effective spacing when it binds.
            min_dist = max(p.min_dist_in_voxel,
                           p.submap_voxel_resolution
                           / max(float(p.max_num_points_in_voxel), 1.0) ** (1 / 3))
            self._map = vmx.empty_point_voxelmap(p.point_capacity, min_dist)
        batch = frame.frame
        if batch is not None and batch.points is not None:
            T = jnp.asarray(frame.T_world_sensor(), jnp.float32)
            w_pts = batch.points @ T[:3, :3].T + T[:3, 3]
            if batch.covs is not None:
                R = T[:3, :3]
                covs = jnp.einsum("ij,njk,lk->nil", R, batch.covs, R)
            else:
                covs = jnp.zeros(batch.points.shape[:1] + (3, 3), jnp.float32)
                self._covs_complete = False
            self._map = vmx.pointmap_insert(self._map, w_pts, batch.mask, covs,
                                            jnp.int32(len(self.keyframes)))
        self.keyframes.append(frame.clone_wo_points())

    def _create_submap(self) -> None:
        p = self.params
        K = len(self.keyframes)
        center = K // 2
        T_world_origin = self.keyframes[center].T_world_sensor()
        T_origin_world = np.linalg.inv(T_world_origin)

        # Submap cloud: map points (world) -> origin frame, random-trim.
        # random_sampling keeps shuffled valid points FIRST, so slicing to
        # the target budget keeps exactly the sample — without the slice the
        # submap would carry the map's full capacity in padding lanes, and
        # every downstream consumer (voxelmap build, covariance
        # re-estimation, match slices) would pay capacity-sized programs.
        self._rng, sub = jax.random.split(self._rng)
        pts, mask, order = pointops.random_sampling(
            self._map.points, self._map.mask, p.submap_target_num_points, sub)
        tgt = min(p.submap_target_num_points, self._map.capacity)
        pts, mask = pts[:tgt], mask[:tgt]
        To = jnp.asarray(T_origin_world, jnp.float32)
        pts_o = pts @ To[:3, :3].T + To[:3, 3]
        covs_o = None
        if self._covs_complete:
            # Covariances accumulated in the map (world frame) ride along,
            # rotated into the origin frame — downstream matching factors
            # need them and re-estimating per insert costs a full kNN pass.
            covs_w = self._map.covs[order[:tgt]]
            Ro = To[:3, :3]
            covs_o = jnp.einsum("ij,njk,lk->nil", Ro, covs_w, Ro)

        submap = SubMap(
            id=self.submap_count,
            T_world_origin=T_world_origin,
            T_origin_endpoint_L=T_origin_world @ self.keyframes[0].T_world_sensor(),
            T_origin_endpoint_R=T_origin_world @ self.keyframes[-1].T_world_sensor(),
            frame=PointBatch(points=pts_o, mask=mask, covs=covs_o),
            frames=self.keyframes,
            odom_frames=self.odom_frames,
        )
        # Creation-time origin (global mapping overwrites T_world_origin in
        # place; frame poses stay in the odometry frame and are re-anchored
        # through this for globally-optimized trajectories).
        submap.custom_data["T_world_origin_pre"] = T_world_origin.copy()
        self.submap_count += 1
        self.keyframes = []
        self.odom_frames = []
        self._map = None
        self._num_voxels_history = []
        self._covs_complete = True
        self.submap_queue.append(submap)
        CB.on_new_submap(submap)
        logger.info("passthrough submap %d created (%d keyframes)", submap.id, K)


@register_module("sub_mapping", "sub_mapping_passthrough")
def create_sub_mapping_passthrough_module(config=None):
    params = (SubMappingPassthroughParams.from_config(config)
              if config is not None else SubMappingPassthroughParams())
    return SubMappingPassthrough(params)
