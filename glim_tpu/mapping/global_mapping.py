"""Matching-cost global mapping: registration-error minimization over submaps.

Equivalent capability to the reference's ``GlobalMapping``
(reference: src/glim/mapping/global_mapping.cpp:127-1049, params from
config/config_global_mapping_{cpu,gpu}.json): submaps enter with
odometry-chained initial poses; every submap within
``max_implicit_loop_distance`` whose overlap exceeds
``min_implicit_loop_overlap`` gets a VGICP matching-cost factor (implicit
loop closure), plus optional GICP-refined odometry between factors
(:379-428), an isolation-prevention factor for unconnected neighbors, and
IMU factors over submap endpoints (:168-219).

iSAM2 is replaced by batched damped-GN over all submap poses
(mapping/global_factors.py): matching factors live in stacked padded
arrays with CACHED correspondences — the voxel lookups are refreshed only
for factors whose relative pose moved since their last search (iSAM2's
relinearization threshold, applied per factor), and the per-iteration
relinearization is one vmapped device program whose factor axis is also
the multi-chip shard axis. Indeterminant-system recovery damps exactly the
offending poses, identified from the final Hessian's diagonal rank check
(reference :492-544). Save/load & multi-session merge live in
glim_tpu.io.dump.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from glim_tpu.mapping.callbacks import GlobalMappingCallbacks as CB
from glim_tpu.mapping.global_factors import (bucket, global_gn, pad_stack,
                                             pad_stack_tree)
from glim_tpu.mapping.global_mapping_base import GlobalMappingBase
from glim_tpu.ops import gicp, lie, lie_np, solver
from glim_tpu.ops import voxelmap as vmx
from glim_tpu.types import SubMap
from glim_tpu.utils.logging import create_module_logger
from glim_tpu.utils.registry import register_module

logger = create_module_logger("global")

GRAVITY = np.array([0.0, 0.0, -9.80665], np.float32)


@dataclass
class GlobalMappingParams:
    enable_imu: bool = True
    enable_optimization: bool = True
    init_pose_damping_scale: float = 1e10
    create_between_factors: bool = False
    between_registration_type: str = "GICP"      # GICP | NONE
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
    matching_points: int = 4096        # per-factor source-cloud budget
    optimization_interval_submaps: int = 1   # sync-path gating
    # Correspondence-refresh thresholds: a factor whose relative pose moved
    # further than this since its last voxel search gets re-searched. These
    # are the CONVERGENCE FLOOR of loop closure — corrections smaller than
    # the threshold leave correspondences biased by up to the same amount
    # (half a voxel at 0.4 m), so they must sit well under the voxel
    # resolution, not at it.
    relinearize_trans: float = 0.04
    relinearize_rot: float = 0.01
    # Shard the matching-factor axis of global_gn over the device mesh when
    # more than one accelerator is attached (the always-on analogue of the
    # reference's CUDA-stream fan-out, odometry_estimation_gpu.cpp:139-147).
    use_device_mesh: bool = True
    # Warm the next padding bucket's programs on a background thread so the
    # live pipeline never blocks on an XLA compile (the reference's iSAM2
    # increments never stall; global_mapping.cpp:492-544). None -> resolve
    # from GLIM_TPU_PRECOMPILE env (default on).
    enable_precompile: Optional[bool] = None
    # Subsampling stride for the candidate-overlap GATE (the dominant cost
    # of every submap insert at scale, 233-295 ms of ~300 ms measured on
    # chip): the overlap fraction only feeds a >= 0.05-0.2 threshold, and
    # a 1-in-4 sample estimates it to ~±2%. 1 = exact.
    overlap_gate_stride: int = 4
    # Per-insert budget on implicit-loop candidates (nearest-K by center
    # distance; the odometry neighbor always survives). Bounds the insert
    # cost as the map densifies; <= 0 = unbounded (reference behavior).
    max_implicit_loop_candidates: int = 64

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
        p.optimization_interval_submaps = int(g("optimization_interval_submaps", 1))
        p.use_device_mesh = bool(g("use_device_mesh", True))
        ep = g("enable_precompile", None)
        if ep is not None:
            p.enable_precompile = bool(ep)
        p.overlap_gate_stride = int(g("overlap_gate_stride", 4))
        p.max_implicit_loop_candidates = int(
            g("max_implicit_loop_candidates", 64))
        return p


class GlobalMapping(GlobalMappingBase):
    def __init__(self, params: Optional[GlobalMappingParams] = None):
        self.params = params or GlobalMappingParams()
        # Factor-type selection (reference :455-471): VGICP and VGICP_GPU
        # are the two supported values; on TPU both run the same fused
        # voxelized-GICP kernel (the _GPU suffix selects the CUDA build in
        # the reference — the accelerated path is the only path here).
        ft = self.params.registration_error_factor_type.upper()
        if ft not in ("VGICP", "VGICP_GPU"):
            logger.warning("unknown registration_error_factor_type (%s); "
                           "using VGICP", ft)
            self.params.registration_error_factor_type = "VGICP"
        self.submaps: List[SubMap] = []
        self.poses: List[np.ndarray] = []
        self.odom_poses: List[np.ndarray] = []
        # Per-submap multi-resolution maps: voxelmaps[i][lvl], [0] finest.
        self.voxelmaps: List[list] = []
        # Per-submap matching clouds (budgeted stride sample, device).
        self._m_pts: List = []
        self._m_covs: List = []
        self._m_mask: List = []
        # Matching-cost factors with cached correspondences, keyed by the
        # (target, source) pair so external edits to matching_factors (tests,
        # recover tooling) can never desynchronize the cache.
        self.matching_factors: List[Tuple[int, int]] = []
        # Per-pair staleness anchor: the relative pose the correspondences
        # were last searched at. The searched rows themselves live ONLY in
        # the match stack (or briefly in _pending_rows) — an earlier design
        # kept per-pair references into each search round's stacked output,
        # which pinned tens of MB of device memory per surviving round over
        # long sessions.
        self._f_cache: dict = {}           # (tgt, src) -> {"T_rel"}
        # Searched rows that could not be scattered into the live match
        # stack (stack absent, or a padding-bucket crossing is pending);
        # consumed — newest first — by the next _match_stacks call, then
        # dropped. Bounded by one optimize cycle's search rounds.
        self._pending_rows: List[tuple] = []
        # Between factors: (i, j, Z (4,4), info (6,6)).
        self.between_factors: List[Tuple[int, int, np.ndarray, np.ndarray]] = []
        # IMU endpoint-chain factors (reference :168-219).
        self.imu_factors: List[dict] = []
        self.junction_states: List[np.ndarray] = []   # (12,) [v_R, v_L, bias]
        self._imu_buffer: List[np.ndarray] = []
        # Indeterminant-system recovery: submap index -> damping scale.
        self.recovery_damping: dict = {}
        # Gravity-alignment anchors: first submap of each appended session.
        self.gravity_anchors: List[int] = []
        # External translation priors [(submap_idx, pos_world (3,),
        # sqrt_info (3,))] — GNSS-style position constraints injected by
        # extension modules (glim_ext gnss_global analogue).
        self.translation_priors: List[tuple] = []
        self._new_loop_since_opt = False
        self._last_opt_count = 0
        # When True, insert_submap skips its in-line optimize (the async
        # wrapper / end-of-sequence drain set this around submap BURSTS so
        # a backlog of N submaps costs ONE solve instead of N).
        self.defer_optimization = False
        # Runtime toggle for implicit-loop candidate search (the reference
        # UI can enable/disable modules live, standard_viewer_ui.cpp);
        # flipped by the command channel's {"cmd": "set_enabled",
        # "target": "loop_detection"}.
        self.loop_search_enabled = True
        # Factor-axis device mesh: when more than one chip is attached, the
        # matching-factor linearization in global_gn shard_maps over it by
        # default — no caller plumbing required (the reference's GPU fan-out
        # is equally always-on). Power-of-two device count so every padded
        # factor bucket (all powers of two >= 8) divides evenly.
        # Incrementally-maintained padded device stacks for optimize():
        # rebuilding the (Sp, M, 12) submap-cloud and (Fp, M, 13)
        # correspondence stacks from scratch on every solve dominates
        # optimize wall once the map grows; appends and refreshed rows are
        # written in place with .at[row].set instead.
        self._sm_stack = None
        self._match_stack = None
        self._match_dirty: set = set()
        # Stacked per-level voxelmap lookup tables (keys/stats/res with a
        # leading submap axis) for the batched correspondence refresh and
        # overlap sweeps — ONE device program per refresh round instead of
        # one dispatch per factor (each costs a tunnel round-trip).
        self._lk_stack = None
        self._mesh = None
        if self.params.use_device_mesh:
            import jax
            n = len(jax.devices())
            if n > 1:
                from glim_tpu.parallel.sharded import make_mesh
                n2 = 1 << (n.bit_length() - 1)
                self._mesh = make_mesh(min(n2, 8), axis="factors")
                logger.info("global_gn matching factors sharded over %d "
                            "devices", self._mesh.size)
        # Background bucket precompilation (mapping/precompile.py): the
        # worker is process-wide (the jit cache is too); per-instance we
        # keep hit/miss/wait accounting for the stress tools and tests.
        ep = self.params.enable_precompile
        if ep is None:
            import os
            ep = os.environ.get("GLIM_TPU_PRECOMPILE", "1") not in ("0", "false")
        self.precompiler = None
        if ep:
            from glim_tpu.mapping.precompile import get_precompiler
            self.precompiler = get_precompiler()
        self.precompile_stats = {"hits": 0, "misses": 0, "waits": 0,
                                 "wait_s": 0.0}
        self._rp_seen: set = {8}

    # -- insertion --

    def insert_imu(self, stamp, linear_acc, angular_vel) -> None:
        CB.on_insert_imu(stamp, linear_acc, angular_vel)
        if self.params.enable_imu:
            self._imu_buffer.append(np.concatenate([[stamp], linear_acc,
                                                    angular_vel]))

    def insert_submap(self, submap: SubMap) -> None:
        from glim_tpu.utils.profiling import profile_scope
        with profile_scope("global/insert_submap"):
            self._insert_submap_impl(submap)

    def _ensure_covs(self, submap: SubMap) -> None:
        """Guarantee the submap frame carries per-point covariances — the
        matching-cost factors are Mahalanobis-weighted and degenerate to
        no-ops with zero covs. Submaps from the full SubMapping arrive with
        merged covs; passthrough submaps and dumps loaded without covariance
        payloads get them re-estimated here (the reference re-estimates
        covariances on load when missing/corrupt, sub_map.cpp:149-199)."""
        if submap.frame.covs is not None:
            return
        from glim_tpu.ops import covariance as cov_ops
        from glim_tpu.ops import knn
        nbr, _ = knn.knn_banded(submap.frame.points, submap.frame.mask, 10)
        covs, _ = cov_ops.estimate_covariances(submap.frame.points,
                                               submap.frame.mask, nbr, "plane")
        submap.frame.covs = covs

    def _insert_submap_impl(self, submap: SubMap) -> None:
        from glim_tpu.utils.profiling import profile_scope
        CB.on_insert_submap(submap)
        with profile_scope("global/ins.covs"):
            self._ensure_covs(submap)
        p = self.params
        i = len(self.submaps)
        T_odom = np.asarray(submap.T_world_origin, np.float64)

        if i == 0:
            T_est = T_odom
        else:
            dZ = np.linalg.inv(self.odom_poses[-1]) @ T_odom
            T_est = self.poses[-1] @ dZ

        self.submaps.append(submap)
        self.odom_poses.append(T_odom)
        self.poses.append(T_est)
        with profile_scope("global/ins.voxelmap"):
            self.voxelmaps.append(self._build_voxelmap(submap))
        self._append_match_slice(submap)

        # Optional odometry between factor, GICP-refined (reference
        # :379-428: create_between_factors + between_registration_type).
        if i > 0 and p.create_between_factors:
            dZ = np.linalg.inv(self.odom_poses[i - 1]) @ self.odom_poses[i]
            if p.between_registration_type.upper() == "GICP":
                with profile_scope("global/ins.between_gicp"):
                    dZ, info = self._gicp_refine_between(i - 1, i, dZ)
            else:
                info = np.eye(6) * 1e2
            self.between_factors.append((i - 1, i, dZ, info))

        with profile_scope("global/ins.matching_factors"):
            self._create_matching_cost_factors(i)
        if p.enable_imu and i > 0:
            with profile_scope("global/ins.imu_factor"):
                self._create_imu_factor(i - 1, i)
        # Sync-path gating: optimize when a loop appeared or on the interval
        # (the async wrapper additionally runs periodic idle optimization).
        due = (i + 1 - self._last_opt_count) >= p.optimization_interval_submaps
        if p.enable_optimization and not self.defer_optimization \
                and (self._new_loop_since_opt or due):
            self.optimize()
        self._precompile_tick()

    def _append_match_slice(self, submap: SubMap) -> None:
        """Budgeted source-cloud slice for matching factors. The reference
        subsamples each submap at ``randomsampling_rate`` before factor
        creation (:245-257); here the rate composes with the fixed
        ``matching_points`` device budget."""
        C = int(submap.frame.points.shape[0])
        p = self.params
        budget = p.matching_points
        if p.randomsampling_rate <= 0.99:
            budget = min(budget, max(64, int(C * p.randomsampling_rate)))
        stride = max(1, -(-C // budget))   # ceil: stay within the budget
        pts = submap.frame.points[::stride]
        covs = submap.frame.covs
        if covs is None:
            covs = jnp.zeros(submap.frame.points.shape[:1] + (3, 3), jnp.float32)
        self._m_pts.append(pts)
        self._m_covs.append(covs[::stride])
        self._m_mask.append(submap.frame.mask[::stride])

    def _gicp_refine_between(self, i: int, j: int, dZ: np.ndarray):
        """Refine the odometry delta by GICP between the two submap clouds
        and derive the information from the converged Hessian (reference
        :379-428)."""
        T_i = jnp.eye(4)
        T_j = jnp.asarray(dZ, jnp.float32)
        for _ in range(5):
            s = gicp.gicp_linearize(T_i, T_j, self._m_pts[j], self._m_covs[j],
                                    self._m_mask[j], self._m_pts[i],
                                    self._m_covs[i], self._m_mask[i],
                                    jnp.float32(2.0))
            delta = solver.solve_damped(s.H_ss, s.b_s, jnp.float32(1e-4))
            T_j = T_j @ lie.se3_exp(delta)
        s = gicp.gicp_linearize(T_i, T_j, self._m_pts[j], self._m_covs[j],
                                self._m_mask[j], self._m_pts[i],
                                self._m_covs[i], self._m_mask[i],
                                jnp.float32(2.0))
        H = np.asarray(s.H_ss, np.float64)
        n_in = int(np.asarray(s.num_inliers))
        dZ_ref = np.asarray(T_j, np.float64)
        if n_in < 100 or not np.all(np.isfinite(H)):
            return dZ, np.eye(6) * 1e2
        # Guard: keep the refinement within sanity of the odometry delta.
        d = lie_np.se3_log(np.linalg.inv(dZ) @ dZ_ref)
        if np.linalg.norm(d[3:]) > 1.0 or np.linalg.norm(d[:3]) > 0.3:
            return dZ, np.eye(6) * 1e2
        return _orthonormalize(dZ_ref), H + np.eye(6) * 1e-3

    def _create_imu_factor(self, i: int, j: int) -> None:
        """Preintegrate the IMU between submap i's right and submap j's left
        endpoint and add the endpoint-chain factor (reference :168-219)."""
        sm_i, sm_j = self.submaps[i], self.submaps[j]
        if not (sm_i.frames and sm_j.frames):
            return
        fr_R = sm_i.frames[-1]
        fr_L = sm_j.frames[0]
        t0, t1 = fr_R.stamp, fr_L.stamp
        rows = np.stack([r for r in self._imu_buffer if t0 < r[0] <= t1 + 1e-9]) \
            if self._imu_buffer else np.zeros((0, 7))
        self._imu_buffer = [r for r in self._imu_buffer if r[0] > t0 - 1.0]
        if len(rows) < 2 or (t1 - t0) > 5.0:
            return
        from glim_tpu.common.imu_integration import IMUIntegration
        integ = IMUIntegration()
        for r in rows:
            integ.insert_imu(r[0], r[1:4], r[4:7])
        bias0 = np.asarray(fr_R.imu_bias, np.float64)
        pre, n = integ.integrate_imu(t0, t1, bias0)
        if n < 2:
            return
        A_R = np.linalg.inv(np.asarray(sm_i.T_world_origin)) @ fr_R.T_world_imu
        A_L = np.linalg.inv(np.asarray(sm_j.T_world_origin)) @ fr_L.T_world_imu
        self.imu_factors.append(dict(i=i, j=j, pre=pre,
                                     A_R=A_R.astype(np.float32),
                                     A_L=A_L.astype(np.float32),
                                     junction=len(self.junction_states)))
        v0 = np.asarray(fr_R.v_world_imu, np.float64)
        v1 = np.asarray(fr_L.v_world_imu, np.float64)
        self.junction_states.append(np.concatenate([v0, v1, bias0]))
        logger.info("IMU endpoint factor %d -> %d (%d samples, dt %.2fs)",
                    i, j, n, t1 - t0)

    def _build_voxelmap(self, submap: SubMap) -> list:
        """Multi-resolution Gaussian voxelmaps for one submap: level L at
        base_resolution * scaling_factor^L (reference :234-283 builds
        ``submap_voxelmap_levels`` maps per submap; each level contributes
        its own matching-cost factor — coarse levels widen the implicit
        loop factors' convergence basin). Index 0 (finest) is the overlap /
        gating map."""
        p = self.params
        # Adaptive resolution from median point distance (reference :234-283).
        # Stays a DEVICE scalar end-to-end: voxelmap resolution is traced, so
        # fetching it to host would only stall the insert behind every
        # in-flight window program on the shared device queue (~20-100 ms
        # measured on the tunneled chip).
        from glim_tpu.ops.pointops import median_distance
        med = median_distance(submap.frame.points, submap.frame.mask)
        t = jnp.clip((med - p.submap_voxel_resolution_dmin) /
                     max(p.submap_voxel_resolution_dmax
                         - p.submap_voxel_resolution_dmin, 1e-6), 0.0, 1.0)
        res = p.submap_voxel_resolution + t * (p.submap_voxel_resolution_max
                                               - p.submap_voxel_resolution)
        covs = submap.frame.covs
        if covs is None:
            covs = jnp.zeros(submap.frame.points.shape[:1] + (3, 3), jnp.float32)
        maps = []
        for lvl in range(max(p.submap_voxelmap_levels, 1)):
            cap = max(p.voxel_capacity >> lvl, 4096)
            vm = vmx.empty_gaussian_voxelmap(
                cap, res * (p.submap_voxelmap_scaling_factor ** lvl))
            maps.append(vmx.voxelmap_insert(vm, submap.frame.points,
                                            submap.frame.mask, covs,
                                            jnp.int32(0)))
        return maps

    def add_translation_prior(self, submap_idx: int, position,
                              sqrt_info) -> None:
        """External position constraint on a submap pose (GNSS-style;
        glim_ext gnss_global analogue). ``sqrt_info`` is a scalar or (3,)
        square-root information [1/m]. Thread-safe under the async
        wrapper's task queue; triggers an optimize on the next cycle."""
        si = np.asarray(sqrt_info, np.float32)
        if si.ndim == 0:
            si = np.full(3, float(si), np.float32)
        self.translation_priors.append((int(submap_idx),
                                        np.asarray(position, np.float32),
                                        si))
        self._new_loop_since_opt = True

    def add_matching_factor(self, tgt: int, src: int) -> None:
        """External loop-closure pair (e.g. from an explicit loop detector
        extension): registers a matching-cost factor between two existing
        submaps with a fresh correspondence search."""
        if not (0 <= tgt < len(self.submaps) and 0 <= src < len(self.submaps)):
            raise IndexError("submap index out of range")
        if tgt == src or (tgt, src) in self.matching_factors \
                or (src, tgt) in self.matching_factors:
            return
        self._register_matching_factor(tgt, src)

    def add_between_factor(self, tgt: int, src: int, T_tgt_src: np.ndarray,
                           info=None) -> None:
        """Manual between-factor injection with an explicit relative-pose
        measurement (the InteractiveViewer correction workflow; reference
        manual_loop_close_modal.cpp:522-574 injects a BetweenFactor with
        information = scale * GICP Hessian)."""
        if not (0 <= tgt < len(self.submaps) and 0 <= src < len(self.submaps)):
            raise IndexError("submap index out of range")
        if info is None:
            info = np.eye(6) * 1e4
        info = np.asarray(info, np.float64)
        if info.ndim == 0:
            info = np.eye(6) * float(info)
        self.between_factors.append((int(tgt), int(src),
                                     np.asarray(T_tgt_src, np.float64),
                                     info))
        self._new_loop_since_opt = True

    # -- matching factors (cached correspondences) --

    def _register_matching_factor(self, tgt: int, src: int) -> None:
        self._register_matching_factors_batch([(tgt, src)])

    def _register_matching_factors_batch(self, pairs: list) -> None:
        """Register several matching-cost factors with ONE stacked
        correspondence search per voxelmap level (per-pair searches each
        pay a device dispatch; an insert typically registers 2-6 factors,
        a recover sweep dozens)."""
        if not pairs:
            return
        fis = list(range(len(self.matching_factors),
                         len(self.matching_factors) + len(pairs)))
        self.matching_factors.extend(pairs)
        self._batch_lookup_factors(pairs, fis)
        for tgt, src in pairs:
            if tgt != src - 1:
                self._new_loop_since_opt = True

    def _lookup_rows(self, pairs: list, L: int) -> list:
        """Stacked correspondence search for (tgt, src) pairs: ONE device
        program per voxelmap level (reference :455-470 creates one VGICP
        factor per level). Returns one (mu, ct, hit) triple per level,
        each stacked over the bucketized pair axis."""
        Sp = bucket(len(self.submaps))
        M = int(self._m_pts[0].shape[0])
        sm_pts, _ = self._sm_stacks(Sp, M)
        sm_mask = self._sm_stack["mask"]
        lk = self._lk_stacks(Sp)
        poses_dev = pad_stack([np.asarray(T, np.float32)
                               for T in self.poses], Sp,
                              np.eye(4, dtype=np.float32))
        R = len(pairs)
        Rp = bucket(R)
        self._rp_seen.add(Rp)
        tgt = jnp.asarray(np.array([t for t, _ in pairs]
                                   + [0] * (Rp - R), np.int32))
        src = jnp.asarray(np.array([s for _, s in pairs]
                                   + [0] * (Rp - R), np.int32))
        return [gicp.vgicp_lookup_stacked(poses_dev, tgt, src, sm_pts,
                                          sm_mask, lk[lvl]["keys"],
                                          lk[lvl]["stats"], lk[lvl]["res"])
                for lvl in range(L)]

    def _refresh_stale_factors(self) -> int:
        """Re-search correspondences for factors whose relative pose moved
        beyond the relinearization threshold (iSAM2-style lazy relin).
        Staleness is detected on host (cheap 4x4 algebra); the re-searches
        themselves run as ONE stacked device program per level — after a
        loop closure moves the whole map, MOST factors are stale, and
        per-factor dispatches cost a tunnel round-trip each."""
        p = self.params
        stale = []
        for fi, (tgt, src) in enumerate(self.matching_factors):
            cache = self._f_cache.get((tgt, src))
            if cache is None:
                stale.append(fi)
                continue
            T_rel = np.linalg.inv(self.poses[tgt]) @ self.poses[src]
            d = lie_np.se3_log(np.linalg.inv(cache["T_rel"]) @ T_rel)
            if (np.linalg.norm(d[3:]) > p.relinearize_trans
                    or np.linalg.norm(d[:3]) > p.relinearize_rot):
                stale.append(fi)
        if stale:
            self._batch_lookup_factors(
                [self.matching_factors[fi] for fi in stale], stale)
        return len(stale)

    def _batch_lookup_factors(self, pairs: list, fis: list) -> None:
        """Correspondence search for every (tgt, src) pair as ONE stacked
        device program per voxelmap level, then ONE batched scatter per
        match-stack leaf (the per-factor path dispatched L lookup programs
        per factor plus 3L .at[row].set writes — thousands of round-trips
        per refresh round at 128 submaps / 621 factors).

        The per-pair cache records only the search-time relative pose (the
        staleness anchor); the searched rows go straight into the live
        match stack, or — when the stack is absent / a padding-bucket
        crossing is pending — into the short-lived _pending_rows buffer
        the next _match_stacks call drains. Nothing pins a search round's
        stacked output beyond one optimize cycle."""
        if not pairs:
            return
        p = self.params
        L = max(p.submap_voxelmap_levels, 1)
        outs = self._lookup_rows(pairs, L)
        for pair in pairs:
            T_rel = np.linalg.inv(self.poses[pair[0]]) @ self.poses[pair[1]]
            self._f_cache[pair] = dict(T_rel=T_rel)
        for fi in fis:
            self._match_dirty.add(fi)

        st = self._match_stack
        key = tuple(self.matching_factors)
        # The len(key) guard keeps the fast path from extending st["key"]
        # past the stack's capacity when earlier appends were deferred to
        # the grow path (a bucket crossing is pending): the grow path sizes
        # its copy from len(st["key"]) and would otherwise read past Fp.
        if (st is None or st["L"] != L
                or st["key"] != key[:len(st["key"])]
                or len(key) * L > st["Fp"]
                or max(fis) * L + L > st["Fp"]):
            self._pending_rows.append((list(fis), outs))
            return      # _match_stacks grow/rebuild path consumes the rows
        self._scatter_rows(st, outs, fis)
        st["key"] = key
        for fi in fis:
            self._match_dirty.discard(fi)

    @staticmethod
    def _scatter_rows(st: dict, outs: list, fis: list) -> None:
        """Write freshly searched factor rows straight into the live match
        stack, one scatter per leaf. Rows are padded with an out-of-range
        index and written mode="drop" so the padded garbage rows (their
        lookups ran against submap 0) never land anywhere; a negative fi
        likewise drops that row (used when only a subset of a pending batch
        is still wanted)."""
        L = st["L"]
        Rp = int(outs[0][0].shape[0])
        R = len(fis)
        rows_np = np.full((L, Rp), st["Fp"], np.int32)
        fis_np = np.asarray(fis, np.int32)
        for lvl in range(L):
            rows_np[lvl, :R] = np.where(fis_np >= 0, fis_np * L + lvl,
                                        st["Fp"])
        rows = jnp.asarray(rows_np.reshape(-1))
        st["f_mu"] = st["f_mu"].at[rows].set(
            jnp.concatenate([o[0] for o in outs]), mode="drop")
        st["f_ct"] = st["f_ct"].at[rows].set(
            jnp.concatenate([o[1] for o in outs]), mode="drop")
        st["f_hit"] = st["f_hit"].at[rows].set(
            jnp.concatenate([o[2] for o in outs]), mode="drop")

    def _batch_overlaps(self, pairs: list) -> np.ndarray:
        """Overlap fraction of submap src against submap tgt's finest
        voxelmap for every (tgt, src) pair: one stacked device program +
        one fetch (per-candidate dispatches each pay a tunnel round-trip,
        and per-candidate fetches each drain the device queue)."""
        Sp = bucket(len(self.submaps))
        M = int(self._m_pts[0].shape[0])
        self._sm_stacks(Sp, M)
        sm_pts, sm_mask = self._sm_stack["pts"], self._sm_stack["mask"]
        lk0 = self._lk_stacks(Sp)[0]
        R = len(pairs)
        Rp = bucket(R)
        self._rp_seen.add(Rp)
        T_rel = np.stack([np.linalg.inv(self.poses[t]) @ self.poses[s]
                          for t, s in pairs]
                         + [np.eye(4)] * (Rp - R)).astype(np.float32)
        tgt = jnp.asarray(np.array([t for t, _ in pairs]
                                   + [0] * (Rp - R), np.int32))
        src = jnp.asarray(np.array([s for _, s in pairs]
                                   + [0] * (Rp - R), np.int32))
        ovs = vmx.voxelmap_overlap_stacked(jnp.asarray(T_rel), tgt, src,
                                           sm_pts, sm_mask, lk0["keys"],
                                           lk0["res"],
                                           stride=self.params.overlap_gate_stride)
        return np.asarray(ovs)[:R]

    def _create_matching_cost_factors(self, i: int) -> None:
        """Implicit loop closure: factors to all overlapping nearby submaps
        (reference :430-484). All distance-gated candidates' overlap
        programs are dispatched together and fetched with ONE stacked copy
        — per-candidate blocking fetches would each pay the device-queue
        drain (~tunnel roundtrip) on remoted chips."""
        p = self.params
        pi = self.poses[i][:3, 3]
        connected = False
        # One vectorized distance gate over all prior submap centers (the
        # reference fast-forwards candidates by travel distance,
        # global_mapping_pose_graph.cpp:307-323; a host-side vector norm
        # keeps this O(1) numpy dispatches regardless of map size).
        if i:
            centers = np.stack([T[:3, 3] for T in self.poses[:i]])
            d = np.linalg.norm(centers - pi, axis=1)
            cands = [int(j) for j in
                     np.where(d <= p.max_implicit_loop_distance)[0]]
            if len(cands) > p.max_implicit_loop_candidates > 0:
                # Candidate BUDGET: the fixed search radius sweeps ever
                # more pairs as the map densifies (855 ms/insert measured
                # at 256 submaps on the stress ring, all in this sweep +
                # the resulting searches) — keep the nearest K by center
                # distance, plus the odometry neighbor unconditionally.
                # The reference sweeps its whole 100 m radius every insert
                # (global_mapping.cpp:430-484) and scales accordingly.
                order = sorted(cands, key=lambda j: d[j])
                cands = sorted(set(order[:p.max_implicit_loop_candidates])
                               | {i - 1})
            if not self.loop_search_enabled:
                # Runtime toggle (reference standard_viewer_ui module
                # enable/disable): keep only the odometry-neighbor factor
                # so the graph stays chained while loop search is off.
                cands = [j for j in cands if j == i - 1]
        else:
            cands = []
        if cands:
            ovs = self._batch_overlaps([(j, i) for j in cands])
            keep = [(j, ov) for j, ov in zip(cands, ovs)
                    if ov >= p.min_implicit_loop_overlap]
            self._register_matching_factors_batch([(j, i) for j, _ in keep])
            for j, ov in keep:
                connected = True
                if j != i - 1:
                    logger.info("implicit loop factor %d <-> %d "
                                "(overlap %.2f)", j, i, ov)
        if not connected and i > 0:
            # Isolation prevention (reference :475-481).
            dZ = np.linalg.inv(self.odom_poses[i - 1]) @ self.odom_poses[i]
            self.between_factors.append((i - 1, i, dZ, np.eye(6) * 100.0))
            logger.warning("submap %d isolated; added between factor", i)

    # -- optimization --

    def _sm_stacks(self, Sp: int, M: int):
        """Padded (Sp, M, 3)/(Sp, M, 3, 3) submap-cloud stacks, maintained
        incrementally — submap slices are append-only, so after the first
        build only new rows are written (one .at[i].set dispatch each)."""
        S = len(self._m_pts)
        st = self._sm_stack
        if st is None or st["Sp"] != Sp:
            st = dict(Sp=Sp, n=S,
                      pts=pad_stack(self._m_pts, Sp,
                                    np.zeros((M, 3), np.float32)),
                      covs=pad_stack(self._m_covs, Sp,
                                     np.zeros((M, 3, 3), np.float32)),
                      mask=pad_stack(self._m_mask, Sp,
                                     np.zeros((M,), bool)))
        else:
            for i in range(st["n"], S):
                st["pts"] = st["pts"].at[i].set(self._m_pts[i])
                st["covs"] = st["covs"].at[i].set(self._m_covs[i])
                st["mask"] = st["mask"].at[i].set(self._m_mask[i])
            st["n"] = S
        self._sm_stack = st
        return st["pts"], st["covs"]

    def _lk_stacks(self, Sp: int) -> list:
        """Per-level stacked voxelmap lookup tables, maintained
        incrementally like _sm_stacks (voxelmaps are append-only). Each
        level holds keys (Sp, V_lvl, 2), stats (Sp, V_lvl, 12) and the
        per-submap adaptive resolution (Sp,) — the payload
        vgicp_lookup_stacked / voxelmap_overlap_stacked search against."""
        p = self.params
        L = max(p.submap_voxelmap_levels, 1)
        S = len(self.voxelmaps)
        st = self._lk_stack
        if st is None or st["Sp"] != Sp or len(st["levels"]) != L:
            levels = []
            for lvl in range(L):
                tabs = [vmx.gaussian_lookup_table(vms[lvl])
                        for vms in self.voxelmaps]
                V = self.voxelmaps[0][lvl].capacity
                levels.append(dict(
                    keys=pad_stack([k for k, _ in tabs], Sp,
                                   np.full((V, 2), vmx.INVALID_HASH,
                                           np.int32)),
                    stats=pad_stack([s for _, s in tabs], Sp,
                                    np.zeros((V, 12), np.float32)),
                    res=pad_stack([vms[lvl].resolution
                                   for vms in self.voxelmaps], Sp,
                                  np.float32(1.0))))
            st = dict(Sp=Sp, n=S, levels=levels)
        else:
            for i in range(st["n"], S):
                for lvl in range(L):
                    k, s = vmx.gaussian_lookup_table(self.voxelmaps[i][lvl])
                    d = st["levels"][lvl]
                    d["keys"] = d["keys"].at[i].set(k)
                    d["stats"] = d["stats"].at[i].set(s)
                    d["res"] = d["res"].at[i].set(
                        self.voxelmaps[i][lvl].resolution)
            st["n"] = S
        self._lk_stack = st
        return st["levels"]

    def _match_stacks(self, Fp: int, L: int, M: int):
        """Padded correspondence stacks (f_mu/f_ct/f_hit), maintained
        incrementally: appends and refreshes scatter exactly the dirty
        rows, a bucket crossing copies the old rows into fresh padding
        (one device set per leaf), and only a break of the append-only
        key prefix (recover tooling, tests) forces a rebuild. Rebuild rows
        come from the _pending_rows buffer when already searched, else from
        ONE batched re-search over all missing pairs (a per-row search loop
        here would re-create the dispatch storm this cache exists to kill).
        Keyed by the factor-pair tuple so external edits to
        matching_factors are detected."""
        key = tuple(self.matching_factors)
        zero_mu = np.zeros((M, 3), np.float32)
        zero_ct = np.zeros((M, 3, 3), np.float32)
        zero_hit = np.zeros((M,), bool)

        st = self._match_stack
        if st is not None and (st["L"] != L
                               or st["key"] != key[:len(st["key"])]):
            st = None
        if st is not None and st["Fp"] != Fp:
            n_old = len(st["key"]) * L
            if n_old > Fp:
                st = None
            else:
                # Bucket crossing: copy the live rows into fresh padding —
                # byte-identical to the rows the scatter fast path wrote,
                # no re-search of the whole map.
                def _grow(a, zero):
                    out = jnp.tile(jnp.asarray(zero)[None],
                                   (Fp,) + (1,) * zero.ndim)
                    return out.at[:n_old].set(a[:n_old]) if n_old else out
                st = dict(Fp=Fp, L=L, key=st["key"],
                          f_mu=_grow(st["f_mu"], zero_mu),
                          f_ct=_grow(st["f_ct"], zero_ct),
                          f_hit=_grow(st["f_hit"], zero_hit))
        if st is None:
            st = dict(Fp=Fp, L=L, key=(),
                      f_mu=pad_stack([], Fp, zero_mu),
                      f_ct=pad_stack([], Fp, zero_ct),
                      f_hit=pad_stack([], Fp, zero_hit))
            self._match_dirty = set(range(len(key)))
        todo = ((set(self._match_dirty)
                 | set(range(len(st["key"]), len(key))))
                & set(range(len(key))))
        # Drain searched-but-unscattered rows, NEWEST first so a pair that
        # was appended and then refreshed within one cycle lands its fresh
        # correspondences (older duplicates are dropped via fi = -1).
        for fis, outs in reversed(self._pending_rows):
            use = [fi if (fi in todo and fi * L + L <= Fp) else -1
                   for fi in fis]
            if any(fi >= 0 for fi in use):
                self._scatter_rows(st, outs, use)
                todo -= {fi for fi in use if fi >= 0}
        self._pending_rows = []
        rest = sorted(todo)
        if rest:
            pairs = [key[i] for i in rest]
            outs = self._lookup_rows(pairs, L)
            for pair in pairs:
                self._f_cache[pair] = dict(
                    T_rel=np.linalg.inv(self.poses[pair[0]])
                    @ self.poses[pair[1]])
            self._scatter_rows(st, outs, rest)
        st["key"] = key
        self._match_dirty.clear()
        self._match_stack = st
        return st["f_mu"], st["f_ct"], st["f_hit"]

    def _padded_args(self):
        """Assemble the padded stacked arrays for global_gn.

        Device buffers are CACHED between calls, keyed per section by what
        can actually change it (factor lists are append-only; the recover
        path replaces the list object, changing its id). Only the pose /
        junction values re-upload every round — on the tunneled chip each
        H2D upload is a round-trip, and the uncached assembly's ~20 uploads
        measured ~0.5-1.0 s per optimize round (opt.args scope), more than
        the GN dispatch itself."""
        p = self.params
        S = len(self.submaps)
        F = len(self.matching_factors)
        B = len(self.between_factors)
        J = len(self.junction_states)
        A = len(self.gravity_anchors)
        TR = len(self.translation_priors)
        L = max(p.submap_voxelmap_levels, 1)
        Sp, Fp, Bp, Jp, Ap = bucket(S), bucket(max(F * L, 1)), \
            bucket(max(B, 1)), (bucket(J) if J else 0), \
            (bucket(A) if A else 0)
        Tp = bucket(TR) if TR else 0
        if not isinstance(getattr(self, "_args_cache", None), dict):
            self._args_cache = {}
        ac = self._args_cache

        poses = pad_stack([np.asarray(T, np.float32) for T in self.poses], Sp,
                          np.eye(4, dtype=np.float32))
        # Padded pose slots get identity; keep them sane via damping below.
        # One factor row per (pair, voxelmap level): repeat the pair indices
        # L times, each repeat carrying that level's cached correspondences.
        sig_f = (Fp, L, tuple(self.matching_factors))
        if ac.get("sig_f") != sig_f:
            ac["f_tgt"] = pad_stack([np.int32(t) for t, _ in
                                     self.matching_factors
                                     for _ in range(L)], Fp, np.int32(0))
            ac["f_src"] = pad_stack([np.int32(s) for _, s in
                                     self.matching_factors
                                     for _ in range(L)], Fp, np.int32(0))
            ac["f_w"] = pad_stack([np.float32(1.0)] * (F * L), Fp,
                                  np.float32(0.0))
            ac["sig_f"] = sig_f
        f_tgt, f_src, f_w = ac["f_tgt"], ac["f_src"], ac["f_w"]
        M = int(self._m_pts[0].shape[0])
        f_mu, f_ct, f_hit = self._match_stacks(Fp, L, M)
        sm_pts, sm_covs = self._sm_stacks(Sp, M)

        sig_b = (Bp, B, id(self.between_factors))
        if ac.get("sig_b") != sig_b:
            ac["b_i"] = pad_stack([np.int32(f[0]) for f in
                                   self.between_factors], Bp, np.int32(0))
            ac["b_j"] = pad_stack([np.int32(f[1]) for f in
                                   self.between_factors], Bp, np.int32(0))
            ac["b_Z"] = pad_stack([np.asarray(f[2], np.float32)
                                   for f in self.between_factors],
                                  Bp, np.eye(4, dtype=np.float32))
            ac["b_info"] = pad_stack([np.asarray(f[3], np.float32)
                                      for f in self.between_factors],
                                     Bp, np.eye(6, dtype=np.float32))
            ac["b_valid"] = pad_stack([True] * B, Bp, False)
            ac["sig_b"] = sig_b
        b_i, b_j, b_Z = ac["b_i"], ac["b_j"], ac["b_Z"]
        b_info, b_valid = ac["b_info"], ac["b_valid"]

        if Jp:
            from glim_tpu.odometry.window_estimator import _zero_preints
            zero_pre = jax.tree_util.tree_map(lambda x: x[0], _zero_preints(2))
            m_i = pad_stack([np.int32(f["i"]) for f in self.imu_factors], Jp,
                            np.int32(0))
            m_j = pad_stack([np.int32(f["j"]) for f in self.imu_factors], Jp,
                            np.int32(0))
            sig_m = (Jp, len(self.imu_factors))
            if ac.get("sig_m") != sig_m:
                ac["m_i"] = m_i
                ac["m_j"] = m_j
                ac["m_AR"] = pad_stack([f["A_R"] for f in self.imu_factors],
                                       Jp, np.eye(4, dtype=np.float32))
                ac["m_AL"] = pad_stack([f["A_L"] for f in self.imu_factors],
                                       Jp, np.eye(4, dtype=np.float32))
                ac["m_pre"] = pad_stack_tree([f["pre"] for f in
                                              self.imu_factors], Jp, zero_pre)
                ac["m_valid"] = pad_stack([True] * len(self.imu_factors),
                                          Jp, False)
                ac["sig_m"] = sig_m
            m_i, m_j = ac["m_i"], ac["m_j"]
            m_AR, m_AL = ac["m_AR"], ac["m_AL"]
            m_pre, m_valid = ac["m_pre"], ac["m_valid"]
            junc = pad_stack([np.asarray(x, np.float32)
                              for x in self.junction_states], Jp,
                             np.zeros(12, np.float32))
        else:
            m_i = m_j = jnp.zeros(0, jnp.int32)
            m_AR = m_AL = jnp.zeros((0, 4, 4), jnp.float32)
            m_valid = jnp.zeros(0, bool)
            junc = jnp.zeros((0, 12), jnp.float32)
            from glim_tpu.odometry.window_estimator import _zero_preints
            m_pre = jax.tree_util.tree_map(lambda x: x[:0], _zero_preints(2))

        if Ap:
            grav_idx = pad_stack([np.int32(a) for a in self.gravity_anchors],
                                 Ap, np.int32(0))
            grav_valid = pad_stack([True] * A, Ap, False)
        else:
            grav_idx = jnp.zeros(0, jnp.int32)
            grav_valid = jnp.zeros(0, bool)

        damping = np.full(Sp, 1e-3, np.float32)
        damping[:S] = 0.0
        for k, scale in self.recovery_damping.items():
            if k < Sp:
                damping[k] = scale

        return dict(
            poses0=poses, junc0=junc,
            f_tgt=f_tgt, f_src=f_src, f_w=f_w, f_mu=f_mu, f_ct=f_ct,
            f_hit=f_hit, sm_pts=sm_pts, sm_covs=sm_covs,
            b_i=b_i, b_j=b_j, b_Z=b_Z, b_info=b_info, b_valid=b_valid,
            m_i=m_i, m_j=m_j, m_AR=m_AR, m_AL=m_AL, m_pre=m_pre,
            m_valid=m_valid,
            prior_T=jnp.asarray(self.poses[0], jnp.float32),
            prior_sqrt=jnp.full(6, np.sqrt(p.init_pose_damping_scale),
                                jnp.float32),
            grav_idx=grav_idx, grav_valid=grav_valid,
            grav_sqrt=jnp.asarray(np.sqrt(p.init_pose_damping_scale) * 0.1,
                                  jnp.float32),
            damping=jnp.asarray(damping),
            gravity=jnp.asarray(GRAVITY),
            matching_weight=jnp.float32(p.matching_weight),
            t_idx=(pad_stack([np.int32(i) for i, _, _ in
                              self.translation_priors], Tp, np.int32(0))
                   if Tp else None),
            t_pos=(pad_stack([pos for _, pos, _ in self.translation_priors],
                             Tp, np.zeros(3, np.float32)) if Tp else None),
            t_sqrt=(pad_stack([si for _, _, si in self.translation_priors],
                              Tp, np.zeros(3, np.float32)) if Tp else None),
            t_valid=(pad_stack([True] * TR, Tp, False) if Tp else None),
        ), dict(Sp=Sp, Fp=Fp, Bp=Bp, Jp=Jp, Ap=Ap, Tp=Tp)

    # -- background bucket precompilation (mapping/precompile.py) --

    def _gn_sig(self, dims: dict):
        M = int(self._m_pts[0].shape[0])
        # The trailing False is the exec-mode marker (_submit_gn_precompile
        # signatures carry the aot flag); only an EXECUTED warmup counts as
        # a hit — an AOT-only compile still costs a cache load at first
        # touch, accounted as a (cheap) miss.
        return ("gn", tuple(sorted(dims.items())), M,
                self.params.lm_iterations, self._mesh, False)

    def _precompile_tick(self) -> None:
        """Predict the padded program variants the next few inserts will
        need and queue background compiles for any not yet warm (called at
        the end of every insert). Bucket crossings then hit a ready
        executable instead of stalling the live thread for the ~20 s
        (first program) / 0.5-1.5 s (crossing) an inline XLA compile costs
        on chip. Candidate set: the current signature, each near-crossing
        dimension bumped individually, and all of them bumped together."""
        pc = self.precompiler
        if pc is None or not self._m_pts:
            return
        p = self.params
        L = max(p.submap_voxelmap_levels, 1)
        M = int(self._m_pts[0].shape[0])
        S, F = len(self.submaps), len(self.matching_factors)
        B, J = len(self.between_factors), len(self.junction_states)
        A, TR = len(self.gravity_anchors), len(self.translation_priors)

        cur = dict(Sp=bucket(S), Fp=bucket(max(F * L, 1)),
                   Bp=bucket(max(B, 1)), Jp=(bucket(J) if J else 0),
                   Ap=(bucket(A) if A else 0), Tp=(bucket(TR) if TR else 0))
        bumps = {}
        for k, count, grow in (("Sp", S, max(2, S // 4)),
                               ("Fp", F * L, max(4, F // 2) * L),
                               ("Bp", B, max(2, B // 4)),
                               ("Jp", J, max(2, J // 4))):
            if k == "Jp" and not p.enable_imu:
                continue
            if k == "Jp" and J == 0:
                bumps[k] = 8     # the first IMU factor lands next insert
                continue
            nb = bucket(max(count + grow, 1))
            if nb != cur[k]:
                bumps[k] = nb
        combos = [dict(cur)]
        for k, v in bumps.items():
            combos.append({**cur, k: v})
        if len(bumps) > 1:
            combos.append({**cur, **bumps})
        for k, dims in enumerate(combos):
            # All-dims-bumped combo is unlikely to be the exact next state:
            # AOT-warm it (persistent-cache hit ~0.5-1.5 s if it DOES occur)
            # instead of paying a full dummy execution on the shared device.
            self._submit_gn_precompile(dims, M,
                                       aot=(k == len(combos) - 1
                                            and len(bumps) > 1))
        # Insert-path programs (correspondence lookup + overlap sweep +
        # match-stack scatter) for the predicted submap buckets x the FULL
        # pair-batch bucket ladder up to the worst-case full-refresh batch
        # (every factor stale after a loop closure). The ladder matters:
        # candidate/refresh batches take every intermediate power-of-two on
        # the way up (a 16-candidate overlap sweep appears long before any
        # 64-row refresh), and each unpredicted bucket is an inline compile
        # in the live insert — the dominant term of the 2 s first-checkpoint
        # insert mean measured on chip. Rungs beyond 2x the largest batch
        # seen so far are the SPECULATIVE tail (a big post-loop-closure
        # full refresh): those compile AOT-only — their dummy executions
        # (75+ MB buffer traffic each) were the load under which the
        # tunneled TPU worker repeatedly crashed, and they halve the async
        # pipeline's throughput while they drain.
        sp_c = [cur["Sp"]] + ([bumps["Sp"]] if "Sp" in bumps else [])
        rp_hot = 2 * max(self._rp_seen)
        rp_max = bucket(max(F + max(4, F // 2), 1, max(self._rp_seen)))
        rp_c, r = [], 8
        while r <= rp_max:
            rp_c.append(r)
            r *= 2
        for si, Sp in enumerate(sp_c):
            for Rp in rp_c:
                self._submit_insert_precompiles(
                    Sp, Rp, M, L, aot=(si > 0 or Rp > rp_hot))
        # Match-stack scatter programs (one per (Fp, Rp) combo): appends and
        # refreshes write searched rows with .at[rows].set(mode="drop"),
        # compiled per stack-capacity x batch-bucket pair — these ran inline
        # during opt.args (2.5 s mean in the first on-chip checkpoint).
        # Scatter is an eager op (no stable jit wrapper to AOT through), so
        # the speculative tail is simply skipped: a far-rung first touch
        # costs a ~1 s inline compile once, vs. a crash-prone giant dummy
        # execution on every prediction.
        fp_c = [cur["Fp"]] + ([bumps["Fp"]] if "Fp" in bumps else [])
        for fi, Fp in enumerate(fp_c):
            for Rp in rp_c:
                if fi == 0 and Rp <= rp_hot:
                    self._submit_scatter_precompile(Fp, Rp, M, L)

    def _submit_scatter_precompile(self, Fp: int, Rp: int, M: int,
                                   L: int) -> None:
        pc = self.precompiler
        sig = ("scatter", Fp, Rp, M, L)
        if pc.ready(sig) or pc.pending_for(sig):
            return

        def thunk(Fp=Fp, Rp=Rp):
            st = dict(L=L, Fp=Fp,
                      f_mu=jnp.zeros((Fp, M, 3), jnp.float32),
                      f_ct=jnp.zeros((Fp, M, 3, 3), jnp.float32),
                      f_hit=jnp.zeros((Fp, M), bool))
            outs = [(jnp.zeros((Rp, M, 3), jnp.float32),
                     jnp.zeros((Rp, M, 3, 3), jnp.float32),
                     jnp.zeros((Rp, M), bool)) for _ in range(L)]
            self._scatter_rows(st, outs, [0])
            jax.block_until_ready(st["f_mu"])

        pc.submit(sig, thunk)

    def _submit_gn_precompile(self, dims: dict, M: int,
                              aot: bool = False) -> None:
        pc = self.precompiler
        sig = ("gn", tuple(sorted(dims.items())), M,
               self.params.lm_iterations, self._mesh, aot)
        if pc.ready(sig) or pc.pending_for(sig) \
                or (aot and pc.ready(sig[:-1] + (False,))):
            return
        dims = dict(dims)
        mw = self.params.matching_weight
        iters, mesh = self.params.lm_iterations, self._mesh

        def thunk():
            from glim_tpu.mapping.precompile import dummy_gn_args
            args = dummy_gn_args(dims, M, mw)
            if aot:
                # Populate the persistent XLA cache only (no device
                # execution): a live first-touch then pays a ~0.5-1.5 s
                # cache load instead of a full compile.
                global_gn.lower(**args, **dims, iters=iters,
                                shard_mesh=mesh).compile()
            else:
                out = global_gn(**args, **dims, iters=iters, shard_mesh=mesh)
                jax.block_until_ready(out)

        pc.submit(sig, thunk)

    def _submit_insert_precompiles(self, Sp: int, Rp: int, M: int,
                                   L: int, aot: bool = False) -> None:
        pc = self.precompiler
        p = self.params
        caps = sorted({max(p.voxel_capacity >> lvl, 4096)
                       for lvl in range(L)}, reverse=True)
        for V in caps:
            sig = ("lookup", Sp, Rp, M, V, aot)
            if not (pc.ready(sig) or pc.pending_for(sig)
                    or (aot and pc.ready(sig[:-1] + (False,)))):
                def lk_thunk(Sp=Sp, Rp=Rp, V=V, aot=aot):
                    args = (
                        jnp.tile(jnp.eye(4, dtype=jnp.float32)[None],
                                 (Sp, 1, 1)),
                        jnp.zeros(Rp, jnp.int32), jnp.zeros(Rp, jnp.int32),
                        jnp.zeros((Sp, M, 3), jnp.float32),
                        jnp.zeros((Sp, M), bool),
                        jnp.full((Sp, V, 2), vmx.INVALID_HASH, jnp.int32),
                        jnp.zeros((Sp, V, 12), jnp.float32),
                        jnp.ones(Sp, jnp.float32))
                    if aot:
                        gicp.vgicp_lookup_stacked.lower(*args).compile()
                    else:
                        jax.block_until_ready(gicp.vgicp_lookup_stacked(*args))
                pc.submit(sig, lk_thunk)
        V0 = caps[0]
        stride = p.overlap_gate_stride
        sig = ("overlap", Sp, Rp, M, V0, stride, aot)
        if not (pc.ready(sig) or pc.pending_for(sig)
                or (aot and pc.ready(sig[:-1] + (False,)))):
            def ov_thunk(Sp=Sp, Rp=Rp, V0=V0, stride=stride, aot=aot):
                args = (
                    jnp.tile(jnp.eye(4, dtype=jnp.float32)[None],
                             (Rp, 1, 1)),
                    jnp.zeros(Rp, jnp.int32), jnp.zeros(Rp, jnp.int32),
                    jnp.zeros((Sp, M, 3), jnp.float32),
                    jnp.zeros((Sp, M), bool),
                    jnp.full((Sp, V0, 2), vmx.INVALID_HASH, jnp.int32),
                    jnp.ones(Sp, jnp.float32))
                if aot:
                    vmx.voxelmap_overlap_stacked.lower(
                        *args, stride=stride).compile()
                else:
                    jax.block_until_ready(vmx.voxelmap_overlap_stacked(
                        *args, stride=stride))
            pc.submit(sig, ov_thunk)

    def _account_gn_compile(self, dims: dict) -> None:
        """Hit/miss/wait accounting against the background precompiler: a
        ready signature is a hit; an in-flight one is WAITED for (strictly
        shorter than compiling the same program inline a second time);
        anything else is a miss the live call compiles inline."""
        import time
        pc = self.precompiler
        sig = self._gn_sig(dims)
        if pc.ready(sig):
            self.precompile_stats["hits"] += 1
            return
        if pc.pending_for(sig):
            t0 = time.perf_counter()
            pc.wait_for(sig, timeout=300.0)
            self.precompile_stats["waits"] += 1
            self.precompile_stats["wait_s"] += time.perf_counter() - t0
            return
        self.precompile_stats["misses"] += 1

    def needs_optimize(self) -> bool:
        """Anything new since the last optimize?  The async wrapper's
        periodic idle optimization consults this: re-optimizing an unchanged
        graph only steals the accelerator from the odometry hot loop."""
        return (self._new_loop_since_opt
                or len(self.submaps) > self._last_opt_count)

    def optimize(self, mesh=None) -> None:
        from glim_tpu.utils.profiling import profile_scope
        with profile_scope("global/optimize"):
            self._optimize_impl(mesh)

    def _optimize_impl(self, mesh=None) -> None:
        p = self.params
        if mesh is None:
            mesh = self._mesh
        N = len(self.submaps)
        if N < 2:
            return
        CB.on_smoother_update(self, None, None)
        self._new_loop_since_opt = False
        self._last_opt_count = N

        # Outer loop: damped-GN solve + correspondence refresh, repeated
        # until the cache is quiescent (iSAM2's relinearize-until-converged
        # sweep). Large loop-closure corrections move poses several voxels,
        # invalidating correspondences cached at the pre-closure estimate —
        # one refresh round cannot track them. Converged maps exit after a
        # single solve + one (cheap) refresh check.
        from glim_tpu.utils.profiling import profile_scope
        max_rounds = 10
        for round_ in range(max_rounds):
            with profile_scope("global/opt.args"):
                args, dims = self._padded_args()
            if round_ == 0 and self.precompiler is not None:
                with profile_scope("global/opt.compile_wait"):
                    self._account_gn_compile(dims)
            with profile_scope("global/opt.gn"):
                T_fin, junc_fin, err, min_diag = global_gn(
                    **args, **dims, iters=p.lm_iterations, shard_mesh=mesh)
                new_poses = np.asarray(T_fin, np.float64)[:N]
            ok = np.all(np.isfinite(new_poses))
            if not ok:
                # Selective indeterminant-system recovery (reference
                # :492-544): damp exactly the rank-deficient poses,
                # identified from the Hessian diagonal.
                md = np.asarray(min_diag)[:N]
                bad = np.where(~np.isfinite(md) | (md < 1e-4))[0]
                if len(bad) == 0:
                    bad = np.where(~np.isfinite(new_poses).reshape(N, -1)
                                   .all(axis=1))[0]
                for k in bad:
                    self.recovery_damping[int(k)] = 1e6
                logger.warning("indeterminant linear system: damping poses %s "
                               "and re-optimizing", list(map(int, bad)))
                args, dims = self._padded_args()
                T_fin, junc_fin, err, min_diag = global_gn(
                    **args, **dims, iters=p.lm_iterations, shard_mesh=mesh)
                self.recovery_damping.clear()
                new_poses = np.asarray(T_fin, np.float64)[:N]
                if not np.all(np.isfinite(new_poses)):
                    logger.error("recovery failed; keeping previous poses")
                    return
            for k in range(N):
                self.poses[k] = _orthonormalize(new_poses[k])
                self.submaps[k].T_world_origin = self.poses[k].copy()
            J = len(self.junction_states)
            if J:
                juncs = np.asarray(junc_fin, np.float64)
                self.junction_states = [juncs[k] for k in range(J)]
            # iSAM2-style relinearization sweep: if poses moved enough to
            # invalidate cached correspondences, refresh and re-solve.
            with profile_scope("global/opt.refresh"):
                n_stale = (self._refresh_stale_factors()
                           if round_ < max_rounds - 1 else 0)
            if n_stale > 0:
                continue
            break
        CB.on_smoother_update_result(self, dict(error=float(err)))
        CB.on_update_submaps(self.submaps)

    def find_overlapping_submaps(self, min_overlap: float) -> None:
        """On-demand loop factor search, distance-gated before any point
        data is touched (reference :285-358)."""
        p = self.params
        existing = set(self.matching_factors)
        centers = np.stack([T[:3, 3] for T in self.poses]) if self.poses else \
            np.zeros((0, 3))
        pairs = []
        for i in range(len(self.submaps)):
            d = np.linalg.norm(centers[:i] - centers[i], axis=1) \
                if i else np.zeros(0)
            pairs.extend((int(j), i) for j in
                         np.where(d <= p.max_implicit_loop_distance)[0]
                         if (int(j), i) not in existing)
        if not pairs:
            return
        # One stacked program + one fetch for all candidate overlaps.
        ovs = self._batch_overlaps(pairs)
        keep = [(pair, ov) for pair, ov in zip(pairs, ovs)
                if ov >= max(min_overlap, 0.01)]
        self._register_matching_factors_batch([pair for pair, _ in keep])
        for (j, i), ov in keep:
            logger.info("found overlapping pair %d <-> %d (%.2f)", j, i, ov)

    def recover_graph(self) -> None:
        """Graph reconstruction after corruption (reference :918-1049).

        The reference's recovery does three things we mirror here:
        (1) detect and repair broken VALUES — non-finite or missing poses are
        re-chained from the odometry deltas of the nearest intact neighbor;
        (2) re-create lost matching-cost FACTORS from connectivity analysis:
        every submap whose factor count fell to zero gets its overlap
        re-evaluated against all distance-gated candidates (one stacked
        device fetch) and matching factors re-registered above the implicit
        loop threshold; (3) submaps that remain isolated after the overlap
        sweep fall back to odometry-chained between factors so the graph
        stays connected for the next optimize."""
        p = self.params
        N = len(self.submaps)
        if N == 0:
            return

        # (1) value repair: re-chain non-finite poses from odometry.
        for k in range(N):
            if not np.all(np.isfinite(self.poses[k])):
                if k == 0:
                    self.poses[0] = self.odom_poses[0].copy()
                else:
                    dZ = np.linalg.inv(self.odom_poses[k - 1]) @ self.odom_poses[k]
                    self.poses[k] = self.poses[k - 1] @ dZ
                self.submaps[k].T_world_origin = self.poses[k].copy()
                logger.warning("recover_graph: repaired pose of submap %d", k)

        # Drop factors that reference broken data (out-of-range indices,
        # non-finite measurements) before the connectivity count.
        self.matching_factors = [(t, s) for (t, s) in self.matching_factors
                                 if 0 <= t < N and 0 <= s < N and t != s]
        self.between_factors = [
            f for f in self.between_factors
            if 0 <= f[0] < N and 0 <= f[1] < N
            and np.all(np.isfinite(f[2])) and np.all(np.isfinite(f[3]))]

        # (2) connectivity analysis + overlap re-evaluation for factor-less
        # submaps (reference re-creates matching-cost factors from the
        # connectivity of surviving values + fresh overlap checks).
        degree = np.zeros(N, np.int32)
        for (i, j) in self.matching_factors:
            degree[i] += 1
            degree[j] += 1
        for (i, j, _, _) in self.between_factors:
            degree[i] += 1
            degree[j] += 1
        orphans = [k for k in range(N) if degree[k] == 0]
        existing = set(self.matching_factors)
        pairs = []
        for k in orphans:
            pk = self.poses[k][:3, 3]
            for j in range(N):
                if j == k:
                    continue
                a, b = (j, k) if j < k else (k, j)
                if (a, b) in existing or (b, a) in existing:
                    continue
                if np.linalg.norm(self.poses[j][:3, 3] - pk) \
                        <= p.max_implicit_loop_distance:
                    pairs.append((a, b))
        pairs = sorted(set(pairs))
        if pairs:
            ovs = self._batch_overlaps(pairs)
            keep = [(pair, ov) for pair, ov in zip(pairs, ovs)
                    if ov >= p.min_implicit_loop_overlap]
            self._register_matching_factors_batch([pair for pair, _ in keep])
            for (t, s), ov in keep:
                degree[t] += 1
                degree[s] += 1
                logger.info("recover_graph: matching factor %d <-> %d "
                            "re-created (overlap %.2f)", t, s, ov)

        # (3) odometry re-chain for submaps still isolated.
        for k in range(1, N):
            if degree[k] == 0:
                dZ = np.linalg.inv(self.odom_poses[k - 1]) @ self.odom_poses[k]
                self.between_factors.append((k - 1, k, dZ, np.eye(6) * 100.0))
                logger.warning("recover_graph: re-chained submap %d", k)
        self._new_loop_since_opt = True

    # -- output --

    def export_points(self) -> np.ndarray:
        out = []
        for sm, T in zip(self.submaps, self.poses):
            pts = np.asarray(sm.frame.points)[np.asarray(sm.frame.mask)]
            out.append((T[:3, :3] @ pts.T).T + T[:3, 3])
        return np.concatenate(out, axis=0) if out else np.zeros((0, 3))

    def save(self, path: str) -> None:
        from glim_tpu.io.dump import save_dump
        save_dump(path, self.submaps, self.poses, odom_poses=self.odom_poses,
                  factors=dict(i=[f[0] for f in self.between_factors],
                               j=[f[1] for f in self.between_factors],
                               Z=[f[2] for f in self.between_factors],
                               info=[f[3] for f in self.between_factors],
                               huber=[-1.0] * len(self.between_factors),
                               matching=list(self.matching_factors),
                               translation_priors=[
                                   (i, pos.tolist(), si.tolist())
                                   for i, pos, si in self.translation_priors]))

    def load(self, path: str, session_offset: int = 0) -> None:
        """Load a dump; with session_offset > 0 the loaded submaps are
        appended after existing ones (multi-session merge rekeying,
        reference :690-910)."""
        from glim_tpu.io.dump import load_dump
        submaps, poses, factors = load_dump(path)
        base = len(self.submaps)
        if base > 0 and submaps:
            self.gravity_anchors.append(base)
        for sm, T in zip(submaps, poses):
            sm.id = base + sm.id
            sm.session_id = session_offset
            self._ensure_covs(sm)
            self.submaps.append(sm)
            self.poses.append(np.asarray(T, np.float64))
            self.odom_poses.append(np.asarray(T, np.float64))
            self.voxelmaps.append(self._build_voxelmap(sm))
            self._append_match_slice(sm)
        if factors:
            for i, j, Z, info in zip(factors["i"], factors["j"], factors["Z"],
                                     factors["info"]):
                info = np.asarray(info, np.float64)
                if info.ndim == 1:       # legacy diagonal sqrt-info dumps
                    info = np.diag(info) ** 2
                self.between_factors.append((base + int(i), base + int(j),
                                             np.asarray(Z), info))
            for pair in factors.get("matching", []):
                self._register_matching_factor(base + int(pair[0]),
                                               base + int(pair[1]))
            for tp in factors.get("translation_priors", []):
                self.translation_priors.append(
                    (base + int(tp[0]), np.asarray(tp[1], np.float32),
                     np.asarray(tp[2], np.float32)))
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
