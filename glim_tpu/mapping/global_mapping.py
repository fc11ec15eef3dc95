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
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from glim_tpu.mapping.callbacks import GlobalMappingCallbacks as CB
from glim_tpu.mapping.global_mapping_base import GlobalMappingBase
from glim_tpu.ops import factors as fct
from glim_tpu.ops import gicp, lie, solver
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
        # IMU endpoint-chain factors (reference :168-219): entry k connects
        # submap k's right endpoint to submap k+1's left endpoint through a
        # preintegrated IMU measurement + junction velocity/bias states.
        self.imu_factors: List[dict] = []
        self.junction_states: List[np.ndarray] = []   # (12,) [v_R, v_L, bias]
        self._imu_buffer: List[np.ndarray] = []
        # Indeterminant-system recovery (reference :492-544): poses that made
        # a solve blow up get a linear_damping block added on the next
        # linearization. Maps submap index -> damping scale.
        self.recovery_damping: dict = {}
        # Gravity-alignment anchors: first submap of each appended session.
        # RotateVector3Factor role (reference: mapping/global_mapping.cpp
        # :168-219) — keeps a loaded session's up-direction pinned to world
        # gravity while yaw/translation stay free to slide into alignment.
        self.gravity_anchors: List[int] = []

    # -- insertion --

    def insert_imu(self, stamp, linear_acc, angular_vel) -> None:
        CB.on_insert_imu(stamp, linear_acc, angular_vel)
        if self.params.enable_imu:
            self._imu_buffer.append(np.concatenate([[stamp], linear_acc,
                                                    angular_vel]))

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
        if p.enable_imu and i > 0:
            self._create_imu_factor(i - 1, i)
        if p.enable_optimization:
            self.optimize()

    def _create_imu_factor(self, i: int, j: int) -> None:
        """Preintegrate the IMU between submap i's right and submap j's left
        endpoint and add the endpoint-chain factor (reference :168-219: the
        E/V/B endpoint states that keep consecutive submaps gravity- and
        velocity-consistent through global optimization)."""
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
        # Endpoint offsets relative to the submap origins (world pose of the
        # endpoint = submap_pose @ A).
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

    def _imu_factor_system(self, fac: dict, T_i, T_j, junc):
        """Linearize one endpoint-chain factor. Returns (H (21,21), b (21),
        err) over [xi_i (6), xi_j (6), d_junction (9: v_R, v_L... bias handled
        inside as 6 more -> total dof = 6+6+12 = 24)]."""
        import jax
        from glim_tpu.ops import imu as imu_ops
        from glim_tpu.ops import lie as lie_dev
        A_R = jnp.asarray(fac["A_R"])
        A_L = jnp.asarray(fac["A_L"])
        pre = fac["pre"]
        grav = jnp.asarray([0.0, 0.0, -9.80665], jnp.float32)

        def res(x):
            xi_i, xi_j = x[:6], x[6:12]
            v_R = junc[:3] + x[12:15]
            v_L = junc[3:6] + x[15:18]
            bias = junc[6:12] + x[18:24]
            T_R = (T_i @ lie_dev.se3_exp(xi_i)) @ A_R
            T_L = (T_j @ lie_dev.se3_exp(xi_j)) @ A_L
            return imu_ops.imu_residual(T_R[:3, :3], T_R[:3, 3], v_R,
                                        T_L[:3, :3], T_L[:3, 3], v_L,
                                        bias, pre, grav)

        zero = jnp.zeros(24)
        r = res(zero)
        J = jax.jacfwd(res)(zero)
        cov = pre.cov + jnp.eye(9) * 1e-6
        info_r = jnp.linalg.solve(cov, r)
        info_J = jnp.linalg.solve(cov, J)
        return J.T @ info_J, J.T @ info_r, r @ info_r

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

        # Gravity alignment of appended sessions (RotateVector3Factor role).
        if self.gravity_anchors:
            ez = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
            si = jnp.full((1, 3), np.sqrt(p.init_pose_damping_scale) * 0.1,
                          jnp.float32)
            for a in self.gravity_anchors:
                gH, gb, gerr = fct.rotate_vector3_linearize(
                    poses_dev[a][None], ez, ez, si)
                ai = a * 6
                H = H.at[ai:ai + 6, ai:ai + 6].add(gH[0])
                b = b.at[ai:ai + 6].add(gb[0])
                err = err + gerr[0]

        # Recovery damping at poses flagged by a previous failed solve
        # (gtsam_points::LinearDampingFactor role, reference :505-543).
        for k, scale in self.recovery_damping.items():
            ki = k * 6
            H = H.at[ki:ki + 6, ki:ki + 6].add(fct.linear_damping(6, scale))

        H = H + jnp.eye(D) * 1e-6
        return H, b, err

    def optimize(self) -> None:
        p = self.params
        N = len(self.submaps)
        if N < 2:
            return
        CB.on_smoother_update(self, None, None)
        J = len(self.junction_states)
        Dp = N * 6

        def linearize(x):
            poses, junc = x
            H, b, err = self._linearize_all(poses)
            if J:
                # Extend with the junction-state block and IMU factors.
                D = Dp + J * 12
                H_ext = jnp.zeros((D, D)).at[:Dp, :Dp].set(H)
                b_ext = jnp.zeros(D).at[:Dp].set(b)
                H_ext = H_ext.at[Dp:, Dp:].add(jnp.eye(J * 12) * 1e-4)
                for fac in self.imu_factors:
                    i, jj, jn = fac["i"], fac["j"], fac["junction"]
                    Hf, bf, ef = self._imu_factor_system(
                        fac, poses[i], poses[jj], junc[jn])
                    # dof order inside Hf: [xi_i(0:6), xi_j(6:12), junc(12:24)]
                    sl = [jnp.arange(i * 6, i * 6 + 6),
                          jnp.arange(jj * 6, jj * 6 + 6),
                          jnp.arange(Dp + jn * 12, Dp + jn * 12 + 12)]
                    idx = jnp.concatenate(sl)
                    H_ext = H_ext.at[jnp.ix_(idx, idx)].add(Hf)
                    b_ext = b_ext.at[idx].add(bf)
                    err = err + ef
                return H_ext, b_ext, err
            return H, b, err

        def retract(x, delta):
            poses, junc = x
            poses = poses @ lie.se3_exp(delta[:Dp].reshape(N, 6))
            if J:
                junc = junc + delta[Dp:].reshape(J, 12)
            return (poses, junc)

        x0 = (jnp.asarray(np.stack(self.poses), jnp.float32),
              jnp.asarray(np.stack(self.junction_states), jnp.float32)
              if J else jnp.zeros((0, 12), jnp.float32))
        res = solver.lm_optimize(linearize, retract, x0,
                                 solver.TerminationCriteria(max_iterations=p.lm_iterations))
        CB.on_smoother_update_result(self, res)

        new_poses = np.asarray(res.x[0], np.float64)
        if not np.all(np.isfinite(new_poses)):
            # Indeterminant-system recovery (reference :492-544): damp the
            # offending poses and re-solve from the pre-update values once.
            bad = np.where(~np.isfinite(new_poses).all(axis=(1, 2)))[0]
            for k in (bad if len(bad) else range(N)):
                self.recovery_damping[int(k)] = 1e6
            logger.warning("indeterminant linear system: damping poses %s "
                           "and re-optimizing", list(bad))
            res = solver.lm_optimize(
                linearize, retract, x0,
                solver.TerminationCriteria(max_iterations=p.lm_iterations))
            self.recovery_damping.clear()
            new_poses = np.asarray(res.x[0], np.float64)
            if not np.all(np.isfinite(new_poses)):
                logger.error("recovery failed; keeping previous poses")
                return
        for k in range(N):
            self.poses[k] = _orthonormalize(new_poses[k])
            self.submaps[k].T_world_origin = self.poses[k].copy()
        if J:
            juncs = np.asarray(res.x[1], np.float64)
            self.junction_states = [juncs[k] for k in range(J)]
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
        if base > 0 and submaps:
            self.gravity_anchors.append(base)
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
