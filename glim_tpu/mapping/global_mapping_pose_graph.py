"""Pose-graph global mapping backend with loop closure.

Equivalent capability to the reference's ``GlobalMappingPoseGraph``
(reference: src/glim/mapping/global_mapping_pose_graph.cpp:251-473, params
from config/config_global_mapping_pose_graph.json): SE3 between factors chain
the submap odometry; loop candidates are gated by travel-distance difference
and euclidean proximity with fast-forward skipping (:305-336), evaluated on
a DEDICATED DETECTION THREAD draining a shuffled bounded candidate buffer
(:346-473), validated by GICP/VGICP registration + point-inlier fraction
(gtsam_points::inlier_fraction at gicp_max_correspondence_dist, :404,417),
and added as Huber-robust between factors; the whole graph is re-solved by
batch LM (replacing iSAM2 — submap counts are small enough that a dense
solve on the MXU beats incremental sparse factorization).

Graph capacities are padded to power-of-two classes so the jitted linearize/
solve programs are reused as the map grows.
"""

from __future__ import annotations

import random
import threading
import time

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Tuple

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
class GlobalMappingPoseGraphParams:
    enable_optimization: bool = True
    init_pose_damping_scale: float = 1e6
    registration_type: str = "VGICP"
    min_travel_dist: float = 50.0
    max_neighbor_dist: float = 5.0
    min_inliear_fraction: float = 0.5       # (sic — reference key spelling)
    subsample_target: int = 10000
    gicp_max_correspondence_dist: float = 2.0
    vgicp_voxel_resolution: float = 2.0
    odom_factor_stddev: float = 1e-3
    loop_factor_stddev: float = 0.1
    loop_factor_robust_width: float = 1.0
    loop_candidate_buffer_size: int = 100
    loop_candidate_eval_per_insert: int = 2
    registration_iterations: int = 10
    voxel_capacity: int = 32768
    enable_detection_thread: bool = True
    # When the odometry-initialized registration lands below this inlier
    # fraction, retry from a GLOBAL registration init (FPFH + RANSAC) and
    # keep whichever alignment matches more points. The reference registers
    # only from the current-estimate init (:404-417) — on long-drifted
    # revisits (3+ m of accumulated error) that init can fall outside the
    # local basin and lock onto structure aliases that still pass the 0.5
    # validation gate (measured: aliased walls at 0.67 inliers vs 0.95 at
    # the true alignment), poisoning the graph with confidently-wrong
    # loops. 0 disables the fallback (exact reference behavior).
    global_registration_min_inliers: float = 0.8

    @staticmethod
    def from_config(config) -> "GlobalMappingPoseGraphParams":
        p = GlobalMappingPoseGraphParams()
        g = lambda k, d: config.param("global_mapping", k, d)
        p.enable_optimization = g("enable_optimization", True)
        p.init_pose_damping_scale = g("init_pose_damping_scale", 1e6)
        p.registration_type = g("registration_type", "VGICP")
        p.min_travel_dist = g("min_travel_dist", 50.0)
        p.max_neighbor_dist = g("max_neighbor_dist", 5.0)
        p.min_inliear_fraction = g("min_inliear_fraction", 0.5)
        p.subsample_target = int(g("subsample_target", 10000))
        p.gicp_max_correspondence_dist = g("gicp_max_correspondence_dist", 2.0)
        p.vgicp_voxel_resolution = g("vgicp_voxel_resolution", 2.0)
        p.odom_factor_stddev = g("odom_factor_stddev", 1e-3)
        p.loop_factor_stddev = g("loop_factor_stddev", 0.1)
        p.loop_factor_robust_width = g("loop_factor_robust_width", 1.0)
        p.loop_candidate_buffer_size = int(g("loop_candidate_buffer_size", 100))
        p.loop_candidate_eval_per_insert = int(g("loop_candidate_eval_per_thread", 2))
        p.enable_detection_thread = g("enable_detection_thread", True)
        p.global_registration_min_inliers = g(
            "global_registration_min_inliers", 0.8)
        return p


def _pad_pow2(n: int, minimum: int = 8) -> int:
    c = minimum
    while c < n:
        c *= 2
    return c


def _skew_np(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])


def _se3_adjoint(T):
    """Ad(T) for [rot, trans] tangents: exp(Ad(T) xi) = T exp(xi) T^-1."""
    R, t = T[:3, :3], T[:3, 3]
    A = np.zeros((6, 6))
    A[:3, :3] = R
    A[3:, :3] = _skew_np(t) @ R
    A[3:, 3:] = R
    return A


def _se3_ad(xi):
    """Little adjoint ad(xi) for [rot, trans] ordering."""
    w, v = xi[:3], xi[3:]
    A = np.zeros((6, 6))
    A[:3, :3] = _skew_np(w)
    A[3:, :3] = _skew_np(v)
    A[3:, 3:] = _skew_np(w)
    return A


def _se3_jr_inv(r):
    """Inverse right Jacobian of se3_log, series to second order."""
    a = _se3_ad(r)
    return np.eye(6) + 0.5 * a + (a @ a) / 12.0


def _host_linearize_graph(poses, f_i, f_j, f_Z, f_si, f_huber,
                          prior_info: float):
    """f64 HOST Gauss-Newton system over all poses.

    The pose graph is the one solver in this framework that must NOT run
    in device f32: its Hessian mixes a 1e6 gauge prior and 1e4-stiff
    odometry links with lever-arm modes (rotate an early link, every later
    pose sweeps 100+ m) whose TRUE stiffness is O(1) — f32 rounding of the
    1e4-1e6-scale entries perturbs those eigenvalues by O(1), routinely
    making the assembled H indefinite, and Gauss-Newton then rides the
    corrupted modes to 50-700-norm steps that LM can only reject (measured
    on the 128-submap drifted ring: every post-closure step rejected, loop
    residual never recovered). The graph is tiny (hundreds of factors,
    N*6 <= a few thousand), so exact f64 assembly on host costs
    microseconds; the device keeps the part it is good at — the dense
    per-candidate registrations that VALIDATE the loops.

    Analytic right-perturbation Jacobians: r = log(Z^-1 Ti^-1 Tj), so
    dr/dxi_j = Jr^-1(r) and dr/dxi_i = -Jr^-1(r) Ad(Tj^-1 Ti), with the
    inverse right Jacobian's series Jr^-1(r) ~ I + ad(r)/2 + ad(r)^2/12
    (exact enough at the sub-radian residuals Huber leaves alive; pinned
    against central differences in tests). Returns (H, b, err).
    """
    N = len(poses)
    D = N * 6
    H = np.zeros((D, D))
    b = np.zeros(D)
    err = 0.0
    for i, j, Z, si, hub in zip(f_i, f_j, f_Z, f_si, f_huber):
        Ti, Tj = poses[i], poses[j]
        rel = np.linalg.inv(Ti) @ Tj
        Z_inv = np.linalg.inv(Z)
        r0 = si * lie_np.se3_log(Z_inv @ rel)
        if np.linalg.norm(r0[:3] / si) < 1.0:
            Jr_inv = _se3_jr_inv(r0 / si)
            J_j = si * Jr_inv
            J_i = -si * (Jr_inv @ _se3_adjoint(np.linalg.inv(rel)))
            J = np.concatenate([J_i, J_j], axis=1)
        else:
            # The Jr^-1 series degrades past ~1 rad of residual rotation
            # (4% at 2.4 rad); central differences for these rare rows.
            eps = 1e-6
            J = np.zeros((6, 12))

            def res(xi_i, xi_j):
                A = Ti @ lie_np.se3_exp(xi_i)
                Bp = Tj @ lie_np.se3_exp(xi_j)
                return si * lie_np.se3_log(Z_inv @ np.linalg.inv(A) @ Bp)

            for k in range(6):
                dk = np.zeros(6)
                dk[k] = eps
                J[:, k] = (res(dk, np.zeros(6))
                           - res(-dk, np.zeros(6))) / (2 * eps)
                J[:, 6 + k] = (res(np.zeros(6), dk)
                               - res(np.zeros(6), -dk)) / (2 * eps)
        u = np.linalg.norm(r0)
        if hub > 0 and u > hub:
            w = hub / u
            err += hub * u - 0.5 * hub * hub
        else:
            w = 1.0
            err += 0.5 * u * u
        Hf = w * (J.T @ J)
        bf = w * (J.T @ r0)
        sl_i, sl_j = slice(i * 6, i * 6 + 6), slice(j * 6, j * 6 + 6)
        H[sl_i, sl_i] += Hf[:6, :6]
        H[sl_i, sl_j] += Hf[:6, 6:]
        H[sl_j, sl_i] += Hf[6:, :6]
        H[sl_j, sl_j] += Hf[6:, 6:]
        b[sl_i] += bf[:6]
        b[sl_j] += bf[6:]
    # Gauge prior on pose 0 at its current value (zero residual, pure
    # stiffness) + tiny global damping.
    H[:6, :6] += np.eye(6) * prior_info
    H += np.eye(D) * 1e-6
    return H, b, err


@partial(jax.jit, static_argnames=("n_pose_cap", "n_factor_cap"))
def _linearize_graph(poses, T_i_idx, T_j_idx, Z, sqrt_info, huber, f_valid,
                     prior_T, prior_info, *, n_pose_cap: int, n_factor_cap: int):
    """Dense GN system over all poses from padded factor arrays."""
    T_i = poses[T_i_idx]
    T_j = poses[T_j_idx]
    batch = fct.between_linearize(T_i, T_j, Z, sqrt_info, huber)
    # Zero out padded factors.
    w = f_valid.astype(jnp.float32)
    batch = fct.BetweenBatch(
        H_ii=batch.H_ii * w[:, None, None], H_ij=batch.H_ij * w[:, None, None],
        H_jj=batch.H_jj * w[:, None, None], b_i=batch.b_i * w[:, None],
        b_j=batch.b_j * w[:, None], error=batch.error * w, weight=batch.weight)

    D = n_pose_cap * 6
    H = jnp.zeros((D, D))
    b = jnp.zeros(D)
    H, b = fct.scatter_between(H, b, batch, T_i_idx, T_j_idx)

    # Gauge prior on pose 0 (evaluated at the CURRENT pose, anchored to
    # prior_T).
    pH, pb, perr = fct.prior_linearize(poses[0][None], prior_T[None], prior_info[None])
    H = H.at[:6, :6].add(pH[0])
    b = b.at[:6].add(pb[0])
    # Tiny damping on every pose block keeps padded/disconnected poses fixed.
    H = H + jnp.eye(D) * 1e-6
    err = jnp.sum(batch.error) + perr[0]
    return H, b, err


@partial(jax.jit, static_argnames=("iters",))
def _register_vgicp_pair(T_init_rel, pts, covs, mask, vm, iters: int):
    """Relative registration: source cloud vs target submap voxelmap
    (both in their submap-origin frames)."""

    def linearize(T):
        s = gicp.vgicp_linearize(jnp.eye(4), T, pts, covs, mask, vm)
        return s.H_ss, s.b_s, s.error

    def gn(T, _):
        H, b, err = linearize(T)
        delta = solver.solve_damped(H, b, jnp.float32(1e-6))
        return T @ lie.se3_exp(delta), err

    return jax.lax.scan(gn, T_init_rel, None, length=iters)


@partial(jax.jit, static_argnames=("iters",))
def _register_gicp_pair(T_init_rel, pts, covs, mask, tgt_pts, tgt_covs,
                        tgt_mask, max_dist, iters: int):
    """GICP registration mode: NN correspondences against the target
    submap's points (reference registration_type="GICP" path)."""

    def gn(T, _):
        s = gicp.gicp_linearize(jnp.eye(4), T, pts, covs, mask,
                                tgt_pts, tgt_covs, tgt_mask, max_dist)
        delta = solver.solve_damped(s.H_ss, s.b_s, jnp.float32(1e-6))
        return T @ lie.se3_exp(delta), s.error

    return jax.lax.scan(gn, T_init_rel, None, length=iters)


class LoopDetector:
    """Dedicated loop-detection worker (reference
    global_mapping_pose_graph.cpp:94,346-473): drains a bounded, shuffled
    candidate buffer, evaluates registrations off the insertion path, and
    queues accepted Huber between factors for the next optimize."""

    def __init__(self, owner: "GlobalMappingPoseGraph"):
        import atexit

        from glim_tpu.utils.concurrent import ConcurrentVector
        self.owner = owner
        self.candidates = ConcurrentVector()
        self.results = ConcurrentVector()
        self._kill = threading.Event()
        self._idle = threading.Event()
        self._idle.set()
        self._buffer = []
        self._rng = random.Random(0)
        self.thread = threading.Thread(target=self._run, daemon=True,
                                       name="loop_detection")
        self.thread.start()
        # Daemon threads blocked in device dispatch at interpreter exit can
        # abort the process; stop cleanly instead.
        atexit.register(self.stop)
        from glim_tpu.utils import lifecycle
        lifecycle.register(self)

    def push(self, cands) -> None:
        if cands:
            self._idle.clear()
            self.candidates.insert(cands)

    def drain(self):
        return self.results.get_all_and_clear()

    def wait_idle(self, timeout: float = 600.0) -> bool:
        """Block until the queue AND buffer are drained and the last batch's
        results have been pushed. A candidate evaluation can take minutes
        when its registration program cold-compiles on a loaded host, so the
        budget is generous; timing out mid-detection drops pending loops."""
        deadline = time.monotonic() + timeout
        while not self._idle.wait(timeout=1.0):
            if not self.thread.is_alive():
                return True
            if time.monotonic() > deadline:
                logger.warning("loop detection still busy after %.0f s; "
                               "pending candidates will be dropped", timeout)
                return False
        return True

    def stop(self) -> None:
        self._kill.set()
        if self.thread.is_alive():
            self.thread.join(timeout=5.0)

    def _run(self) -> None:
        p = self.owner.params
        while not self._kill.is_set():
            new = self.candidates.get_all_and_clear_wait(timeout=0.1)
            self._buffer.extend(new)
            if not self._buffer:
                self._idle.set()
                continue
            # Regulate the buffer: shuffle + trim (reference :407-411).
            if len(self._buffer) > p.loop_candidate_buffer_size:
                self._rng.shuffle(self._buffer)
                del self._buffer[p.loop_candidate_buffer_size:]
            batch = self._buffer[:max(p.loop_candidate_eval_per_insert, 1)]
            del self._buffer[:len(batch)]
            for (tgt, src, T_init) in batch:
                if self._kill.is_set():
                    break
                try:
                    res = self.owner._evaluate_candidate(tgt, src, T_init)
                except Exception:   # device hiccup must not kill the thread
                    logger.exception("loop candidate %d->%d evaluation failed",
                                     tgt, src)
                    continue
                if res is not None:
                    self.results.push_back(res)


class GlobalMappingPoseGraph(GlobalMappingBase):
    def __init__(self, params: Optional[GlobalMappingPoseGraphParams] = None):
        self.params = params or GlobalMappingPoseGraphParams()
        self.submaps: List[SubMap] = []
        self.poses: List[np.ndarray] = []          # current world estimates
        self.odom_poses: List[np.ndarray] = []     # raw odometry submap poses
        self.travel_dist: List[float] = []
        self.voxelmaps: List[vmx.GaussianVoxelMap] = []
        # Per-submap registration slices, subsampled to subsample_target
        # (reference :262-268 random_sampling of each target submap).
        self._sub_pts: List = []
        self._sub_covs: List = []
        self._sub_mask: List = []
        # factor storage (host lists; padded device arrays built on demand)
        self.f_i: List[int] = []
        self.f_j: List[int] = []
        self.f_Z: List[np.ndarray] = []
        self.f_info: List[np.ndarray] = []
        self.f_huber: List[float] = []
        self.candidates: List[Tuple[int, int, np.ndarray]] = []
        self.num_loops = 0
        self._looped_pairs = set()
        self._last_opt_n = 0         # poses at the last optimize
        # Burst deferral (see GlobalMapping.defer_optimization).
        self.defer_optimization = False
        # Runtime toggle for loop-candidate generation (reference
        # standard_viewer_ui module enable/disable; command channel
        # {"cmd": "set_enabled", "target": "loop_detection"}).
        self.loop_search_enabled = True
        self._last_opt_factors = 0   # factors at the last optimize
        self.detector = LoopDetector(self) if self.params.enable_detection_thread \
            else None
        # request_to_optimize servicing belongs to AsyncGlobalMapping (it owns
        # the worker thread); synchronous users call optimize() directly.

    def stop(self) -> None:
        if self.detector is not None:
            self.detector.stop()
            self.detector = None

    def wait_for_detection(self, timeout: float = 600.0) -> None:
        """Block until the detection thread has drained its queue (used by
        end-of-sequence flushes and tests)."""
        if self.detector is not None:
            self.detector.wait_idle(timeout)

    # -- insertion --

    def insert_submap(self, submap: SubMap) -> None:
        from glim_tpu.utils.profiling import profile_scope
        with profile_scope("global/insert_submap"):
            self._insert_submap_impl(submap)

    def _insert_submap_impl(self, submap: SubMap) -> None:
        CB.on_insert_submap(submap)
        p = self.params
        i = len(self.submaps)
        T_odom = np.asarray(submap.T_world_origin, np.float64)

        if i == 0:
            T_est = T_odom
            self.travel_dist.append(0.0)
        else:
            dZ = np.linalg.inv(self.odom_poses[-1]) @ T_odom
            T_est = self.poses[-1] @ dZ
            self.travel_dist.append(self.travel_dist[-1] + float(np.linalg.norm(dZ[:3, 3])))
            # Odometry between factor.
            self._add_factor(i - 1, i, dZ, 1.0 / p.odom_factor_stddev, -1.0)

        self.submaps.append(submap)
        self.odom_poses.append(T_odom)
        self.poses.append(T_est)

        covs = submap.frame.covs
        if covs is None:
            # GICP/VGICP registration eval is Mahalanobis-weighted: zero
            # covariances make every candidate evaluation a no-op, so
            # re-estimate them (as the reference does for covariance-less
            # loads, sub_map.cpp:149-199).
            from glim_tpu.ops import covariance as cov_ops
            from glim_tpu.ops import knn
            nbr, _ = knn.knn_banded(submap.frame.points, submap.frame.mask, 10)
            covs, _ = cov_ops.estimate_covariances(
                submap.frame.points, submap.frame.mask, nbr, "plane")
            submap.frame.covs = covs
        # Registration slice: subsample_target bounds the per-candidate
        # registration/validation cost (reference :262-268).
        C = int(submap.frame.points.shape[0])
        stride = max(1, C // max(p.subsample_target, 64))
        self._sub_pts.append(submap.frame.points[::stride])
        self._sub_covs.append(covs[::stride])
        self._sub_mask.append(submap.frame.mask[::stride])

        vm = vmx.empty_gaussian_voxelmap(p.voxel_capacity, p.vgicp_voxel_resolution)
        vm = vmx.voxelmap_insert(vm, submap.frame.points, submap.frame.mask,
                                 covs, jnp.int32(0))
        self.voxelmaps.append(vm)

        if self.loop_search_enabled:
            self._find_loop_candidates(i)
        if self.detector is not None:
            self.detector.push(self.candidates)
            self.candidates = []
            self._collect_detected_loops()
        else:
            self._eval_candidates(p.loop_candidate_eval_per_insert)

        if p.enable_optimization and not self.defer_optimization:
            self.optimize()

    # -- loop closure --

    def add_loop_candidate(self, tgt: int, src: int,
                           T_init=None) -> None:
        """External loop candidate (e.g. from an explicit place-recognition
        detector extension): enqueued into the same registration-validation
        path as proximity candidates."""
        if not (0 <= tgt < len(self.submaps)
                and 0 <= src < len(self.submaps)) or tgt == src:
            return
        if (tgt, src) in self._looped_pairs:
            return
        if T_init is None:
            T_init = np.linalg.inv(self.poses[tgt]) @ self.poses[src]
        cand = (tgt, src, np.asarray(T_init, np.float64))
        if self.detector is not None:
            self.detector.push([cand])
        else:
            self.candidates.append(cand)

    def add_between_factor(self, tgt: int, src: int, T_tgt_src: np.ndarray,
                           info=None) -> None:
        """Manual between-factor injection with an explicit relative-pose
        measurement (InteractiveViewer correction workflow). A 6x6
        information matrix is reduced to its diagonal sqrt for this
        backend's scaled pose-graph factors."""
        if not (0 <= tgt < len(self.submaps)
                and 0 <= src < len(self.submaps)) or tgt == src:
            return
        if info is None:
            si = 1.0 / self.params.loop_factor_stddev
        else:
            info = np.asarray(info, np.float64)
            si = float(np.sqrt(np.mean(np.diag(info)))) if info.ndim == 2 \
                else float(np.sqrt(info))
        self._looped_pairs.add((int(tgt), int(src)))
        self._add_factor(int(tgt), int(src),
                         np.asarray(T_tgt_src, np.float64), si,
                         self.params.loop_factor_robust_width)
        self.num_loops += 1

    def _find_loop_candidates(self, i: int) -> None:
        """Gated candidate generation with fast-forward skipping
        (reference :305-336)."""
        p = self.params
        pi = self.poses[i][:3, 3]
        j = 0
        while j < i:
            direct = np.linalg.norm(self.poses[j][:3, 3] - pi)
            if direct > p.max_neighbor_dist:
                if j != 0 and direct > p.max_neighbor_dist * 2:
                    # Fast forward: skip ahead proportionally to how far away
                    # we are, using the recent average travel step.
                    left = max(0, j - 3)
                    step_avg = (self.travel_dist[j] - self.travel_dist[left]) \
                        / max(j - left, 1)
                    step = int(0.8 * direct / max(min(step_avg, 100.0), 1e-3))
                    j += 1 + min(10, step)
                else:
                    j += 1
                continue
            if self.travel_dist[i] - self.travel_dist[j] < p.min_travel_dist:
                break
            if (j, i) not in self._looped_pairs:
                T_init = np.linalg.inv(self.poses[j]) @ self.poses[i]
                self.candidates.append((j, i, T_init))
            j += 1
        if len(self.candidates) > p.loop_candidate_buffer_size:
            self.candidates = self.candidates[-p.loop_candidate_buffer_size:]

    def _eval_candidates(self, budget: int) -> None:
        """Synchronous candidate evaluation (enable_detection_thread=false)."""
        for _ in range(min(budget, len(self.candidates))):
            tgt, src, T_init = self.candidates.pop(0)
            res = self._evaluate_candidate(tgt, src, T_init)
            if res is not None:
                self._accept_loop(res)

    def _evaluate_candidate(self, tgt: int, src: int, T_init: np.ndarray):
        """Registration + point-inlier-fraction validation (reference
        :404-417 — gtsam_points::inlier_fraction at the correspondence
        distance, NOT voxel overlap). Returns (tgt, src, Z, frac) or None."""
        from glim_tpu.utils.profiling import profile_scope
        with profile_scope("global/eval_candidate"):
            return self._evaluate_candidate_impl(tgt, src, T_init)

    def _register_from(self, tgt: int, src: int, T_init) -> tuple:
        """One registration attempt (GICP/VGICP per config) from T_init;
        returns (T_rel device array, inlier fraction)."""
        p = self.params
        pts, covs, mask = (self._sub_pts[src], self._sub_covs[src],
                           self._sub_mask[src])
        if p.registration_type.upper() == "GICP":
            T_rel, _ = _register_gicp_pair(
                jnp.asarray(T_init, jnp.float32), pts, covs, mask,
                self._sub_pts[tgt], self._sub_covs[tgt], self._sub_mask[tgt],
                jnp.float32(p.gicp_max_correspondence_dist),
                p.registration_iterations)
        else:
            T_rel, _ = _register_vgicp_pair(
                jnp.asarray(T_init, jnp.float32), pts, covs, mask,
                self.voxelmaps[tgt], p.registration_iterations)
        frac = float(gicp.inlier_fraction(
            jnp.eye(4), T_rel, pts, mask,
            self._sub_pts[tgt], self._sub_mask[tgt],
            jnp.float32(p.gicp_max_correspondence_dist)))
        return T_rel, frac

    def _global_reg_init(self, tgt: int, src: int):
        """FPFH + RANSAC global registration between the two submap slices
        (drift-independent init for the fallback path)."""
        from glim_tpu.ops import covariance as cov_ops
        from glim_tpu.ops import knn
        from glim_tpu.ops import registration as reg

        def feats(k):
            pts, mask = self._sub_pts[k], self._sub_mask[k]
            nbr, _ = knn.knn_self(pts, mask, 10)
            _, normals = cov_ops.estimate_covariances(pts, mask, nbr, "plane")
            return pts, mask, reg.estimate_fpfh(pts, normals, mask, k=20)
        sp, sm_, sf = feats(src)
        tp, tm, tf = feats(tgt)
        res, _ = reg.estimate_pose_ransac(sp, sf, sm_, tp, tf, tm)
        return np.asarray(res.T_target_source, np.float64)

    def _evaluate_candidate_impl(self, tgt: int, src: int, T_init: np.ndarray):
        p = self.params
        T_rel, frac = self._register_from(tgt, src, T_init)
        if (p.global_registration_min_inliers > 0
                and frac < p.global_registration_min_inliers):
            # The odometry init may sit outside the true basin after meters
            # of drift: retry from a drift-independent global init and keep
            # the better-matching alignment (see the param docstring).
            try:
                T0 = self._global_reg_init(tgt, src)
                if np.all(np.isfinite(T0)):
                    T_g, frac_g = self._register_from(tgt, src, T0)
                    if frac_g > frac:
                        logger.info("loop %d->%d re-based on global "
                                    "registration (inliers %.2f -> %.2f)",
                                    tgt, src, frac, frac_g)
                        T_rel, frac = T_g, frac_g
            except Exception:
                logger.exception("global registration fallback failed for "
                                 "%d->%d", tgt, src)
        if frac < p.min_inliear_fraction or not \
                np.all(np.isfinite(np.asarray(T_rel))):
            logger.debug("loop %d->%d rejected (inliers %.2f)", tgt, src, frac)
            return None
        return (tgt, src, np.asarray(T_rel, np.float64), frac)

    def _accept_loop(self, res) -> None:
        tgt, src, Z, frac = res
        if (tgt, src) in self._looped_pairs:
            return
        self._looped_pairs.add((tgt, src))
        p = self.params
        self._add_factor(tgt, src, Z, 1.0 / p.loop_factor_stddev,
                         p.loop_factor_robust_width)
        self.num_loops += 1
        logger.info("loop factor %d->%d accepted (inliers %.2f)", tgt, src, frac)

    def _collect_detected_loops(self) -> None:
        if self.detector is None:
            return
        for res in self.detector.drain():
            self._accept_loop(res)

    def _add_factor(self, i: int, j: int, Z: np.ndarray, info: float, huber: float):
        self.f_i.append(i)
        self.f_j.append(j)
        self.f_Z.append(np.asarray(Z, np.float64))
        self.f_info.append(np.full(6, info))
        self.f_huber.append(huber)

    # -- optimization --

    def needs_optimize(self) -> bool:
        """Anything new since the last optimize? (new submaps, new factors,
        or detected loops waiting to be collected)."""
        if len(self.poses) > self._last_opt_n \
                or len(self.f_i) > self._last_opt_factors:
            return True
        return self.detector is not None and self.detector.results.size() > 0

    def optimize(self) -> None:
        from glim_tpu.utils.profiling import profile_scope
        with profile_scope("global/optimize"):
            self._optimize_impl()

    def _optimize_impl(self) -> None:
        self._collect_detected_loops()
        p = self.params
        N = len(self.poses)
        B = len(self.f_i)
        self._last_opt_n = N
        self._last_opt_factors = B
        if N < 2 or B == 0:
            return

        poses = [np.asarray(T, np.float64).copy() for T in self.poses]
        f_i, f_j = list(self.f_i), list(self.f_j)
        f_Z = [np.asarray(Z, np.float64) for Z in self.f_Z]
        f_si = [float(info[0]) for info in self.f_info]
        f_hub = list(self.f_huber)

        def linearize(x):
            return _host_linearize_graph(x, f_i, f_j, f_Z, f_si, f_hub,
                                         p.init_pose_damping_scale)

        CB.on_smoother_update(self, None, None)
        # Host-f64 LM (see _host_linearize_graph for why this solver must
        # not run in device f32). 50 iterations cost nothing at steady
        # state (early termination after 1-3); a freshly accepted loop on a
        # heavily drifted chain needs ~10-20 Huber-IRLS rounds.
        H, b, err = linearize(poses)
        lam = 1e-6
        for it in range(50):
            A = H + np.diag(lam * np.diag(H) + 1e-9)
            try:
                delta = np.linalg.solve(A, -b)
            except np.linalg.LinAlgError:
                delta = np.linalg.lstsq(A, -b, rcond=None)[0]
            d6 = delta.reshape(N, 6)
            trial = [T @ lie_np.se3_exp(d) for T, d in zip(poses, d6)]
            H_new, b_new, err_new = linearize(trial)
            if err_new < err:
                rel = (err - err_new) / max(err, 1e-12)
                poses, H, b, err = trial, H_new, b_new, err_new
                lam = max(lam / 10.0, 1e-10)
                rot_n = float(np.max(np.linalg.norm(d6[:, :3], axis=1)))
                tr_n = float(np.max(np.linalg.norm(d6[:, 3:], axis=1)))
                if (rot_n < 1e-5 and tr_n < 1e-5) or rel < 1e-8:
                    break
            else:
                lam = min(lam * 10.0, 1e6)
                if lam >= 1e6:
                    break
        CB.on_smoother_update_result(self, dict(error=float(err),
                                                iterations=it + 1))

        new_poses = np.stack(poses)
        if not np.all(np.isfinite(new_poses)):
            logger.error("pose-graph optimize produced non-finite poses; "
                         "keeping previous estimates")
            return
        for k in range(N):
            self.poses[k] = _orthonormalize(new_poses[k])
            self.submaps[k].T_world_origin = self.poses[k].copy()
        CB.on_update_submaps(self.submaps)

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
                  factors=dict(i=self.f_i, j=self.f_j, Z=self.f_Z,
                               info=self.f_info, huber=self.f_huber))


def _orthonormalize(T: np.ndarray) -> np.ndarray:
    U, _, Vt = np.linalg.svd(T[:3, :3])
    out = np.eye(4)
    out[:3, :3] = U @ np.diag([1, 1, np.sign(np.linalg.det(U @ Vt))]) @ Vt
    out[:3, 3] = T[:3, 3]
    return out


@register_module("global_mapping", "global_mapping_pose_graph")
def create_global_mapping_pose_graph_module(config=None):
    params = (GlobalMappingPoseGraphParams.from_config(config)
              if config is not None else GlobalMappingPoseGraphParams())
    return GlobalMappingPoseGraph(params)
