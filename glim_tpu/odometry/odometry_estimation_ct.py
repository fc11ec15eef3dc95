"""Continuous-time ICP odometry (LiDAR-only, CT-GICP).

Equivalent capability to the reference's ``OdometryEstimationCT``
(reference: src/glim/odometry/odometry_estimation_ct.cpp:127-318, params from
config/config_odometry_ct.json): each scan jointly estimates its BEGIN and
END poses; the matching factor interpolates every point's pose along the
scan (in-factor deskewing via ``deskewed_source_points``), with
location-consistency (begin == previous end) and constant-velocity priors,
and damped twist extrapolation as the initial guess (:127-137).

TPU design: one fused jitted 12-dof Gauss-Newton per scan. The per-point
Jacobian splits across begin/end with weights (1-s, s) — the standard CT-ICP
linear-interpolation approximation — so the whole linearization stays one
batched einsum pass. Correspondences: multi-resolution Gaussian voxel
lookup by default (model_type="vgicp"; measured materially more accurate
than point-NN on the benchmark sequences), or nearest neighbor in a bounded
point model via the MXU kNN kernel (model_type="ivox", the reference's iVox
behavior), cached across inner iterations.

Tracked accuracy deviations from the reference defaults (each measured on
the figure8_room benchmark, begin-pose chain):
  * location_consistency_inf_scale defaults to 1e4 (reference: 1e-3).
    The begin pose is physically pinned to the previous scan's end on a
    spinning lidar; at 1e-3 the constraint is decorative and registration
    noise displaces the scan boundary every frame. Measured on
    figure8_room: 1e-3 -> 0.054 m, 1e3 -> 0.026 m, 1e4 -> 0.008 m (beats
    the flagship's 0.018); 1e5 and the exact pin (anchor_begin=True)
    over-constrain — boundary errors become uncorrectable and the chain
    diverges — so 1e4 is a deliberate sweet spot, not a limit.
  * bootstrap replay (shared with the cpu modules) + pose back-propagation
    into the lag window.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp

from glim_tpu.odometry.callbacks import OdometryEstimationCallbacks as CB
from glim_tpu.odometry.estimation_base import OdometryEstimationBase
from glim_tpu.ops import covariance as cov_ops
from glim_tpu.ops import knn, lie, solver
from glim_tpu.ops import voxelmap as vmx
from glim_tpu.ops.gicp import inv_sym3x3
from glim_tpu.ops.lie import skew
from glim_tpu.types import EstimationFrame, FrameID, PointBatch, PreprocessedFrame
from glim_tpu.utils.logging import create_module_logger
from glim_tpu.utils.registry import register_module

logger = create_module_logger("odom")


@dataclass
class OdometryEstimationCTParams:
    ivox_resolution: float = 1.0
    ivox_min_points_dist: float = 0.1
    ivox_lru_thresh: int = 200
    # Model the continuous-time factor registers against: "vgicp" keeps a
    # multi-resolution Gaussian voxel map (distribution-to-distribution,
    # like the cpu VGICP module whose model measured 3x the point-NN
    # model's accuracy on the aggressive figure-8) — the reference CT is
    # iVox-only (odometry_estimation_ct.cpp:160), kept available as
    # "ivox" for exact behavioral parity.
    model_type: str = "vgicp"
    vgicp_resolution: float = 0.3
    vgicp_levels: int = 2
    vgicp_scaling: float = 2.0
    max_correspondence_distance: float = 2.0
    # Final 6-dof alignment of the deskewed cloud at fixed intra-scan
    # twist (see _ct_scan_step rigid_round). Off by default: even with
    # LM-style step acceptance it perturbs the prior-stabilized joint
    # chain enough to destabilize marginal (sparse-scene) runs.
    rigid_refine: bool = False
    # Pin the scan-begin pose EXACTLY to the previous scan's end (original
    # CT-ICP elasticity taken to its physical limit — a spinning lidar's
    # scans are contiguous, begin == previous end by construction) and
    # solve only the 6-dof end pose. The free-begin joint solve lets
    # registration noise displace the begin boundary every scan (~3x the
    # per-frame error of a rigid 6-dof alignment, measured); the
    # reference's location-consistency precision of 1e-3 is decorative
    # against a ~1e8-scale matching Hessian. "free" restores the
    # reference's exact 12-dof behavior.
    anchor_begin: bool = False
    location_consistency_inf_scale: float = 1e4
    constant_velocity_inf_scale: float = 1e3
    lm_max_iterations: int = 8
    smoother_lag: float = 1.0
    model_capacity: int = 65536
    extrapolation_damping: float = 0.85
    update_budget: int = 2048
    bootstrap_frames: int = 5
    # Startup refinement: "replay" rebuilds the model from the stored
    # bootstrap scans once the twist has converged (their first insertions
    # were deskewed with a zero/immature twist and permanently smeared the
    # map the whole run anchors to); "off" disables.
    bootstrap_refine: str = "replay"

    @staticmethod
    def from_config(config) -> "OdometryEstimationCTParams":
        p = OdometryEstimationCTParams()
        g = lambda k, d: config.param("odometry_estimation", k, d)
        p.ivox_resolution = g("ivox_resolution", 1.0)
        p.ivox_min_points_dist = g("ivox_min_points_dist", 0.1)
        p.ivox_lru_thresh = int(g("ivox_lru_thresh", 200))
        p.model_type = g("model_type", "vgicp")
        p.vgicp_resolution = g("vgicp_resolution", 0.3)
        p.vgicp_levels = int(g("vgicp_levels", 2))
        p.rigid_refine = bool(g("rigid_refine", False))
        p.anchor_begin = bool(g("anchor_begin", False))
        p.max_correspondence_distance = g("max_correspondence_distance", 2.0)
        p.location_consistency_inf_scale = g("location_consistency_inf_scale", 1e4)
        p.constant_velocity_inf_scale = g("constant_velocity_inf_scale", 1e3)
        p.lm_max_iterations = int(g("lm_max_iterations", 8))
        p.smoother_lag = g("smoother_lag", 1.0)
        return p


def _interp_poses(T_b, T_e, s):
    """Per-point pose interpolation T(s) = T_b Exp(s log(T_b^-1 T_e)).

    Returns (R (C,3,3), t (C,3))."""
    d = lie.se3_log(lie.se3_inv(T_b) @ T_e)
    T = jnp.einsum("ij,cjk->cik", T_b, lie.se3_exp(s[:, None] * d[None, :]))
    return T[:, :3, :3], T[:, :3, 3]


def _ct_linearize(T_b, T_e, pts, covs, s, mu, C_t, hit):
    """CT-GICP system over [xi_begin, xi_end] with cached correspondences.

    Per point: q = T(s) p, r = mu - q; J wrt the interpolated pose's right
    perturbation is [R(s)[p]x | -R(s)]; it splits (1-s)/s across begin/end.
    """
    R_s, t_s = _interp_poses(T_b, T_e, s)
    q = jnp.einsum("cij,cj->ci", R_s, pts) + t_s
    r = mu - q
    omega = inv_sym3x3(C_t + jnp.einsum("cij,cjk,clk->cil", R_s, covs, R_s))
    w = hit.astype(pts.dtype)

    Rp = jnp.einsum("cij,cjk->cik", R_s, skew(pts))
    J_pose = jnp.concatenate([Rp, -R_s], axis=-1)            # (C, 3, 6)
    w_b = (1.0 - s)[:, None, None]
    w_e = s[:, None, None]

    Wr = jnp.einsum("cij,cj->ci", omega, r) * w[:, None]
    WJ = jnp.einsum("cij,cjk->cik", omega, J_pose) * w[:, None, None]

    H_pp = jnp.einsum("cki,ckj->cij", J_pose, WJ)             # (C, 6, 6)
    b_p = jnp.einsum("cki,ck->ci", J_pose, Wr)                # (C, 6)

    H = jnp.zeros((12, 12))
    H = H.at[:6, :6].add(jnp.einsum("c,cij->ij", ((1 - s) ** 2), H_pp))
    H = H.at[:6, 6:].add(jnp.einsum("c,cij->ij", (1 - s) * s, H_pp))
    H = H.at[6:, :6].add(jnp.einsum("c,cij->ij", (1 - s) * s, H_pp))
    H = H.at[6:, 6:].add(jnp.einsum("c,cij->ij", s ** 2, H_pp))
    b = jnp.concatenate([jnp.einsum("c,ci->i", 1 - s, b_p),
                         jnp.einsum("c,ci->i", s, b_p)])
    err = jnp.sum(jnp.einsum("ci,ci->c", r, Wr))
    return H, b, err


def _pose_prior_12(T, anchor, weight, offset):
    """6-dof prior on one of the two poses: r = log(anchor^-1 T)."""
    def res(xi):
        return lie.se3_log(lie.se3_inv(anchor) @ (T @ lie.se3_exp(xi)))

    r = res(jnp.zeros(6))
    J = jax.jacfwd(res)(jnp.zeros(6))
    H6 = weight * (J.T @ J)
    b6 = weight * (J.T @ r)
    err = weight * (r @ r)
    H = jnp.zeros((12, 12)).at[offset:offset + 6, offset:offset + 6].set(H6)
    b = jnp.zeros(12).at[offset:offset + 6].set(b6)
    return H, b, err


@partial(jax.jit, static_argnames=("iters", "bootstrap_frames",
                                   "update_budget", "model_kind",
                                   "rigid_refine", "anchor_begin"))
def _ct_scan_step(T_prev_e, twist_prev, step, model,
                  pts, times, mask, neighbors, dt, rng, max_dist,
                  loc_weight, cv_weight, damping, *, iters: int,
                  bootstrap_frames: int, update_budget: int,
                  model_kind: str = "ivox", rigid_refine: bool = True,
                  anchor_begin: bool = False):
    # Normalized per-point time s in [0, 1].
    t_max = jnp.max(jnp.where(mask, times, 0.0))
    s = jnp.clip(times / jnp.maximum(t_max, 1e-6), 0.0, 1.0)

    covs, normals = cov_ops.estimate_covariances(pts, mask, neighbors, "plane")

    # Initial guess: damped twist extrapolation (reference :127-137).
    T_b0 = T_prev_e
    T_e0 = T_b0 @ lie.se3_exp(damping * twist_prev * dt)
    cv_target = damping * twist_prev * dt

    def model_lookup(q):
        """World-frame query points -> (mu, C_t, hit) against the model."""
        if model_kind == "vgicp":
            # Multi-resolution Gaussian voxel lookup, finest level wins
            # (distribution-to-distribution; iterate coarse -> fine so the
            # fine rows overwrite).
            C = q.shape[0]
            mu = jnp.zeros((C, 3))
            C_t = jnp.zeros((C, 3, 3))
            hit = jnp.zeros(C, bool)
            for vm in reversed(model):
                vidx = vmx.voxelmap_lookup(vm, q)
                h = vidx >= 0
                stats = jnp.concatenate([vm.mean, vm.cov.reshape(-1, 9)], 1)
                row = stats[jnp.maximum(vidx, 0)]
                mu = jnp.where(h[:, None], row[:, :3], mu)
                C_t = jnp.where(h[:, None, None],
                                row[:, 3:].reshape(-1, 3, 3), C_t)
                hit = hit | h
            d2 = jnp.sum((mu - q) ** 2, axis=1)
            return mu, C_t, hit & mask & (d2 < max_dist * max_dist)
        from glim_tpu.ops.pallas_knn import nn_search
        idx, d2 = nn_search(q, mask, model.points, model.mask)
        hit = mask & (d2 < max_dist * max_dist) & jnp.isfinite(d2)
        return model.points[idx], model.covs[idx], hit

    def lookup(T_b, T_e):
        R_s, t_s = _interp_poses(T_b, T_e, s)
        return model_lookup(jnp.einsum("cij,cj->ci", R_s, pts) + t_s)

    def gn_round(carry, _):
        T_b, T_e = carry
        mu, C_t, hit = lookup(T_b, T_e)

        def inner(carry2, _):
            T_b, T_e = carry2
            H, b, err = _ct_linearize(T_b, T_e, pts, covs, s, mu, C_t, hit)
            # Location consistency: T_b ~ previous scan end (reference
            # location_consistency_inf_scale).
            Hl, bl, el = _pose_prior_12(T_b, T_prev_e, loc_weight, 0)
            # Constant velocity: T_e ~ T_b Exp(cv_target).
            Hc, bc, ec = _pose_prior_12(T_e, T_b @ lie.se3_exp(cv_target), cv_weight, 6)
            H = H + Hl + Hc
            b = b + bl + bc
            if anchor_begin:
                # Begin pinned at the previous end: solve the end block
                # only (the begin's Schur/marginal terms vanish because
                # its delta is identically zero).
                de = solver.solve_damped(H[6:, 6:], b[6:], jnp.float32(1e-6))
                return (T_b, T_e @ lie.se3_exp(de)), err
            delta = solver.solve_damped(H, b, jnp.float32(1e-6))
            return (T_b @ lie.se3_exp(delta[:6]), T_e @ lie.se3_exp(delta[6:])), err

        (T_b, T_e), errs = jax.lax.scan(inner, (T_b, T_e), None, length=2)
        return (T_b, T_e), errs[-1]

    n_outer = max(1, iters // 2)
    (T_b, T_e), errs = jax.lax.scan(gn_round, (T_b0, T_e0), None, length=n_outer)

    # Final RIGID refinement at fixed intra-scan twist: the 12-dof joint
    # estimate resolves the intra-scan motion well but its scan-begin
    # boundary pose carries ~3x the per-frame noise of a plain 6-dof
    # scan-to-model alignment (measured: CT RPE-1 median 7.3 mm vs 2.6 mm
    # for the single-shot LiDAR-only VGICP on the same sequence/model) —
    # every point constrains the trajectory INTERIOR while the emitted pose
    # is the s=0 extrapolation. So deskew with the converged relative
    # twist, freeze it, and let two 6-dof rounds with fresh correspondences
    # place the now-rigid cloud. _ct_linearize with s=0 for every point IS
    # that 6-dof system (all weight on the begin pose).
    # Guard FIRST (before the refinement and before anything derived from
    # the joint solve can reach the model): on the very first scan the GN
    # rounds run against an empty model where only the near-zero LC prior
    # constrains the begin pose — numerical junk amplified by 1/1e-3.
    # Skip registration entirely for that scan — but keep the extrapolated
    # END pose so a bootstrap REPLAY (see _replay_bootstrap) deskews frame
    # 0 with the converged twist instead of inserting it distorted. On a
    # cold start twist_prev is zero, so T_e0 == T_b0 and this reduces to
    # the old zero-motion first step.
    first = step == 0
    T_b = jnp.where(first, T_b0, T_b)
    T_e = jnp.where(first, T_e0, T_e)

    rel = lie.se3_inv(T_b) @ T_e
    R_s, t_s = _interp_poses(jnp.eye(4), rel, s)
    deskewed = jnp.einsum("cij,cj->ci", R_s, pts) + t_s
    s0 = jnp.zeros_like(s)

    def rigid_round(T_b, _):
        q = deskewed @ T_b[:3, :3].T + T_b[:3, 3]
        mu, C_t, hit = model_lookup(q)
        T_e_r = T_b @ rel
        H, b, err = _ct_linearize(T_b, T_e_r, deskewed, covs, s0, mu, C_t,
                                  hit)
        H6, b6 = H[:6, :6], b[:6]
        # Trace-scaled damping: unlike the joint rounds this solve has no
        # LC/CV priors to stabilize it, so a hit-starved scan (sparse
        # scene, cold model) must solve to delta ~ 0, not b/1e-6 garbage.
        lam = 1e-3 * jnp.trace(H6) / 6.0 + 1e-2
        delta = solver.solve_damped(H6, b6, lam)
        return T_b @ lie.se3_exp(delta), err

    # Trust region on the TOTAL rigid correction: the refinement exists to
    # shave mm-to-cm boundary noise off the joint solve; a larger jump
    # means junk correspondences (sparse scene, degenerate geometry) and
    # must not override the prior-stabilized joint estimate — unbounded,
    # one bad scan feeds the next scan's extrapolation and the chain
    # diverges within a few frames (observed on the sparse synthetic
    # scene: twist norm 1 -> 12 -> 56 -> inf).
    if rigid_refine:
        T_b_joint = T_b
        T_b_r, _ = jax.lax.scan(rigid_round, T_b, None, length=2)

        def match_quality(T):
            """(per-hit matching error, hit count) of the deskewed cloud
            placed at T — the acceptance metric for the refined pose."""
            q = deskewed @ T[:3, :3].T + T[:3, 3]
            mu, C_t, hit = model_lookup(q)
            _, _, err = _ct_linearize(T, T @ rel, deskewed, covs, s0,
                                      mu, C_t, hit)
            n = jnp.sum(hit)
            return err / jnp.maximum(n, 1), n

        # Step acceptance (LM-style): the refined pose must actually fit
        # the model better — lower per-hit error without losing matches —
        # and stay within a tight trust region. An unconditional apply
        # diverged on sparse scenes: each junk correction corrupts the
        # model inserts, which corrupts the next scan's correspondences
        # (observed twist norm 1 -> 12 -> inf within frames).
        e_j, n_j = match_quality(T_b_joint)
        e_r, n_r = match_quality(T_b_r)
        d = lie.se3_log(lie.se3_inv(T_b_joint) @ T_b_r)
        ok = ((e_r < e_j) & (n_r >= 0.95 * n_j)
              & (jnp.linalg.norm(d[:3]) < 0.01)
              & (jnp.linalg.norm(d[3:]) < 0.03)
              & jnp.all(jnp.isfinite(d)))
        d = jnp.where(jnp.isfinite(d), d, 0.0)
        T_b = T_b_joint @ lie.se3_exp(jnp.where(ok, d, jnp.zeros(6)))
        T_e = T_b @ rel

    twist_new = lie.se3_log(lie.se3_inv(T_b) @ T_e) / jnp.maximum(dt, 1e-4)
    twist_new = jnp.where(first, twist_prev, twist_new)

    # Model update in the world frame.
    w_pts = deskewed @ T_b[:3, :3].T + T_b[:3, 3]
    covs_w = jnp.einsum("ij,cjk,lk->cil", T_b[:3, :3], covs, T_b[:3, :3])
    C = w_pts.shape[0]
    rate = jnp.where(step < bootstrap_frames, 1.0, update_budget / C)
    keep = mask & (jax.random.uniform(rng, (C,)) < rate)
    if model_kind == "vgicp":
        model = tuple(vmx.voxelmap_insert(vm, w_pts, keep, covs_w, step)
                      for vm in model)
    else:
        model = vmx.pointmap_insert(model, w_pts, keep, covs_w, step)

    return T_b, T_e, twist_new, model, deskewed, covs, normals, errs


class OdometryEstimationCT(OdometryEstimationBase):
    def __init__(self, params: Optional[OdometryEstimationCTParams] = None):
        self.params = params or OdometryEstimationCTParams()
        p = self.params
        self.model_kind = str(p.model_type).lower()
        self.model = self._empty_model()
        self.T_prev_end = jnp.eye(4)
        self.twist = jnp.zeros(6)
        self.frame_count = 0
        self.last_stamp: Optional[float] = None
        self.frames: List[EstimationFrame] = []
        self._rng = jax.random.PRNGKey(5)
        # Bootstrap replay buffer (same mechanism as the LiDAR-only
        # GICP/VGICP path, odometry_estimation_cpu.py): the first scans
        # register against a model seeded from undeskewed insertions.
        self._boot: List[tuple] = []
        self._boot_done = (p.bootstrap_frames < 2
                           or p.bootstrap_refine == "off")

    def _empty_model(self):
        p = self.params
        if self.model_kind == "vgicp":
            return tuple(vmx.empty_gaussian_voxelmap(
                max(p.model_capacity >> lvl, 8192),
                p.vgicp_resolution * (p.vgicp_scaling ** lvl))
                for lvl in range(max(p.vgicp_levels, 1)))
        return vmx.empty_point_voxelmap(p.model_capacity,
                                        p.ivox_min_points_dist,
                                        lru_horizon=p.ivox_lru_thresh)

    def requires_imu(self) -> bool:
        return False

    def insert_frame(self, frame: PreprocessedFrame,
                     marginalized: Optional[List[EstimationFrame]] = None
                     ) -> Optional[EstimationFrame]:
        CB.on_insert_frame(frame)
        p = self.params
        dt = 0.1 if self.last_stamp is None else max(frame.stamp - self.last_stamp, 1e-3)
        self._rng, sub = jax.random.split(self._rng)

        in_boot = not self._boot_done and self.frame_count < p.bootstrap_frames
        if in_boot:
            self._boot.append((frame.device_points, frame.device_times,
                               frame.device_mask, frame.device_neighbors,
                               jnp.float32(dt)))
        elif not self._boot_done:
            # Twist has converged: rebuild the model by replaying the stored
            # bootstrap scans with the converged twist — their original
            # insertions were deskewed with a zero/immature intra-scan
            # trajectory and permanently smeared the model the whole run
            # anchors to (the dominant LiDAR-only error source; the cpu path
            # measured 0.123 -> 0.027 m ATE from the same fix).
            self._boot_done = True
            self._replay_bootstrap()

        (T_b, T_e, self.twist, self.model, deskewed, covs, normals, errs) = \
            _ct_scan_step(self.T_prev_end, self.twist, jnp.int32(self.frame_count),
                          self.model, frame.device_points, frame.device_times,
                          frame.device_mask, frame.device_neighbors,
                          jnp.float32(dt), sub,
                          jnp.float32(p.max_correspondence_distance),
                          jnp.float32(p.location_consistency_inf_scale),
                          jnp.float32(p.constant_velocity_inf_scale),
                          jnp.float32(p.extrapolation_damping),
                          iters=p.lm_max_iterations,
                          bootstrap_frames=p.bootstrap_frames,
                          update_budget=p.update_budget,
                          model_kind=self.model_kind,
                          rigid_refine=bool(p.rigid_refine),
                          anchor_begin=bool(p.anchor_begin))
        self.T_prev_end = T_e

        est = EstimationFrame(
            id=self.frame_count, stamp=frame.stamp,
            device_T_world_lidar=T_b,
            frame_id=FrameID.LIDAR,
            frame=PointBatch(points=deskewed, mask=frame.device_mask,
                             times=frame.device_times, covs=covs, normals=normals),
            raw_frame=frame)
        est.custom_data["T_world_lidar_end"] = T_e
        self.frames.append(est)
        self.frame_count += 1
        self.last_stamp = frame.stamp
        CB.on_new_frame(est)

        margs = []
        while self.frames and self.frames[0].stamp < frame.stamp - p.smoother_lag:
            margs.append(self.frames.pop(0))
        if margs:
            CB.on_marginalized_frames(margs)
            if marginalized is not None:
                marginalized.extend(margs)
        return est

    def _replay_bootstrap(self) -> None:
        """Re-run the stored bootstrap scans against a FRESH model, seeded
        with the now-converged twist, then adopt the replayed state: every
        insertion is properly deskewed, so the map the rest of the run
        registers against is sharp. The replayed begin/end poses and
        deskewed clouds are also written BACK into the bootstrap frames
        still inside the smoother-lag window — their original estimates
        (zero-twist deskew, immature model) are the worst per-frame errors
        of the whole run and everything downstream chains off them; the
        window always still holds them because smoother_lag (1 s = 10
        frames) exceeds bootstrap_frames (5). One-off cost of
        ~bootstrap_frames steps."""
        if len(self._boot) < 2:
            self._boot = []
            return
        p = self.params
        model = self._empty_model()
        # `+ 0` copies: nothing is donated here, but keep the live buffers
        # decoupled from the replay loop for safety.
        twist = self.twist + 0
        T_prev = jnp.eye(4)
        rng = jax.random.PRNGKey(6)
        for k, (pts, times, mask, neighbors, dt) in enumerate(self._boot):
            rng, sub = jax.random.split(rng)
            (T_b, T_prev, twist, model, deskewed, covs, normals, _) = \
                _ct_scan_step(
                    T_prev, twist, jnp.int32(k), model, pts, times, mask,
                    neighbors, dt, sub,
                    jnp.float32(p.max_correspondence_distance),
                    jnp.float32(p.location_consistency_inf_scale),
                    jnp.float32(p.constant_velocity_inf_scale),
                    jnp.float32(p.extrapolation_damping),
                    iters=p.lm_max_iterations,
                    bootstrap_frames=p.bootstrap_frames,
                    update_budget=p.update_budget,
                    model_kind=self.model_kind,
                    rigid_refine=bool(p.rigid_refine),
                    anchor_begin=bool(p.anchor_begin))
            if k < len(self.frames) and self.frames[k].id == k:
                est = self.frames[k]
                est.device_T_world_lidar = T_b
                est._T_world_lidar = None      # drop stale host mirrors
                est._T_world_imu = None
                est.custom_data["T_world_lidar_end"] = T_prev
                est.frame = PointBatch(points=deskewed, mask=est.frame.mask,
                                       times=est.frame.times, covs=covs,
                                       normals=normals)
        self.model = model
        self.T_prev_end = T_prev
        self.twist = twist
        self._boot = []

    def get_remaining_frames(self) -> List[EstimationFrame]:
        out = self.frames
        self.frames = []
        return out


@register_module("odometry", "odometry_estimation_ct")
def create_odometry_estimation_ct_module(config=None, sensors_config=None):
    params = (OdometryEstimationCTParams.from_config(config)
              if config is not None else OdometryEstimationCTParams())
    return OdometryEstimationCT(params)
