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
batched einsum pass. Correspondences: nearest neighbor in a bounded point
model via the MXU kNN kernel (the iVox replacement), cached across inner
iterations.
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
    max_correspondence_distance: float = 2.0
    location_consistency_inf_scale: float = 1e-3
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
        p.max_correspondence_distance = g("max_correspondence_distance", 2.0)
        p.location_consistency_inf_scale = g("location_consistency_inf_scale", 1e-3)
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


@partial(jax.jit, static_argnames=("iters", "bootstrap_frames", "update_budget"))
def _ct_scan_step(T_prev_e, twist_prev, step, model: vmx.PointVoxelMap,
                  pts, times, mask, neighbors, dt, rng, max_dist,
                  loc_weight, cv_weight, damping, *, iters: int,
                  bootstrap_frames: int, update_budget: int):
    # Normalized per-point time s in [0, 1].
    t_max = jnp.max(jnp.where(mask, times, 0.0))
    s = jnp.clip(times / jnp.maximum(t_max, 1e-6), 0.0, 1.0)

    covs, normals = cov_ops.estimate_covariances(pts, mask, neighbors, "plane")

    # Initial guess: damped twist extrapolation (reference :127-137).
    T_b0 = T_prev_e
    T_e0 = T_b0 @ lie.se3_exp(damping * twist_prev * dt)
    cv_target = damping * twist_prev * dt

    def lookup(T_b, T_e):
        from glim_tpu.ops.pallas_knn import nn_search
        R_s, t_s = _interp_poses(T_b, T_e, s)
        q = jnp.einsum("cij,cj->ci", R_s, pts) + t_s
        idx, d2 = nn_search(q, mask, model.points, model.mask)
        hit = mask & (d2 < max_dist * max_dist) & jnp.isfinite(d2)
        return model.points[idx], model.covs[idx], hit

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
            delta = solver.solve_damped(H, b, jnp.float32(1e-6))
            return (T_b @ lie.se3_exp(delta[:6]), T_e @ lie.se3_exp(delta[6:])), err

        (T_b, T_e), errs = jax.lax.scan(inner, (T_b, T_e), None, length=2)
        return (T_b, T_e), errs[-1]

    n_outer = max(1, iters // 2)
    (T_b, T_e), errs = jax.lax.scan(gn_round, (T_b0, T_e0), None, length=n_outer)

    # Skip registration entirely for the very first scan (empty model) —
    # but keep the extrapolated END pose so a bootstrap REPLAY (see
    # _replay_bootstrap) deskews frame 0 with the converged twist instead
    # of inserting it distorted. On a cold start twist_prev is zero, so
    # T_e0 == T_b0 and this reduces to the old zero-motion first step.
    first = step == 0
    T_b = jnp.where(first, T_b0, T_b)
    T_e = jnp.where(first, T_e0, T_e)

    # Deskew with the final continuous-time trajectory (points at scan-begin).
    R_s, t_s = _interp_poses(jnp.eye(4), lie.se3_inv(T_b) @ T_e, s)
    deskewed = jnp.einsum("cij,cj->ci", R_s, pts) + t_s

    twist_new = lie.se3_log(lie.se3_inv(T_b) @ T_e) / jnp.maximum(dt, 1e-4)
    twist_new = jnp.where(first, twist_prev, twist_new)

    # Model update in the world frame.
    w_pts = deskewed @ T_b[:3, :3].T + T_b[:3, 3]
    covs_w = jnp.einsum("ij,cjk,lk->cil", T_b[:3, :3], covs, T_b[:3, :3])
    C = w_pts.shape[0]
    rate = jnp.where(step < bootstrap_frames, 1.0, update_budget / C)
    keep = mask & (jax.random.uniform(rng, (C,)) < rate)
    model = vmx.pointmap_insert(model, w_pts, keep, covs_w, step)

    return T_b, T_e, twist_new, model, deskewed, covs, normals, errs


class OdometryEstimationCT(OdometryEstimationBase):
    def __init__(self, params: Optional[OdometryEstimationCTParams] = None):
        self.params = params or OdometryEstimationCTParams()
        p = self.params
        self.model = vmx.empty_point_voxelmap(p.model_capacity,
                                              p.ivox_min_points_dist,
                                              lru_horizon=p.ivox_lru_thresh)
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
                          update_budget=p.update_budget)
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
        registers against is sharp. One-off cost of ~bootstrap_frames steps."""
        if len(self._boot) < 2:
            self._boot = []
            return
        p = self.params
        model = vmx.empty_point_voxelmap(p.model_capacity,
                                         p.ivox_min_points_dist,
                                         lru_horizon=p.ivox_lru_thresh)
        # `+ 0` copies: nothing is donated here, but keep the live buffers
        # decoupled from the replay loop for safety.
        twist = self.twist + 0
        T_prev = jnp.eye(4)
        rng = jax.random.PRNGKey(6)
        for k, (pts, times, mask, neighbors, dt) in enumerate(self._boot):
            rng, sub = jax.random.split(rng)
            (_, T_prev, twist, model, _, _, _, _) = _ct_scan_step(
                T_prev, twist, jnp.int32(k), model, pts, times, mask,
                neighbors, dt, sub,
                jnp.float32(p.max_correspondence_distance),
                jnp.float32(p.location_consistency_inf_scale),
                jnp.float32(p.constant_velocity_inf_scale),
                jnp.float32(p.extrapolation_damping),
                iters=p.lm_max_iterations,
                bootstrap_frames=p.bootstrap_frames,
                update_budget=p.update_budget)
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
