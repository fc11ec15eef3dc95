"""Interactive map-correction tools (headless API).

Equivalent capability to the reference's InteractiveViewer modals
(reference: src/glim/viewer/interactive/manual_loop_close_modal.cpp:9-64 —
FPFH + RANSAC / GNC global registration + GICP refinement producing a between
factor; src/glim/viewer/interactive/bundle_adjustment_modal.cpp:6-60 —
plane/point eigenvalue-minimization bundle adjustment over user-selected
regions). The GUI picking loop is replaced by a programmatic API the ROS/
notebook front-ends drive; all heavy math runs on device.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from glim_tpu.ops import covariance as cov_ops
from glim_tpu.ops import gicp, knn, lie, solver
from glim_tpu.ops import registration as reg
from glim_tpu.ops.eigh3 import eigvals_sym3x3
from glim_tpu.types import SubMap
from glim_tpu.utils.logging import create_module_logger

logger = create_module_logger("interactive")


@dataclass
class ManualLoopCloseResult:
    T_target_source: np.ndarray
    inlier_fraction: float
    method: str
    # 6x6 information of the aligned pair — the GICP Hessian at the refined
    # pose, the reference's BetweenFactor noise model
    # (manual_loop_close_modal.cpp:562-574).
    information: Optional[np.ndarray] = None


class ManualLoopClose:
    """Align two submaps: global registration (RANSAC or GNC over FPFH
    correspondences) + fine GICP refinement -> a between factor candidate."""

    def __init__(self, fpfh_k: int = 20, refine_iterations: int = 15,
                 max_correspondence_distance: float = 1.0):
        self.fpfh_k = fpfh_k
        self.refine_iterations = refine_iterations
        self.max_corr = max_correspondence_distance

    def _features(self, sm: SubMap):
        pts, mask = sm.frame.points, sm.frame.mask
        nbr, _ = knn.knn_self(pts, mask, 10)
        covs, normals = cov_ops.estimate_covariances(pts, mask, nbr, "plane")
        feat = reg.estimate_fpfh(pts, normals, mask, k=self.fpfh_k)
        return pts, mask, covs, feat

    def align(self, target: SubMap, source: SubMap, method: str = "RANSAC",
              T_init: Optional[np.ndarray] = None) -> ManualLoopCloseResult:
        tp, tm, tc, tf = self._features(target)
        sp, sm_, sc, sf = self._features(source)

        if T_init is None:
            if method.upper() == "GNC":
                res, _ = reg.estimate_pose_gnc(sp, sf, sm_, tp, tf, tm)
            else:
                res, _ = reg.estimate_pose_ransac(sp, sf, sm_, tp, tf, tm)
            T0 = np.asarray(res.T_target_source, np.float64)
        else:
            T0 = np.asarray(T_init, np.float64)

        # Coarse-to-fine GICP refinement (reference: modal's final ICP stage;
        # the coarse passes recover the meters-scale in-plane error that
        # descriptor matching leaves on feature-poor planar scenes).
        T_cur = jnp.asarray(T0, jnp.float32)
        for corr_dist in (4.0 * self.max_corr, 2.0 * self.max_corr, self.max_corr):
            def linearize(T, _d=jnp.float32(corr_dist)):
                s = gicp.gicp_linearize(jnp.eye(4), T, sp, sc, sm_, tp, tc, tm, _d)
                return s.H_ss, s.b_s, s.error

            lm = solver.lm_optimize(linearize, lambda T, d: T @ lie.se3_exp(d),
                                    T_cur,
                                    solver.TerminationCriteria(
                                        max_iterations=self.refine_iterations))
            T_cur = lm.x
        T_ref = np.asarray(T_cur, np.float64)
        frac = float(gicp.inlier_fraction(jnp.eye(4), jnp.asarray(T_ref, jnp.float32),
                                          sp, sm_, tp, tm, jnp.float32(self.max_corr)))
        # Information = GICP Hessian at the refined pose (the reference's
        # BetweenFactor noise model, manual_loop_close_modal.cpp:562-574).
        s_fin = gicp.gicp_linearize(jnp.eye(4), jnp.asarray(T_ref, jnp.float32),
                                    sp, sc, sm_, tp, tc, tm,
                                    jnp.float32(self.max_corr))
        info = np.asarray(s_fin.H_ss, np.float64)
        logger.info("manual loop close (%s): inliers %.2f", method, frac)
        return ManualLoopCloseResult(T_target_source=T_ref, inlier_fraction=frac,
                                     method=method, information=info)


@dataclass
class PlaneSelection:
    """Points selected from one submap for bundle adjustment."""

    submap_index: int
    points: np.ndarray   # (M, 3) in the submap origin frame


def plane_evm_factor(selections: Sequence[PlaneSelection], poses: jnp.ndarray):
    """Eigenvalue-minimization plane factor over selected regions.

    gtsam_points::PlaneEVMFactor role: error = smallest eigenvalue of the
    scatter of the world-frame selected points (zero when all selections lie
    on one common plane). Linearized as the equivalent per-point
    point-to-plane residual vector r_k = n·(p_k − mean)/√P with the normal
    n FROZEN at the current iterate (the BALM quadratic expansion:
    Σ r_k² = λ_min exactly when n is the smallest eigenvector) — a scalar
    λ_min residual would give a rank-1 Hessian that Gauss-Newton descends
    impractically slowly. Returns (error, H (N*6, N*6), b).
    """
    N = poses.shape[0]
    pts = [jnp.asarray(s.points, jnp.float32) for s in selections]
    idx = [s.submap_index for s in selections]

    def world_all(xi):
        Ts = poses @ lie.se3_exp(xi.reshape(N, 6))
        return jnp.concatenate(
            [p @ Ts[i][:3, :3].T + Ts[i][:3, 3] for p, i in zip(pts, idx)],
            axis=0)

    zero = jnp.zeros(N * 6)
    allp = world_all(zero)
    d0 = allp - jnp.mean(allp, axis=0)
    S = d0.T @ d0 / allp.shape[0]
    n = jax.lax.stop_gradient(jnp.linalg.eigh(S)[1][:, 0])

    def resid(xi):
        ap = world_all(xi)
        return (ap - jnp.mean(ap, axis=0)) @ n / jnp.sqrt(1.0 * ap.shape[0])

    r = resid(zero)
    J = jax.jacfwd(resid)(zero)                # (P, N*6)
    H = J.T @ J
    b = J.T @ r
    return jnp.sum(r * r), H, b


def point_evm_factor(selections: Sequence[PlaneSelection], poses: jnp.ndarray):
    """Point eigenvalue-minimization factor: error = sum of ALL three
    eigenvalues (= trace) of the world-frame scatter — zero when every
    selection collapses onto one common point. The reference's
    BundleAdjustmentModal offers both plane and point factors
    (bundle_adjustment_modal.cpp:17-60). Linearized per point as the full
    3-vector deviation from the mean (Σ|r_k|² = trace exactly), so the
    Hessian is full-rank like the plane variant's."""
    N = poses.shape[0]
    pts = [jnp.asarray(s.points, jnp.float32) for s in selections]
    idx = [s.submap_index for s in selections]

    def world_all(xi):
        Ts = poses @ lie.se3_exp(xi.reshape(N, 6))
        return jnp.concatenate(
            [p @ Ts[i][:3, :3].T + Ts[i][:3, 3] for p, i in zip(pts, idx)],
            axis=0)

    def resid(xi):
        ap = world_all(xi)
        return ((ap - jnp.mean(ap, axis=0))
                / jnp.sqrt(1.0 * ap.shape[0])).reshape(-1)

    zero = jnp.zeros(N * 6)
    r = resid(zero)
    J = jax.jacfwd(resid)(zero)
    H = J.T @ J
    b = J.T @ r
    return jnp.sum(r * r), H, b


class BundleAdjustment:
    """Plane/point-constraint bundle adjustment over user-selected regions
    (reference BundleAdjustmentModal role)."""

    def __init__(self, iterations: int = 10, weight: float = 1e4):
        self.iterations = iterations
        self.weight = weight

    def optimize(self, submaps: List[SubMap], poses: List[np.ndarray],
                 plane_selections: Sequence[Sequence[PlaneSelection]],
                 mode: str = "plane") -> List[np.ndarray]:
        """Refine submap poses so each selection group becomes coplanar
        (mode="plane") or coincident (mode="point"). Gauge: pose 0 fixed."""
        N = len(poses)
        x = jnp.asarray(np.stack(poses), jnp.float32)
        factor = plane_evm_factor if mode == "plane" else point_evm_factor

        def linearize(x):
            D = N * 6
            H = jnp.eye(D) * 1e-6
            b = jnp.zeros(D)
            err = 0.0
            for group in plane_selections:
                r, Hg, bg = factor(group, x)    # r = λ (already squared)
                H = H + self.weight * Hg
                b = b + self.weight * bg
                err = err + self.weight * r
            H = H.at[:6, :6].add(jnp.eye(6) * 1e8)   # gauge
            return H, b, err

        res = solver.lm_optimize(linearize, lambda x, d: x @ lie.se3_exp(d.reshape(N, 6)),
                                 x, solver.TerminationCriteria(max_iterations=self.iterations))
        return [np.asarray(T, np.float64) for T in res.x]
