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

    gtsam_points::PlaneEVMFactor role: residual = smallest eigenvalue of the
    scatter of the world-frame selected points (zero when all selections lie
    on one common plane). Returns (error, H (N*6, N*6), b) via jacfwd on the
    stacked pose perturbations.
    """
    N = poses.shape[0]
    pts = [jnp.asarray(s.points, jnp.float32) for s in selections]
    idx = [s.submap_index for s in selections]

    def lam_min(xi):
        Ts = poses @ lie.se3_exp(xi.reshape(N, 6))
        world = []
        for p, i in zip(pts, idx):
            world.append(p @ Ts[i][:3, :3].T + Ts[i][:3, 3])
        allp = jnp.concatenate(world, axis=0)
        mu = jnp.mean(allp, axis=0)
        d = allp - mu
        S = d.T @ d / allp.shape[0]
        return eigvals_sym3x3(S)[0]

    zero = jnp.zeros(N * 6)
    r = lam_min(zero)
    J = jax.jacfwd(lam_min)(zero)              # (N*6,)
    H = jnp.outer(J, J)
    b = J * r
    return r, H, b


class BundleAdjustment:
    """Plane-constraint bundle adjustment over user-selected regions
    (reference BundleAdjustmentModal role)."""

    def __init__(self, iterations: int = 10, weight: float = 1e4):
        self.iterations = iterations
        self.weight = weight

    def optimize(self, submaps: List[SubMap], poses: List[np.ndarray],
                 plane_selections: Sequence[Sequence[PlaneSelection]]
                 ) -> List[np.ndarray]:
        """Refine submap poses so each selection group becomes coplanar.
        Gauge: pose 0 fixed."""
        N = len(poses)
        x = jnp.asarray(np.stack(poses), jnp.float32)

        def linearize(x):
            D = N * 6
            H = jnp.eye(D) * 1e-6
            b = jnp.zeros(D)
            err = 0.0
            for group in plane_selections:
                r, Hg, bg = plane_evm_factor(group, x)
                H = H + self.weight * Hg
                b = b + self.weight * bg
                err = err + self.weight * r * r
            H = H.at[:6, :6].add(jnp.eye(6) * 1e8)   # gauge
            return H, b, err

        res = solver.lm_optimize(linearize, lambda x, d: x @ lie.se3_exp(d.reshape(N, 6)),
                                 x, solver.TerminationCriteria(max_iterations=self.iterations))
        return [np.asarray(T, np.float64) for T in res.x]
