"""Pose-graph loop detection: dedicated detection thread, inlier-fraction
validation, and false-positive rejection (reference
global_mapping_pose_graph.cpp:94,305-473)."""

import time

import jax.numpy as jnp
import numpy as np
import pytest

from glim_tpu.mapping.global_mapping_pose_graph import (
    GlobalMappingPoseGraph, GlobalMappingPoseGraphParams)
from glim_tpu.types import PointBatch, SubMap


def structured_cloud(rng, seed_shift=0.0, n=700, cap=1024):
    """Walls + floor with distinctive structure."""
    pts = np.zeros((cap, 3), np.float32)
    k = n // 3
    pts[:k, 0] = rng.uniform(-6, 6, k)
    pts[:k, 2] = rng.uniform(0, 3, k)
    pts[:k, 1] = 6.0 + seed_shift
    pts[k:2 * k, 1] = rng.uniform(-6, 6, k)
    pts[k:2 * k, 2] = rng.uniform(0, 3, k)
    pts[k:2 * k, 0] = -6.0 - seed_shift * 0.7
    pts[2 * k:n, 0] = rng.uniform(-6, 6, n - 2 * k)
    pts[2 * k:n, 1] = rng.uniform(-6, 6, n - 2 * k)
    mask = np.zeros(cap, bool)
    mask[:n] = True
    return pts, mask


def submap_at(sid, T_world, pts, mask):
    Ti = np.linalg.inv(T_world)
    local = pts.copy()
    valid = mask
    local[valid] = (Ti[:3, :3] @ pts[valid].T).T + Ti[:3, 3]
    return SubMap(id=sid, T_world_origin=T_world.copy(),
                  frame=PointBatch(points=jnp.asarray(local),
                                   mask=jnp.asarray(mask)))


def square_path(n_side=3, step=4.0):
    """Poses around a square that returns to the start."""
    poses = [np.eye(4)]
    dirs = [(1, 0), (0, 1), (-1, 0), (0, -1)]
    for dx, dy in dirs:
        for _ in range(n_side):
            T = poses[-1].copy()
            T[0, 3] += dx * step
            T[1, 3] += dy * step
            poses.append(T)
    return poses


def params(**kw):
    base = dict(min_travel_dist=15.0, max_neighbor_dist=5.0,
                min_inliear_fraction=0.5, vgicp_voxel_resolution=1.0,
                gicp_max_correspondence_dist=1.0,
                odom_factor_stddev=0.1, loop_factor_stddev=0.05,
                voxel_capacity=8192, registration_iterations=10)
    base.update(kw)
    return GlobalMappingPoseGraphParams(**base)


@pytest.mark.slow
class TestLoopDetectionThread:
    def test_true_loop_accepted_with_thread(self, rng):
        """A revisited place with the same geometry must close, with the
        DETECTION THREAD doing the evaluation."""
        world, wmask = structured_cloud(rng)
        gm = GlobalMappingPoseGraph(params(enable_detection_thread=True))
        drift = np.eye(4)
        drift[1, 3] = 0.04           # odometry drift per edge
        T_drifted = np.eye(4)
        for k, T_true in enumerate(square_path()):
            if k > 0:
                dT = np.linalg.inv(prev_true) @ T_true
                T_drifted = T_drifted @ dT @ drift
            else:
                T_drifted = T_true.copy()
            prev_true = T_true
            sm = submap_at(k, T_true, world.copy(), wmask)   # true geometry
            sm.T_world_origin = T_drifted.copy()             # drifted odometry
            # Scan content must match the TRUE pose (the world is fixed).
            Ti = np.linalg.inv(T_true)
            local = world.copy()
            local[wmask] = (Ti[:3, :3] @ world[wmask].T).T + Ti[:3, 3]
            sm.frame = PointBatch(points=jnp.asarray(local),
                                  mask=jnp.asarray(wmask))
            gm.insert_submap(sm)
        gm.wait_for_detection(60.0)
        gm.optimize()
        gm.stop()
        assert gm.num_loops >= 1, "detection thread accepted no loops"
        # Loop closure must pull the final pose back toward the start.
        end_err = np.linalg.norm(gm.poses[-1][:3, 3] - gm.poses[0][:3, 3])
        assert end_err < 2.0, end_err

    def test_false_positive_rejected(self, rng):
        """Two similar-but-DIFFERENT places that pass the distance gates must
        NOT close (inlier-fraction validation at the correspondence dist)."""
        world_a, mask_a = structured_cloud(rng, seed_shift=0.0)
        rng2 = np.random.default_rng(999)
        world_b, mask_b = structured_cloud(rng2, seed_shift=3.0)

        gm = GlobalMappingPoseGraph(params(enable_detection_thread=False))
        poses = square_path()
        n = len(poses)
        for k, T in enumerate(poses):
            # First and last submaps are geometrically DIFFERENT places even
            # though their poses coincide; middle ones use scene A geometry.
            w, m = (world_b, mask_b) if k == n - 1 else (world_a, mask_a)
            gm.insert_submap(submap_at(k, T, w.copy(), m))
        # Exhaust the candidate queue synchronously.
        gm._eval_candidates(100)
        gm.optimize()
        # The final submap must not have closed against the start.
        looped = [(i, j) for (i, j) in gm._looped_pairs if j == n - 1]
        assert not looped, f"false loop accepted: {looped}"


class TestHostGraphSolver:
    """The pose-graph backend's host-f64 Gauss-Newton pieces (device f32
    provably corrupts this solver's soft lever-arm modes — see
    _host_linearize_graph's docstring)."""

    def test_analytic_jacobians_match_central_differences(self):
        from glim_tpu.mapping.global_mapping_pose_graph import (_se3_adjoint,
                                                                _se3_jr_inv)
        from glim_tpu.ops import lie_np
        rng = np.random.default_rng(1)
        for _ in range(6):
            Ti = lie_np.se3_exp(rng.normal(0, 0.4, 6))
            Tj = lie_np.se3_exp(rng.normal(0, 0.4, 6))
            Z = lie_np.se3_exp(rng.normal(0, 0.2, 6))
            si = 37.0
            rel = np.linalg.inv(Ti) @ Tj
            r0 = si * lie_np.se3_log(np.linalg.inv(Z) @ rel)
            if np.linalg.norm(r0[:3] / si) > 0.9:
                continue          # the analytic path defers to FD there
            Jr_inv = _se3_jr_inv(r0 / si)
            Ja = np.concatenate(
                [-si * (Jr_inv @ _se3_adjoint(np.linalg.inv(rel))),
                 si * Jr_inv], axis=1)
            eps = 1e-6
            Jn = np.zeros((6, 12))

            def res(xi_i, xi_j):
                A = Ti @ lie_np.se3_exp(xi_i)
                Bp = Tj @ lie_np.se3_exp(xi_j)
                return si * lie_np.se3_log(
                    np.linalg.inv(Z) @ np.linalg.inv(A) @ Bp)

            for k in range(6):
                d = np.zeros(6)
                d[k] = eps
                Jn[:, k] = (res(d, np.zeros(6)) - res(-d, np.zeros(6))) \
                    / (2 * eps)
                Jn[:, 6 + k] = (res(np.zeros(6), d) - res(np.zeros(6), -d)) \
                    / (2 * eps)
            rel_err = np.abs(Ja - Jn).max() / max(np.abs(Jn).max(), 1.0)
            assert rel_err < 5e-3, rel_err

    def test_closes_drifted_ring_where_f32_stalled(self):
        """A 64-pose yaw-drifted ring with two endpoint loop factors must
        close: the device-f32 assembly's indefinite Hessian left this
        configuration uncorrected (every LM step rejected)."""
        from glim_tpu.mapping.global_mapping_pose_graph import (
            GlobalMappingPoseGraph, GlobalMappingPoseGraphParams)
        from glim_tpu.ops import lie_np
        n, radius = 64, 40.0
        drift = lie_np.se3_exp(np.array([0, 0, 4e-4, 5e-3, 0, 0]))
        gm = GlobalMappingPoseGraph(GlobalMappingPoseGraphParams(
            enable_detection_thread=False, enable_optimization=False))
        T_true, prev, cur = [], None, np.eye(4)
        for k in range(n):
            ang = 2 * np.pi * k / n
            T = np.eye(4)
            T[:2, 3] = radius * np.cos(ang), radius * np.sin(ang)
            yaw = ang + np.pi / 2
            T[:2, :2] = [[np.cos(yaw), -np.sin(yaw)],
                         [np.sin(yaw), np.cos(yaw)]]
            T_true.append(T)
            cur = T if prev is None else \
                cur @ np.linalg.inv(prev) @ T @ drift
            prev = T
            gm.poses.append(cur.copy())
            gm.odom_poses.append(cur.copy())
            gm.submaps.append(SubMap(id=k, T_world_origin=cur.copy(),
                                     frame=None))
            if k:
                dZ = np.linalg.inv(gm.odom_poses[k - 1]) @ gm.odom_poses[k]
                gm._add_factor(k - 1, k, dZ, 1.0 / 0.01, -1.0)
        for a in (0, 1):
            Zt = np.linalg.inv(T_true[a]) @ T_true[n - 1]
            gm._add_factor(a, n - 1, Zt, 1.0 / 0.01, 1.0)
        pre = np.sqrt(np.mean([np.sum((gm.poses[k][:2, 3]
                                       - T_true[k][:2, 3]) ** 2)
                               for k in range(n)]))
        gm.optimize()
        post = np.sqrt(np.mean([np.sum((gm.poses[k][:2, 3]
                                        - T_true[k][:2, 3]) ** 2)
                                for k in range(n)]))
        assert pre > 0.5, pre
        assert post < 0.5 * pre, (pre, post)
        assert all(np.all(np.isfinite(T)) for T in gm.poses)
