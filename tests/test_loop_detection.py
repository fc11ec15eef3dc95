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
