"""Sub-mapping, pose-graph global mapping, and dump tests."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from glim_tpu.io.dump import export_ply, load_dump, save_dump
from glim_tpu.mapping.global_mapping_pose_graph import (GlobalMappingPoseGraph,
                                                        GlobalMappingPoseGraphParams)
from glim_tpu.mapping.sub_mapping import SubMapping, SubMappingParams
from glim_tpu.mapping.sub_mapping_passthrough import (SubMappingPassthrough,
                                                      SubMappingPassthroughParams)
from glim_tpu.ops import lie_np
from glim_tpu.types import EstimationFrame, FrameID, PointBatch, SubMap


def make_frame(rng, fid, T_world, n=400, cap=512):
    pts = np.zeros((cap, 3), np.float32)
    pts[:n] = rng.uniform(-8, 8, size=(n, 3)).astype(np.float32)
    mask = np.zeros(cap, bool)
    mask[:n] = True
    covs = np.broadcast_to(np.eye(3, dtype=np.float32) * 0.01, (cap, 3, 3)).copy()
    return EstimationFrame(
        id=fid, stamp=0.1 * fid, T_world_lidar=T_world, frame_id=FrameID.LIDAR,
        frame=PointBatch(points=jnp.asarray(pts), mask=jnp.asarray(mask),
                         covs=jnp.asarray(covs)))


def straight_frames(rng, n_frames, step=0.5):
    frames = []
    for i in range(n_frames):
        T = np.eye(4)
        T[0, 3] = i * step
        frames.append(make_frame(rng, i, T))
    return frames


class TestSubMapping:
    def test_submap_creation(self, rng):
        sm = SubMapping(SubMappingParams(max_num_keyframes=5,
                                         keyframe_update_strategy="DISPLACEMENT",
                                         keyframe_update_interval_trans=0.4,
                                         keyframe_update_min_points=100,
                                         submap_downsample_resolution=0.2))
        for f in straight_frames(rng, 12):
            sm.insert_frame(f)
        submaps = sm.get_submaps()
        assert len(submaps) >= 1
        s = submaps[0]
        # Origin at central keyframe; endpoints relative to origin.
        assert s.frame is not None and int(np.asarray(s.frame.mask).sum()) > 100
        T_L = s.T_world_origin @ s.T_origin_endpoint_L
        T_R = s.T_world_origin @ s.T_origin_endpoint_R
        assert T_R[0, 3] > T_L[0, 3]   # moved along +x
        assert len(s.frames) == 5
        assert len(s.odom_frames) >= len(s.frames)

    def test_end_of_sequence_flush(self, rng):
        sm = SubMapping(SubMappingParams(max_num_keyframes=50,
                                         keyframe_update_strategy="DISPLACEMENT",
                                         keyframe_update_min_points=100,
                                         keyframe_update_interval_trans=0.4))
        for f in straight_frames(rng, 6):
            sm.insert_frame(f)
        assert not sm.get_submaps()
        submaps = sm.submit_end_of_sequence()
        assert len(submaps) == 1

    def test_overlap_strategy(self, rng):
        sm = SubMapping(SubMappingParams(max_num_keyframes=100,
                                         keyframe_update_strategy="OVERLAP",
                                         keyframe_update_min_points=100,
                                         max_keyframe_overlap=0.8))
        # Identical poses AND identical clouds: overlap 1.0 -> only the first
        # frame becomes a keyframe.
        f0 = make_frame(rng, 0, np.eye(4))
        for i in range(5):
            f = f0.clone()
            f.id = i
            f.stamp = 0.1 * i
            sm.insert_frame(f)
        assert len(sm.keyframes) == 1
        # Large jumps: overlap ~0 -> every frame becomes a keyframe.
        # (The decision for frame k lands during frame k+1's processing —
        # delayed queue + one-frame lagged gate read — so flush to count;
        # count through the callback since submap creation clears the list.)
        from glim_tpu.mapping.callbacks import SubMappingCallbacks as SMCB
        n_new = [0]
        handle = SMCB.on_new_keyframe.add(
            lambda idx, fr: n_new.__setitem__(0, n_new[0] + 1))
        try:
            for i, f in enumerate(straight_frames(rng, 3, step=40.0)):
                sm.insert_frame(f)
            sm.submit_end_of_sequence()
        finally:
            SMCB.on_new_keyframe.remove(handle)
        assert n_new[0] >= 3


class TestSubMappingPassthrough:
    def test_submap_creation(self, rng):
        sm = SubMappingPassthrough(SubMappingPassthroughParams(
            max_num_keyframes=4, keyframe_update_interval_trans=0.3,
            submap_target_num_points=5000, point_capacity=8192))
        for f in straight_frames(rng, 10):
            sm.insert_frame(f)
        submaps = sm.get_submaps()
        assert len(submaps) >= 1
        assert int(np.asarray(submaps[0].frame.mask).sum()) > 500


def make_submap(rng, sid, T_world, n=800, cap=1024):
    pts = np.zeros((cap, 3), np.float32)
    pts[:n] = rng.uniform(-10, 10, size=(n, 3)).astype(np.float32)
    pts[:n, 2] = np.abs(pts[:n, 2]) * 0.3
    mask = np.zeros(cap, bool)
    mask[:n] = True
    covs = np.broadcast_to(np.eye(3, dtype=np.float32) * 0.05, (cap, 3, 3)).copy()
    return SubMap(id=sid, T_world_origin=np.asarray(T_world, np.float64),
                  frame=PointBatch(points=jnp.asarray(pts), mask=jnp.asarray(mask),
                                   covs=jnp.asarray(covs)))


class TestGlobalMappingPoseGraph:
    def test_odometry_chain(self, rng):
        gm = GlobalMappingPoseGraph(GlobalMappingPoseGraphParams(
            enable_optimization=True, min_travel_dist=1e9))
        for i in range(4):
            T = np.eye(4)
            T[0, 3] = 5.0 * i
            gm.insert_submap(make_submap(rng, i, T))
        assert len(gm.poses) == 4
        # Without loops, optimized poses match the odometry chain.
        for i in range(4):
            np.testing.assert_allclose(gm.poses[i][0, 3], 5.0 * i, atol=0.1)

    def test_loop_closure_corrects_drift(self, rng):
        # A square loop where odometry drifts; final submap physically
        # overlaps the first. The same world cloud is observed from both.
        world_pts = rng.uniform(-10, 10, size=(800, 3))
        world_pts[:, 2] = np.abs(world_pts[:, 2]) * 0.3

        def submap_at(sid, T_world_true):
            cap = 1024
            Ti = np.linalg.inv(T_world_true)
            local = (Ti[:3, :3] @ world_pts.T).T + Ti[:3, 3]
            pts = np.zeros((cap, 3), np.float32)
            pts[:800] = local
            mask = np.zeros(cap, bool)
            mask[:800] = True
            covs = np.broadcast_to(np.eye(3, dtype=np.float32) * 0.05, (cap, 3, 3)).copy()
            return SubMap(id=sid, T_world_origin=np.eye(4),  # set below
                          frame=PointBatch(points=jnp.asarray(pts),
                                           mask=jnp.asarray(mask),
                                           covs=jnp.asarray(covs)))

        # True poses around a square, returning to start.
        true_poses = []
        side = 20.0
        corners = [(0, 0), (side, 0), (side, side), (0, side), (0, 0.5)]
        for k, (x, y) in enumerate(corners):
            T = np.eye(4)
            T[0, 3] = x
            T[1, 3] = y
            true_poses.append(T)

        # Odometry drifts: each step adds a small error (kept within the
        # registration convergence basin of ~half a voxel).
        drift = lie_np.se3_exp(np.array([0, 0, 0.004, 0.1, 0.05, 0.0]))
        odom_poses = [true_poses[0]]
        for k in range(1, len(true_poses)):
            dT = np.linalg.inv(true_poses[k - 1]) @ true_poses[k]
            odom_poses.append(odom_poses[-1] @ dT @ drift)

        # Noise model consistent with the injected drift (~0.3 m/edge): odom
        # edges looser than the registration-validated loop edge.
        gm = GlobalMappingPoseGraph(GlobalMappingPoseGraphParams(
            enable_optimization=True, min_travel_dist=30.0, max_neighbor_dist=8.0,
            min_inliear_fraction=0.3, vgicp_voxel_resolution=1.0,
            odom_factor_stddev=0.3, loop_factor_stddev=0.05,
            loop_factor_robust_width=10.0, registration_iterations=15,
            enable_detection_thread=False))   # deterministic unit test
        for k in range(len(true_poses)):
            sm = submap_at(k, true_poses[k])
            sm.T_world_origin = odom_poses[k]
            gm.insert_submap(sm)

        assert gm.num_loops >= 1, "no loop factors were accepted"
        # Loop closure should pull the final pose back toward truth.
        err_before = np.linalg.norm(odom_poses[-1][:3, 3] - true_poses[-1][:3, 3])
        err_after = np.linalg.norm(gm.poses[-1][:3, 3] - true_poses[-1][:3, 3])
        assert err_after < err_before * 0.5, (err_before, err_after)


class TestDump:
    def test_save_load_roundtrip(self, rng, tmp_path):
        submaps = []
        poses = []
        for i in range(3):
            T = np.eye(4)
            T[0, 3] = 2.0 * i
            sm = make_submap(rng, i, T, n=200, cap=256)
            sm.frames = [EstimationFrame(id=10 * i + k, stamp=i + 0.1 * k,
                                         T_world_lidar=T) for k in range(2)]
            sm.odom_frames = [f.clone() for f in sm.frames]
            submaps.append(sm)
            poses.append(T)
        factors = dict(i=[0, 1], j=[1, 2],
                       Z=[np.eye(4), np.eye(4)],
                       info=[np.ones(6), np.ones(6)], huber=[-1.0, 1.0])
        d = str(tmp_path / "dump")
        save_dump(d, submaps, poses, factors=factors)

        assert os.path.exists(os.path.join(d, "graph.txt"))
        assert os.path.exists(os.path.join(d, "traj_lidar.txt"))
        assert os.path.exists(os.path.join(d, "000002", "data.txt"))

        submaps2, poses2, factors2 = load_dump(d)
        assert len(submaps2) == 3
        np.testing.assert_allclose(poses2[2], poses[2], atol=1e-9)
        assert submaps2[1].frames[1].stamp == pytest.approx(1.1)
        assert list(factors2["i"]) == [0, 1]
        n_pts = int(np.asarray(submaps2[0].frame.mask).sum())
        assert n_pts == 200

    def test_tum_format(self, rng, tmp_path):
        sm = make_submap(rng, 0, np.eye(4), n=50, cap=64)
        sm.frames = [EstimationFrame(id=0, stamp=123.456, T_world_lidar=np.eye(4))]
        sm.odom_frames = [sm.frames[0].clone()]
        d = str(tmp_path / "dump")
        save_dump(d, [sm], [np.eye(4)])
        line = open(os.path.join(d, "traj_lidar.txt")).readline().split()
        assert len(line) == 8
        assert float(line[0]) == pytest.approx(123.456)
        assert float(line[7]) == pytest.approx(1.0)  # qw

    def test_export_ply(self, rng, tmp_path):
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        p = str(tmp_path / "map.ply")
        export_ply(p, pts)
        data = open(p, "rb").read()
        assert data.startswith(b"ply")
        assert b"element vertex 100" in data
