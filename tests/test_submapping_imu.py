"""SubMapping IMU machinery (reference sub_mapping.cpp:117-243,339-452):
IMU-rate chain smoothing, keyframe re-deskew inputs, and the in-submap
batch refinement with IMU + VGICP factors."""

import jax.numpy as jnp
import numpy as np
import pytest

from glim_tpu.mapping.sub_mapping import SubMapping, SubMappingParams
from glim_tpu.ops import imu as imu_ops
from glim_tpu.ops import lie_np
from glim_tpu.types import EstimationFrame, FrameID, PointBatch

GRAVITY = np.array([0.0, 0.0, -9.80665])


def test_smooth_pose_chain_anchors_endpoints():
    # Straight-line chain that drifted: integrated end != true end.
    N = 16
    Rs = jnp.tile(jnp.eye(3), (N, 1, 1))
    ps = jnp.asarray(np.stack([[0.1 * i, 0.0, 0.0] for i in range(N)]),
                     jnp.float32)
    mask = jnp.ones(N, bool)
    sigmas = jnp.full(N, 0.1, jnp.float32)
    T_end = np.eye(4)
    T_end[:3, 3] = [0.1 * (N - 1), 0.3, 0.0]   # true end is 0.3 off in y
    Rs2, ps2 = imu_ops.smooth_pose_chain(Rs, ps, mask, sigmas,
                                         jnp.asarray(T_end, jnp.float32))
    ps2 = np.asarray(ps2)
    # Start pinned, end anchored, correction distributed monotonically.
    assert np.allclose(ps2[0], [0.0, 0.0, 0.0], atol=1e-5)
    assert np.allclose(ps2[-1], T_end[:3, 3], atol=1e-4)
    y = ps2[:, 1]
    assert np.all(np.diff(y) > -1e-6)
    assert 0.05 < y[N // 2] < 0.25


def _scene(rng, n=3000):
    pts = rng.uniform(-10, 10, size=(n, 3))
    pts[:, 2] = np.abs(pts[:, 2]) * 0.3
    # Add walls for constraint in all directions.
    w = rng.uniform(-10, 10, size=(n // 2, 3))
    w[: n // 4, 0] = 10.0
    w[n // 4:, 1] = -10.0
    return np.concatenate([pts, w])


def _frame(fid, stamp, T_true, T_obs, scene, rng, cap=768):
    """Cloud = scene observed from the TRUE pose; pose estimate = T_obs."""
    Ti = np.linalg.inv(T_true)
    local = scene @ Ti[:3, :3].T + Ti[:3, 3]
    keep = np.linalg.norm(local, axis=1) < 12.0
    local = local[keep][:cap]
    pts = np.zeros((cap, 3), np.float32)
    pts[:len(local)] = local + rng.normal(size=local.shape) * 0.005
    mask = np.zeros(cap, bool)
    mask[:len(local)] = True
    covs = np.broadcast_to(np.eye(3, dtype=np.float32) * 0.01,
                           (cap, 3, 3)).copy()
    f = EstimationFrame(
        id=fid, stamp=stamp, T_world_lidar=T_obs, frame_id=FrameID.LIDAR,
        frame=PointBatch(points=jnp.asarray(pts), mask=jnp.asarray(mask),
                         covs=jnp.asarray(covs)))
    f.v_world_imu = np.array([1.0, 0.0, 0.0])
    f.imu_bias = np.zeros(6)
    return f


def _line_pose(t):
    T = np.eye(4)
    T[:3, 3] = [t * 1.0, 0.0, 1.0]
    return T


def _feed_imu(sm, t0, t1, hz=100.0):
    t = t0
    while t < t1 - 1e-9:
        t += 1.0 / hz
        sm.insert_imu(t, -GRAVITY, np.zeros(3))


@pytest.mark.slow
def test_imu_rate_trajectory_smoothing_written():
    rng = np.random.default_rng(3)
    scene = _scene(rng)
    sm = SubMapping(SubMappingParams(max_num_keyframes=50,
                                     keyframe_update_min_points=100,
                                     keyframe_update_strategy="DISPLACEMENT",
                                     keyframe_update_interval_trans=0.05))
    prev_t = -0.1
    for i in range(4):
        t = 0.1 * i
        _feed_imu(sm, prev_t, t)
        prev_t = t
        sm.insert_frame(_frame(i, t, _line_pose(t), _line_pose(t), scene, rng))
    # Processed frames carry the doubly-anchored IMU-rate trajectory.
    done = sm.frames
    assert len(done) == 3
    traj = done[1].imu_rate_trajectory
    assert traj is not None and traj.shape[0] == 8 and traj.shape[1] >= 5
    # Chain spans the inter-frame interval and tracks the line (x ~ t).
    assert abs(traj[0, 0] - done[1].stamp) < 0.02
    xs = traj[1]
    assert np.all(np.diff(xs) > -0.01)
    assert np.allclose(traj[2:4], [[0.0], [1.0]], atol=0.05)


@pytest.mark.slow
def test_batch_refinement_recovers_perturbed_poses():
    """enable_optimization + IMU factors must pull corrupted mid-submap
    poses back toward truth (reference sub_mapping.cpp:421-452 role)."""
    rng = np.random.default_rng(11)
    scene = _scene(rng)
    N = 8

    def build(enable_opt):
        sm = SubMapping(SubMappingParams(
            max_num_keyframes=N, keyframe_update_min_points=100,
            keyframe_update_strategy="DISPLACEMENT",
            keyframe_update_interval_trans=0.01,
            enable_optimization=enable_opt, enable_imu=True,
            keyframe_voxel_resolution=0.5, keyframe_voxelmap_levels=2,
            refine_subsample=2, keyframe_voxel_capacity=8192))
        prev_t = -0.1
        errs0 = []
        for i in range(N + 1):
            t = 0.1 * i
            T_true = _line_pose(t)
            T_obs = T_true.copy()
            if 2 <= i <= N - 2:
                T_obs[:3, 3] += rng.normal(size=3) * 0.12
            errs0.append(np.linalg.norm(T_obs[:3, 3] - T_true[:3, 3]))
            _feed_imu(sm, prev_t, t)
            prev_t = t
            sm.insert_frame(_frame(i, t, T_true, T_obs, scene, rng))
        subs = sm.submit_end_of_sequence()
        assert len(subs) >= 1
        s = subs[0]
        errs = [np.linalg.norm(f.T_world_sensor()[:3, 3]
                               - _line_pose(f.stamp)[:3, 3])
                for f in s.frames]
        return float(np.mean(errs)), float(np.mean(errs0[:len(s.frames)]))

    err_opt, err_in = build(True)
    assert err_opt < err_in * 0.7, (err_opt, err_in)
    assert err_opt < 0.06, err_opt
