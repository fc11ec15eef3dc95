"""Tests: evaluation utilities + raycast sequence generator."""

import os

import numpy as np
import pytest

from glim_tpu.io import evaluation as ev
from glim_tpu.io.synthetic import (generate_raycast_sequence, make_path,
                                   _path_imu, GRAVITY)
from glim_tpu.ops import lie_np


def _noisy_traj(n=50, seed=0):
    rng = np.random.default_rng(seed)
    poses = []
    for i in range(n):
        T = np.eye(4)
        T[:3, :3] = lie_np.so3_exp(np.array([0, 0, 0.05 * i]))
        T[:3, 3] = [0.5 * i, 0.1 * i, 0.0]
        poses.append(T)
    return poses


def test_ate_zero_for_identical():
    poses = _noisy_traj()
    m = ev.evaluate_trajectory(poses, poses, align=False)
    assert m.ate_rmse < 1e-9
    assert m.rot_rmse_deg < 1e-6
    assert m.length_m > 10


def test_alignment_removes_rigid_offset():
    gt = _noisy_traj()
    T_off = np.eye(4)
    T_off[:3, :3] = lie_np.so3_exp(np.array([0.1, -0.2, 0.7]))
    T_off[:3, 3] = [5.0, -3.0, 2.0]
    est = [T_off @ T for T in gt]
    m_noalign = ev.evaluate_trajectory(est, gt, align=False)
    m_align = ev.evaluate_trajectory(est, gt, align=True)
    assert m_noalign.ate_rmse > 1.0
    assert m_align.ate_rmse < 1e-6


def test_rpe_catches_drift_ate_alignment_hides_less():
    gt = _noisy_traj(100)
    # Growing drift along x.
    est = []
    for i, T in enumerate(gt):
        E = T.copy()
        E[0, 3] += 0.01 * i
        est.append(E)
    m = ev.evaluate_trajectory(est, gt, align=True, rpe_deltas_m=(1.0,))
    assert m.ate_rmse > 0.05
    assert 1.0 in m.rpe_trans
    assert m.rpe_trans[1.0] > 0.005


def test_tum_roundtrip_and_association(tmp_path):
    gt = _noisy_traj(30)
    stamps = [0.1 * i for i in range(30)]
    p1 = os.path.join(tmp_path, "a.tum")
    p2 = os.path.join(tmp_path, "b.tum")
    ev.save_tum(p1, stamps, gt)
    # Slightly offset stamps within max_diff.
    ev.save_tum(p2, [s + 0.004 for s in stamps], gt)
    m = ev.evaluate_tum_files(p1, p2, max_diff=0.02, align=False)
    assert m.n_poses == 30
    assert m.ate_rmse < 1e-5


def test_umeyama_recovers_transform():
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(40, 3))
    R = lie_np.so3_exp(np.array([0.3, -0.4, 1.0]))
    t = np.array([1.0, 2.0, -3.0])
    T, s = ev.umeyama_alignment(pts, pts @ R.T + t)
    assert np.allclose(T[:3, :3], R, atol=1e-8)
    assert np.allclose(T[:3, 3], t, atol=1e-8)
    assert s == 1.0


# ------------------------------------------------ raycast generator


def test_path_imu_matches_analytic_circle():
    # Finite-difference IMU must agree with the analytic circle IMU.
    from glim_tpu.io.synthetic import circle_imu
    pose_fn = make_path("circle", speed=3.0, radius=10.0)
    for t in [0.5, 2.0, 4.7]:
        acc_fd, gyro_fd = _path_imu(pose_fn, t)
        acc_an, gyro_an = circle_imu(t, 10.0, 0.3)
        assert np.allclose(acc_fd, acc_an, atol=1e-3)
        assert np.allclose(gyro_fd, gyro_an, atol=1e-4)


@pytest.mark.parametrize("path,scene", [("circle", "room"),
                                        ("corridor", "corridor")])
def test_raycast_sequence_geometry(path, scene):
    seq = generate_raycast_sequence(duration=0.5, path=path, scene=scene,
                                    n_channels=8, n_azimuth=128, noise=0.0,
                                    seed=1)
    assert len(seq.scans) == 5
    scan = seq.scans[0]
    assert scan.size > 200
    assert scan.rings is not None and scan.rings.max() <= 7
    # All world-frame points (deskewed with GT per-point poses) must lie on
    # scene surfaces: check ranges are bounded and floor points are at z~0.
    T = seq.gt_poses[0]
    w = scan.points @ T[:3, :3].T + T[:3, 3]
    assert np.isfinite(w).all()
    r = np.linalg.norm(scan.points, axis=1)
    assert (r > 0.04).all() and (r < 81.0).all()
    # Per-point times span the scan period and are azimuth-ordered.
    assert scan.times.min() >= 0.0 and scan.times.max() <= 0.101


def test_raycast_corridor_is_degenerate():
    # Sanity: corridor scans have much lower spread along the corridor axis
    # direction variety than a room (the hard case the estimator must face).
    seq = generate_raycast_sequence(duration=0.2, path="line", scene="corridor",
                                    n_channels=8, n_azimuth=128, seed=2)
    pts = seq.scans[0].points
    # Most hits are the two side walls: |y| concentrated near the walls.
    frac_walls = np.mean(np.abs(pts[:, 1]) > 3.0)
    assert frac_walls > 0.3


def test_imu_gravity_at_rest():
    # A non-accelerating straight path: accelerometer reads -gravity in body.
    pose_fn = make_path("line", speed=1.5)
    acc, gyro = _path_imu(pose_fn, 1.0)
    assert np.allclose(acc, pose_fn(1.0)[:3, :3].T @ -GRAVITY, atol=1e-4)
    assert np.allclose(gyro, 0.0, atol=1e-5)
