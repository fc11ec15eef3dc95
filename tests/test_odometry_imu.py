"""Tightly-coupled LiDAR-IMU odometry tests on synthetic sequences."""

import numpy as np
import pytest

from glim_tpu.io.synthetic import ate_rmse, generate_sequence
from glim_tpu.odometry.odometry_estimation_imu import (OdometryEstimationIMU,
                                                       OdometryEstimationIMUParams)
from glim_tpu.preprocess.cloud_preprocessor import (CloudPreprocessor,
                                                    CloudPreprocessorParams)


def run(seq, params, target=1200):
    pp = CloudPreprocessor(CloudPreprocessorParams(
        random_downsample_target=target, downsample_resolution=0.4))
    odom = OdometryEstimationIMU(params)
    imu_idx = 0
    ests, margs = [], []
    for raw in seq.scans:
        while imu_idx < len(seq.imu) and seq.imu[imu_idx, 0] <= raw.stamp + 0.12:
            odom.insert_imu(seq.imu[imu_idx, 0], seq.imu[imu_idx, 1:4],
                            seq.imu[imu_idx, 4:7])
            imu_idx += 1
        e = odom.insert_frame(pp.preprocess(raw), margs)
        if e is not None:
            ests.append((raw.stamp, e))
    return ests, margs, odom


@pytest.mark.slow
class TestOdometryIMU:
    def params(self, **kw):
        base = dict(voxel_resolution=0.5, voxel_capacity=32768, window_size=4,
                    outer_iterations=3, inner_iterations=2,
                    initialization_window_size=0.3)
        base.update(kw)
        return OdometryEstimationIMUParams(**base)

    def test_trajectory_accuracy(self):
        seq = generate_sequence(duration=3.0, scan_hz=10.0, n_scan_points=2500,
                                noise=0.01, seed=13, scene_points=30000)
        ests, margs, odom = run(seq, self.params())
        gt = [seq.gt_poses[int(round(s * 10))] for s, _ in ests]
        est_poses = [e.T_world_lidar for _, e in ests]
        ate = ate_rmse(est_poses, gt, align=True)
        assert ate < 0.08, ate
        # Velocity magnitude ~ radius * omega = 3 m/s on the circle.
        vs = [np.linalg.norm(e.v_world_imu) for _, e in ests[5:]]
        assert abs(float(np.mean(vs)) - 3.0) < 0.3
        # Marginalized frames stream out as the window slides.
        assert len(margs) >= len(ests) - odom.W

    def test_aggressive_motion(self):
        """Under fast rotation the IMU estimator must stay accurate AND
        deliver the states LiDAR-only odometry cannot observe (metric
        velocity from a standing start, gravity-aligned attitude)."""
        seq = generate_sequence(duration=3.0, scan_hz=10.0, n_scan_points=2500,
                                noise=0.01, seed=17, scene_points=30000,
                                radius=6.0, omega=0.9)
        ests, _, _ = run(seq, self.params())
        gt = [seq.gt_poses[int(round(s * 10))] for s, _ in ests]
        ate_imu = ate_rmse([e.T_world_lidar for _, e in ests], gt, align=True)
        assert ate_imu < 0.15, ate_imu
        # Speed on this circle is radius * omega = 5.4 m/s.
        vs = [np.linalg.norm(e.v_world_imu) for _, e in ests[5:]]
        assert abs(float(np.mean(vs)) - 5.4) < 0.5

    def test_known_bias_estimated(self):
        bias = np.array([0.05, -0.03, 0.02, 0.002, -0.001, 0.003])
        seq = generate_sequence(duration=3.0, scan_hz=10.0, n_scan_points=2500,
                                noise=0.01, seed=19, scene_points=30000,
                                imu_bias=bias)
        ests, _, _ = run(seq, self.params())
        gt = [seq.gt_poses[int(round(s * 10))] for s, _ in ests]
        ate = ate_rmse([e.T_world_lidar for _, e in ests], gt, align=True)
        # Matching factors must hold the trajectory despite the biased IMU.
        assert ate < 0.12, ate
        # Gyro bias z (0.003) should be at least partially recovered.
        b_est = ests[-1][1].imu_bias
        assert abs(b_est[5] - bias[5]) < 0.01

    def test_waits_for_init_imu(self):
        seq = generate_sequence(duration=1.0, scan_hz=10.0, n_scan_points=1500,
                                seed=23, scene_points=20000)
        pp = CloudPreprocessor(CloudPreprocessorParams(
            random_downsample_target=800, downsample_resolution=0.4))
        odom = OdometryEstimationIMU(self.params())
        # No IMU yet: frames are rejected.
        assert odom.insert_frame(pp.preprocess(seq.scans[0])) is None
        assert not odom.initialized
