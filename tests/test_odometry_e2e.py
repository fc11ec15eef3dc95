"""End-to-end odometry slice: synthetic LiDAR sequence -> preprocess ->
frame-to-model registration -> trajectory ATE vs ground truth."""

import numpy as np
import pytest

from glim_tpu.io.synthetic import ate_rmse, generate_sequence
from glim_tpu.odometry.odometry_estimation_cpu import (OdometryEstimationCPU,
                                                       OdometryEstimationCPUParams)
from glim_tpu.preprocess.cloud_preprocessor import (CloudPreprocessor,
                                                    CloudPreprocessorParams)


def anchor_to_gt(est_poses, seq):
    """Odometry starts at identity; express it in the world frame of the
    sequence's first ground-truth pose for direct ATE comparison."""
    T0 = seq.gt_poses[0]
    return [T0 @ T for T in est_poses]


def run_odometry(seq, odom_params, target=2000):
    pp = CloudPreprocessor(CloudPreprocessorParams(
        random_downsample_target=target, downsample_resolution=0.4,
        k_correspondences=10, distance_near_thresh=0.5, distance_far_thresh=100.0))
    odom = OdometryEstimationCPU(odom_params)
    est_poses = []
    marginalized = []
    for raw in seq.scans:
        frame = pp.preprocess(raw)
        est = odom.insert_frame(frame, marginalized)
        est_poses.append(est.T_world_lidar)
    return est_poses, marginalized, odom


@pytest.mark.slow
class TestOdometryE2E:
    def test_vgicp_trajectory(self):
        seq = generate_sequence(duration=3.0, scan_hz=10.0, n_scan_points=4000,
                                noise=0.01, seed=3, scene_points=40000)
        params = OdometryEstimationCPUParams(
            registration_type="VGICP", vgicp_resolution=0.5,
            voxel_capacity=65536, max_iterations=8)
        est, margs, odom = run_odometry(seq, params)

        # Trajectory should track ground truth closely (no alignment:
        # both start at the same pose).
        ate = ate_rmse(anchor_to_gt(est, seq), seq.gt_poses, align=False)
        assert ate < 0.15, f"VGICP ATE {ate}"
        # The sequence moves ~9m along the circle; make sure we moved.
        traveled = np.linalg.norm(est[-1][:3, 3] - est[0][:3, 3])
        assert traveled > 1.0

    def test_bootstrap_replay_keeps_anchor(self):
        """The bootstrap model rebuild re-runs the first scans with the
        converged twist; the replayed trajectory must stay anchored at
        frame 0 = identity (the replay seeds a nonzero twist, and the step's
        constant-velocity predictor would otherwise advance frame 0 by
        exp(twist*dt) and shift the whole map)."""
        seq = generate_sequence(duration=2.0, scan_hz=10.0, n_scan_points=4000,
                                noise=0.01, seed=3, scene_points=40000)
        params = OdometryEstimationCPUParams(
            registration_type="VGICP", vgicp_resolution=0.5,
            voxel_capacity=65536, max_iterations=8, bootstrap_frames=5,
            bootstrap_refine="replay")
        est, _, odom = run_odometry(seq, params)
        assert odom._boot_done and not odom._boot
        # No discontinuity at the replay boundary: consecutive pose deltas
        # stay near the true per-scan motion (~0.3 m at 3 m/s, 10 Hz).
        deltas = [np.linalg.norm(est[i + 1][:3, 3] - est[i][:3, 3])
                  for i in range(len(est) - 1)]
        assert max(deltas) < 0.6, deltas
        ate = ate_rmse(anchor_to_gt(est, seq), seq.gt_poses, align=False)
        ate_off = None
        params_off = OdometryEstimationCPUParams(
            registration_type="VGICP", vgicp_resolution=0.5,
            voxel_capacity=65536, max_iterations=8,
            bootstrap_refine="off")
        est_off, _, _ = run_odometry(seq, params_off)
        ate_off = ate_rmse(anchor_to_gt(est_off, seq), seq.gt_poses,
                           align=False)
        # The rebuilt (deskewed) bootstrap model must not be worse.
        assert ate <= ate_off * 1.2, (ate, ate_off)

    def test_gicp_trajectory(self):
        seq = generate_sequence(duration=2.0, scan_hz=10.0, n_scan_points=3000,
                                noise=0.01, seed=4, scene_points=30000)
        params = OdometryEstimationCPUParams(
            registration_type="GICP", model_capacity=32768,
            ivox_min_dist=0.1, max_iterations=6)
        est, margs, odom = run_odometry(seq, params, target=1500)
        ate = ate_rmse(anchor_to_gt(est, seq), seq.gt_poses, align=False)
        assert ate < 0.15, f"GICP ATE {ate}"

    def test_marginalization_emits_frames(self):
        seq = generate_sequence(duration=2.0, scan_hz=10.0, n_scan_points=2000,
                                seed=5, scene_points=20000)
        params = OdometryEstimationCPUParams(
            registration_type="VGICP", smoother_lag=0.5, voxel_capacity=32768)
        est, margs, odom = run_odometry(seq, params, target=1000)
        assert len(margs) > 5
        assert margs[0].id == 0
        rem = odom.get_remaining_frames()
        assert len(rem) + len(margs) == len(seq.scans)
