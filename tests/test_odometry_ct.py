"""Continuous-time ICP odometry tests."""

import numpy as np
import pytest

from glim_tpu.io.synthetic import ate_rmse, generate_sequence
from glim_tpu.odometry.odometry_estimation_ct import (OdometryEstimationCT,
                                                      OdometryEstimationCTParams)
from glim_tpu.preprocess.cloud_preprocessor import (CloudPreprocessor,
                                                    CloudPreprocessorParams)


@pytest.mark.slow
class TestOdometryCT:
    def test_trajectory_on_skewed_scans(self):
        # CT odometry's whole point: deskewing happens inside the factor, so
        # strongly skewed scans track without IMU.
        seq = generate_sequence(duration=3.0, scan_hz=10.0, n_scan_points=2500,
                                noise=0.01, seed=29, scene_points=30000, skew=True)
        pp = CloudPreprocessor(CloudPreprocessorParams(
            random_downsample_target=1200, downsample_resolution=0.4))
        odom = OdometryEstimationCT(OdometryEstimationCTParams(
            model_capacity=32768, lm_max_iterations=8))
        est, margs = [], []
        for raw in seq.scans:
            e = odom.insert_frame(pp.preprocess(raw), margs)
            est.append(e.T_world_lidar)
        T0 = seq.gt_poses[0]
        ate = ate_rmse([T0 @ T for T in est], seq.gt_poses, align=False)
        assert ate < 0.2, ate
        # Begin/end poses differ (continuous-time motion captured).
        e_last = odom.frames[-1] if odom.frames else None
        if e_last is not None:
            T_end = np.asarray(e_last.custom_data["T_world_lidar_end"])
            delta = np.linalg.norm(T_end[:3, 3] - e_last.T_world_lidar[:3, 3])
            assert delta > 0.1  # ~0.3 m motion during one 0.1 s scan

    def test_marginalization(self):
        seq = generate_sequence(duration=1.5, scan_hz=10.0, n_scan_points=1500,
                                seed=31, scene_points=20000)
        pp = CloudPreprocessor(CloudPreprocessorParams(
            random_downsample_target=800, downsample_resolution=0.4))
        odom = OdometryEstimationCT(OdometryEstimationCTParams(
            model_capacity=16384, smoother_lag=0.5))
        margs = []
        for raw in seq.scans:
            odom.insert_frame(pp.preprocess(raw), margs)
        assert len(margs) >= 5
