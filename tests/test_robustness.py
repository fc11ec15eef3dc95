"""Robustness tests: IMU dropouts, submap batch refinement, degraded input."""

import numpy as np
import pytest

from glim_tpu.io.synthetic import ate_rmse, generate_sequence
from glim_tpu.preprocess.cloud_preprocessor import (CloudPreprocessor,
                                                    CloudPreprocessorParams)


@pytest.mark.slow
class TestImuDropout:
    def test_odometry_survives_imu_gap(self):
        """The window estimator must keep tracking (matching factors carry
        the chain) through a 1-second IMU outage (reference degradation path:
        odometry_estimation_imu.cpp:252-257)."""
        from glim_tpu.odometry.odometry_estimation_imu import (
            OdometryEstimationIMU, OdometryEstimationIMUParams)

        seq = generate_sequence(duration=3.0, scan_hz=10.0, n_scan_points=2000,
                                noise=0.01, seed=41, scene_points=25000)
        pp = CloudPreprocessor(CloudPreprocessorParams(
            random_downsample_target=1000, downsample_resolution=0.4))
        odom = OdometryEstimationIMU(OdometryEstimationIMUParams(
            voxel_resolution=0.5, voxel_capacity=16384,
            initialization_window_size=0.3))
        imu_idx = 0
        ests = []
        for raw in seq.scans:
            while imu_idx < len(seq.imu) and seq.imu[imu_idx, 0] <= raw.stamp + 0.12:
                t = seq.imu[imu_idx, 0]
                # Outage: drop all IMU between 1.5 s and 2.5 s.
                if not (1.5 < t < 2.5):
                    odom.insert_imu(t, seq.imu[imu_idx, 1:4], seq.imu[imu_idx, 4:7])
                imu_idx += 1
            e = odom.insert_frame(pp.preprocess(raw))
            if e is not None:
                ests.append((raw.stamp, e))
        # No crash, all poses finite, trajectory roughly intact.
        for _, e in ests:
            assert np.isfinite(e.T_world_lidar).all()
        gt = [seq.gt_poses[int(round(s * 10))] for s, _ in ests]
        ate = ate_rmse([e.T_world_lidar for _, e in ests], gt, align=True)
        assert ate < 0.5, ate


class TestSubmapRefinement:
    def test_batch_optimization_improves_consistency(self, rng):
        """enable_optimization: the fully-connected VGICP refinement must pull
        perturbed keyframe poses back toward consistency
        (reference: sub_mapping.cpp:421-452)."""
        import jax.numpy as jnp

        from glim_tpu.mapping.sub_mapping import SubMapping, SubMappingParams
        from glim_tpu.ops import lie_np
        from glim_tpu.types import EstimationFrame, FrameID, PointBatch

        # Shared structured world observed from slightly-wrong poses.
        world = np.zeros((600, 3), np.float32)
        world[:200, :2] = rng.uniform(-8, 8, (200, 2))
        world[200:400, 0] = rng.uniform(-8, 8, 200)
        world[200:400, 2] = rng.uniform(0, 4, 200)
        world[400:, 1] = rng.uniform(-8, 8, 200)
        world[400:, 2] = rng.uniform(0, 4, 200)

        def frame_at(fid, T_true, T_noisy):
            cap = 1024
            Ti = np.linalg.inv(T_true)
            local = (Ti[:3, :3] @ world.T).T + Ti[:3, 3]
            pts = np.zeros((cap, 3), np.float32)
            pts[:600] = local
            mask = np.zeros(cap, bool)
            mask[:600] = True
            covs = np.broadcast_to(np.eye(3, dtype=np.float32) * 0.02,
                                   (cap, 3, 3)).copy()
            return EstimationFrame(
                id=fid, stamp=0.1 * fid, T_world_lidar=T_noisy,
                frame_id=FrameID.LIDAR,
                frame=PointBatch(points=jnp.asarray(pts), mask=jnp.asarray(mask),
                                 covs=jnp.asarray(covs)))

        sm = SubMapping(SubMappingParams(
            max_num_keyframes=4, keyframe_update_strategy="DISPLACEMENT",
            keyframe_update_interval_trans=0.3, enable_optimization=True,
            keyframe_update_min_points=100, refine_subsample=2,
            optimization_outer=3, optimization_inner=3))
        errs_in = []
        for k in range(4):
            T_true = np.eye(4)
            T_true[0, 3] = 0.5 * k
            noise = lie_np.se3_exp(rng.normal(size=6) * np.array(
                [0.01, 0.01, 0.01, 0.05, 0.05, 0.02]))
            T_noisy = T_true @ noise
            errs_in.append(np.linalg.norm(
                lie_np.se3_log(np.linalg.inv(T_true) @ T_noisy)))
            sm.insert_frame(frame_at(k, T_true, T_noisy))
        submaps = sm.get_submaps() or sm.submit_end_of_sequence()
        assert len(submaps) == 1
        s = submaps[0]
        # After refinement, relative keyframe poses should match truth better
        # than the injected noise.
        errs_out = []
        for k in range(1, len(s.frames)):
            d_est = np.linalg.inv(s.frames[k - 1].T_world_lidar) @ s.frames[k].T_world_lidar
            d_true = np.eye(4)
            d_true[0, 3] = 0.5
            errs_out.append(np.linalg.norm(
                lie_np.se3_log(np.linalg.inv(d_true) @ d_est)))
        assert np.mean(errs_out) < np.mean(errs_in), (errs_in, errs_out)


class TestDegradedScans:
    def test_tiny_scan(self, rng):
        """A nearly-empty scan must flow through preprocessing without error."""
        from glim_tpu.types import RawPoints
        pp = CloudPreprocessor(CloudPreprocessorParams(
            random_downsample_target=1000, downsample_resolution=0.4))
        raw = RawPoints(stamp=0.0, points=rng.normal(size=(5, 3)) * 5,
                        times=np.linspace(0, 0.1, 5))
        f = pp.preprocess(raw)
        assert f.size <= 5

    def test_all_points_filtered(self, rng):
        """Every point outside the range band -> empty but valid frame."""
        from glim_tpu.types import RawPoints
        pp = CloudPreprocessor(CloudPreprocessorParams(
            random_downsample_target=1000, distance_far_thresh=10.0))
        raw = RawPoints(stamp=0.0, points=rng.normal(size=(500, 3)) * 500,
                        times=np.linspace(0, 0.1, 500))
        f = pp.preprocess(raw)
        assert f.size == 0
