"""Full-pipeline loop closure: a trajectory that returns to its start must
trigger loop detection and keep the global map consistent."""

import json
import os

import numpy as np
import pytest

from glim_tpu.io.synthetic import ate_rmse, generate_sequence
from glim_tpu.pipeline import GlimTPU
from glim_tpu.utils.config import GlobalConfig, create_default_config_dir


def loop_config(tmp_path) -> str:
    cfg_dir = create_default_config_dir(str(tmp_path / "config"))

    def patch(fname, fn):
        p = os.path.join(cfg_dir, fname)
        with open(p) as f:
            d = json.load(f)
        fn(d)
        with open(p, "w") as f:
            json.dump(d, f)

    patch("config.json", lambda d: d["global"].update(
        config_odometry="config_odometry_cpu.json",
        config_sub_mapping="config_sub_mapping_cpu.json",
        config_global_mapping="config_global_mapping_pose_graph.json"))
    patch("config_preprocess.json", lambda d: d["preprocess"].update(
        random_downsample_target=1500, downsample_resolution=0.4))
    patch("config_odometry_cpu.json", lambda d: d["odometry_estimation"].update(
        registration_type="VGICP", vgicp_resolution=0.5, smoother_lag=0.5,
        initialization_window_size=0.5))
    patch("config_sub_mapping_cpu.json", lambda d: d["sub_mapping"].update(
        max_num_keyframes=4, keyframe_update_strategy="DISPLACEMENT",
        keyframe_update_interval_trans=1.2))
    patch("config_global_mapping_pose_graph.json", lambda d: d["global_mapping"].update(
        min_travel_dist=20.0, max_neighbor_dist=6.0, min_inliear_fraction=0.3,
        vgicp_voxel_resolution=1.0, odom_factor_stddev=0.1,
        loop_factor_stddev=0.05, loop_factor_robust_width=10.0))
    return cfg_dir


@pytest.mark.slow
class TestLoopClosureE2E:
    def test_full_loop_closes(self, tmp_path):
        # omega=0.75 closes the circle in ~8.4 s; run 9.5 s so the end
        # revisits the start region.
        seq = generate_sequence(duration=9.5, scan_hz=10.0, n_scan_points=3000,
                                noise=0.015, seed=47, scene_points=40000,
                                radius=8.0, omega=0.75)
        glim = GlimTPU(config_path=loop_config(tmp_path), async_mode=False)
        imu_idx = 0
        for raw in seq.scans:
            while imu_idx < len(seq.imu) and seq.imu[imu_idx, 0] <= raw.stamp + 0.1:
                glim.insert_imu(seq.imu[imu_idx, 0], seq.imu[imu_idx, 1:4],
                                seq.imu[imu_idx, 4:7])
                imu_idx += 1
            glim.insert_frame(raw)
        glim.wait()

        gm = glim.global_mapping
        assert len(gm.submaps) >= 4, len(gm.submaps)
        assert gm.num_loops >= 1, "no loop factors accepted on a closed loop"

        # Global consistency: optimized submap positions must lie near the
        # true circle of radius 8 (centered at the world origin, which in the
        # odometry frame is at distance 8 from the start).
        T0 = seq.gt_poses[0]
        centers = np.stack([(T0 @ gm.poses[k])[:3, 3] for k in range(len(gm.poses))])
        radii = np.linalg.norm(centers[:, :2], axis=1)
        assert np.abs(radii - 8.0).max() < 1.0, radii
        GlobalConfig.reset()
