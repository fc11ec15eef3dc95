"""Full-pipeline integration: GlimTPU end-to-end on a synthetic sequence."""

import json
import os

import numpy as np
import pytest

from glim_tpu.io.synthetic import ate_rmse, generate_sequence
from glim_tpu.pipeline import GlimTPU
from glim_tpu.utils.config import GlobalConfig, create_default_config_dir


def write_test_config(tmp_path) -> str:
    """Default config tree tuned down for CPU test speed."""
    cfg_dir = create_default_config_dir(str(tmp_path / "config"))
    # Select the pose-graph backend + small caps.
    with open(os.path.join(cfg_dir, "config.json")) as f:
        root = json.load(f)
    root["global"]["config_odometry"] = "config_odometry_cpu.json"
    root["global"]["config_sub_mapping"] = "config_sub_mapping_cpu.json"
    root["global"]["config_global_mapping"] = "config_global_mapping_pose_graph.json"
    with open(os.path.join(cfg_dir, "config.json"), "w") as f:
        json.dump(root, f)

    with open(os.path.join(cfg_dir, "config_preprocess.json")) as f:
        pre = json.load(f)
    pre["preprocess"]["random_downsample_target"] = 1500
    pre["preprocess"]["downsample_resolution"] = 0.4
    with open(os.path.join(cfg_dir, "config_preprocess.json"), "w") as f:
        json.dump(pre, f)

    with open(os.path.join(cfg_dir, "config_odometry_cpu.json")) as f:
        odo = json.load(f)
    odo["odometry_estimation"]["registration_type"] = "VGICP"
    odo["odometry_estimation"]["vgicp_resolution"] = 0.5
    odo["odometry_estimation"]["smoother_lag"] = 1.0
    odo["odometry_estimation"]["initialization_window_size"] = 0.5
    with open(os.path.join(cfg_dir, "config_odometry_cpu.json"), "w") as f:
        json.dump(odo, f)

    with open(os.path.join(cfg_dir, "config_sub_mapping_cpu.json")) as f:
        sub = json.load(f)
    sub["sub_mapping"]["max_num_keyframes"] = 5
    sub["sub_mapping"]["keyframe_update_strategy"] = "DISPLACEMENT"
    sub["sub_mapping"]["keyframe_update_interval_trans"] = 0.5
    with open(os.path.join(cfg_dir, "config_sub_mapping_cpu.json"), "w") as f:
        json.dump(sub, f)
    return cfg_dir


@pytest.mark.slow
class TestGlimTPUPipeline:
    def run_pipeline(self, tmp_path, async_mode):
        cfg_dir = write_test_config(tmp_path)
        seq = generate_sequence(duration=3.0, scan_hz=10.0, n_scan_points=3000,
                                noise=0.01, seed=9, scene_points=30000)
        glim = GlimTPU(config_path=cfg_dir, async_mode=async_mode)
        imu_idx = 0
        for raw in seq.scans:
            while imu_idx < len(seq.imu) and seq.imu[imu_idx, 0] <= raw.stamp + 0.1:
                glim.insert_imu(seq.imu[imu_idx, 0], seq.imu[imu_idx, 1:4],
                                seq.imu[imu_idx, 4:7])
                imu_idx += 1
            glim.insert_frame(raw)
        glim.wait()
        return glim, seq

    def test_sync_pipeline(self, tmp_path):
        glim, seq = self.run_pipeline(tmp_path, async_mode=False)
        est = glim.odometry_estimates
        # The IMU-coupled cpu module (reference parity) buffers frames until
        # LOOSE initialization completes (~initialization_window_size).
        assert len(est) >= len(seq.scans) - 8
        ate = ate_rmse([e.T_world_lidar for e in est],
                       [seq.gt_poses[e.id] for e in est], align=True)
        assert ate < 0.2, ate
        # Submaps reached global mapping.
        assert len(glim.global_mapping.submaps) >= 1
        pts = glim.export_points()
        assert pts.shape[0] > 1000

        dump = str(tmp_path / "dump")
        glim.save(dump)
        assert os.path.exists(os.path.join(dump, "graph.txt"))
        assert os.path.exists(os.path.join(dump, "config", "config.json"))
        GlobalConfig.reset()

    def test_async_pipeline(self, tmp_path):
        glim, seq = self.run_pipeline(tmp_path, async_mode=True)
        est = glim.odometry_estimates
        assert len(est) >= len(seq.scans) - 8
        ate = ate_rmse([e.T_world_lidar for e in est],
                       [seq.gt_poses[e.id] for e in est], align=True)
        assert ate < 0.2, ate
        assert len(glim.global_mapping.global_mapping.submaps) >= 1
        GlobalConfig.reset()


class TestRegistryCoverage:
    def test_all_reference_module_names_resolve(self, tmp_path):
        """Every so_name the reference configs can select must resolve to a
        registered factory with our default config objects."""
        from glim_tpu.utils.config import Config
        from glim_tpu.utils.default_config import DEFAULT_CONFIGS
        from glim_tpu.utils.registry import available_modules, canonical_name

        odo = available_modules("odometry")
        sub = available_modules("sub_mapping")
        glb = available_modules("global_mapping")
        ext = available_modules("extension")

        for fname, data in DEFAULT_CONFIGS.items():
            cfg = Config(data)
            for section, table in [("odometry_estimation", odo),
                                   ("sub_mapping", sub),
                                   ("global_mapping", glb)]:
                so = cfg.param(section, "so_name", None)
                if so:
                    assert canonical_name(so) in table, (fname, so)
        # Extension modules from config_ros.json.
        for so in DEFAULT_CONFIGS["config_ros.json"]["glim_ros"]["extension_modules"]:
            assert canonical_name(so) in ext, so


@pytest.mark.slow
class TestImuPipelineE2E:
    def test_default_gpu_config_pipeline(self, tmp_path):
        """The DEFAULT config path (odometry_estimation_gpu = the LiDAR-IMU
        window estimator) through the full sync pipeline."""
        cfg_dir = create_default_config_dir(str(tmp_path / "config"))
        # Shrink capacities for CPU test speed.
        for fname, section, upd in [
            ("config_preprocess.json", "preprocess",
             dict(random_downsample_target=1200, downsample_resolution=0.4)),
            ("config_odometry_gpu.json", "odometry_estimation",
             dict(voxel_resolution=0.5, initialization_window_size=0.3)),
            ("config_sub_mapping_gpu.json", "sub_mapping",
             dict(max_num_keyframes=4, keyframe_update_strategy="DISPLACEMENT",
                  keyframe_update_interval_trans=0.5)),
        ]:
            p = os.path.join(cfg_dir, fname)
            with open(p) as f:
                d = json.load(f)
            d[section].update(upd)
            with open(p, "w") as f:
                json.dump(d, f)

        seq = generate_sequence(duration=2.5, scan_hz=10.0, n_scan_points=2500,
                                noise=0.01, seed=53, scene_points=25000)
        glim = GlimTPU(config_path=cfg_dir, async_mode=False)
        # Shrink the device-side capacities on the instantiated module.
        glim.odometry.params.voxel_capacity = 16384
        glim.odometry.model = tuple(
            __import__("glim_tpu.ops.voxelmap", fromlist=["x"]).empty_gaussian_voxelmap(
                16384, 0.5 * (2.0 ** lvl)) for lvl in range(2))
        imu_idx = 0
        for raw in seq.scans:
            while imu_idx < len(seq.imu) and seq.imu[imu_idx, 0] <= raw.stamp + 0.12:
                glim.insert_imu(seq.imu[imu_idx, 0], seq.imu[imu_idx, 1:4],
                                seq.imu[imu_idx, 4:7])
                imu_idx += 1
            glim.insert_frame(raw)
        glim.wait()
        est = glim.odometry_estimates
        assert len(est) >= 15
        gt = [seq.gt_poses[int(round(e.stamp * 10))] for e in est]
        ate = ate_rmse([e.T_world_lidar for e in est], gt, align=True)
        assert ate < 0.15, ate
        assert len(glim.global_mapping.submaps) >= 1
        GlobalConfig.reset()
