"""IMU-coupled frame-to-model odometry (reference cpu-module parity,
odometry_estimation_cpu.cpp:77-224)."""

import numpy as np
import pytest

from glim_tpu.io.synthetic import ate_rmse, generate_sequence
from glim_tpu.odometry.odometry_estimation_cpu_imu import (
    OdometryEstimationCPUIMU, OdometryEstimationCPUIMUParams)
from glim_tpu.preprocess.cloud_preprocessor import (CloudPreprocessor,
                                                    CloudPreprocessorParams)


def run(seq, params, target=1200):
    pp = CloudPreprocessor(CloudPreprocessorParams(
        random_downsample_target=target, downsample_resolution=0.4))
    odom = OdometryEstimationCPUIMU(params)
    imu_idx = 0
    ests = []
    for raw in seq.scans:
        while imu_idx < len(seq.imu) and seq.imu[imu_idx, 0] <= raw.stamp + 0.12:
            odom.insert_imu(seq.imu[imu_idx, 0], seq.imu[imu_idx, 1:4],
                            seq.imu[imu_idx, 4:7])
            imu_idx += 1
        e = odom.insert_frame(pp.preprocess(raw))
        if e is not None:
            ests.append((raw.stamp, e))
    return ests, odom


def params(**kw):
    base = dict(window_size=6, outer_iterations=3, inner_iterations=2,
                initialization_window_size=0.3, model_capacity=32768,
                ivox_resolution=0.8, vgicp_resolution=0.5)
    base.update(kw)
    return OdometryEstimationCPUIMUParams(**base)


@pytest.mark.slow
@pytest.mark.parametrize("reg", ["GICP", "VGICP"])
def test_cpu_imu_accuracy(reg):
    seq = generate_sequence(duration=2.5, scan_hz=10.0, n_scan_points=2000,
                            noise=0.01, seed=53, scene_points=25000)
    ests, odom = run(seq, params(registration_type=reg))
    assert odom.requires_imu()
    gt = [seq.gt_poses[int(round(s * 10))] for s, _ in ests]
    ate = ate_rmse([e.T_world_lidar for _, e in ests], gt, align=True)
    assert ate < 0.12, (reg, ate)
    # Metric velocity is observable through the IMU coupling.
    vs = [np.linalg.norm(e.v_world_imu) for _, e in ests[5:]]
    assert abs(float(np.mean(vs)) - 3.0) < 0.4


@pytest.mark.slow
def test_cpu_imu_beats_lidar_only_on_aggressive_motion():
    """The acknowledged round-1 deviation, erased: with enable_imu the cpu
    module must beat the LiDAR-only fallback under fast rotation."""
    from glim_tpu.odometry.odometry_estimation_cpu import (
        OdometryEstimationCPU, OdometryEstimationCPUParams)

    seq = generate_sequence(duration=2.5, scan_hz=10.0, n_scan_points=2000,
                            noise=0.01, seed=59, scene_points=25000,
                            radius=5.0, omega=1.1)
    pp = CloudPreprocessor(CloudPreprocessorParams(
        random_downsample_target=1200, downsample_resolution=0.4))

    lidar_only = OdometryEstimationCPU(OdometryEstimationCPUParams(
        registration_type="GICP", model_capacity=32768, ivox_resolution=0.8))
    lo_ests = [(raw.stamp, lidar_only.insert_frame(pp.preprocess(raw)))
               for raw in seq.scans]

    ests, _ = run(seq, params(registration_type="GICP"))

    gt_lo = [seq.gt_poses[int(round(s * 10))] for s, _ in lo_ests]
    ate_lo = ate_rmse([e.T_world_lidar for _, e in lo_ests], gt_lo, align=True)
    gt_imu = [seq.gt_poses[int(round(s * 10))] for s, _ in ests]
    ate_imu = ate_rmse([e.T_world_lidar for _, e in ests], gt_imu, align=True)
    assert ate_imu < ate_lo, (ate_imu, ate_lo)
    assert ate_imu < 0.2, ate_imu


def test_registry_dispatch():
    from glim_tpu.utils.config import Config
    from glim_tpu.utils.registry import load_module

    cfg = Config({"odometry_estimation": {"enable_imu": False,
                                          "registration_type": "GICP"}})
    from glim_tpu.odometry.odometry_estimation_cpu import OdometryEstimationCPU
    m = load_module("odometry", "libodometry_estimation_cpu.so", cfg)
    assert isinstance(m, OdometryEstimationCPU)

    cfg2 = Config({"odometry_estimation": {"registration_type": "VGICP"}})
    m2 = load_module("odometry", "libodometry_estimation_cpu.so", cfg2)
    assert isinstance(m2, OdometryEstimationCPUIMU)
    assert m2.requires_imu()
