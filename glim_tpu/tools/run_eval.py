"""Accuracy evaluation suite: full pipeline over raycast benchmark sequences.

    python -m glim_tpu.tools.run_eval [--out EVAL.md] [--quick]
        [--sequences circle_room,figure8_room,corridor,aggressive]
        [--window-study] [--scan-hz 10] [--duration 20]

Runs preprocess -> LiDAR-IMU odometry -> sub-mapping -> global mapping over
simulated spinning-LiDAR sequences (glim_tpu.io.synthetic raycast generator:
elevation rings, azimuth timing, occlusion, degenerate corridors, exact
ground truth), evaluates ATE/RPE with the evo-equivalent module, measures
end-to-end throughput, and writes a markdown report.

The real-data path (KITTI .bin loader, rosbag2/mcap converter) uses the same
pipeline + evaluator via glim_runner + tools/evaluate; this suite exists
because the build sandbox has no network access and therefore no public
datasets — the harness is identical either way (SURVEY.md §4 implication)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

SEQUENCES = {
    # name: generator kwargs
    "circle_room": dict(path="circle", scene="room", speed=2.0, radius=10.0),
    "figure8_room": dict(path="figure8", scene="room", speed=2.5, extent=14.0),
    "corridor": dict(path="corridor", scene="corridor", speed=2.0,
                     length=30.0, turn_radius=3.0),
    "aggressive": dict(path="figure8", scene="room", speed=4.0,
                       aggressive=1.0, extent=12.0),
    # Large open loop: only LOCAL structure is visible (no enclosing room),
    # so odometry drifts over the ~170 m lap and the implicit loop closure
    # in global mapping must pull the ring back together — the sequence
    # where the backend (not just the odometry) earns its ATE.
    "city_loop": dict(path="circle", scene="blocks", speed=4.0, radius=27.0,
                      extent=27.0, max_range=35.0, duration=47.0),
}


def _make_odometry(kind, odom_params):
    """Registry-matrix odometry factory (reference pipeline configs:
    CMakeLists.txt:123-149 / BASELINE.json)."""
    if kind == "flagship":
        from glim_tpu.odometry.odometry_estimation_imu import (
            OdometryEstimationIMU, OdometryEstimationIMUParams)
        return OdometryEstimationIMU(
            odom_params or OdometryEstimationIMUParams(
                voxel_resolution=0.5, voxel_capacity=131072,
                initialization_window_size=0.5))
    if kind in ("cpu_gicp", "cpu_vgicp"):
        from glim_tpu.odometry.odometry_estimation_cpu_imu import (
            OdometryEstimationCPUIMU, OdometryEstimationCPUIMUParams)
        return OdometryEstimationCPUIMU(OdometryEstimationCPUIMUParams(
            registration_type="GICP" if kind == "cpu_gicp" else "VGICP",
            voxel_capacity=131072, initialization_window_size=0.5))
    if kind == "ct":
        from glim_tpu.odometry.odometry_estimation_ct import (
            OdometryEstimationCT, OdometryEstimationCTParams)
        return OdometryEstimationCT(odom_params or OdometryEstimationCTParams())
    raise ValueError(kind)


def run_sequence(seq, odom_params=None, downsample=10000, pose_graph=False,
                 odometry="flagship", sub_mapping="full"):
    """Full pipeline on one sequence. Returns (metrics, scans_per_sec, extras)."""
    import jax

    from glim_tpu.io.evaluation import evaluate_trajectory
    from glim_tpu.mapping.global_mapping import (GlobalMapping,
                                                 GlobalMappingParams)
    from glim_tpu.mapping.global_mapping_pose_graph import (
        GlobalMappingPoseGraph, GlobalMappingPoseGraphParams)
    from glim_tpu.mapping.sub_mapping import SubMapping, SubMappingParams
    from glim_tpu.preprocess.cloud_preprocessor import (CloudPreprocessor,
                                                        CloudPreprocessorParams)

    pp = CloudPreprocessor(CloudPreprocessorParams(
        random_downsample_target=downsample, downsample_resolution=0.25))
    odom = _make_odometry(odometry, odom_params)
    if sub_mapping == "passthrough":
        from glim_tpu.mapping.sub_mapping_passthrough import (
            SubMappingPassthrough, SubMappingPassthroughParams)
        sub = SubMappingPassthrough(SubMappingPassthroughParams(
            max_num_keyframes=20, submap_target_num_points=20000))
    else:
        sub = SubMapping(SubMappingParams(max_num_keyframes=8,
                                          keyframe_update_min_points=256))
    if pose_graph:
        gm = GlobalMappingPoseGraph(GlobalMappingPoseGraphParams(
            min_travel_dist=20.0, max_neighbor_dist=6.0))
    else:
        gm = GlobalMapping(GlobalMappingParams(voxel_capacity=65536))

    imu_idx = 0
    ests = []
    margs = []
    n_warm = 14
    t0 = None
    for si, raw in enumerate(seq.scans):
        while imu_idx < len(seq.imu) and seq.imu[imu_idx, 0] <= raw.stamp + 0.12:
            r = seq.imu[imu_idx]
            odom.insert_imu(r[0], r[1:4], r[4:7])
            sub.insert_imu(r[0], r[1:4], r[4:7])
            gm.insert_imu(r[0], r[1:4], r[4:7])
            imu_idx += 1
        new_margs = []
        e = odom.insert_frame(pp.preprocess(raw), new_margs)
        if e is not None:
            ests.append((raw.stamp, e))
        for m in new_margs:
            sub.insert_frame(m)
            margs.append(m)
        for sm in sub.get_submaps():
            gm.insert_submap(sm)
        if si == n_warm:
            win = getattr(odom, "window", None)
            if win is not None:
                jax.block_until_ready(win.T)
            t0 = time.perf_counter()
    for m in odom.get_remaining_frames():
        if m.stamp > (margs[-1].stamp if margs else -1):
            sub.insert_frame(m)
    for sm in sub.submit_end_of_sequence():
        gm.insert_submap(sm)
    if hasattr(gm, "wait_for_detection"):
        gm.wait_for_detection()
    gm.optimize()
    if hasattr(gm, "stop"):
        gm.stop()
    elapsed = time.perf_counter() - (t0 or time.perf_counter())
    n_timed = max(len(seq.scans) - n_warm - 1, 1)
    sps = n_timed / max(elapsed, 1e-9)

    # Odometry-frame trajectory vs ground truth (aligned: odometry frames
    # are local).
    stamp_to_gt = {round(s, 4): T for s, T in zip(seq.stamps, seq.gt_poses)}
    est_T = [e.T_world_lidar for _, e in ests]
    gt_T = [stamp_to_gt[round(s, 4)] for s, _ in ests]
    m = evaluate_trajectory(est_T, gt_T, align=True)

    # Globally-optimized submap trajectory error: per-submap frame poses
    # after global optimization.
    g_est, g_gt = [], []
    for sm_obj, pose in zip(gm.submaps, gm.poses):
        To = np.linalg.inv(np.asarray(sm_obj.custom_data.get(
            "T_world_origin_pre", sm_obj.T_world_origin)))
        for fr in sm_obj.frames:
            key = round(fr.stamp, 4)
            if key in stamp_to_gt:
                g_est.append(pose @ To @ fr.T_world_sensor())
                g_gt.append(stamp_to_gt[key])
    gmetrics = (evaluate_trajectory(g_est, g_gt, align=True)
                if len(g_est) >= 3 else None)
    return m, gmetrics, sps, dict(n_submaps=len(gm.submaps),
                                  n_scans=len(seq.scans))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="EVAL.md")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--duration", type=float, default=20.0)
    ap.add_argument("--sequences", default=",".join(SEQUENCES))
    ap.add_argument("--window-study", action="store_true")
    ap.add_argument("--matrix", action="store_true",
                    help="sweep the registry matrix (odometry x sub_mapping "
                         "x global backend) and emit an ATE table per combo")
    ap.add_argument("--channels", type=int, default=32)
    ap.add_argument("--azimuth", type=int, default=512)
    ap.add_argument("--imu-noise", type=float, default=0.02)
    args = ap.parse_args(argv)

    from glim_tpu.io.synthetic import generate_raycast_sequence
    from glim_tpu.odometry.odometry_estimation_imu import \
        OdometryEstimationIMUParams

    duration = 6.0 if args.quick else args.duration
    rows = []
    for name in args.sequences.split(","):
        kw = dict(SEQUENCES[name])
        seq_duration = kw.pop("duration", duration)
        print(f"[eval] generating {name} ({seq_duration:.0f} s)...", flush=True)
        seq = generate_raycast_sequence(
            duration=seq_duration, n_channels=args.channels,
            n_azimuth=args.azimuth, imu_noise=args.imu_noise,
            imu_bias=np.array([0.03, -0.02, 0.01, 0.002, -0.001, 0.001]),
            seed=sum(ord(c) for c in name) % 1000, **kw)
        print(f"[eval] running {name}...", flush=True)
        m, gmet, sps, extra = run_sequence(seq)
        rows.append((name, m, gmet, sps, extra))
        print(f"[eval] {name}: {m.summary()} | {sps:.2f} scans/s", flush=True)

    matrix_rows = []
    if args.matrix:
        # Registry matrix: every supported pipeline combination (reference
        # CMakeLists.txt:123-149 module libraries x BASELINE.json configs).
        seq = generate_raycast_sequence(
            duration=min(duration, 12.0), path="figure8", scene="room",
            speed=2.5, n_channels=args.channels, n_azimuth=args.azimuth,
            imu_noise=args.imu_noise,
            imu_bias=np.array([0.03, -0.02, 0.01, 0.002, -0.001, 0.001]),
            seed=42, extent=14.0)
        for od in ("flagship", "cpu_gicp", "cpu_vgicp", "ct"):
            for sm in ("full", "passthrough"):
                for gb in ("matching", "pose_graph"):
                    label = f"{od} / {sm} / {gb}"
                    try:
                        m, gmet, sps, extra = run_sequence(
                            seq, odometry=od, sub_mapping=sm,
                            pose_graph=(gb == "pose_graph"))
                        matrix_rows.append((label, m, gmet, sps, extra))
                        print(f"[matrix] {label}: ATE {m.ate_rmse:.4f} "
                              f"(global {gmet.ate_rmse:.4f})"
                              if gmet else
                              f"[matrix] {label}: ATE {m.ate_rmse:.4f}",
                              flush=True)
                    except Exception as e:
                        matrix_rows.append((label, None, None, None, str(e)))
                        print(f"[matrix] {label}: FAILED ({e})", flush=True)

    study_rows = []
    if args.window_study:
        seq = generate_raycast_sequence(
            duration=duration, path="figure8", scene="room", speed=3.5,
            aggressive=0.7, n_channels=args.channels, n_azimuth=args.azimuth,
            imu_noise=args.imu_noise,
            imu_bias=np.array([0.03, -0.02, 0.01, 0.002, -0.001, 0.001]),
            seed=77, extent=12.0)
        for lag, W in [(0.4, None), (1.2, None), (3.0, None), (5.0, 4)]:
            p = OdometryEstimationIMUParams(
                voxel_resolution=0.5, voxel_capacity=131072,
                initialization_window_size=0.5, smoother_lag=lag,
                window_size=W)
            m, _, sps, _ = run_sequence(seq, odom_params=p)
            label = f"W={W}" if W else f"lag={lag}s"
            study_rows.append((label, m, sps))
            print(f"[study] {label}: ATE {m.ate_rmse:.4f} m, {sps:.2f} scans/s",
                  flush=True)

    # Preserve sections not regenerated by THIS invocation (the backend
    # scaling study comes from tools/backend_stress.py; the registry matrix
    # only from --matrix runs) across regenerations.
    def _section(text, header):
        k = text.find(header)
        if k < 0:
            return ""
        end = text.find("\n## ", k + 1)
        return text[k:] if end < 0 else text[k:end]

    preserved = ""
    if os.path.exists(args.out):
        old = open(args.out).read()
        if not args.matrix:
            preserved += _section(old, "\n## Registry matrix")
        preserved += _section(old, "\n## Backend scaling")

    with open(args.out, "w") as f:
        f.write("# EVAL — accuracy & throughput on raycast benchmark "
                "sequences\n\n")
        f.write("No public datasets are reachable from this build sandbox "
                "(zero egress), so accuracy is measured on simulated "
                "spinning-LiDAR sequences with exact ground truth "
                "(`glim_tpu.io.synthetic.generate_raycast_sequence`: "
                f"{args.channels}-ring scanner, occlusion, motion skew, "
                f"IMU noise {args.imu_noise} + bias). The identical "
                "pipeline+evaluator runs on real data via "
                "`tools/bag_converter` / KITTI loader + `tools/evaluate`.\n\n")
        f.write("The scans/s column is the fully SYNCHRONOUS single-thread "
                "worst case (every stage's device fetch latency serializes "
                "on the remoted chip's tunnel, with large run-to-run "
                "variance); the production pipeline runs the stages on "
                "worker threads — see bench.py's odometry and e2e_async "
                "numbers for deployment throughput.\n\n")
        f.write("| sequence | ATE RMSE [m] | rot RMSE [deg] | RPE@10m [m] | "
                "global ATE [m] | scans/s | submaps |\n|---|---|---|---|---|---|---|\n")
        for name, m, gmet, sps, extra in rows:
            rpe = m.rpe_trans.get(10.0, m.rpe_trans.get(1.0, float("nan")))
            gate = f"{gmet.ate_rmse:.4f}" if gmet else "-"
            f.write(f"| {name} | {m.ate_rmse:.4f} | {m.rot_rmse_deg:.3f} | "
                    f"{rpe:.4f} | {gate} | {sps:.2f} | {extra['n_submaps']} |\n")
        if any(name == "city_loop" for name, *_ in rows):
            f.write("\n`city_loop` is the backend stress case: a ~186 m lap "
                    "through an open city-block scene with no enclosing "
                    "structure, so the estimator only ever sees local "
                    "geometry, odometry drift accumulates over the lap, and "
                    "the implicit loop closures in global mapping must pull "
                    "the ring back together.\n")
        if matrix_rows:
            f.write("\n## Registry matrix (figure8_room)\n\n")
            f.write("Every supported pipeline combination from the module "
                    "registry (reference CMakeLists.txt:123-149: odometry x "
                    "sub_mapping x global backend):\n\n")
            f.write("| odometry / sub_mapping / global | ATE RMSE [m] | "
                    "global ATE [m] | scans/s | submaps |\n"
                    "|---|---|---|---|---|\n")
            for label, m, gmet, sps, extra in matrix_rows:
                if m is None:
                    f.write(f"| {label} | FAILED | - | - | - |\n")
                    continue
                gate = f"{gmet.ate_rmse:.4f}" if gmet else "-"
                f.write(f"| {label} | {m.ate_rmse:.4f} | {gate} | "
                        f"{sps:.2f} | {extra['n_submaps']} |\n")
        if study_rows:
            f.write("\n## Drift vs window size (aggressive figure-8)\n\n")
            f.write("| window | ATE RMSE [m] | scans/s |\n|---|---|---|\n")
            for label, m, sps in study_rows:
                f.write(f"| {label} | {m.ate_rmse:.4f} | {sps:.2f} |\n")
        f.write(f"\nGenerated by `python -m glim_tpu.tools.run_eval` "
                f"(duration {duration:.0f} s/sequence).\n")
        if preserved:
            f.write(preserved)
    print(f"[eval] wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
