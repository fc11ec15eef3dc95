"""Backend diagnosis harness: run odometry+submapping ONCE on a sequence,
pickle the submap stream, then sweep GlobalMapping configurations offline.

    python -m glim_tpu.tools.debug_backend capture --seq city_loop --out /tmp/cl.pkl
    python -m glim_tpu.tools.debug_backend sweep --state /tmp/cl.pkl

Separating the (expensive, config-independent) front-end from the backend
lets each backend experiment run in seconds instead of minutes.
"""

from __future__ import annotations

import argparse
import pickle
import sys
import time

import numpy as np


def capture(seq_name: str, out: str, duration=None):
    from glim_tpu.io.synthetic import generate_raycast_sequence
    from glim_tpu.mapping.sub_mapping import SubMapping, SubMappingParams
    from glim_tpu.odometry.odometry_estimation_imu import (
        OdometryEstimationIMU, OdometryEstimationIMUParams)
    from glim_tpu.preprocess.cloud_preprocessor import (CloudPreprocessor,
                                                        CloudPreprocessorParams)
    from glim_tpu.tools.run_eval import SEQUENCES

    kw = dict(SEQUENCES[seq_name])
    seq_duration = kw.pop("duration", duration or 20.0)
    if duration:
        seq_duration = duration
    seq = generate_raycast_sequence(
        duration=seq_duration, n_channels=32, n_azimuth=512, imu_noise=0.02,
        imu_bias=np.array([0.03, -0.02, 0.01, 0.002, -0.001, 0.001]),
        seed=sum(ord(c) for c in seq_name) % 1000, **kw)

    pp = CloudPreprocessor(CloudPreprocessorParams(
        random_downsample_target=10000, downsample_resolution=0.25))
    odom = OdometryEstimationIMU(OdometryEstimationIMUParams(
        voxel_resolution=0.5, voxel_capacity=131072,
        initialization_window_size=0.5))
    sub = SubMapping(SubMappingParams(max_num_keyframes=8,
                                      keyframe_update_min_points=256))

    imu_idx = 0
    ests = []
    margs = []
    submaps = []
    imu_rows = []
    t0 = time.perf_counter()
    for si, raw in enumerate(seq.scans):
        while imu_idx < len(seq.imu) and seq.imu[imu_idx, 0] <= raw.stamp + 0.12:
            r = seq.imu[imu_idx]
            odom.insert_imu(r[0], r[1:4], r[4:7])
            sub.insert_imu(r[0], r[1:4], r[4:7])
            imu_rows.append(np.asarray(r))
            imu_idx += 1
        new_margs = []
        e = odom.insert_frame(pp.preprocess(raw), new_margs)
        if e is not None:
            ests.append((raw.stamp, np.asarray(e.T_world_lidar)))
        for m in new_margs:
            sub.insert_frame(m)
            margs.append(m)
        submaps.extend(sub.get_submaps())
        if si % 50 == 0:
            print(f"[capture] scan {si}/{len(seq.scans)} "
                  f"({time.perf_counter()-t0:.0f}s)", flush=True)
    for m in odom.get_remaining_frames():
        if m.stamp > (margs[-1].stamp if margs else -1):
            sub.insert_frame(m)
    submaps.extend(sub.submit_end_of_sequence())

    # Materialize device arrays to numpy for pickling.
    def to_np(fr):
        fr.points = np.asarray(fr.points)
        fr.mask = np.asarray(fr.mask)
        if fr.covs is not None:
            fr.covs = np.asarray(fr.covs)
        return fr

    for sm in submaps:
        to_np(sm.frame)
        sm.voxelmaps = []

    state = dict(
        submaps=submaps,
        imu=np.stack(imu_rows) if imu_rows else np.zeros((0, 7)),
        ests=ests,
        gt_stamps=np.asarray(seq.stamps),
        gt_poses=np.stack(seq.gt_poses),
    )
    with open(out, "wb") as f:
        pickle.dump(state, f)
    print(f"[capture] {len(submaps)} submaps, {len(ests)} odom poses -> {out}")


def _global_ate(gm, state):
    from glim_tpu.io.evaluation import evaluate_trajectory
    stamp_to_gt = {round(s, 4): T for s, T in
                   zip(state["gt_stamps"], state["gt_poses"])}
    g_est, g_gt = [], []
    for sm_obj, pose in zip(gm.submaps, gm.poses):
        To = np.linalg.inv(np.asarray(sm_obj.custom_data.get(
            "T_world_origin_pre", sm_obj.T_world_origin)))
        for fr in sm_obj.frames:
            key = round(fr.stamp, 4)
            if key in stamp_to_gt:
                g_est.append(pose @ To @ fr.T_world_sensor())
                g_gt.append(stamp_to_gt[key])
    return evaluate_trajectory(g_est, g_gt, align=True)


def _odom_ate(state):
    from glim_tpu.io.evaluation import evaluate_trajectory
    stamp_to_gt = {round(s, 4): T for s, T in
                   zip(state["gt_stamps"], state["gt_poses"])}
    est = [T for s, T in state["ests"] if round(s, 4) in stamp_to_gt]
    gt = [stamp_to_gt[round(s, 4)] for s, T in state["ests"]
          if round(s, 4) in stamp_to_gt]
    return evaluate_trajectory(est, gt, align=True)


def run_backend(state, params=None, label="", optimize_each=True,
                final_optimize=True):
    import copy

    from glim_tpu.mapping.global_mapping import (GlobalMapping,
                                                 GlobalMappingParams)
    gm = GlobalMapping(params or GlobalMappingParams(voxel_capacity=65536))
    if not optimize_each:
        gm.params.enable_optimization = False
    imu = state["imu"]
    idx = 0
    t0 = time.perf_counter()
    submaps = copy.deepcopy(state["submaps"])
    for sm in submaps:
        while idx < len(imu) and imu[idx, 0] <= sm.frames[-1].stamp + 0.3:
            gm.insert_imu(imu[idx, 0], imu[idx, 1:4], imu[idx, 4:7])
            idx += 1
        gm.insert_submap(sm)
    if final_optimize:
        gm.params.enable_optimization = True
        gm.optimize()
    el = time.perf_counter() - t0
    m = _global_ate(gm, state)
    print(f"[sweep] {label}: global ATE {m.ate_rmse:.4f} m  rot "
          f"{m.rot_rmse_deg:.3f} deg  ({el:.1f}s)", flush=True)
    return gm, m


def sweep(state_path: str, which="all"):
    with open(state_path, "rb") as f:
        state = pickle.load(f)
    mo = _odom_ate(state)
    print(f"[sweep] odometry ATE {mo.ate_rmse:.4f} m rot {mo.rot_rmse_deg:.3f}")

    from glim_tpu.mapping.global_mapping import GlobalMappingParams

    configs = {
        "no_opt": None,     # odometry-chained poses, no optimization
        "default": GlobalMappingParams(voxel_capacity=65536),
        "no_imu": GlobalMappingParams(voxel_capacity=65536, enable_imu=False),
        "fine_voxel": GlobalMappingParams(voxel_capacity=65536,
                                          submap_voxel_resolution=0.25,
                                          submap_voxel_resolution_max=0.5),
        "more_iters": GlobalMappingParams(voxel_capacity=65536,
                                          lm_iterations=15),
        "weight_1e-2": GlobalMappingParams(voxel_capacity=65536,
                                           matching_weight=1e-2),
        "between": GlobalMappingParams(voxel_capacity=65536,
                                       create_between_factors=True),
    }
    if which != "all":
        configs = {k: v for k, v in configs.items() if k in which.split(",")}
    for label, p in configs.items():
        if label == "no_opt":
            run_backend(state, None, label, optimize_each=False,
                        final_optimize=False)
        else:
            run_backend(state, p, label)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["capture", "sweep"])
    ap.add_argument("--seq", default="city_loop")
    ap.add_argument("--out", default="/tmp/backend_state.pkl")
    ap.add_argument("--state", default="/tmp/backend_state.pkl")
    ap.add_argument("--duration", type=float, default=None)
    ap.add_argument("--which", default="all")
    args = ap.parse_args(argv)
    if args.mode == "capture":
        capture(args.seq, args.out, args.duration)
    else:
        sweep(args.state, args.which)
    return 0


if __name__ == "__main__":
    sys.exit(main())
