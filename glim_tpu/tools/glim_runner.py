"""Offline dataset runner — the ``glim_rosbag`` equivalent.

Plays a recorded dataset through the full pipeline faster than real time with
queue-based backpressure (reference: docs/quickstart.md:70-79 adaptive
playback via workload()), then saves the dump.

Dataset layout (ROS-free; rosbags convert to this with standard tooling):
  dataset/
    imu.csv                   # rows: t, ax, ay, az, wx, wy, wz
    scans/NNNNNN.npy          # (N, 3|4) float points, or .ply
    stamps.csv                # per-scan stamps (row i -> scans/%06i)
    [times/NNNNNN.npy]        # optional per-point times

A ROS bag (ROS1 .bag, rosbag2 .db3 dir, or MCAP) can be played DIRECTLY —
the reference's `glim_rosbag path_to_bag` workflow (docs/quickstart.md:70-79)
— with messages streamed through the pure-Python readers in
glim_tpu.io.rosbag, no conversion step and no ROS install.

Usage: python -m glim_tpu.tools.glim_runner <dataset_dir|bag> [--config DIR]
       [--dump /tmp/dump] [--synthetic N_SECONDS]
       [--points-topic T] [--imu-topic T]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def load_dataset(path: str):
    imu = np.loadtxt(os.path.join(path, "imu.csv"), delimiter=",") \
        if os.path.exists(os.path.join(path, "imu.csv")) else np.zeros((0, 7))
    stamps = np.loadtxt(os.path.join(path, "stamps.csv"), delimiter=",")
    scan_dir = os.path.join(path, "scans")
    from glim_tpu.io.loaders import load_scan_file
    scans = []
    for i, stamp in enumerate(np.atleast_1d(stamps)):
        for ext in (".npy", ".ply", ".bin"):
            fp = os.path.join(scan_dir, f"{i:06d}{ext}")
            if os.path.exists(fp):
                pts = load_scan_file(fp)
                break
        else:
            break
        tfile = os.path.join(path, "times", f"{i:06d}.npy")
        times = np.load(tfile) if os.path.exists(tfile) else None
        scans.append((float(stamp), pts, times))
    return imu, scans


def _make_command_poller(glim, commands_path, controls=None):
    """Tail a JSONL command file and apply new lines to the LIVE run (the
    interactive-correction loop: watch.py POST /command appends here).
    Alignment runs on this feed thread; the factor injection itself goes
    through request_to_add_between, applied on the global-mapping worker.

    Playback-control commands (pause / resume / step — the reference UI's
    runtime controls, standard_viewer_ui.cpp) are intercepted here and
    recorded in `controls` for the feed loop; everything else goes to the
    shared execute_command dispatcher."""
    if not commands_path:
        return lambda: None
    import json
    from glim_tpu.viewer.interactive_viewer import (InteractiveViewer,
                                                    execute_command)
    # The async wrapper holds the real backend; commands read its submaps.
    gm = getattr(glim.global_mapping, "global_mapping", glim.global_mapping)
    viewer = InteractiveViewer(gm, live=True)
    state = {"pos": 0}
    open(commands_path, "a").close()          # ensure it exists for tail

    def poll():
        try:
            with open(commands_path) as f:
                f.seek(state["pos"])
                lines = f.readlines()
                state["pos"] = f.tell()
        except OSError:
            return
        for line in lines:
            line = line.strip()
            if not line:
                continue
            try:
                cmd = json.loads(line)
            except ValueError:
                print(f"[commands] bad JSON line ignored: {line[:80]}")
                continue
            name = cmd.get("cmd")
            if controls is not None and name in ("pause", "resume", "step"):
                if name == "pause":
                    controls["paused"] = True
                elif name == "resume":
                    controls["paused"] = False
                    controls["step"] = 0
                else:
                    controls["paused"] = True
                    controls["step"] += max(int(cmd.get("n", 1)), 1)
                print(f"[commands] {name}: {controls}")
                continue
            out = execute_command(viewer, cmd)
            print(f"[commands] {name}: {out}")

    return poll


def _playback_gate(controls, poll_commands):
    """Block the feed loop while paused (still polling commands so resume /
    step / corrections are serviced); consume one step credit if stepping."""
    import time as _time
    while controls["paused"] and controls["step"] == 0:
        _time.sleep(0.05)
        poll_commands()
    if controls["step"] > 0:
        controls["step"] -= 1


def _is_bag(path: str) -> bool:
    """A ROS bag rather than a converted dataset directory."""
    if os.path.isfile(path):
        return path.endswith((".bag", ".mcap", ".db3"))
    if os.path.isdir(path) and not os.path.exists(
            os.path.join(path, "stamps.csv")):
        return any(e.endswith((".bag", ".mcap", ".db3"))
                   for e in os.listdir(path))
    return False


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dataset", nargs="?",
                    help="dataset directory or ROS bag (.bag/.db3/.mcap)")
    ap.add_argument("--config", default=None, help="config directory")
    ap.add_argument("--dump", default="/tmp/glim_tpu_dump")
    ap.add_argument("--synthetic", type=float, default=0.0,
                    help="run N seconds of the synthetic sequence instead")
    ap.add_argument("--max-workload", type=int, default=10,
                    help="throttle input when pipeline workload exceeds this")
    ap.add_argument("--points-topic", default=None,
                    help="bag playback: PointCloud2 topic (auto-discovered)")
    ap.add_argument("--imu-topic", default=None,
                    help="bag playback: Imu topic (auto-discovered)")
    ap.add_argument("--viewer-stream", default=None, metavar="FILE.jsonl",
                    help="write a watchable run stream (replay with "
                         "glim_tpu/viewer/watch.html or tools/watch.py)")
    ap.add_argument("--commands", default=None, metavar="FILE.jsonl",
                    help="poll this JSONL file for interactive correction "
                         "commands applied to the LIVE run (loop_close / "
                         "optimize / find_loops — see "
                         "viewer/interactive_viewer.py; watch.py POSTs "
                         "here)")
    args = ap.parse_args(argv)

    from glim_tpu.pipeline import GlimTPU
    from glim_tpu.types import RawPoints
    from glim_tpu.utils.debug import print_system_info

    print_system_info()

    stream_bag = False
    if args.synthetic > 0:
        from glim_tpu.io.synthetic import generate_sequence
        seq = generate_sequence(duration=args.synthetic, n_scan_points=20000,
                                scene_points=120000)
        imu = seq.imu
        scans = [(s.stamp, s.points, s.times) for s in seq.scans]
    else:
        if not args.dataset:
            ap.error("dataset directory, bag file, or --synthetic required")
        if _is_bag(args.dataset):
            stream_bag = True
        else:
            imu, scans = load_dataset(args.dataset)

    glim = GlimTPU(config_path=args.config, async_mode=True)
    viewer = None
    if args.viewer_stream:
        from glim_tpu.viewer.standard_viewer import StandardViewer
        viewer = StandardViewer(stream_path=args.viewer_stream,
                                stream_interval=0.5)
        print(f"viewer stream -> {args.viewer_stream} "
              f"(open glim_tpu/viewer/watch.html, or "
              f"python -m glim_tpu.tools.watch --stream {args.viewer_stream})")
    controls = {"paused": False, "step": 0}
    poll_commands = _make_command_poller(glim, args.commands, controls)
    t0 = time.perf_counter()
    n = 0
    if stream_bag:
        # Direct bag playback (the reference's glim_rosbag): messages
        # stream through in recorded order, throttled by workload().
        # Sensor conditioning — acc_scale g-unit auto-detection and the
        # imu/points time offsets from config_ros — is applied exactly as
        # the live node applies it (the reference routes glim_rosbag
        # through the same GlimROS wrapper as glim_rosnode).
        from glim_tpu.io.rosbag import iter_sensor_messages
        from glim_tpu.ros.conditioning import ImuConditioner
        ros_cfg = glim.config.get_config("config_ros")
        g = lambda k, d: ros_cfg.param("glim_ros", k, d)  # noqa: E731
        imu_cond = ImuConditioner(float(g("acc_scale", 0.0)),
                                  float(g("imu_time_offset", 0.0)))
        points_time_offset = float(g("points_time_offset", 0.0))
        for kind, msg in iter_sensor_messages(args.dataset,
                                              args.points_topic,
                                              args.imu_topic):
            if kind == "imu":
                for sample in imu_cond.condition(msg.stamp,
                                                 msg.linear_acceleration,
                                                 msg.angular_velocity):
                    glim.insert_imu(*sample)
                continue
            if kind == "image":
                glim.insert_image(msg.stamp, msg.to_array())
                continue
            if points_time_offset != 0.0:
                msg.stamp = msg.stamp + points_time_offset
            glim.insert_frame(msg)
            n += 1
            poll_commands()
            _playback_gate(controls, poll_commands)
            while glim.workload() > args.max_workload:
                time.sleep(0.01)
            if not glim.ok():
                print("extension module requested shutdown")
                break
    else:
        imu_idx = 0
        for stamp, pts, times in scans:
            while imu_idx < len(imu) and imu[imu_idx, 0] <= stamp + 0.2:
                glim.insert_imu(imu[imu_idx, 0], imu[imu_idx, 1:4],
                                imu[imu_idx, 4:7])
                imu_idx += 1
            glim.insert_frame(RawPoints(stamp=stamp, points=pts, times=times))
            poll_commands()
            _playback_gate(controls, poll_commands)
            # Adaptive throttling (the glim_rosbag playback-rate control).
            while glim.workload() > args.max_workload:
                time.sleep(0.01)
            if not glim.ok():
                print("extension module requested shutdown")
                break
        n = len(scans)
    glim.wait()
    elapsed = time.perf_counter() - t0
    print(f"processed {n} scans in {elapsed:.1f}s ({n / max(elapsed, 1e-9):.2f} scans/s)")
    glim.save(args.dump)
    if viewer is not None:
        viewer.at_exit(args.dump)
        viewer.detach()
    print(f"dump saved to {args.dump}")


if __name__ == "__main__":
    main()
