"""Headless standard viewer: real-time state aggregation + export.

Plays the role of the reference's ``StandardViewer``
(reference: src/glim/viewer/standard_viewer.cpp:42-198 + callbacks wiring in
standard_viewer_callbacks.cpp, memory accounting in
standard_viewer_mem.cpp:15-59) for GUI-less TPU hosts: it attaches to the
same callback slots, maintains the odometry trajectory, keyframe/submap
poses, per-object memory accounting and the shared log ring buffer, and
exposes them as a status dict / periodic log line / file exports instead of
an OpenGL window. Downstream visualization (rviz, rerun, notebooks) can poll
``snapshot()``.
"""

from __future__ import annotations

import threading
import time
from typing import Dict, List

import numpy as np

from glim_tpu.mapping.callbacks import GlobalMappingCallbacks, SubMappingCallbacks
from glim_tpu.odometry.callbacks import OdometryEstimationCallbacks
from glim_tpu.utils.extension_module import ExtensionModule
from glim_tpu.utils.logging import create_module_logger, get_ringbuffer_lines
from glim_tpu.utils.registry import register_module
from glim_tpu.utils.trajectory_manager import TrajectoryManager

logger = create_module_logger("viewer")


def _batch_bytes(batch) -> int:
    """CPU+device byte accounting of a PointBatch (reference:
    standard_viewer_mem.cpp:34-59 attribute layout)."""
    if batch is None:
        return 0
    total = 0
    for name in ("points", "mask", "times", "intensities", "covs", "normals"):
        a = getattr(batch, name, None)
        if a is not None:
            total += a.size * a.dtype.itemsize
    return total


class StandardViewer(ExtensionModule):
    def __init__(self, report_interval: float = 10.0, config=None,
                 stream_path=None, stream_interval=None):
        self.report_interval = report_interval
        # Rendering hints (reference standard_viewer.cpp:70-100 GUI knobs:
        # point size/shape/alpha, z-range coloring, partial-rendering
        # budget, window size). Rendering is delegated to external tools
        # here; the parsed hints ride along in snapshot() so any consumer
        # of the exported clouds/trajectories renders with the configured
        # style.
        g = (lambda k, d: config.param("standard_viewer", k, d)) if config \
            else (lambda k, d: d)
        self.render_hints = dict(
            default_z_range=list(g("default_z_range", [-2.0, 4.0])),
            point_size=float(g("point_size", 0.025)),
            point_size_metric=bool(g("point_size_metric", True)),
            point_shape_circle=bool(g("point_shape_circle", True)),
            points_alpha=float(g("points_alpha", 1.0)),
            factors_alpha=float(g("factors_alpha", 1.0)),
            enable_partial_rendering=bool(g("enable_partial_rendering",
                                            False)),
            partial_rendering_budget=int(g("partial_rendering_budget",
                                           1024)),
            viewer_width=int(g("viewer_width", 2560)),
            viewer_height=int(g("viewer_height", 1440)),
        )
        self._lock = threading.Lock()
        self.trajectory = TrajectoryManager()
        self.odom_poses: List[np.ndarray] = []
        self.odom_stamps: List[float] = []
        self.submap_poses: List[np.ndarray] = []
        self.num_keyframes = 0
        self.num_marginalized = 0
        self.frame_bytes = 0
        self.last_report = time.time()
        # Watchable-run stream (reference standard_viewer_callbacks.cpp
        # drawables -> .jsonl lines replayed by viewer/watch.html).
        self.stream = None
        sp = stream_path if stream_path is not None else g("stream_path", None)
        if sp:
            from glim_tpu.viewer.stream_writer import ViewerStream
            self.stream = ViewerStream(str(sp),
                                       scan_budget=int(g("stream_scan_budget",
                                                         1024)))
        self.stream_interval = float(
            stream_interval if stream_interval is not None
            else g("stream_interval", 1.0))
        self._last_stream = 0.0
        self._stream_odom_mark = 0
        # Map/pose-graph stream state: origin-frame submap clouds queued for
        # one-shot emission, and the factor-edge list (sent on change).
        self._pending_clouds: Dict[int, np.ndarray] = {}
        self._factors: List[list] = []
        self._factors_dirty = False
        self.cloud_budget = int(g("stream_cloud_budget", 1200))
        self._handles = []
        self._wire()

    def _wire(self) -> None:
        O = OdometryEstimationCallbacks
        S = SubMappingCallbacks
        G = GlobalMappingCallbacks
        add = lambda slot, fn: self._handles.append((slot, slot.add(fn)))
        add(O.on_new_frame, self._on_new_frame)
        add(O.on_update_keyframes, self._on_update_keyframes)
        add(O.on_marginalized_frames, self._on_marginalized)
        add(S.on_new_submap, self._on_new_submap)
        add(G.on_update_submaps, self._on_update_submaps)
        add(G.on_smoother_update, self._on_smoother_update)

    def detach(self) -> None:
        for slot, h in self._handles:
            slot.remove(h)
        self._handles = []

    # -- callbacks --

    def _on_new_frame(self, frame) -> None:
        with self._lock:
            T = frame.T_world_sensor()
            self.odom_poses.append(T)
            self.odom_stamps.append(frame.stamp)
            self.trajectory.add_odom(frame.stamp, T)
            self.frame_bytes += _batch_bytes(frame.frame)
        if (self.stream is not None
                and time.time() - self._last_stream >= self.stream_interval):
            self._last_stream = time.time()
            self._emit_stream(frame)
        if time.time() - self.last_report > self.report_interval:
            self.last_report = time.time()
            logger.info("viewer: %d frames, %d keyframes, %d submaps, ~%.1f MB frame data",
                        len(self.odom_poses), self.num_keyframes,
                        len(self.submap_poses), self.frame_bytes / 1e6)

    def _on_update_keyframes(self, keyframes) -> None:
        with self._lock:
            self.num_keyframes += len(keyframes)

    def _on_marginalized(self, frames) -> None:
        with self._lock:
            self.num_marginalized += len(frames)

    def _on_new_submap(self, submap) -> None:
        cloud = None
        if self.stream is not None:
            # One-shot origin-frame cloud for the persistent map layer.
            # Runs on the sub-mapping worker once per submap; the blocking
            # fetch is amortized over the submap's ~1-2 s of scans.
            try:
                batch = submap.frame
                if batch is not None and batch.points is not None:
                    pts = np.asarray(batch.points)[np.asarray(batch.mask)]
                    if len(pts) > self.cloud_budget:
                        pts = pts[:: max(1, len(pts) // self.cloud_budget)]
                    cloud = pts
            except Exception:       # stream must never break the pipeline
                cloud = None
        with self._lock:
            self.submap_poses.append(np.asarray(submap.T_world_origin))
            if cloud is not None:
                self._pending_clouds[int(submap.id)] = cloud

    def _on_smoother_update(self, mapping, *_args) -> None:
        """Capture the global factor graph for the pose-graph stream layer
        (reference interactive_viewer factor lines)."""
        try:
            pairs = [[int(t), int(s), "m"]
                     for t, s in getattr(mapping, "matching_factors", [])]
            pairs += [[int(bf[0]), int(bf[1]), "b"]
                      for bf in getattr(mapping, "between_factors", [])]
            # Pose-graph backend: consecutive = odometry chain ("b"),
            # non-consecutive = accepted loop factors ("m").
            for i, j, h in zip(getattr(mapping, "f_i", []),
                               getattr(mapping, "f_j", []),
                               getattr(mapping, "f_huber", [])):
                pairs.append([int(i), int(j),
                              "b" if abs(int(j) - int(i)) == 1 else "m"])
        except Exception:
            return
        with self._lock:
            if pairs != self._factors:
                self._factors = pairs
                self._factors_dirty = True

    def _on_update_submaps(self, submaps) -> None:
        with self._lock:
            self.submap_poses = [np.asarray(s.T_world_origin) for s in submaps]
            if submaps and self.odom_stamps:
                last = submaps[-1]
                if last.frames:
                    self.trajectory.update_anchor(last.frames[-1].stamp,
                                                  last.T_world_origin
                                                  @ last.T_origin_endpoint_R)

    def _emit_stream(self, frame) -> None:
        """One stream line: new odometry poses since the last line, all
        (corrected) submap poses, the current scan in the world frame."""
        scan_world = None
        try:
            batch = frame.frame
            if batch is not None and batch.points is not None:
                pts = np.asarray(batch.points)
                msk = np.asarray(batch.mask)
                pts = pts[msk]
                budget = self.stream.scan_budget
                if len(pts) > budget:
                    pts = pts[:: max(1, len(pts) // budget)]
                T = frame.T_world_sensor()
                scan_world = (T[:3, :3] @ pts.T).T + T[:3, 3]
        except Exception:    # stream must never break the pipeline
            pass
        with self._lock:
            odom_new = self.odom_poses[self._stream_odom_mark:]
            self._stream_odom_mark = len(self.odom_poses)
            submaps = [T.copy() for T in self.submap_poses]
            stats = dict(frames=len(self.odom_poses),
                         keyframes=self.num_keyframes,
                         submaps=len(self.submap_poses),
                         mb=round(self.frame_bytes / 1e6, 1))
            clouds, self._pending_clouds = self._pending_clouds, {}
            factors = list(self._factors) if self._factors_dirty else None
            self._factors_dirty = False
        self.stream.emit(frame.stamp, odom_new, submaps, scan_world, stats,
                         clouds=clouds or None, factors=factors)

    # -- outputs --

    def snapshot(self) -> Dict:
        with self._lock:
            return dict(
                odom_poses=[T.copy() for T in self.odom_poses],
                odom_stamps=list(self.odom_stamps),
                submap_poses=[T.copy() for T in self.submap_poses],
                num_keyframes=self.num_keyframes,
                num_marginalized=self.num_marginalized,
                T_world_odom=self.trajectory.get_T_world_odom(),
                log_tail=get_ringbuffer_lines(32),
                render_hints=dict(self.render_hints),
            )

    def at_exit(self, dump_path: str) -> None:
        import os

        from glim_tpu.utils.config import se3_to_tum
        os.makedirs(dump_path, exist_ok=True)
        with self._lock:
            with open(os.path.join(dump_path, "viewer_odom.txt"), "w") as f:
                for t, T in zip(self.odom_stamps, self.odom_poses):
                    v = se3_to_tum(T)
                    f.write(f"{t:.9f} " + " ".join(f"{x:.6f}" for x in v) + "\n")
        if self.stream is not None:
            self.stream.close()


@register_module("extension", "standard_viewer")
def create_extension_module(*args, **kwargs):
    from glim_tpu.utils.config import GlobalConfig
    try:
        config = GlobalConfig.instance().get_config("config_viewer")
    except Exception:
        config = None
    return StandardViewer(config=config)
