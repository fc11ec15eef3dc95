"""Rviz viewer extension — publishes clouds for live visualization.

Equivalent capability to the reference's ``librviz_viewer.so`` extension
(reference: config/config_ros.json extension_modules list): publishes the
current aligned scan and a periodically refreshed global map cloud so rviz
(or any PointCloud2 consumer) can render the session live. TF and odometry
are published by :class:`glim_tpu.ros.node.GlimROSNode`; this module adds
the point-cloud topics:

  /glim_ros/aligned_points   current scan transformed into the map frame
  /glim_ros/map              downsampled global map (refreshed on submap update)

Publishing happens in ``spin_once`` on the node's thread — the estimation
callbacks only snapshot data under a lock, keeping worker threads free of
ROS middleware work.
"""

from __future__ import annotations

import threading
import time
from typing import Any, Optional

import numpy as np

from glim_tpu.mapping.callbacks import GlobalMappingCallbacks
from glim_tpu.odometry.callbacks import OdometryEstimationCallbacks
from glim_tpu.ros import messages as rosmsg
from glim_tpu.ros.extension_module_ros import ExtensionModuleROS
from glim_tpu.utils.logging import create_module_logger
from glim_tpu.utils.registry import register_module

logger = create_module_logger("rviz")


class RvizViewer(ExtensionModuleROS):
    def __init__(self, map_publish_interval: float = 5.0,
                 max_map_points: int = 500_000):
        self.map_publish_interval = map_publish_interval
        self.max_map_points = max_map_points
        self._lock = threading.Lock()
        self._latest_frame = None            # EstimationFrame snapshot
        self._map_dirty = False
        self._last_map_publish = 0.0
        self._node = None
        self._glim_node = None
        self._pub_aligned = None
        self._pub_map = None
        self._handles = [
            (OdometryEstimationCallbacks.on_new_frame,
             OdometryEstimationCallbacks.on_new_frame.add(self._on_new_frame)),
            (GlobalMappingCallbacks.on_update_submaps,
             GlobalMappingCallbacks.on_update_submaps.add(self._on_update_submaps)),
        ]

    # -- node binding (called by GlimROSNode) --

    def bind_node(self, node: Any, glim_node: Any) -> None:
        self._node = node
        self._glim_node = glim_node
        cloud_cls = type(rosmsg.make_pointcloud2(0.0, "map", np.zeros((0, 3))))
        self._pub_aligned = node.create_publisher(
            cloud_cls, "/glim_ros/aligned_points", 10)
        self._pub_map = node.create_publisher(cloud_cls, "/glim_ros/map", 1)
        if hasattr(node, "create_timer"):
            try:
                node.create_timer(0.1, self.spin_once)
            except Exception:
                pass

    # -- estimation callbacks (worker threads; snapshot only) --

    def _on_new_frame(self, frame) -> None:
        with self._lock:
            self._latest_frame = frame

    def _on_update_submaps(self, submaps) -> None:
        with self._lock:
            self._map_dirty = True

    # -- publishing (node thread) --

    def spin_once(self) -> None:
        if self._glim_node is None:
            return
        p = self._glim_node.params
        with self._lock:
            frame = self._latest_frame
            self._latest_frame = None
            map_due = self._map_dirty and (
                time.time() - self._last_map_publish > self.map_publish_interval)

        if frame is not None and frame.frame is not None \
                and self._pub_aligned is not None:
            traj = self._glim_node.glim.trajectory
            T_map_sensor = traj.odom2world(np.asarray(frame.T_world_sensor()))
            pb = frame.frame
            pts = np.asarray(pb.points)[np.asarray(pb.mask, bool)]
            # PointBatch points live in the sensor (lidar) frame.
            aligned = pts[:, :3] @ T_map_sensor[:3, :3].T + T_map_sensor[:3, 3]
            self._pub_aligned.publish(rosmsg.make_pointcloud2(
                frame.stamp, p.map_frame_id, aligned))

        if map_due and self._pub_map is not None:
            pts = self._glim_node.glim.export_points()
            if pts is not None and len(pts):
                if len(pts) > self.max_map_points:
                    sel = np.random.default_rng(0).choice(
                        len(pts), self.max_map_points, replace=False)
                    pts = pts[sel]
                self._pub_map.publish(rosmsg.make_pointcloud2(
                    time.time(), p.map_frame_id, np.asarray(pts)[:, :3]))
            with self._lock:
                self._map_dirty = False
                self._last_map_publish = time.time()

    def detach(self) -> None:
        for slot, h in self._handles:
            slot.remove(h)
        self._handles = []

    def at_exit(self, dump_path: str) -> None:
        self.detach()


@register_module("extension", "rviz_viewer")
def create_extension_module(*args, **kwargs):
    return RvizViewer()
