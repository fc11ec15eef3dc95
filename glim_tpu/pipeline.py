"""GlimTPU: the top-level config-driven pipeline.

Plays the role of the reference's glim_ros node minus ROS (reference
semantics: SURVEY.md §3.1 system init): reads config.json, instantiates the
configured preprocessing / odometry / sub-mapping / global-mapping modules
through the registry, wires them with async worker threads, loads extension
modules, and exposes insert_imu/insert_frame + save/export APIs. A
synchronous mode (``async_mode=False``) runs everything inline for
deterministic tests and offline batch processing.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from glim_tpu.mapping.async_global_mapping import AsyncGlobalMapping
from glim_tpu.mapping.async_sub_mapping import AsyncSubMapping
from glim_tpu.mapping.global_mapping_base import GlobalMappingBase
from glim_tpu.mapping.sub_mapping_base import SubMappingBase
from glim_tpu.odometry.async_odometry_estimation import AsyncOdometryEstimation
from glim_tpu.odometry.estimation_base import OdometryEstimationBase
from glim_tpu.preprocess.cloud_preprocessor import (CloudPreprocessor,
                                                    CloudPreprocessorParams)
from glim_tpu.types import EstimationFrame, RawPoints
from glim_tpu.utils.config import GlobalConfig, create_default_config_dir
from glim_tpu.utils.extension_module import ExtensionModule
from glim_tpu.utils.logging import configure_logging, create_module_logger
from glim_tpu.utils.time_keeper import PerPointTimeSettings, TimeKeeper
from glim_tpu.utils.trajectory_manager import TrajectoryManager

logger = create_module_logger("glim")


class GlimTPU:
    """End-to-end SLAM pipeline: scans+IMU in, globally consistent map out."""

    def __init__(self, config_path: Optional[str] = None,
                 async_mode: bool = True,
                 extension_modules: Optional[List[str]] = None,
                 overrides: Optional[List[tuple]] = None):
        """``overrides`` is a list of (logical_config, module, name, value)
        applied after loading and before module construction — the driver
        layer uses it for ROS-level flags (enable_local/global_mapping)."""
        if config_path is None:
            config_path = create_default_config_dir("/tmp/glim_tpu_config")
        GlobalConfig.reset()
        self.config = GlobalConfig.instance(config_path)
        for logical, module, name, value in (overrides or []):
            self.config.get_config(logical).override_param(module, name, value)

        log_cfg = self.config.get_config("config_logging")
        configure_logging(log_dir=log_cfg.param("logging", "log_dir", None),
                          save_logs=log_cfg.param("logging", "save_logs", False))

        sensors = self.config.get_config("config_sensors")
        self.T_lidar_imu = sensors.param_se3("sensors", "T_lidar_imu")
        self.time_keeper = TimeKeeper(PerPointTimeSettings.from_config(sensors))
        self.trajectory = TrajectoryManager()
        from glim_tpu.utils.data_validator import DataValidator
        self.data_validator = DataValidator()

        pre_cfg = self.config.get_config("config_preprocess")
        self.preprocessor = CloudPreprocessor(
            CloudPreprocessorParams.from_config(pre_cfg, sensors))
        # Reference glim_ros keeps the raw scan on the frame only when
        # keep_raw_points is set (config_ros.json:9 — "required for only
        # extension modules"); the default drops it after preprocessing so
        # the host copy doesn't ride along for the frame's whole lifetime.
        ros_cfg = self.config.get_config("config_ros")
        self.keep_raw_points = bool(
            ros_cfg.param("glim_ros", "keep_raw_points", False))

        odo_cfg = self.config.get_config("config_odometry")
        odometry = OdometryEstimationBase.load_module(
            odo_cfg.param("odometry_estimation", "so_name",
                          "libodometry_estimation_cpu.so"), odo_cfg,
            sensors_config=sensors)

        sub_cfg = self.config.get_config("config_sub_mapping")
        sub = SubMappingBase.load_module(
            sub_cfg.param("sub_mapping", "so_name", "libsub_mapping.so"), sub_cfg)

        glb_cfg = self.config.get_config("config_global_mapping")
        glb = GlobalMappingBase.load_module(
            glb_cfg.param("global_mapping", "so_name",
                          "libglobal_mapping_pose_graph.so"), glb_cfg)

        self.async_mode = async_mode
        if async_mode:
            self.odometry = AsyncOdometryEstimation(odometry)
            self.sub_mapping = AsyncSubMapping(sub)
            self.global_mapping = AsyncGlobalMapping(glb)
        else:
            self.odometry = odometry
            self.sub_mapping = sub
            self.global_mapping = glb

        self._sync_estimates: List[EstimationFrame] = []
        self.extensions = ExtensionModule.load_extensions(extension_modules or [])

        # Keep the pipeline's odom->world anchor in sync with globally
        # corrected submap poses (reference: trajectory_manager.cpp anchor
        # update driven by the global-mapping update callback).
        from glim_tpu.mapping.callbacks import GlobalMappingCallbacks
        GlobalMappingCallbacks.on_update_submaps.add(self._on_update_submaps_anchor)

    def _on_update_submaps_anchor(self, submaps) -> None:
        if submaps and submaps[-1].frames:
            last = submaps[-1]
            self.trajectory.update_anchor(
                last.frames[-1].stamp,
                last.T_world_origin @ last.T_origin_endpoint_R)

    # -- input --

    def insert_imu(self, stamp: float, linear_acc, angular_vel) -> None:
        self.data_validator.imu_callback(stamp, linear_acc, angular_vel)
        if not self.time_keeper.validate_imu_stamp(stamp):
            return
        self.odometry.insert_imu(stamp, np.asarray(linear_acc), np.asarray(angular_vel))
        self.sub_mapping.insert_imu(stamp, np.asarray(linear_acc), np.asarray(angular_vel))
        self.global_mapping.insert_imu(stamp, np.asarray(linear_acc), np.asarray(angular_vel))

    def insert_frame(self, raw: RawPoints) -> None:
        from glim_tpu.utils.profiling import profile_scope
        self.data_validator.points_callback(raw)
        if not self.time_keeper.process(raw):
            logger.warning("dropping scan at %.6f", raw.stamp)
            return
        with profile_scope("preprocess"):
            frame = self.preprocessor.preprocess(raw)
        if not self.keep_raw_points:
            frame.raw_points = None
        if self.async_mode:
            self.odometry.insert_frame(frame)
            self._pump()
        else:
            marginalized: List[EstimationFrame] = []
            with profile_scope("odometry"):
                est = self.odometry.insert_frame(frame, marginalized)
            if est is not None:
                self._sync_estimates.append(est)
                self.trajectory.add_odom(est.stamp, est.T_world_sensor())
            for m in marginalized:
                # The add_odom read above blocked until this scan's window
                # program finished, so these copies are pure D2H now and
                # land while sub-mapping dispatches its own work (the async
                # path gets the same prefetch at the wrapper hand-off).
                m.fetch_state_async()
                self.sub_mapping.insert_frame(m)
            for sm in self.sub_mapping.get_submaps():
                self.global_mapping.insert_submap(sm)

    def insert_image(self, stamp: float, image) -> None:
        """Forward camera frames to every stage (reference: glim_ros feeds
        image_topic into odometry/sub/global insert_image)."""
        self.odometry.insert_image(stamp, image)
        self.sub_mapping.insert_image(stamp, image)
        self.global_mapping.insert_image(stamp, image)

    def _pump(self) -> None:
        est, margs = self.odometry.get_results()
        for e in est:
            self._sync_estimates.append(e)
            self.trajectory.add_odom(e.stamp, e.T_world_sensor())
        for m in margs:
            self.sub_mapping.insert_frame(m)
        for sm in self.sub_mapping.get_results():
            self.global_mapping.insert_submap(sm)

    # -- control --

    def workload(self) -> int:
        if any(ext.needs_wait() for ext in self.extensions):
            return 1 << 20   # extension requested throttling
        if not self.async_mode:
            return 0
        return max(self.odometry.workload(), self.sub_mapping.workload(),
                   self.global_mapping.workload())

    def ok(self) -> bool:
        return all(ext.ok() for ext in self.extensions)

    def wait(self) -> None:
        """Flush the pipeline (end of sequence)."""
        if self.async_mode:
            # Flag the drain to the downstream workers BEFORE the odometry
            # join: submaps trickle into the global worker throughout the
            # window flush, and without the flag every 2+ batch pays an
            # intermediate optimize (hundreds of ms each) that the single
            # final end-of-sequence solve makes redundant.
            for stage in (self.sub_mapping, self.global_mapping):
                begin = getattr(stage, "begin_drain", None)
                if begin is not None:
                    begin()
            self.odometry.join()
            est, margs = self.odometry.get_results()
            self._sync_estimates.extend(est)
            for m in margs:
                self.sub_mapping.insert_frame(m)
            self.sub_mapping.join()
            for sm in self.sub_mapping.get_results():
                self.global_mapping.insert_submap(sm)
            self.global_mapping.join()
        else:
            for m in self.odometry.get_remaining_frames():
                self.sub_mapping.insert_frame(m)
            # Drain burst: defer per-insert optimization — the final solve
            # below covers the whole backlog in ONE optimize.
            if hasattr(self.global_mapping, "defer_optimization"):
                self.global_mapping.defer_optimization = True
            for sm in self.sub_mapping.submit_end_of_sequence():
                self.global_mapping.insert_submap(sm)
            if hasattr(self.global_mapping, "defer_optimization"):
                self.global_mapping.defer_optimization = False
            # Pose-graph backend: let the loop-detection thread finish its
            # candidate queue before the final solve, then stop it.
            if hasattr(self.global_mapping, "wait_for_detection"):
                self.global_mapping.wait_for_detection()
            self.global_mapping.optimize()
            if hasattr(self.global_mapping, "stop"):
                self.global_mapping.stop()

    # -- output --

    @property
    def odometry_estimates(self) -> List[EstimationFrame]:
        return self._sync_estimates

    def save(self, path: str) -> None:
        from glim_tpu.utils.profiling import report
        report()
        self.global_mapping.save(path)
        for ext in self.extensions:
            ext.at_exit(path)

    def export_points(self) -> np.ndarray:
        return self.global_mapping.export_points()
