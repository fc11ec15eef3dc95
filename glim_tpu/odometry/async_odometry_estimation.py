"""Asynchronous odometry wrapper: worker thread + queues.

Equivalent surface to the reference's ``AsyncOdometryEstimation``
(reference: src/glim/odometry/async_odometry_estimation.cpp:15-139): input
queues for IMU/frames, a worker that holds scans back until IMU coverage
reaches ``scan_end_time``, output queues of estimated + marginalized frames,
and ``workload()`` for upstream backpressure (rosbag throttling).
"""

from __future__ import annotations

import threading
from typing import List, Tuple

import numpy as np

from glim_tpu.odometry.estimation_base import OdometryEstimationBase
from glim_tpu.types import EstimationFrame, PreprocessedFrame
from glim_tpu.utils.concurrent import ConcurrentVector
from glim_tpu.utils.logging import create_module_logger

logger = create_module_logger("odom")


class AsyncOdometryEstimation:
    def __init__(self, odometry: OdometryEstimationBase, enable_imu: bool = True):
        self.odometry = odometry
        self.enable_imu = enable_imu and odometry.requires_imu()

        self.input_imu_queue: ConcurrentVector = ConcurrentVector()
        self.input_frame_queue: ConcurrentVector = ConcurrentVector()
        self.output_estimation_results: ConcurrentVector = ConcurrentVector()
        self.output_marginalized_frames: ConcurrentVector = ConcurrentVector()

        self._end_of_sequence = threading.Event()
        self._internal_frames: List[PreprocessedFrame] = []
        self._pending_out: List[EstimationFrame] = []
        self._last_imu_stamp = -1.0
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()
        from glim_tpu.utils import lifecycle
        lifecycle.register(self)

    def insert_imu(self, stamp: float, linear_acc: np.ndarray, angular_vel: np.ndarray) -> None:
        self.input_imu_queue.push_back((stamp, np.asarray(linear_acc), np.asarray(angular_vel)))

    def insert_frame(self, frame: PreprocessedFrame) -> None:
        self.input_frame_queue.push_back(frame)

    def insert_image(self, stamp: float, image) -> None:
        # Callback fan-out only; CallbackSlot is thread-safe.
        self.odometry.insert_image(stamp, image)

    def join(self) -> None:
        self._end_of_sequence.set()
        self.input_frame_queue.submit_end_of_data()
        self.thread.join()

    def stop(self, timeout: float = 5.0) -> None:
        """Non-draining shutdown (lifecycle cleanup): signal end-of-sequence
        and wait briefly; queued frames may be dropped."""
        self._end_of_sequence.set()
        self.input_frame_queue.submit_end_of_data()
        self.thread.join(timeout=timeout)

    def workload(self) -> int:
        return self.input_frame_queue.size() + len(self._internal_frames)

    def get_results(self) -> Tuple[List[EstimationFrame], List[EstimationFrame]]:
        return (self.output_estimation_results.get_all_and_clear(),
                self.output_marginalized_frames.get_all_and_clear())

    def _run(self) -> None:
        while True:
            eos = self._end_of_sequence.is_set()
            imu = self.input_imu_queue.get_all_and_clear()
            for stamp, acc, gyro in imu:
                self.odometry.insert_imu(stamp, acc, gyro)
                self._last_imu_stamp = stamp

            self._internal_frames.extend(
                self.input_frame_queue.get_all_and_clear_wait(timeout=0.05))

            # Hold frames back until IMU coverage reaches scan end (reference:
            # async_odometry_estimation.cpp:114-124).
            while self._internal_frames:
                frame = self._internal_frames[0]
                if self.enable_imu and not eos and frame.scan_end_time > self._last_imu_stamp:
                    break
                self._internal_frames.pop(0)
                marginalized: List[EstimationFrame] = []
                from glim_tpu.utils.profiling import profile_scope
                with profile_scope("odometry"):
                    est = self.odometry.insert_frame(frame, marginalized)
                if est is not None:
                    # Publish one frame late: by the next scan the estimator
                    # has decoded this frame's lagged status and filled its
                    # HOST pose caches, so consumers (trajectory, viewers)
                    # never block on a device fetch.
                    if self._pending_out:
                        self.output_estimation_results.push_back(
                            self._pending_out.pop(0))
                    self._pending_out.append(est)
                if marginalized:
                    self.output_marginalized_frames.insert(marginalized)

            if eos and not self._internal_frames and self.input_frame_queue.empty():
                for e in self._pending_out:
                    self.output_estimation_results.push_back(e)
                self._pending_out = []
                remaining = self.odometry.get_remaining_frames()
                if remaining:
                    self.output_marginalized_frames.insert(remaining)
                self.output_estimation_results.submit_end_of_data()
                self.output_marginalized_frames.submit_end_of_data()
                break
