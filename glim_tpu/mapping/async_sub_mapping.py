"""Asynchronous sub-mapping wrapper (reference: src/glim/mapping/async_sub_mapping.cpp:8-91)."""

from __future__ import annotations

import threading
from typing import List

import numpy as np

from glim_tpu.mapping.sub_mapping_base import SubMappingBase
from glim_tpu.types import EstimationFrame, SubMap
from glim_tpu.utils.concurrent import ConcurrentVector


class AsyncSubMapping:
    def __init__(self, sub_mapping: SubMappingBase):
        self.sub_mapping = sub_mapping
        self.input_imu_queue: ConcurrentVector = ConcurrentVector()
        self.input_frame_queue: ConcurrentVector = ConcurrentVector()
        self.output_submap_queue: ConcurrentVector = ConcurrentVector()
        self._end_of_sequence = threading.Event()
        self._draining = threading.Event()
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()
        from glim_tpu.utils import lifecycle
        lifecycle.register(self)

    def insert_imu(self, stamp: float, linear_acc: np.ndarray, angular_vel: np.ndarray) -> None:
        self.input_imu_queue.push_back((stamp, np.asarray(linear_acc), np.asarray(angular_vel)))

    def insert_frame(self, frame: EstimationFrame) -> None:
        # Start the packed-state device->host copy NOW (producer thread):
        # it lands while the frame sits in the queue, so the worker's
        # fetch_state() doesn't pay a blocking roundtrip behind the busy
        # odometry device queue.
        frame.fetch_state_async()
        self.input_frame_queue.push_back(frame)

    def insert_image(self, stamp: float, image) -> None:
        # Callback fan-out only; CallbackSlot is thread-safe.
        self.sub_mapping.insert_image(stamp, image)

    def begin_drain(self) -> None:
        """Feed ended, join() imminent: keep the pending-gate queue deep for
        the whole drain so back-to-back frames never block on gate copies
        (decisions still force-resolve at submap rolls / end of sequence)."""
        self._draining.set()

    def join(self) -> None:
        self._draining.set()
        self._end_of_sequence.set()
        self.input_frame_queue.submit_end_of_data()
        self.thread.join()

    def stop(self, timeout: float = 5.0) -> None:
        """Non-draining shutdown (lifecycle cleanup)."""
        self._end_of_sequence.set()
        self.input_frame_queue.submit_end_of_data()
        self.thread.join(timeout=timeout)

    def workload(self) -> int:
        return self.input_frame_queue.size()

    def get_results(self) -> List[SubMap]:
        return self.output_submap_queue.get_all_and_clear()

    def _run(self) -> None:
        while True:
            eos = self._end_of_sequence.is_set()
            for stamp, acc, gyro in self.input_imu_queue.get_all_and_clear():
                self.sub_mapping.insert_imu(stamp, acc, gyro)
            frames = self.input_frame_queue.get_all_and_clear_wait(timeout=0.05)
            burst = len(frames) > 1 or self._draining.is_set()
            if burst and hasattr(self.sub_mapping, "gate_keep"):
                # Input burst (startup catch-up or end-of-sequence drain):
                # deepen the pending-gate queue so back-to-back frames never
                # pay a blocking read on a gate copy still behind the
                # programs just dispatched (measured ~11 ms/frame serialized
                # over the tunnel). Decisions resolve once copies land, and
                # submap rolls still force-resolve everything.
                self.sub_mapping.gate_keep = max(len(frames) + 3, 64)
            for frame in frames:
                self.sub_mapping.insert_frame(frame)
            if not burst and hasattr(self.sub_mapping, "gate_keep"):
                self.sub_mapping.gate_keep = 3
            self.output_submap_queue.insert(self.sub_mapping.get_submaps())
            if eos and self.input_frame_queue.empty() and not frames:
                self.output_submap_queue.insert(self.sub_mapping.submit_end_of_sequence())
                self.output_submap_queue.submit_end_of_data()
                break
