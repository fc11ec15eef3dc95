"""Asynchronous global-mapping wrapper.

Equivalent surface to the reference's ``AsyncGlobalMapping``
(reference: src/glim/mapping/async_global_mapping.cpp:24-143): worker thread
draining the submap queue, periodic ``optimize()`` when idle, servicing of the
three request slots, and mutex-guarded save/export.
"""

from __future__ import annotations

import threading
import time
from typing import List

import numpy as np

from glim_tpu.mapping.callbacks import GlobalMappingCallbacks as CB
from glim_tpu.mapping.global_mapping_base import GlobalMappingBase
from glim_tpu.types import SubMap
from glim_tpu.utils.concurrent import ConcurrentVector


class AsyncGlobalMapping:
    def __init__(self, global_mapping: GlobalMappingBase,
                 optimization_interval: float = 5.0):
        self.global_mapping = global_mapping
        self.optimization_interval = optimization_interval
        self.input_imu_queue: ConcurrentVector = ConcurrentVector()
        self.input_submap_queue: ConcurrentVector = ConcurrentVector()
        self._end_of_sequence = threading.Event()
        self._draining = threading.Event()
        self._request_optimize = threading.Event()
        self._request_recover = threading.Event()
        self._request_overlap: List[float] = []
        self._mutex = threading.RLock()
        self._last_optimization = time.time()

        CB.request_to_optimize.add(lambda: self._request_optimize.set())
        CB.request_to_recover.add(lambda: self._request_recover.set())
        CB.request_to_find_overlapping_submaps.add(self._request_overlap.append)
        # Extension factor-injection requests, applied on the worker thread.
        self._request_factors: List[tuple] = []
        CB.request_to_add_translation_prior.add(
            lambda idx, pos, si: self._request_factors.append(
                ("tp", idx, pos, si)))
        CB.request_to_add_loop.add(
            lambda tgt, src: self._request_factors.append(
                ("loop", tgt, src)))
        CB.request_to_add_between.add(
            lambda tgt, src, T, info=None: self._request_factors.append(
                ("between", tgt, src, T, info)))

        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()
        from glim_tpu.utils import lifecycle
        lifecycle.register(self)

    def insert_imu(self, stamp: float, linear_acc: np.ndarray, angular_vel: np.ndarray) -> None:
        self.input_imu_queue.push_back((stamp, np.asarray(linear_acc), np.asarray(angular_vel)))

    def insert_submap(self, submap: SubMap) -> None:
        self.input_submap_queue.push_back(submap)

    def insert_image(self, stamp: float, image) -> None:
        # Callback fan-out only (global_mapping_base.cpp:14-16); safe to
        # fire on the caller thread — CallbackSlot is thread-safe.
        self.global_mapping.insert_image(stamp, image)

    def begin_drain(self) -> None:
        """Signal that the feed has ended and a join() is imminent: from now
        on every insert defers its optimization into the single final solve
        (intermediate solves on a still-growing drain backlog are wasted
        work — each costs hundreds of ms on the shared device)."""
        self._draining.set()

    def join(self) -> None:
        self._draining.set()
        self._end_of_sequence.set()
        self.input_submap_queue.submit_end_of_data()
        self.thread.join()

    def stop(self, timeout: float = 5.0) -> None:
        """Non-draining shutdown (lifecycle cleanup)."""
        self._end_of_sequence.set()
        self.input_submap_queue.submit_end_of_data()
        self.thread.join(timeout=timeout)
        stop_inner = getattr(self.global_mapping, "stop", None)
        if stop_inner is not None:
            stop_inner()

    def workload(self) -> int:
        return self.input_submap_queue.size()

    def save(self, path: str) -> None:
        with self._mutex:
            self.global_mapping.save(path)

    def export_points(self) -> np.ndarray:
        with self._mutex:
            return self.global_mapping.export_points()

    def _run(self) -> None:
        while True:
            eos = self._end_of_sequence.is_set()
            for stamp, acc, gyro in self.input_imu_queue.get_all_and_clear():
                self.global_mapping.insert_imu(stamp, acc, gyro)
            submaps = self.input_submap_queue.get_all_and_clear_wait(timeout=0.05)
            with self._mutex:
                gm = self.global_mapping
                # A backlog (startup catch-up or end-of-sequence drain)
                # costs ONE solve after the burst instead of one per
                # insert — each in-line optimize is hundreds of ms. Once
                # the drain is flagged, even single-submap batches defer:
                # the final eos solve below covers them.
                draining = eos or self._draining.is_set()
                defer = ((len(submaps) > 1 or draining)
                         and hasattr(gm, "defer_optimization"))
                if defer:
                    gm.defer_optimization = True
                for sm in submaps:
                    gm.insert_submap(sm)
                    self._last_optimization = time.time()
                if defer:
                    gm.defer_optimization = False
                    if not draining:
                        needs = getattr(gm, "needs_optimize", None)
                        if needs is None or needs():
                            gm.optimize()
                        self._last_optimization = time.time()

                while self._request_factors:
                    req = self._request_factors.pop(0)
                    gm = self.global_mapping
                    try:
                        if req[0] == "tp" and hasattr(gm, "add_translation_prior"):
                            gm.add_translation_prior(req[1], req[2], req[3])
                        elif req[0] == "loop":
                            if hasattr(gm, "add_matching_factor"):
                                gm.add_matching_factor(req[1], req[2])
                            elif hasattr(gm, "add_loop_candidate"):
                                gm.add_loop_candidate(req[1], req[2])
                        elif req[0] == "between" and \
                                hasattr(gm, "add_between_factor"):
                            gm.add_between_factor(req[1], req[2], req[3],
                                                  req[4])
                            self._request_optimize.set()
                    except Exception as e:     # extension input: never fatal
                        import logging
                        logging.getLogger("glim_tpu.global").warning(
                            "extension factor request %s failed: %s", req[0], e)

                if self._request_optimize.is_set():
                    self._request_optimize.clear()
                    self.global_mapping.optimize()
                    self._last_optimization = time.time()
                if self._request_recover.is_set():
                    self._request_recover.clear()
                    self.global_mapping.recover_graph()
                while self._request_overlap:
                    self.global_mapping.find_overlapping_submaps(self._request_overlap.pop(0))

                # Periodic idle optimization (reference: :96-118) — but only
                # when the graph actually changed since the last solve:
                # re-optimizing an unchanged graph steals the (shared)
                # accelerator from the odometry hot loop for nothing.
                if (not draining and time.time() - self._last_optimization
                        > self.optimization_interval):
                    needs = getattr(self.global_mapping, "needs_optimize", None)
                    if needs is None or needs():
                        self.global_mapping.optimize()
                    self._last_optimization = time.time()

            if eos and self.input_submap_queue.empty() and not submaps:
                with self._mutex:
                    # Let the loop-detection thread (pose-graph backend)
                    # finish its queue before the final solve.
                    if hasattr(self.global_mapping, "wait_for_detection"):
                        self.global_mapping.wait_for_detection()
                    # Final solve — skipped when the graph is unchanged
                    # since the last optimize (e.g. the drain burst above
                    # already solved it).
                    needs = getattr(self.global_mapping, "needs_optimize", None)
                    if needs is None or needs():
                        self.global_mapping.optimize()
                    if hasattr(self.global_mapping, "stop"):
                        self.global_mapping.stop()
                break
