"""IMU sample queue + preintegration front-end.

Equivalent surface to the reference's ``IMUIntegration``
(reference: src/glim/common/imu_integration.cpp:38-189): a time-ordered queue
of 7-vector samples [t, ax..az, wx..wz], preintegration over [t0, t1] with a
given bias, the pose-prediction variant emitting per-sample poses for
deskewing, and find/erase bookkeeping. Device math lives in glim_tpu.ops.imu.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from glim_tpu.ops import imu as imu_ops


class IMUIntegration:
    def __init__(self, acc_noise: float = 0.05, gyro_noise: float = 0.02,
                 int_noise: float = 0.001, capacity: int = 256):
        self.acc_noise = acc_noise
        self.gyro_noise = gyro_noise
        self.int_noise = int_noise
        self.capacity = capacity
        self._data: List[np.ndarray] = []

    def insert_imu(self, stamp: float, linear_acc, angular_vel) -> None:
        self._data.append(np.concatenate([[stamp], np.asarray(linear_acc),
                                          np.asarray(angular_vel)]))

    @property
    def imu_data(self) -> List[np.ndarray]:
        return self._data

    def find_imu_data(self, t0: float, t1: float) -> np.ndarray:
        rows = [r for r in self._data if t0 - 1e-9 <= r[0] <= t1 + 1e-9]
        return np.stack(rows) if rows else np.zeros((0, 7))

    def erase_imu_data(self, before: float) -> None:
        self._data = [r for r in self._data if r[0] >= before]

    def integrate_imu(self, t0: float, t1: float, bias: np.ndarray
                      ) -> Tuple[imu_ops.PreintegratedImu, int]:
        """Preintegrate [t0, t1]; returns (preint, num_samples_used)."""
        rows = self.find_imu_data(t0, t1)
        cap = self.capacity
        n = min(len(rows), cap)
        acc = np.zeros((cap, 3), np.float32)
        gyro = np.zeros((cap, 3), np.float32)
        dts = np.zeros(cap, np.float32)
        mask = np.zeros(cap, bool)
        prev = t0
        for i in range(n):
            acc[i] = rows[i, 1:4]
            gyro[i] = rows[i, 4:7]
            dts[i] = max(rows[i, 0] - prev, 0.0)
            prev = rows[i, 0]
            mask[i] = True
        pre = imu_ops.preintegrate(jnp.asarray(acc), jnp.asarray(gyro),
                                   jnp.asarray(dts), jnp.asarray(mask),
                                   jnp.asarray(bias, jnp.float32),
                                   jnp.float32(self.acc_noise),
                                   jnp.float32(self.gyro_noise),
                                   jnp.float32(self.int_noise))
        return pre, n

    def integrate_imu_rate_poses(self, T0: np.ndarray, v0: np.ndarray,
                                 bias: np.ndarray, t0: float, t1: float,
                                 gravity=np.array([0.0, 0.0, -9.80665])):
        """Per-sample world poses over [t0, t1] (the deskewing variant).

        Returns (stamps (K,), Rs (K,3,3), ps (K,3)) or None if <2 samples."""
        rows = self.find_imu_data(t0, t1)
        if len(rows) < 2:
            return None
        dts = np.diff(rows[:, 0], prepend=rows[0, 0]).astype(np.float32)
        Rs, ps, vs = imu_ops.integrate_poses(
            jnp.asarray(np.asarray(T0)[:3, :3], jnp.float32),
            jnp.asarray(np.asarray(T0)[:3, 3], jnp.float32),
            jnp.asarray(v0, jnp.float32), jnp.asarray(bias, jnp.float32),
            jnp.asarray(gravity, jnp.float32),
            jnp.asarray(rows[:, 1:4], jnp.float32),
            jnp.asarray(rows[:, 4:7], jnp.float32),
            jnp.asarray(dts), jnp.ones(len(rows), bool))
        return rows[:, 0], Rs, ps
