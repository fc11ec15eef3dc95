"""Scan deskewing front-end.

Equivalent surface to the reference's ``CloudDeskewing``
(reference: src/glim/common/cloud_deskewing.cpp:11-133): constant-twist and
IMU-pose-interpolation modes. Device kernels live in glim_tpu.ops.deskew.
"""

from __future__ import annotations

import jax.numpy as jnp

from glim_tpu.ops import deskew as deskew_ops
from glim_tpu.ops.lie import rot_to_quat


class CloudDeskewing:
    def deskew_twist(self, points, times, mask, twist) -> jnp.ndarray:
        """Constant-twist motion compensation (twist = [omega, v] per sec)."""
        return deskew_ops.deskew_twist(points, times, mask,
                                       jnp.asarray(twist, jnp.float32))

    def deskew_imu(self, points, times, mask, imu_stamps, imu_Rs, imu_ps,
                   T_lidar_imu) -> jnp.ndarray:
        """IMU-rate pose-stream motion compensation."""
        quats = rot_to_quat(jnp.asarray(imu_Rs, jnp.float32))
        return deskew_ops.deskew_imu(points, times, mask,
                                     jnp.asarray(imu_stamps, jnp.float32), quats,
                                     jnp.asarray(imu_ps, jnp.float32),
                                     jnp.asarray(T_lidar_imu, jnp.float32))
