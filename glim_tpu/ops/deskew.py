"""Scan deskewing (motion compensation).

Equivalent behavior to the reference's ``CloudDeskewing``
(reference: src/glim/common/cloud_deskewing.cpp:11-133) with two modes:

- constant-twist: pose(t) = Exp(t * twist) relative to scan start (used when
  only begin/end poses are known),
- IMU-rate: slerp/lerp interpolation of the IMU-predicted pose stream.

The reference compresses the per-point time table to amortize pose
interpolation on CPU; on TPU the fully vectorized per-point interpolation is
a handful of gathers + fused elementwise math, so no table is needed.
Output points live in the LiDAR frame at scan start (t = times[0]).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from glim_tpu.ops.lie import (quat_slerp, quat_to_rot, rot_to_quat, se3_exp,
                              se3_inv)


@jax.jit
def deskew_twist(points: jnp.ndarray, times: jnp.ndarray, mask: jnp.ndarray,
                 twist: jnp.ndarray) -> jnp.ndarray:
    """Constant-twist deskew: point i is moved by Exp(times[i] * twist).

    ``twist`` is the sensor's body twist [omega, v] over one second, in the
    LiDAR frame at scan start.
    """
    T = se3_exp(times[:, None] * twist[None, :])            # (C, 4, 4)
    p = jnp.einsum("cij,cj->ci", T[:, :3, :3], points) + T[:, :3, 3]
    return jnp.where(mask[:, None], p, points)


@jax.jit
def deskew_imu(points: jnp.ndarray, times: jnp.ndarray, mask: jnp.ndarray,
               imu_stamps: jnp.ndarray, imu_quats: jnp.ndarray,
               imu_trans: jnp.ndarray, T_lidar_imu: jnp.ndarray) -> jnp.ndarray:
    """Deskew against an IMU-rate pose stream.

    Args:
      points:     (C, 3) in the LiDAR frame (as captured)
      times:      (C,) per-point times on the same clock as imu_stamps
      imu_stamps: (K,) ascending pose stamps (world_imu poses)
      imu_quats:  (K, 4) [x y z w]
      imu_trans:  (K, 3)
      T_lidar_imu: (4, 4) extrinsics (p_lidar = T_lidar_imu * p_imu)

    Returns points in the LiDAR frame at the scan-start time times.min().
    """
    K = imu_stamps.shape[0]
    t = times
    # method="sort": one co-sort beats the default while-loop binary search
    # on TPU (see ops/voxelmap.py lookup note).
    idx = jnp.clip(jnp.searchsorted(imu_stamps, t, method="sort"), 1, K - 1)
    t0 = imu_stamps[idx - 1]
    t1 = imu_stamps[idx]
    a = jnp.clip((t - t0) / jnp.maximum(t1 - t0, 1e-9), 0.0, 1.0)

    q = quat_slerp(imu_quats[idx - 1], imu_quats[idx], a)
    trans = imu_trans[idx - 1] * (1.0 - a[:, None]) + imu_trans[idx] * a[:, None]
    R_wi = quat_to_rot(q)                                   # (C, 3, 3)

    # Reference pose: interpolate at scan start.
    t_ref = jnp.min(jnp.where(mask, t, jnp.inf))
    i_ref = jnp.clip(jnp.searchsorted(imu_stamps, t_ref), 1, K - 1)
    a_ref = jnp.clip((t_ref - imu_stamps[i_ref - 1]) /
                     jnp.maximum(imu_stamps[i_ref] - imu_stamps[i_ref - 1], 1e-9), 0.0, 1.0)
    q_ref = quat_slerp(imu_quats[i_ref - 1][None], imu_quats[i_ref][None], a_ref[None])[0]
    p_ref = imu_trans[i_ref - 1] * (1.0 - a_ref) + imu_trans[i_ref] * a_ref
    R_ref = quat_to_rot(q_ref)

    # p_out = (T_w_L(ref))^-1 * T_w_L(t) * p, with T_w_L = T_w_imu * T_imu_lidar.
    T_imu_lidar = se3_inv(T_lidar_imu)
    R_il = T_imu_lidar[:3, :3]
    p_il = T_imu_lidar[:3, 3]

    # point -> imu frame at capture time -> world
    p_imu = points @ R_il.T + p_il
    p_w = jnp.einsum("cij,cj->ci", R_wi, p_imu) + trans
    # world -> imu frame at ref time -> lidar frame
    p_imu_ref = (p_w - p_ref) @ R_ref                        # R_ref^T applied
    p_lidar = (p_imu_ref - p_il) @ R_il                      # R_il^T applied
    return jnp.where(mask[:, None], p_lidar, points)


def imu_pose_table(stamps, Rs, ps):
    """Pack an IMU-rate pose stream into (stamps, quats, trans) arrays."""
    return jnp.asarray(stamps), rot_to_quat(jnp.asarray(Rs)), jnp.asarray(ps)
