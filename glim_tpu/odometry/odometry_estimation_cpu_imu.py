"""IMU-coupled frame-to-model odometry (cpu-module parity).

Equivalent capability to the reference's ``OdometryEstimationCPU``
(reference: src/glim/odometry/odometry_estimation_cpu.cpp:77-224, params from
config/config_odometry_cpu.json), which EXTENDS OdometryEstimationIMU: every
scan is registered frame-to-model — GICP against an iVox point map or VGICP
against Gaussian voxel maps — and the result is fused with the IMU factors
in the fixed-lag smoother (the reference injects the per-frame LM solve as
Between+Prior factors, odometry_estimation_cpu.cpp:166-167).

TPU redesign: the shared window estimator already fuses a frame-to-model
matching system for the newest state with the IMU chain in one joint GN —
which is strictly tighter coupling than the reference's
solve-then-inject-as-unary scheme (the matching Hessian enters the joint
system directly instead of being flattened to an isotropic precision). The
cpu-parity pieces this module adds on top of the shared estimator:

  * the model is a bounded iVox-style point map (GICP mode, NN
    correspondences capped at 2 x ivox_resolution) or single/multi-level
    Gaussian voxel maps (VGICP mode) — NOT the keyframe map;
  * the model absorbs EVERY scan (no keyframe gating): full density for the
    first 5 frames, then a ``target_downsampling_rate`` random sample
    (reference update_target, odometry_estimation_cpu.cpp:177-224).

``enable_imu=False`` falls back to the LiDAR-only module in
odometry_estimation_cpu.py (a deliberate extra over the reference, kept for
IMU-less datasets and the LOOSE-init bootstrap).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from glim_tpu.odometry.odometry_estimation_imu import (
    OdometryEstimationIMU, OdometryEstimationIMUParams)
from glim_tpu.ops import voxelmap as vmx
from glim_tpu.types import EstimationFrame
from glim_tpu.utils.logging import create_module_logger
from glim_tpu.utils.registry import register_module

logger = create_module_logger("odom")


@dataclass
class OdometryEstimationCPUIMUParams(OdometryEstimationIMUParams):
    registration_type: str = "GICP"        # GICP (iVox) | VGICP
    max_iterations: int = 8
    target_downsampling_rate: float = 0.1
    ivox_resolution: float = 0.5
    ivox_min_dist: float = 0.1
    vgicp_resolution: float = 0.3
    vgicp_voxelmap_levels: int = 2
    vgicp_voxelmap_scaling_factor: float = 2.0
    model_capacity: int = 131072
    dense_frames: int = 5                  # full-density model updates early

    @staticmethod
    def from_config(config, sensors_config=None) -> "OdometryEstimationCPUIMUParams":
        base = OdometryEstimationIMUParams.from_config(config, sensors_config)
        p = OdometryEstimationCPUIMUParams(**vars(base))
        g = lambda k, d: config.param("odometry_estimation", k, d)
        p.registration_type = g("registration_type", "GICP")
        p.max_iterations = int(g("max_iterations", 8))
        p.target_downsampling_rate = g("target_downsampling_rate", 0.1)
        p.ivox_resolution = g("ivox_resolution", 0.5)
        p.ivox_min_dist = g("ivox_min_dist", 0.1)
        p.vgicp_resolution = g("vgicp_resolution", 0.3)
        p.vgicp_voxelmap_levels = int(g("vgicp_voxelmap_levels", 2))
        p.vgicp_voxelmap_scaling_factor = g("vgicp_voxelmap_scaling_factor", 2.0)
        return p


class OdometryEstimationCPUIMU(OdometryEstimationIMU):
    def __init__(self, params: Optional[OdometryEstimationCPUIMUParams] = None):
        self._cpu_params = params or OdometryEstimationCPUIMUParams()
        super().__init__(self._cpu_params)
        p = self._cpu_params
        self.use_vgicp = p.registration_type.upper().startswith("VGICP")
        self._matching = "vgicp" if self.use_vgicp else "gicp"
        # The cpu module's target-model resolution comes from its own
        # ivox/vgicp knobs (as in the reference cpu module, which has no
        # adaptive voxel resolution) — disable the GPU-module adaptation.
        self._adaptive_resolution = False
        self._max_corr_dist = p.ivox_resolution * 2.0
        self._d_max_corr_dist = jnp.float32(self._max_corr_dist)
        self._rng = jax.random.PRNGKey(7)
        self._last_kf_T = jnp.eye(4)       # displacement reference (unused
        #                                    by strategies here, fed to the step)

    # -- model hooks ------------------------------------------------------

    def _make_model(self):
        p = self._cpu_params
        if p.registration_type.upper().startswith("VGICP"):
            return tuple(
                vmx.empty_gaussian_voxelmap(
                    max(p.model_capacity >> lvl, 8192),
                    p.vgicp_resolution * (p.vgicp_voxelmap_scaling_factor ** lvl))
                for lvl in range(max(p.vgicp_voxelmap_levels, 1)))
        return vmx.empty_point_voxelmap(p.model_capacity, p.ivox_min_dist)

    def _last_kf_pose_dev(self):
        return self._last_kf_T

    def _init_model(self, frame, covs, T_wl_dev, T_wi_dev, T0_host) -> None:
        self._insert_scan(frame.device_points, covs, frame.device_mask,
                          T_wl_dev, 0)
        self._last_kf_T = T_wi_dev

    def _maybe_update_model(self, prev: EstimationFrame, s: np.ndarray) -> None:
        """Every scan feeds the model (reference update_target,
        odometry_estimation_cpu.cpp:177-224): full density for the first
        ``dense_frames``, then a random ``target_downsampling_rate`` sample."""
        self._insert_scan(prev.frame.points, prev.frame.covs, prev.frame.mask,
                          prev.device_T_world_lidar, prev.id)

    def _insert_scan(self, pts_l, covs_l, mask, T_wl, frame_id: int) -> None:
        p = self._cpu_params
        R, t = T_wl[:3, :3], T_wl[:3, 3]
        pts_w = pts_l @ R.T + t
        covs_w = jnp.einsum("ij,cjk,lk->cil", R, covs_l, R)
        if frame_id >= p.dense_frames:
            self._rng, sub = jax.random.split(self._rng)
            keep = jax.random.uniform(sub, mask.shape) < p.target_downsampling_rate
            mask = mask & keep
        if self.use_vgicp:
            self.model = tuple(
                vmx.voxelmap_insert(vm, pts_w, mask, covs_w, jnp.int32(frame_id))
                for vm in self.model)
        else:
            self.model = vmx.pointmap_insert(self.model, pts_w, mask, covs_w,
                                             jnp.int32(frame_id))


@register_module("odometry", "odometry_estimation_cpu")
def create_odometry_estimation_cpu_module(config=None, sensors_config=None):
    """Reference parity: libodometry_estimation_cpu.so is the IMU-coupled
    frame-to-model module. enable_imu=false (an extra) selects the
    LiDAR-only fallback used for IMU-less datasets."""
    if config is not None and not config.param("odometry_estimation",
                                               "enable_imu", True):
        from glim_tpu.odometry.odometry_estimation_cpu import (
            OdometryEstimationCPU, OdometryEstimationCPUParams)
        return OdometryEstimationCPU(OdometryEstimationCPUParams.from_config(config))
    params = (OdometryEstimationCPUIMUParams.from_config(config, sensors_config)
              if config is not None else OdometryEstimationCPUIMUParams())
    return OdometryEstimationCPUIMU(params)
