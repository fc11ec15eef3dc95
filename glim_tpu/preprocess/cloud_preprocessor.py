"""Scan preprocessing: downsample -> filter -> sort -> kNN graph.

Equivalent surface to the reference's ``CloudPreprocessor``
(reference: src/glim/preprocess/cloud_preprocessor.cpp:75-221, params from
config/config_preprocess.json) re-designed as ONE fused jitted device
pipeline over a padded scan:

  distance/finite filter -> random-grid (or voxel-grid) downsampling ->
  time sort -> optional crop-box -> optional statistical outlier removal ->
  k-nearest-neighbor graph (MXU distance matmuls)

The reference runs these as sequential OMP/TBB passes over std::vectors; here
XLA fuses the masked elementwise stages and the sort/top-k primitives do the
rest, with a single host->device upload of the raw scan and one compiled
program per (input-capacity, output-capacity) class.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from glim_tpu.ops import covariance, knn, pointops
from glim_tpu.preprocess.callbacks import PreprocessCallbacks
from glim_tpu.types import PreprocessedFrame, RawPoints, capacity_for
from glim_tpu.utils.logging import create_module_logger

logger = create_module_logger("preprocess")


@dataclass
class CloudPreprocessorParams:
    """Mirrors config_preprocess.json keys (reference defaults)."""

    distance_near_thresh: float = 0.5
    distance_far_thresh: float = 100.0
    use_random_grid_downsampling: bool = True
    downsample_resolution: float = 1.0
    random_downsample_target: int = 10000
    random_downsample_rate: float = 0.1
    enable_outlier_removal: bool = False
    outlier_removal_k: int = 10
    outlier_std_mul_factor: float = 1.0
    enable_cropbox_filter: bool = False
    crop_bbox_frame: str = "lidar"
    crop_bbox_min: np.ndarray = None
    crop_bbox_max: np.ndarray = None
    k_correspondences: int = 10
    T_imu_lidar: np.ndarray = None
    exact_knn: bool = False                  # banded Morton kNN by default
    knn_window: int = 64
    quantize_resolution: float = 0.005       # upload quantization [m/LSB]

    @staticmethod
    def from_config(config, sensors_config=None) -> "CloudPreprocessorParams":
        p = CloudPreprocessorParams()
        g = lambda k, d: config.param("preprocess", k, d)
        p.distance_near_thresh = g("distance_near_thresh", p.distance_near_thresh)
        p.distance_far_thresh = g("distance_far_thresh", p.distance_far_thresh)
        p.use_random_grid_downsampling = g("use_random_grid_downsampling", True)
        p.downsample_resolution = g("downsample_resolution", 1.0)
        p.random_downsample_target = int(g("random_downsample_target", 10000))
        p.random_downsample_rate = g("random_downsample_rate", 0.1)
        p.enable_outlier_removal = g("enable_outlier_removal", False)
        p.outlier_removal_k = int(g("outlier_removal_k", 10))
        p.outlier_std_mul_factor = g("outlier_std_mul_factor", 1.0)
        p.enable_cropbox_filter = g("enable_cropbox_filter", False)
        p.crop_bbox_frame = g("crop_bbox_frame", "lidar")
        p.crop_bbox_min = np.asarray(g("crop_bbox_min", [-1.0, -1.0, -1.0]))
        p.crop_bbox_max = np.asarray(g("crop_bbox_max", [1.0, 1.0, 1.0]))
        p.k_correspondences = int(g("k_correspondences", 10))
        if sensors_config is not None:
            T_lidar_imu = sensors_config.param_se3("sensors", "T_lidar_imu")
            p.T_imu_lidar = np.linalg.inv(T_lidar_imu)
        return p


@partial(jax.jit, static_argnames=("out_cap", "use_random_grid", "k",
                                   "enable_cropbox", "enable_outlier_removal",
                                   "outlier_k", "exact_knn", "knn_window"))
def _preprocess_device(packed, meta, pt_scale, rng, *,
                       out_cap: int, use_random_grid: bool, k: int,
                       enable_cropbox: bool, enable_outlier_removal: bool,
                       outlier_k: int, exact_knn: bool, knn_window: int,
                       near, far, resolution, bbox_T, bbox_min, bbox_max,
                       outlier_std_mul):
    """The fused device pipeline. Returns (points, times, mask, neighbors,
    next_rng).

    ``packed`` is the quantized upload: (C, 4) int16 [x, y, z, t] with
    points at pt_scale meters/LSB and times at t_scale seconds/LSB — 8 bytes
    per point over the host->device link instead of 20. ``meta`` is the only
    other per-scan transfer: (3,) f32 [n_valid, t_scale, sample_target] —
    the per-scan sample target rides in it as a TRACED value (the reference
    derives it as target>0 ? target : rate*size per scan,
    cloud_preprocessor.cpp:104-106; a traced target means rate-mode never
    recompiles). The RNG key stays device-resident (split in here, new key
    returned) so per-scan dispatch costs one upload + one small upload +
    one program on remoted chips.
    """
    C = packed.shape[0]
    n_valid = meta[0].astype(jnp.int32)
    t_scale = meta[1]
    target = meta[2].astype(jnp.int32)
    rng, rng_next = jax.random.split(rng)
    points = packed[:, :3].astype(jnp.float32) * pt_scale
    times = packed[:, 3].astype(jnp.float32) * t_scale
    mask = jnp.arange(C) < n_valid
    mask = pointops.distance_filter(points, mask, near, far)

    if use_random_grid:
        pts_d, mask_d, idx = pointops.randomgrid_sampling(points, mask, resolution, target, rng)
        times_d = times[idx]
    else:
        pts_d, mask_d = pointops.voxelgrid_sampling(points, mask, resolution)
        # Centroid times: nearest original point's time is a good proxy (the
        # reference averages attributes; scan times vary smoothly in space).
        nn_idx, _ = knn.knn_search(pts_d, mask_d, points, mask, k=1)
        times_d = times[nn_idx[:, 0]]

    pts_d = pts_d[:out_cap]
    mask_d = mask_d[:out_cap]
    times_d = times_d[:out_cap]

    # Time sort (reference sorts per-point times ascending).
    t_sort = jnp.where(mask_d, times_d, jnp.inf)
    order = jnp.argsort(t_sort)
    pts_d = pts_d[order]
    times_d = jnp.where(mask_d[order], times_d[order], 0.0)
    mask_d = mask_d[order]

    if enable_cropbox:
        mask_d = pointops.cropbox_filter(pts_d, mask_d, bbox_T, bbox_min, bbox_max)

    if exact_knn:
        neighbors, sq_dists = knn.knn_self(pts_d, mask_d, k)
    else:
        neighbors, sq_dists = knn.knn_banded(pts_d, mask_d, k, window=knn_window,
                                             cell=2.0 * resolution)
    if enable_outlier_removal:
        # kNN columns are distance-sorted (lax.top_k): the first outlier_k
        # are exactly the outlier-removal neighborhood (reference uses a
        # separate outlier_removal_k kNN search, cloud_preprocessor.cpp:166).
        mask_d = covariance.outlier_mask(sq_dists[:, :outlier_k], mask_d,
                                         outlier_std_mul)

    return pts_d, times_d, mask_d, neighbors, rng_next


class CloudPreprocessor:
    """Sensor-agnostic scan preprocessing front-end."""

    def __init__(self, params: Optional[CloudPreprocessorParams] = None,
                 seed: int = 0):
        self.params = params or CloudPreprocessorParams()
        self._rng = jax.random.PRNGKey(seed)
        tgt = self.params.random_downsample_target
        # target <= 0 selects rate mode (reference default: target=0,
        # rate=0.3, cloud_preprocessor.cpp:32-33,104-106); the output
        # capacity is then input-size dependent and chosen per scan.
        self.out_capacity = capacity_for(max(tgt, 512)) if tgt > 0 else None
        if (self.params.enable_outlier_removal
                and self.params.outlier_removal_k
                > self.params.k_correspondences):
            logger.warning(
                "outlier_removal_k=%d exceeds k_correspondences=%d; the "
                "outlier test reuses the correspondence kNN graph and is "
                "clamped to %d neighbors", self.params.outlier_removal_k,
                self.params.k_correspondences, self.params.k_correspondences)
        # Constant device args, uploaded once (every host->device transfer
        # costs ~2 ms of tunnel latency on remoted chips).
        p = self.params
        bbox_T = np.eye(4, dtype=np.float32)
        if p.enable_cropbox_filter and p.crop_bbox_frame == "imu" \
                and p.T_imu_lidar is not None:
            bbox_T = p.T_imu_lidar.astype(np.float32)
        self._d_const = dict(
            pt_scale=jnp.float32(p.quantize_resolution),
            near=jnp.float32(p.distance_near_thresh),
            far=jnp.float32(p.distance_far_thresh),
            resolution=jnp.float32(p.downsample_resolution),
            bbox_T=jnp.asarray(bbox_T),
            bbox_min=jnp.asarray(np.asarray(p.crop_bbox_min, np.float32)
                                 if p.crop_bbox_min is not None
                                 else np.full(3, -1.0, np.float32)),
            bbox_max=jnp.asarray(np.asarray(p.crop_bbox_max, np.float32)
                                 if p.crop_bbox_max is not None
                                 else np.full(3, 1.0, np.float32)),
            outlier_std_mul=jnp.float32(p.outlier_std_mul_factor),
        )

    def preprocess(self, raw: RawPoints) -> PreprocessedFrame:
        """Fully asynchronous: one packed host->device upload, one fused jit
        dispatch, zero device->host syncs (host mirrors fetch lazily)."""
        PreprocessCallbacks.on_raw_points_received(raw)
        p = self.params

        n = raw.size
        cap = capacity_for(max(n, 1024))
        # Quantized single-buffer upload: (cap, 4) int16 [x y z t]. 8 B/point
        # over the host->device link; 5 mm position resolution is well under
        # LiDAR sensor noise.
        pt_scale = p.quantize_resolution
        if raw.times is not None and len(raw.times) == n and n:
            scan_duration = float(np.max(raw.times))
        else:
            scan_duration = 0.0
        t_scale = max(scan_duration, 1e-3) / 32000.0
        from glim_tpu.native import pack_scan_i16
        packed, _ = pack_scan_i16(np.asarray(raw.points, np.float64),
                                  raw.times if scan_duration > 0.0 else None,
                                  cap, pt_scale, t_scale)

        # Per-scan sample target (reference cloud_preprocessor.cpp:104-106:
        # rate-mode keeps downsample_rate of the raw scan).
        if p.random_downsample_target > 0:
            target = p.random_downsample_target
            out_cap = self.out_capacity
        else:
            target = max(512, int(n * p.random_downsample_rate))
            out_cap = capacity_for(target)

        dev = jax.device_put(packed)
        meta = jnp.asarray(np.array([n, t_scale, target], np.float32))
        pts_d, times_d, mask_d, neighbors, self._rng = _preprocess_device(
            dev, meta, self._d_const["pt_scale"], self._rng,
            out_cap=out_cap,
            use_random_grid=p.use_random_grid_downsampling,
            k=p.k_correspondences,
            enable_cropbox=p.enable_cropbox_filter,
            enable_outlier_removal=p.enable_outlier_removal,
            outlier_k=min(p.outlier_removal_k, p.k_correspondences),
            exact_knn=p.exact_knn,
            knn_window=p.knn_window,
            near=self._d_const["near"],
            far=self._d_const["far"],
            resolution=self._d_const["resolution"],
            bbox_T=self._d_const["bbox_T"],
            bbox_min=self._d_const["bbox_min"],
            bbox_max=self._d_const["bbox_max"],
            outlier_std_mul=self._d_const["outlier_std_mul"],
        )

        frame = PreprocessedFrame(
            stamp=raw.stamp,
            scan_end_time=raw.stamp + scan_duration,
            k_neighbors=p.k_correspondences,
            device_points=pts_d,
            device_times=times_d,
            device_mask=mask_d,
            device_neighbors=neighbors,
            raw_points=raw,
        )
        PreprocessCallbacks.on_filtering_finished(frame)
        return frame
