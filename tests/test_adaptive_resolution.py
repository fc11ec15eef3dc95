"""Per-keyframe adaptive voxel resolution (reference
odometry_estimation_gpu.cpp:89-93 re-derives the voxel scale from each
frame's median point distance; here the accumulated model re-scales at
eviction-triggered rebuilds, with the resolution a traced device scalar so
adaptation never recompiles)."""

import jax.numpy as jnp
import numpy as np
import pytest

from glim_tpu.io.synthetic import ate_rmse, circle_imu, circle_pose
from glim_tpu.odometry.keyframe_manager import KeyframeManager
from glim_tpu.odometry.odometry_estimation_imu import (
    OdometryEstimationIMU, OdometryEstimationIMUParams,
    _adaptive_base_resolution)
from glim_tpu.preprocess.cloud_preprocessor import (CloudPreprocessor,
                                                    CloudPreprocessorParams)
from glim_tpu.types import RawPoints


def test_adaptive_base_resolution_ramp():
    """Linear ramp: near clouds pin res_min, far clouds pin res_max."""
    rng = np.random.default_rng(0)
    near = jnp.asarray(rng.normal(size=(500, 3)) * 2.0, jnp.float32)
    far = jnp.asarray(rng.normal(size=(500, 3)) * 20.0, jnp.float32)
    mask = jnp.ones(500, bool)
    args = (jnp.float32(0.25), jnp.float32(1.0),
            jnp.float32(5.0), jnp.float32(20.0))
    r_near = float(_adaptive_base_resolution(near, mask, *args))
    r_far = float(_adaptive_base_resolution(far, mask, *args))
    assert abs(r_near - 0.25) < 1e-5, r_near
    assert abs(r_far - 1.0) < 1e-5, r_far
    # Mid-range lands strictly inside the ramp.
    mid = jnp.asarray(rng.normal(size=(500, 3)) * 9.0, jnp.float32)
    r_mid = float(_adaptive_base_resolution(mid, mask, *args))
    assert 0.3 < r_mid < 0.95, r_mid


def test_rebuild_uses_updated_resolution():
    """set_model_resolutions takes effect at the eviction-triggered rebuild:
    the rebuilt map's traced resolution (and voxel occupancy) reflect the
    new scale."""
    rng = np.random.default_rng(1)
    C = 256
    kfm = KeyframeManager(strategy="ENTROPY", max_num_keyframes=2,
                          min_overlap=0.1, max_overlap=0.9,
                          delta_trans=0.0, delta_rot=0.0,
                          entropy_thresh=1.0, C=C,
                          model_capacities=[4096],
                          model_resolutions=[0.25])
    from glim_tpu.ops import voxelmap as vmx
    model = (vmx.empty_gaussian_voxelmap(4096, 0.25),)
    pts = jnp.asarray(rng.uniform(-4, 4, size=(C, 3)), jnp.float32)
    covs = jnp.tile(jnp.eye(3, dtype=jnp.float32) * 0.01, (C, 1, 1))
    mask = jnp.ones(C, bool)
    for i in range(3):   # third insert overflows max_num=2 -> evict+rebuild
        T = np.eye(4); T[0, 3] = 0.1 * i
        T_dev = jnpp = jnp.asarray(T, jnp.float32)
        if i == 2:
            kfm.set_model_resolutions([jnp.float32(1.0)])
        model = kfm.insert(pts, covs, mask, T_dev, T_dev, T, model, i)
    assert abs(float(model[0].resolution) - 1.0) < 1e-6
    # Coarser voxels => strictly fewer occupied voxels than the fine map.
    fine = vmx.voxelmap_insert(vmx.empty_gaussian_voxelmap(4096, 0.25),
                               pts, mask, covs, jnp.int32(0))
    assert int(model[0].num_voxels()) < int(fine.num_voxels())


def _two_zone_sequence(duration=8.0, scan_hz=10.0, imu_hz=200.0, seed=5,
                       radius=10.0, omega=0.35, n_scan_points=2200):
    """Indoor→outdoor transition on the circle: the first half of the arc
    is a dense near-field 'room' (visible range 8 m, median distance
    ~3 m); the second half is open ground with sparse far structure
    (15–35 m). The environment — not the trajectory — changes at t_half."""
    rng = np.random.default_rng(seed)
    t_half = duration / 2
    a_half = omega * t_half
    a_end = omega * duration

    def ring(r, a0, a1, n, z0, z1):
        """Vertical cylindrical wall segment around the circle's center."""
        a = rng.uniform(a0, a1, n)
        z = rng.uniform(z0, z1, n)
        return np.stack([r * np.cos(a), r * np.sin(a), z], axis=1)

    def pillars(r_lo, r_hi, a0, a1, n_pil, n_pts, z_hi):
        """Vertical poles scattered in an annular sector — they break the
        smooth-wall along-track degeneracy (cf. make_scene's pillars)."""
        pr = rng.uniform(r_lo, r_hi, n_pil)
        pa = rng.uniform(a0, a1, n_pil)
        cx, cy = pr * np.cos(pa), pr * np.sin(pa)
        ci = rng.integers(0, n_pil, n_pts)
        ang = rng.uniform(0, 2 * np.pi, n_pts)
        return np.stack([cx[ci] + 0.3 * np.cos(ang),
                         cy[ci] + 0.3 * np.sin(ang),
                         rng.uniform(0, z_hi, n_pts)], axis=1)

    # Indoor: an annular corridor (walls 4 m either side of the r=10 path,
    # plus a floor strip) along the first half of the arc; it extends a bit
    # past the transition so the 'doorway' scans keep overlap.
    near = np.concatenate([
        ring(radius - 4.0, -0.3, a_half + 0.25, 6000, 0.0, 5.0),
        ring(radius + 4.0, -0.3, a_half + 0.25, 6000, 0.0, 5.0),
        # floor strip under the corridor
        np.stack([rng.uniform(radius - 4, radius + 4, 5000) *
                  np.cos(a_f := rng.uniform(-0.3, a_half + 0.25, 5000)),
                  rng.uniform(radius - 4, radius + 4, 5000) * np.sin(a_f),
                  np.zeros(5000)], axis=1),
        pillars(radius - 3, radius + 3, -0.2, a_half + 0.2, 12, 3000, 4.0),
    ])
    # Outdoor: only DISTANT structure — a building facade ring at r=32
    # (20-40 m from the path) and sparse far ground; no near-field returns.
    far = np.concatenate([
        ring(32.0, a_half - 0.2, a_end + 0.4, 9000, 0.0, 10.0),
        np.stack([rng.uniform(22, 40, 4000) *
                  np.cos(a_g := rng.uniform(a_half - 0.2, a_end + 0.4, 4000)),
                  rng.uniform(22, 40, 4000) * np.sin(a_g),
                  np.zeros(4000)], axis=1),
        pillars(24, 38, a_half - 0.2, a_end + 0.4, 16, 4000, 9.0),
    ])

    scans, gt_poses, stamps = [], [], []
    n_scans = int(duration * scan_hz)
    for si in range(n_scans):
        stamp = si / scan_hz
        T = circle_pose(stamp, radius, omega)
        gt_poses.append(T)
        stamps.append(stamp)
        # Indoors the corridor walls occlude everything past 8 m; outdoors
        # only the distant facade / far ground returns anything.
        max_range = 8.0 if stamp < t_half else 45.0
        cand = near if stamp < t_half else np.concatenate([near, far])
        rel = cand - T[:3, 3]
        dist = np.linalg.norm(rel, axis=1)
        vis = np.where(dist < max_range)[0]
        if len(vis) > n_scan_points:
            vis = rng.choice(vis, n_scan_points, replace=False)
        lm = cand[vis]
        Ti = np.linalg.inv(T)
        pts = (Ti[:3, :3] @ lm.T).T + Ti[:3, 3]
        pts += rng.normal(size=pts.shape) * 0.01
        scans.append(RawPoints(stamp=stamp, points=pts,
                               times=np.zeros(len(pts))))

    n_imu = int(duration * imu_hz) + 1
    imu = np.zeros((n_imu, 7))
    for i in range(n_imu):
        t = i / imu_hz
        acc, gyro = circle_imu(t, radius, omega)
        imu[i, 0] = t
        imu[i, 1:4] = acc
        imu[i, 4:7] = gyro
    return scans, imu, gt_poses


def _run(scans, imu, adaptive_per_keyframe):
    pp = CloudPreprocessor(CloudPreprocessorParams(
        random_downsample_target=1500, downsample_resolution=0.3))
    odom = OdometryEstimationIMU(OdometryEstimationIMUParams(
        voxel_resolution=0.25, voxel_resolution_max=1.0,
        voxel_resolution_dmin=4.0, voxel_resolution_dmax=12.0,
        voxel_capacity=16384, voxelmap_levels=2,
        max_num_keyframes=8, window_size=4,
        outer_iterations=3, inner_iterations=2,
        initialization_window_size=0.3))
    odom._adaptive_per_keyframe = adaptive_per_keyframe
    imu_idx = 0
    ests = []
    for raw in scans:
        while imu_idx < len(imu) and imu[imu_idx, 0] <= raw.stamp + 0.12:
            odom.insert_imu(imu[imu_idx, 0], imu[imu_idx, 1:4],
                            imu[imu_idx, 4:7])
            imu_idx += 1
        e = odom.insert_frame(pp.preprocess(raw))
        if e is not None:
            ests.append((raw.stamp, e))
    return ests, odom


@pytest.mark.slow
def test_indoor_outdoor_transition_adaptation_beats_fixed():
    """VERDICT r3 #9 done-criterion: on an indoor→outdoor transition, the
    per-keyframe adaptive model resolution must beat fixed-at-init (which
    locks the indoor-tuned 0.25 m scale and starves the far-field matcher
    of correspondences)."""
    scans, imu, gt_poses = _two_zone_sequence()
    ests_a, odom_a = _run(scans, imu, adaptive_per_keyframe=True)
    ests_f, _ = _run(scans, imu, adaptive_per_keyframe=False)

    def ate(ests):
        gt = [gt_poses[int(round(s * 10))] for s, _ in ests]
        return ate_rmse([e.T_world_lidar for _, e in ests], gt, align=True)

    ate_a, ate_f = ate(ests_a), ate(ests_f)
    # The adaptive model must have actually re-scaled: its rebuilt base
    # resolution is coarser than the indoor init value once outdoors.
    res_a = float(odom_a.keyframes.model_res_dev[0])
    assert res_a > 0.4, res_a
    # Headline: adaptation clearly beats fixed-at-init (measured ~1.8 m vs
    # ~7.1 m — the fixed 0.25 m scale starves the 20-40 m matcher), with
    # a generous margin for cross-platform numeric drift.
    assert ate_a < 0.6 * ate_f, (ate_a, ate_f)
    assert ate_a < 3.0, ate_a
