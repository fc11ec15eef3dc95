"""Synthetic LiDAR-IMU sequence generator for tests and benchmarks.

The reference repo ships no test data; its canonical validation is running a
real Ouster OS1-128 rosbag (reference docs/quickstart.md:6-10). For CI-able
numerical validation we instead simulate a spinning LiDAR + IMU moving through
an analytic scene (SURVEY.md §4 implication (2)): world landmarks on walls /
floor / pillars, scans taken along a smooth closed trajectory with motion skew
(each point sampled at the sensor pose of its capture time), IMU samples from
the analytic kinematics with optional bias and noise. Ground-truth poses come
with the data, so ATE is exact.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from glim_tpu.ops import lie_np
from glim_tpu.types import RawPoints

GRAVITY = np.array([0.0, 0.0, -9.81])


def make_scene(rng: np.random.Generator, extent: float = 30.0,
               n_points: int = 60000) -> np.ndarray:
    """World landmarks: 4 walls + floor + scattered pillars (N, 3)."""
    n_wall = n_points // 8
    pts = []
    for axis, sign in [(0, -1), (0, 1), (1, -1), (1, 1)]:
        w = np.zeros((n_wall, 3))
        w[:, axis] = sign * extent
        w[:, 1 - axis] = rng.uniform(-extent, extent, n_wall)
        w[:, 2] = rng.uniform(0.0, 6.0, n_wall)
        pts.append(w)
    floor = np.zeros((n_points // 4, 3))
    floor[:, 0] = rng.uniform(-extent, extent, len(floor))
    floor[:, 1] = rng.uniform(-extent, extent, len(floor))
    pts.append(floor)
    # Pillars: vertical cylinders at random xy.
    n_pil = n_points - 4 * n_wall - len(floor)
    centers = rng.uniform(-extent * 0.7, extent * 0.7, size=(12, 2))
    pp = np.zeros((n_pil, 3))
    ci = rng.integers(0, len(centers), n_pil)
    ang = rng.uniform(0, 2 * np.pi, n_pil)
    pp[:, 0] = centers[ci, 0] + 0.4 * np.cos(ang)
    pp[:, 1] = centers[ci, 1] + 0.4 * np.sin(ang)
    pp[:, 2] = rng.uniform(0, 5.0, n_pil)
    pts.append(pp)
    return np.concatenate(pts, axis=0)


def circle_pose(t: float, radius: float = 10.0, omega: float = 0.3,
                z_amp: float = 0.5, z_omega: float = 0.7) -> np.ndarray:
    """T_world_sensor on a circle with yaw tangent to the path and a gentle
    vertical bob. Sensor z-up, x-forward."""
    a = omega * t
    p = np.array([radius * np.cos(a), radius * np.sin(a),
                  1.5 + z_amp * np.sin(z_omega * t)])
    yaw = a + np.pi / 2.0
    R = lie_np.so3_exp(np.array([0.0, 0.0, yaw]))
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = p
    return T


def circle_imu(t: float, radius: float = 10.0, omega: float = 0.3,
               z_amp: float = 0.5, z_omega: float = 0.7):
    """Analytic body-frame IMU measurements for circle_pose."""
    a = omega * t
    # World-frame acceleration of the position curve.
    acc_w = np.array([-radius * omega * omega * np.cos(a),
                      -radius * omega * omega * np.sin(a),
                      -z_amp * z_omega * z_omega * np.sin(z_omega * t)])
    R = circle_pose(t, radius, omega, z_amp, z_omega)[:3, :3]
    acc_body = R.T @ (acc_w - GRAVITY)
    gyro_body = np.array([0.0, 0.0, omega])
    return acc_body, gyro_body


@dataclass
class SyntheticSequence:
    scans: List[RawPoints]
    imu: np.ndarray                     # (M, 7): [t, ax, ay, az, wx, wy, wz]
    gt_poses: List[np.ndarray]          # T_world_lidar at each scan stamp
    stamps: List[float]
    T_lidar_imu: np.ndarray = field(default_factory=lambda: np.eye(4))
    landmarks: Optional[np.ndarray] = None


def generate_sequence(duration: float = 10.0, scan_hz: float = 10.0,
                      imu_hz: float = 200.0, n_scan_points: int = 6000,
                      max_range: float = 40.0, noise: float = 0.01,
                      imu_noise: float = 0.0, imu_bias: Optional[np.ndarray] = None,
                      radius: float = 10.0, omega: float = 0.3,
                      seed: int = 0, skew: bool = True,
                      scene_points: int = 60000) -> SyntheticSequence:
    """Simulate a full LiDAR-IMU sequence on the circle trajectory."""
    rng = np.random.default_rng(seed)
    scene = make_scene(rng, n_points=scene_points)
    imu_bias = np.zeros(6) if imu_bias is None else imu_bias

    scan_period = 1.0 / scan_hz
    n_scans = int(duration * scan_hz)
    scans: List[RawPoints] = []
    gt_poses: List[np.ndarray] = []
    stamps: List[float] = []

    for si in range(n_scans):
        stamp = si * scan_period
        T_ws = circle_pose(stamp, radius, omega)
        gt_poses.append(T_ws)
        stamps.append(stamp)

        # Visible landmarks: within range of the sensor at scan start.
        rel = scene - T_ws[:3, 3]
        dist = np.linalg.norm(rel, axis=1)
        vis = np.where(dist < max_range)[0]
        if len(vis) > n_scan_points:
            vis = rng.choice(vis, n_scan_points, replace=False)
        lm = scene[vis]

        # Spinning-lidar time ordering: azimuth in the sensor frame at stamp.
        in_s0 = (np.linalg.inv(T_ws)[:3, :3] @ lm.T).T + np.linalg.inv(T_ws)[:3, 3]
        az = np.arctan2(in_s0[:, 1], in_s0[:, 0])
        order = np.argsort(az)
        lm = lm[order]
        times = (az[order] + np.pi) / (2 * np.pi) * scan_period

        pts = np.zeros((len(lm), 3))
        if skew:
            # Each point observed from the pose at its capture time.
            # Batch by small time groups for speed.
            n_groups = 32
            gidx = np.minimum((times / scan_period * n_groups).astype(int), n_groups - 1)
            for g in range(n_groups):
                sel = gidx == g
                if not sel.any():
                    continue
                tg = stamp + (g + 0.5) / n_groups * scan_period
                T_g = circle_pose(tg, radius, omega)
                Ti = np.linalg.inv(T_g)
                pts[sel] = (Ti[:3, :3] @ lm[sel].T).T + Ti[:3, 3]
        else:
            Ti = np.linalg.inv(T_ws)
            pts = (Ti[:3, :3] @ lm.T).T + Ti[:3, 3]

        pts += rng.normal(size=pts.shape) * noise
        scans.append(RawPoints(stamp=stamp, points=pts, times=times))

    n_imu = int(duration * imu_hz) + 1
    imu = np.zeros((n_imu, 7))
    for i in range(n_imu):
        t = i / imu_hz
        acc, gyro = circle_imu(t, radius, omega)
        imu[i, 0] = t
        imu[i, 1:4] = acc + imu_bias[:3] + rng.normal(size=3) * imu_noise
        imu[i, 4:7] = gyro + imu_bias[3:] + rng.normal(size=3) * imu_noise * 0.1
    return SyntheticSequence(scans=scans, imu=imu, gt_poses=gt_poses,
                             stamps=stamps, landmarks=scene)


def ate_rmse(est_poses: List[np.ndarray], gt_poses: List[np.ndarray],
             align: bool = True) -> float:
    """Absolute trajectory error (RMSE over translations), with optional
    SE(3) Umeyama alignment — the evo-style offline check implied by the
    reference docs (quickstart.md:119-127)."""
    est = np.array([T[:3, 3] for T in est_poses])
    gt = np.array([T[:3, 3] for T in gt_poses])
    assert est.shape == gt.shape
    if align and len(est) >= 3:
        mu_e = est.mean(axis=0)
        mu_g = gt.mean(axis=0)
        E = est - mu_e
        G = gt - mu_g
        U, _, Vt = np.linalg.svd(E.T @ G)
        S = np.diag([1.0, 1.0, np.sign(np.linalg.det(Vt.T @ U.T))])
        R = Vt.T @ S @ U.T
        est = (R @ E.T).T + mu_g
        gt = G + mu_g
    return float(np.sqrt(np.mean(np.sum((est - gt) ** 2, axis=1))))
