"""Deskewing tests: points captured from a moving sensor land back where a
static scan would have seen them."""

import jax.numpy as jnp
import numpy as np

from glim_tpu.ops import deskew, lie_np
from glim_tpu.ops.lie import rot_to_quat


def make_skewed_scan(rng, n=200, cap=256, duration=0.1, twist=None):
    """World landmarks observed from a sensor moving with constant twist.

    Returns (skewed points in capture-time lidar frame, times, mask,
    landmark positions in the scan-start lidar frame)."""
    twist = np.zeros(6) if twist is None else np.asarray(twist, float)
    landmarks = rng.uniform(-10, 10, size=(n, 3))
    times = np.sort(rng.uniform(0, duration, size=n))
    pts = np.zeros((cap, 3), np.float32)
    tms = np.zeros(cap, np.float32)
    ref = np.zeros((cap, 3), np.float32)
    for i, (lm, t) in enumerate(zip(landmarks, times)):
        T_w_s = lie_np.se3_exp(t * twist)     # sensor pose at capture time
        p_s = lie_np.se3_inverse(T_w_s)[:3, :3] @ lm + lie_np.se3_inverse(T_w_s)[:3, 3]
        pts[i] = p_s
        tms[i] = t
        ref[i] = lm                            # scan-start frame == world here
    mask = np.zeros(cap, bool)
    mask[:n] = True
    return pts, tms, mask, ref


class TestDeskewTwist:
    def test_recovers_static_scan(self, rng):
        twist = np.array([0.1, -0.2, 0.5, 2.0, 1.0, -0.5])  # [omega, v]
        pts, tms, mask, ref = make_skewed_scan(rng, twist=twist)
        out = deskew.deskew_twist(jnp.asarray(pts), jnp.asarray(tms),
                                  jnp.asarray(mask), jnp.asarray(twist, jnp.float32))
        np.testing.assert_allclose(np.asarray(out)[mask], ref[mask], atol=1e-3)

    def test_zero_twist_noop(self, rng):
        pts, tms, mask, ref = make_skewed_scan(rng, twist=np.zeros(6))
        out = deskew.deskew_twist(jnp.asarray(pts), jnp.asarray(tms),
                                  jnp.asarray(mask), jnp.zeros(6))
        np.testing.assert_allclose(np.asarray(out)[mask], np.asarray(pts)[mask], atol=1e-6)


class TestDeskewImu:
    def test_recovers_static_scan(self, rng):
        # Sensor (imu==lidar frame) moving with constant twist; pose table from
        # dense sampling of the same motion.
        twist = np.array([0.0, 0.0, 0.8, 1.5, 0.0, 0.2])
        pts, tms, mask, ref = make_skewed_scan(rng, twist=twist)
        K = 32
        stamps = np.linspace(-0.01, 0.12, K)
        Rs = np.zeros((K, 3, 3), np.float32)
        ps = np.zeros((K, 3), np.float32)
        for k, t in enumerate(stamps):
            T = lie_np.se3_exp(t * twist)
            Rs[k] = T[:3, :3]
            ps[k] = T[:3, 3]
        quats = rot_to_quat(jnp.asarray(Rs))
        out = deskew.deskew_imu(jnp.asarray(pts), jnp.asarray(tms), jnp.asarray(mask),
                                jnp.asarray(stamps, jnp.float32), quats,
                                jnp.asarray(ps), jnp.eye(4))
        # Reference frame is the pose at the first point's time (~0), so the
        # output should match the landmarks expressed at scan start.
        t0 = tms[mask].min()
        T0 = lie_np.se3_exp(t0 * twist)
        T0_inv = lie_np.se3_inverse(T0)
        ref0 = (T0_inv[:3, :3] @ ref[mask].T).T + T0_inv[:3, 3]
        np.testing.assert_allclose(np.asarray(out)[mask], ref0, atol=5e-3)

    def test_extrinsics(self, rng):
        # Nontrivial T_lidar_imu; static sensor -> deskew must be a no-op.
        T_lidar_imu = lie_np.se3_exp(np.array([0.1, 0.2, -0.1, 0.5, -0.3, 0.2]))
        pts, tms, mask, _ = make_skewed_scan(rng, twist=np.zeros(6))
        K = 8
        stamps = np.linspace(-0.01, 0.12, K).astype(np.float32)
        quats = np.tile(np.array([0, 0, 0, 1], np.float32), (K, 1))
        trans = np.zeros((K, 3), np.float32)
        out = deskew.deskew_imu(jnp.asarray(pts), jnp.asarray(tms), jnp.asarray(mask),
                                jnp.asarray(stamps), jnp.asarray(quats),
                                jnp.asarray(trans), jnp.asarray(T_lidar_imu, jnp.float32))
        np.testing.assert_allclose(np.asarray(out)[mask], np.asarray(pts)[mask], atol=1e-4)
