"""SO(3)/SE(3) manifold op tests: JAX device ops vs f64 numpy references."""

import numpy as np
import jax.numpy as jnp
import pytest

from glim_tpu.ops import lie, lie_np


def random_twists(rng, n=64, scale=1.0):
    xi = rng.normal(size=(n, 6)) * scale
    # Keep rotation angles below pi: log() returns the principal value, so
    # exp/log roundtrips only hold on |omega| < pi.
    wn = np.linalg.norm(xi[:, :3], axis=1, keepdims=True)
    xi[:, :3] *= np.minimum(1.0, 3.0 / np.maximum(wn, 1e-12))
    return xi


class TestNumpyLie:
    def test_exp_log_roundtrip(self, rng):
        for xi in random_twists(rng, 32):
            T = lie_np.se3_exp(xi)
            xi2 = lie_np.se3_log(T)
            np.testing.assert_allclose(xi, xi2, atol=1e-9)

    def test_exp_log_small(self):
        xi = np.array([1e-9, -1e-9, 1e-10, 1e-8, 0, -1e-9])
        T = lie_np.se3_exp(xi)
        np.testing.assert_allclose(lie_np.se3_log(T), xi, atol=1e-12)

    def test_near_pi_rotation(self, rng):
        for _ in range(16):
            axis = rng.normal(size=3)
            axis /= np.linalg.norm(axis)
            w = axis * (np.pi - 1e-6)
            R = lie_np.so3_exp(w)
            w2 = lie_np.so3_log(R)
            np.testing.assert_allclose(w, w2, atol=1e-5)

    def test_inverse(self, rng):
        T = lie_np.se3_exp(rng.normal(size=6))
        np.testing.assert_allclose(T @ lie_np.se3_inverse(T), np.eye(4), atol=1e-12)

    def test_quat_roundtrip(self, rng):
        for _ in range(16):
            R = lie_np.so3_exp(rng.normal(size=3))
            q = lie_np.rot_to_quat(R)
            np.testing.assert_allclose(lie_np.quat_to_rot(q), R, atol=1e-9)

    def test_interpolate_endpoints(self, rng):
        T0 = lie_np.se3_exp(rng.normal(size=6))
        T1 = lie_np.se3_exp(rng.normal(size=6))
        np.testing.assert_allclose(lie_np.se3_interpolate(T0, T1, 0.0), T0, atol=1e-10)
        np.testing.assert_allclose(lie_np.se3_interpolate(T0, T1, 1.0), T1, atol=1e-10)

    def test_adjoint_identity(self, rng):
        # Ad_T * xi == log(T * exp(xi) * T^-1)
        T = lie_np.se3_exp(rng.normal(size=6) * 0.5)
        xi = rng.normal(size=6) * 0.1
        lhs = lie_np.se3_adjoint(T) @ xi
        rhs = lie_np.se3_log(T @ lie_np.se3_exp(xi) @ lie_np.se3_inverse(T))
        np.testing.assert_allclose(lhs, rhs, atol=1e-8)


class TestJaxLie:
    def test_matches_numpy_exp(self, rng):
        xis = random_twists(rng, 64).astype(np.float32)
        Ts = np.asarray(lie.se3_exp(jnp.asarray(xis)))
        for xi, T in zip(xis, Ts):
            np.testing.assert_allclose(T, lie_np.se3_exp(xi), atol=1e-5)

    def test_matches_numpy_log(self, rng):
        xis = random_twists(rng, 64, scale=0.8)
        Ts = np.stack([lie_np.se3_exp(x) for x in xis]).astype(np.float32)
        logs = np.asarray(lie.se3_log(jnp.asarray(Ts)))
        for xi, l in zip(xis, logs):
            np.testing.assert_allclose(l, xi, atol=2e-4)

    def test_exp_log_roundtrip_batched(self, rng):
        xis = jnp.asarray(random_twists(rng, 128, scale=0.5).astype(np.float32))
        back = lie.se3_log(lie.se3_exp(xis))
        np.testing.assert_allclose(np.asarray(back), np.asarray(xis), atol=2e-4)

    def test_small_angle(self):
        xi = jnp.array([[1e-6, 0, 0, 1e-4, 0, 0]], dtype=jnp.float32)
        T = lie.se3_exp(xi)
        np.testing.assert_allclose(np.asarray(lie.se3_log(T))[0], np.asarray(xi)[0], atol=1e-6)

    def test_transform_points(self, rng):
        T = lie_np.se3_exp(rng.normal(size=6))
        pts = rng.normal(size=(100, 3))
        expected = (T[:3, :3] @ pts.T).T + T[:3, 3]
        got = np.asarray(lie.transform_points(jnp.asarray(T, jnp.float32), jnp.asarray(pts, jnp.float32)))
        np.testing.assert_allclose(got, expected, atol=1e-4)

    def test_quat_roundtrip_batched(self, rng):
        ws = rng.normal(size=(64, 3)).astype(np.float32)
        R = lie.so3_exp(jnp.asarray(ws))
        q = lie.rot_to_quat(R)
        R2 = lie.quat_to_rot(q)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)

    def test_slerp_endpoints(self, rng):
        q0 = np.asarray(lie.rot_to_quat(lie.so3_exp(jnp.asarray(rng.normal(size=(1, 3)), jnp.float32))))
        q1 = np.asarray(lie.rot_to_quat(lie.so3_exp(jnp.asarray(rng.normal(size=(1, 3)), jnp.float32))))
        s0 = np.asarray(lie.quat_slerp(jnp.asarray(q0), jnp.asarray(q1), jnp.asarray([0.0])))
        s1 = np.asarray(lie.quat_slerp(jnp.asarray(q0), jnp.asarray(q1), jnp.asarray([1.0])))
        assert min(np.abs(s0 - q0).max(), np.abs(s0 + q0).max()) < 1e-5
        assert min(np.abs(s1 - q1).max(), np.abs(s1 + q1).max()) < 1e-5

    def test_inverse_batched(self, rng):
        Ts = lie.se3_exp(jnp.asarray(random_twists(rng, 16).astype(np.float32)))
        eye = np.asarray(Ts @ lie.se3_inv(Ts))
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(4), eye.shape), atol=1e-5)
