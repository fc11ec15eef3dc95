"""IMU preintegration tests: analytic cases, dead-reckoning consistency,
bias-Jacobian finite differences."""

import jax.numpy as jnp
import numpy as np

from glim_tpu.ops import imu as imu_ops
from glim_tpu.ops import lie_np

GRAVITY = np.array([0.0, 0.0, -9.81])


def simulate(rng, n=100, hz=200.0, accel_world=None, omega=None, bias=None):
    """Simulate IMU samples along an analytic trajectory (f64 ground truth).

    Returns measured (acc, gyro, dts) and ground-truth states at each step.
    """
    dt = 1.0 / hz
    accel_world = np.zeros(3) if accel_world is None else accel_world
    omega = np.zeros(3) if omega is None else omega
    bias = np.zeros(6) if bias is None else bias

    R = np.eye(3)
    p = np.zeros(3)
    v = np.zeros(3)
    accs, gyros, dts = [], [], []
    Rs, ps, vs = [], [], []
    for _ in range(n):
        # body-frame measurements
        a_body = R.T @ (accel_world - GRAVITY)
        accs.append(a_body + bias[:3])
        gyros.append(omega + bias[3:])
        dts.append(dt)
        # integrate truth (same discretization as the estimator)
        a_w = accel_world
        p = p + v * dt + 0.5 * a_w * dt * dt
        v = v + a_w * dt
        R = R @ lie_np.so3_exp(omega * dt)
        Rs.append(R.copy())
        ps.append(p.copy())
        vs.append(v.copy())
    return (np.array(accs), np.array(gyros), np.array(dts),
            np.array(Rs), np.array(ps), np.array(vs))


def run_preint(accs, gyros, dts, bias=np.zeros(6)):
    n = len(accs)
    mask = np.ones(n, bool)
    return imu_ops.preintegrate(
        jnp.asarray(accs, jnp.float32), jnp.asarray(gyros, jnp.float32),
        jnp.asarray(dts, jnp.float32), jnp.asarray(mask),
        jnp.asarray(bias, jnp.float32),
        jnp.float32(0.01), jnp.float32(0.001), jnp.float32(1e-4))


class TestPreintegration:
    def test_static_gravity_only(self):
        accs, gyros, dts, Rs, ps, vs = simulate(None, n=200)
        pre = run_preint(accs, gyros, dts)
        R_j, p_j, v_j = imu_ops.predict(jnp.eye(3), jnp.zeros(3), jnp.zeros(3),
                                        pre, jnp.zeros(6), jnp.asarray(GRAVITY, jnp.float32))
        np.testing.assert_allclose(np.asarray(R_j), np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.asarray(p_j), 0.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(v_j), 0.0, atol=1e-4)

    def test_constant_accel(self):
        a_w = np.array([1.0, 0.5, 0.0])
        accs, gyros, dts, Rs, ps, vs = simulate(None, n=200, accel_world=a_w)
        pre = run_preint(accs, gyros, dts)
        R_j, p_j, v_j = imu_ops.predict(jnp.eye(3), jnp.zeros(3), jnp.zeros(3),
                                        pre, jnp.zeros(6), jnp.asarray(GRAVITY, jnp.float32))
        np.testing.assert_allclose(np.asarray(p_j), ps[-1], atol=1e-3)
        np.testing.assert_allclose(np.asarray(v_j), vs[-1], atol=1e-3)

    def test_rotation_with_accel(self):
        omega = np.array([0.0, 0.0, 1.0])
        a_w = np.array([2.0, 0.0, 0.0])
        accs, gyros, dts, Rs, ps, vs = simulate(None, n=400, accel_world=a_w, omega=omega)
        pre = run_preint(accs, gyros, dts)
        R_j, p_j, v_j = imu_ops.predict(jnp.eye(3), jnp.zeros(3), jnp.zeros(3),
                                        pre, jnp.zeros(6), jnp.asarray(GRAVITY, jnp.float32))
        np.testing.assert_allclose(np.asarray(R_j), Rs[-1], atol=1e-4)
        np.testing.assert_allclose(np.asarray(p_j), ps[-1], atol=2e-3)

    def test_known_bias_removed(self):
        bias = np.array([0.1, -0.05, 0.2, 0.01, -0.02, 0.005])
        accs, gyros, dts, Rs, ps, vs = simulate(None, n=200, bias=bias)
        pre = run_preint(accs, gyros, dts, bias=bias)
        R_j, p_j, v_j = imu_ops.predict(jnp.eye(3), jnp.zeros(3), jnp.zeros(3),
                                        pre, jnp.asarray(bias, jnp.float32),
                                        jnp.asarray(GRAVITY, jnp.float32))
        np.testing.assert_allclose(np.asarray(p_j), ps[-1], atol=1e-3)

    def test_bias_jacobians_finite_diff(self):
        omega = np.array([0.1, 0.2, -0.1])
        a_w = np.array([0.5, -0.3, 0.2])
        accs, gyros, dts, *_ = simulate(None, n=100, accel_world=a_w, omega=omega)
        pre0 = run_preint(accs, gyros, dts, bias=np.zeros(6))

        eps = 1e-3
        for k in range(6):
            db = np.zeros(6)
            db[k] = eps
            pre_k = run_preint(accs, gyros, dts, bias=db)
            # First-order correction from pre0 should match re-integration.
            dR_c, dv_c, dp_c = imu_ops.bias_corrected(pre0, jnp.asarray(db, jnp.float32))
            np.testing.assert_allclose(np.asarray(dv_c), np.asarray(pre_k.dv),
                                       atol=5e-4, err_msg=f"dv bias {k}")
            np.testing.assert_allclose(np.asarray(dp_c), np.asarray(pre_k.dp),
                                       atol=5e-4, err_msg=f"dp bias {k}")
            err_R = lie_np.so3_log(np.asarray(dR_c, np.float64).T @ np.asarray(pre_k.dR, np.float64))
            np.testing.assert_allclose(err_R, 0.0, atol=5e-4, err_msg=f"dR bias {k}")

    def test_masked_padding_ignored(self):
        accs, gyros, dts, *_ = simulate(None, n=50, accel_world=np.array([1.0, 0, 0]))
        # Pad with garbage marked invalid.
        pad = 30
        accs_p = np.vstack([accs, np.full((pad, 3), 1e3)])
        gyros_p = np.vstack([gyros, np.full((pad, 3), 1e3)])
        dts_p = np.concatenate([dts, np.full(pad, 0.1)])
        mask = np.concatenate([np.ones(50, bool), np.zeros(pad, bool)])
        pre_pad = imu_ops.preintegrate(
            jnp.asarray(accs_p, jnp.float32), jnp.asarray(gyros_p, jnp.float32),
            jnp.asarray(dts_p, jnp.float32), jnp.asarray(mask),
            jnp.zeros(6), jnp.float32(0.01), jnp.float32(0.001), jnp.float32(1e-4))
        pre_ref = run_preint(accs, gyros, dts)
        np.testing.assert_allclose(np.asarray(pre_pad.dp), np.asarray(pre_ref.dp), atol=1e-6)
        np.testing.assert_allclose(np.asarray(pre_pad.dt), np.asarray(pre_ref.dt), atol=1e-6)

    def test_covariance_psd_and_grows(self):
        accs, gyros, dts, *_ = simulate(None, n=100, omega=np.array([0.1, 0, 0.2]))
        pre50 = run_preint(accs[:50], gyros[:50], dts[:50])
        pre100 = run_preint(accs, gyros, dts)
        c50 = np.asarray(pre50.cov, np.float64)
        c100 = np.asarray(pre100.cov, np.float64)
        assert (np.linalg.eigvalsh((c50 + c50.T) / 2) > -1e-10).all()
        assert np.trace(c100) > np.trace(c50)

    def test_residual_zero_at_truth(self):
        omega = np.array([0.0, 0.1, 0.3])
        a_w = np.array([1.0, 0.0, 0.5])
        accs, gyros, dts, Rs, ps, vs = simulate(None, n=200, accel_world=a_w, omega=omega)
        pre = run_preint(accs, gyros, dts)
        r = imu_ops.imu_residual(
            jnp.eye(3), jnp.zeros(3), jnp.zeros(3),
            jnp.asarray(Rs[-1], jnp.float32), jnp.asarray(ps[-1], jnp.float32),
            jnp.asarray(vs[-1], jnp.float32),
            jnp.zeros(6), pre, jnp.asarray(GRAVITY, jnp.float32))
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=2e-3)

    def test_integrate_poses_matches_truth(self):
        omega = np.array([0.2, -0.1, 0.5])
        a_w = np.array([1.0, 2.0, 0.3])
        accs, gyros, dts, Rs, ps, vs = simulate(None, n=150, accel_world=a_w, omega=omega)
        Rj, pj, vj = imu_ops.integrate_poses(
            jnp.eye(3), jnp.zeros(3), jnp.zeros(3), jnp.zeros(6),
            jnp.asarray(GRAVITY, jnp.float32),
            jnp.asarray(accs, jnp.float32), jnp.asarray(gyros, jnp.float32),
            jnp.asarray(dts, jnp.float32), jnp.ones(150, dtype=bool))
        np.testing.assert_allclose(np.asarray(pj)[-1], ps[-1], atol=2e-3)
        np.testing.assert_allclose(np.asarray(Rj)[-1], Rs[-1], atol=1e-4)


class TestAssociativeAgreement:
    """The log-depth associative forms must match the sequential scans."""

    def test_preintegrate_matches_sequential(self):
        rng = np.random.default_rng(3)
        n = 100
        acc = rng.normal(0, 2.0, (n, 3)).astype(np.float32) + [0, 0, 9.8]
        gyro = rng.normal(0, 0.8, (n, 3)).astype(np.float32)
        dts = np.full(n, 0.005, np.float32)
        mask = np.ones(n, bool)
        mask[70:] = False          # padded tail must not contribute
        bias = np.array([0.05, -0.02, 0.01, 0.004, -0.002, 0.001], np.float32)
        args = (jnp.asarray(acc), jnp.asarray(gyro), jnp.asarray(dts),
                jnp.asarray(mask), jnp.asarray(bias),
                jnp.float32(0.05), jnp.float32(0.02), jnp.float32(1e-3))
        a = imu_ops.preintegrate(*args)
        b = imu_ops.preintegrate_sequential(*args)
        for f in ("dR", "dv", "dp", "dt", "H_Rg", "H_va", "H_vg",
                  "H_pa", "H_pg"):
            np.testing.assert_allclose(np.asarray(getattr(a, f)),
                                       np.asarray(getattr(b, f)),
                                       atol=2e-4, err_msg=f)
        np.testing.assert_allclose(np.asarray(a.cov), np.asarray(b.cov),
                                   atol=2e-4 * max(1.0, float(np.abs(b.cov).max())))

    def test_integrate_poses_matches_euler(self):
        rng = np.random.default_rng(5)
        n = 64
        acc = rng.normal(0, 1.5, (n, 3)).astype(np.float32) + [0, 0, 9.8]
        gyro = rng.normal(0, 0.5, (n, 3)).astype(np.float32)
        dts = np.full(n, 0.01, np.float32)
        mask = np.ones(n, bool)
        mask[50:] = False
        bias = np.zeros(6, np.float32)
        g = np.array([0, 0, -9.8], np.float32)
        R0 = lie_np.so3_exp(np.array([0.1, -0.2, 0.3]))
        p0 = np.array([1.0, 2.0, 3.0])
        v0 = np.array([0.5, -0.5, 0.1])
        Rs, ps, vs = imu_ops.integrate_poses(
            jnp.asarray(R0, jnp.float32), jnp.asarray(p0, jnp.float32),
            jnp.asarray(v0, jnp.float32), jnp.asarray(bias),
            jnp.asarray(g), jnp.asarray(acc), jnp.asarray(gyro),
            jnp.asarray(dts), jnp.asarray(mask))
        # sequential numpy euler reference
        R, p, v = R0.copy(), p0.copy(), v0.copy()
        for k in range(n):
            dt = dts[k] if mask[k] else 0.0
            a_w = R @ acc[k] + g
            p = p + v * dt + 0.5 * a_w * dt * dt
            v = v + a_w * dt
            R = R @ lie_np.so3_exp(gyro[k] * dt)
            np.testing.assert_allclose(np.asarray(Rs[k]), R, atol=1e-4)
            np.testing.assert_allclose(np.asarray(ps[k]), p, atol=1e-4)
            np.testing.assert_allclose(np.asarray(vs[k]), v, atol=1e-4)
