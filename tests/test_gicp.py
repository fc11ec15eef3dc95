"""Registration engine tests: GICP/VGICP linearization + LM convergence on
synthetic scenes with known ground-truth transforms."""

import jax
import jax.numpy as jnp
import numpy as np

from glim_tpu.ops import gicp, lie, lie_np, solver
from glim_tpu.ops import voxelmap as vmx
from glim_tpu.ops.gicp import inv_sym3x3


def make_scene(rng, n=800, cap=1024):
    """Structured scene (3 walls) so the registration is well-conditioned."""
    pts = np.zeros((cap, 3), np.float32)
    n3 = n // 3
    pts[:n3, 0] = rng.uniform(-5, 5, n3)
    pts[:n3, 1] = rng.uniform(-5, 5, n3)
    pts[n3:2 * n3, 0] = rng.uniform(-5, 5, n3)
    pts[n3:2 * n3, 2] = rng.uniform(0, 4, n3)
    pts[n3:2 * n3, 1] = 5.0
    pts[2 * n3:n, 1] = rng.uniform(-5, 5, n - 2 * n3)
    pts[2 * n3:n, 2] = rng.uniform(0, 4, n - 2 * n3)
    pts[2 * n3:n, 0] = 5.0
    pts[:n] += rng.normal(size=(n, 3)) * 0.005
    mask = np.zeros(cap, bool)
    mask[:n] = True
    covs = np.broadcast_to(np.eye(3, dtype=np.float32) * 0.01, (cap, 3, 3)).copy()
    return jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(covs)


class TestInvSym3x3:
    def test_vs_numpy(self, rng):
        A = rng.normal(size=(64, 3, 3))
        A = (A @ A.transpose(0, 2, 1) + np.eye(3) * 0.1).astype(np.float32)
        inv = np.asarray(inv_sym3x3(jnp.asarray(A)))
        ref = np.linalg.inv(A.astype(np.float64))
        np.testing.assert_allclose(inv, ref, rtol=1e-3, atol=1e-4)


def lm_register_gicp(src, covs, mask, tgt, tgt_covs, tgt_mask, T_init, max_dist=2.0):
    def linearize(T):
        sys = gicp.gicp_linearize(jnp.eye(4), T, src, covs, mask,
                                  tgt, tgt_covs, tgt_mask, jnp.float32(max_dist))
        return sys.H_ss, sys.b_s, sys.error

    def retract(T, delta):
        return T @ lie.se3_exp(delta)

    res = solver.lm_optimize(linearize, retract, T_init,
                             solver.TerminationCriteria(max_iterations=20))
    return res


class TestGICPRegistration:
    def test_identity_at_alignment(self, rng):
        pts, mask, covs = make_scene(rng)
        sys = gicp.gicp_linearize(jnp.eye(4), jnp.eye(4), pts, covs, mask,
                                  pts, covs, mask, jnp.float32(1.0))
        assert float(sys.error) < 1.0
        # f32 distance expansion can swap an exact self-match for a ~mm-away
        # neighbor, so b is not exactly zero — but the implied GN update must
        # be negligible.
        delta = solver.solve_damped(sys.H_ss, sys.b_s, jnp.float32(0.0))
        assert float(jnp.linalg.norm(delta)) < 1e-4
        assert int(sys.num_inliers) == int(np.asarray(mask).sum())

    def test_recovers_perturbation(self, rng):
        pts, mask, covs = make_scene(rng)
        xi_true = np.array([0.05, -0.03, 0.08, 0.3, -0.2, 0.15])
        T_true = lie_np.se3_exp(xi_true).astype(np.float32)
        src = jnp.asarray((np.asarray(pts) @ np.linalg.inv(T_true)[:3, :3].T
                           + np.linalg.inv(T_true)[:3, 3]).astype(np.float32))
        res = lm_register_gicp(src, covs, mask, pts, covs, mask, jnp.eye(4))
        T_est = np.asarray(res.x, np.float64)
        err = lie_np.se3_log(np.linalg.inv(T_true.astype(np.float64)) @ T_est)
        assert np.linalg.norm(err[:3]) < 0.01, err
        assert np.linalg.norm(err[3:]) < 0.02, err

    def test_callback_fires(self, rng):
        pts, mask, covs = make_scene(rng, 300, 512)
        calls = []
        def linearize(T):
            s = gicp.gicp_linearize(jnp.eye(4), T, pts, covs, mask,
                                    pts, covs, mask, jnp.float32(1.0))
            return s.H_ss, s.b_s, s.error
        solver.lm_optimize(linearize, lambda T, d: T @ lie.se3_exp(d), jnp.eye(4),
                           solver.TerminationCriteria(max_iterations=3),
                           callback=calls.append)
        assert len(calls) >= 1
        assert isinstance(calls[0], solver.LMStatus)


class TestVGICPRegistration:
    def test_recovers_perturbation(self, rng):
        pts, mask, covs = make_scene(rng)
        vm = vmx.empty_gaussian_voxelmap(2048, 0.5)
        vm = vmx.voxelmap_insert(vm, pts, mask, covs, jnp.int32(0))

        xi_true = np.array([0.03, 0.05, -0.04, 0.2, 0.1, -0.15])
        T_true = lie_np.se3_exp(xi_true).astype(np.float32)
        Ti = np.linalg.inv(T_true.astype(np.float64)).astype(np.float32)
        src = jnp.asarray(np.asarray(pts) @ Ti[:3, :3].T + Ti[:3, 3])

        def linearize(T):
            s = gicp.vgicp_linearize(jnp.eye(4), T, src, covs, mask, vm)
            return s.H_ss, s.b_s, s.error

        res = solver.lm_optimize(linearize, lambda T, d: T @ lie.se3_exp(d), jnp.eye(4),
                                 solver.TerminationCriteria(max_iterations=20))
        T_est = np.asarray(res.x, np.float64)
        err = lie_np.se3_log(np.linalg.inv(T_true.astype(np.float64)) @ T_est)
        # Voxel means quantize the scene; tolerance is looser than GICP.
        assert np.linalg.norm(err[:3]) < 0.03, err
        assert np.linalg.norm(err[3:]) < 0.08, err

    def test_gn_scan_variant(self, rng):
        pts, mask, covs = make_scene(rng)
        vm = vmx.empty_gaussian_voxelmap(2048, 0.5)
        vm = vmx.voxelmap_insert(vm, pts, mask, covs, jnp.int32(0))
        T_true = lie_np.se3_exp(np.array([0.02, 0.0, 0.03, 0.15, -0.1, 0.05]))
        Ti = np.linalg.inv(T_true).astype(np.float32)
        src = jnp.asarray(np.asarray(pts) @ Ti[:3, :3].T + Ti[:3, 3])

        def linearize(T):
            s = gicp.vgicp_linearize(jnp.eye(4), T, src, covs, mask, vm)
            return s.H_ss, s.b_s, s.error

        T_est, errs = solver.gn_optimize_scan(linearize, lambda T, d: T @ lie.se3_exp(d),
                                              jnp.eye(4), num_iters=10)
        err = lie_np.se3_log(np.linalg.inv(T_true) @ np.asarray(T_est, np.float64))
        assert np.linalg.norm(err[3:]) < 0.1, err
        assert float(errs[-1]) < float(errs[0])


class TestInlierFraction:
    def test_aligned_vs_shifted(self, rng):
        pts, mask, covs = make_scene(rng)
        f_same = float(gicp.inlier_fraction(jnp.eye(4), jnp.eye(4), pts, mask,
                                            pts, mask, jnp.float32(0.5)))
        assert f_same > 0.99
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = 50.0
        f_far = float(gicp.inlier_fraction(jnp.eye(4), jnp.asarray(T), pts, mask,
                                           pts, mask, jnp.float32(0.5)))
        assert f_far < 0.2


class TestSolverUtils:
    def test_schur_marginalize_consistency(self, rng):
        # Marginalizing then solving == solving the full system's keep-block.
        D, K = 18, 12
        J = rng.normal(size=(40, D))
        H = (J.T @ J + np.eye(D) * 0.1).astype(np.float32)
        b = rng.normal(size=D).astype(np.float32)
        Hr, br = solver.schur_marginalize(jnp.asarray(H), jnp.asarray(b), K)
        full = np.linalg.solve(H.astype(np.float64), -b.astype(np.float64))[:K]
        red = np.linalg.solve(np.asarray(Hr, np.float64), -np.asarray(br, np.float64))
        np.testing.assert_allclose(red, full, atol=1e-3)


class TestICPFactor:
    def test_recovers_perturbation(self, rng):
        pts, mask, covs = make_scene(rng)
        xi_true = np.array([0.0, 0.0, 0.05, 0.2, -0.1, 0.1])
        T_true = lie_np.se3_exp(xi_true).astype(np.float32)
        Ti = np.linalg.inv(T_true.astype(np.float64)).astype(np.float32)
        src = jnp.asarray(np.asarray(pts) @ Ti[:3, :3].T + Ti[:3, 3])

        def linearize(T):
            s = gicp.icp_linearize(jnp.eye(4), T, src, mask, pts, mask,
                                   jnp.float32(1.0))
            return s.H_ss, s.b_s, s.error

        res = solver.lm_optimize(linearize, lambda T, d: T @ lie.se3_exp(d),
                                 jnp.eye(4),
                                 solver.TerminationCriteria(max_iterations=15))
        err = lie_np.se3_log(np.linalg.inv(T_true.astype(np.float64))
                             @ np.asarray(res.x, np.float64))
        assert np.linalg.norm(err[3:]) < 0.05, err
