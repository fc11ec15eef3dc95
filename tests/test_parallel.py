"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glim_tpu.ops import gicp
from glim_tpu.ops import voxelmap as vmx
from glim_tpu.parallel import (make_mesh, sharded_odometry_step,
                               sharded_vgicp_linearize)
from glim_tpu.ops import lie_np


def scene(rng, n=960, cap=1024):
    pts = np.zeros((cap, 3), np.float32)
    pts[:n] = rng.uniform(-8, 8, size=(n, 3)).astype(np.float32)
    pts[:n, 2] = np.abs(pts[:n, 2]) * 0.3
    mask = np.zeros(cap, bool)
    mask[:n] = True
    covs = np.broadcast_to(np.eye(3, dtype=np.float32) * 0.01, (cap, 3, 3)).copy()
    return jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(covs)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


class TestShardedLinearize:
    def test_matches_single_device(self, mesh8, rng):
        pts, mask, covs = scene(rng)
        vm = vmx.empty_gaussian_voxelmap(2048, 0.7)
        vm = vmx.voxelmap_insert(vm, pts, mask, covs, jnp.int32(0))
        T = jnp.asarray(lie_np.se3_exp(np.array([0.01, 0.02, -0.01, 0.1, 0.05, 0.0])), jnp.float32)

        ref = gicp.vgicp_linearize(jnp.eye(4), T, pts, covs, mask, vm)
        shd = sharded_vgicp_linearize(mesh8, jnp.eye(4), T, pts, covs, mask, vm)

        np.testing.assert_allclose(np.asarray(shd.H_ss), np.asarray(ref.H_ss), rtol=1e-4, atol=1e-2)
        np.testing.assert_allclose(np.asarray(shd.b_s), np.asarray(ref.b_s), rtol=1e-4, atol=1e-2)
        assert int(shd.num_inliers) == int(ref.num_inliers)

    def test_sharded_solve_converges(self, mesh8, rng):
        pts, mask, covs = scene(rng)
        vm = vmx.empty_gaussian_voxelmap(2048, 0.7)
        vm = vmx.voxelmap_insert(vm, pts, mask, covs, jnp.int32(0))
        T_true = lie_np.se3_exp(np.array([0.02, -0.01, 0.03, 0.2, -0.1, 0.05]))
        Ti = np.linalg.inv(T_true).astype(np.float32)
        src = jnp.asarray(np.asarray(pts) @ Ti[:3, :3].T + Ti[:3, 3])
        T_est, errs = sharded_odometry_step(mesh8, jnp.eye(4), src, covs, mask, vm, iters=10)
        err = lie_np.se3_log(np.linalg.inv(T_true) @ np.asarray(T_est, np.float64))
        assert np.linalg.norm(err[3:]) < 0.1, err


class TestShardedFactorFanout:
    def test_matches_loop(self, mesh8, rng):
        from glim_tpu.parallel.sharded import sharded_factor_linearize
        import jax.tree_util as jtu

        F, C = 8, 512
        vms = []
        ptss, covss, maskss, Tts, Tss = [], [], [], [], []
        refs = []
        for f in range(F):
            pts, mask, covs = scene(rng, 480, C)
            vm = vmx.empty_gaussian_voxelmap(1024, 0.7)
            vm = vmx.voxelmap_insert(vm, pts, mask, covs, jnp.int32(0))
            T_s = jnp.asarray(lie_np.se3_exp(rng.normal(size=6) * 0.02), jnp.float32)
            vms.append(vm)
            ptss.append(pts)
            covss.append(covs)
            maskss.append(mask)
            Tts.append(jnp.eye(4))
            Tss.append(T_s)
            refs.append(gicp.vgicp_linearize(jnp.eye(4), T_s, pts, covs, mask, vm))

        vm_stack = jtu.tree_map(lambda *xs: jnp.stack(xs), *vms)
        out = sharded_factor_linearize(
            mesh8, jnp.stack(Tts), jnp.stack(Tss), jnp.stack(ptss),
            jnp.stack(covss), jnp.stack(maskss), vm_stack)
        for f in range(F):
            np.testing.assert_allclose(np.asarray(out.H_ss[f]),
                                       np.asarray(refs[f].H_ss), rtol=1e-4, atol=1e-2)
            np.testing.assert_allclose(np.asarray(out.b_s[f]),
                                       np.asarray(refs[f].b_s), rtol=1e-4, atol=1e-2)


@pytest.mark.slow
def test_backend_parity_at_production_scale():
    """The factor axis sharded over 8 devices must produce the SAME poses
    as single-device at production scale (64 submaps / 300+ factors on a
    drifting ring built through the real GlobalMapping insert path) —
    shard-boundary bugs (padding rows crossing shard edges, psum of masked
    blocks) cannot hide at this scale (VERDICT r4 item 4)."""
    from glim_tpu.tools.multichip_check import backend_parity_check
    fmesh = make_mesh(8, axis="factors")
    stats = backend_parity_check(fmesh, n_submaps=64)
    assert stats["factors"] >= 300
    assert stats["max_pose_delta"] < 5e-4
