"""GaussianVoxelMap / PointVoxelMap tests."""

import jax.numpy as jnp
import numpy as np

from glim_tpu.ops import voxelmap as vmx


def padded(rng, n, cap, scale=10.0):
    pts = np.zeros((cap, 3), np.float32)
    pts[:n] = rng.normal(size=(n, 3)).astype(np.float32) * scale
    mask = np.zeros(cap, bool)
    mask[:n] = True
    covs = np.broadcast_to(np.eye(3, dtype=np.float32) * 0.01, (cap, 3, 3)).copy()
    return jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(covs)


class TestGaussianVoxelMap:
    def test_insert_and_stats(self, rng):
        pts, mask, covs = padded(rng, 500, 512)
        vm = vmx.empty_gaussian_voxelmap(1024, 1.0)
        vm = vmx.voxelmap_insert(vm, pts, mask, covs, jnp.int32(0))

        pn = np.asarray(pts)[np.asarray(mask)]
        keys = np.floor(pn / 1.0).astype(np.int64)
        uniq = np.unique(keys, axis=0)
        assert int(vm.num_voxels()) == len(uniq)

        # Check one voxel's mean against numpy.
        k0 = uniq[0]
        sel = (keys == k0).all(axis=1)
        ref_mean = pn[sel].mean(axis=0)
        idx = vmx.voxelmap_lookup(vm, jnp.asarray(ref_mean[None].astype(np.float32)))
        i = int(np.asarray(idx)[0])
        assert i >= 0
        np.testing.assert_allclose(np.asarray(vm.mean)[i], ref_mean, atol=1e-4)
        np.testing.assert_allclose(np.asarray(vm.count)[i], sel.sum())
        np.testing.assert_allclose(np.asarray(vm.cov)[i], np.eye(3) * 0.01, atol=1e-5)

    def test_incremental_merge(self, rng):
        # Inserting the same points twice doubles counts, keeps means.
        pts, mask, covs = padded(rng, 200, 256)
        vm = vmx.empty_gaussian_voxelmap(512, 1.0)
        vm1 = vmx.voxelmap_insert(vm, pts, mask, covs, jnp.int32(0))
        vm2 = vmx.voxelmap_insert(vm1, pts, mask, covs, jnp.int32(1))
        assert int(vm2.num_voxels()) == int(vm1.num_voxels())
        v1 = np.asarray(vm1.valid)
        np.testing.assert_allclose(np.asarray(vm2.count)[np.asarray(vm2.valid)].sum(),
                                   2 * np.asarray(vm1.count)[v1].sum())

    def test_lookup_miss(self, rng):
        pts, mask, covs = padded(rng, 100, 128, scale=1.0)
        vm = vmx.empty_gaussian_voxelmap(256, 0.5)
        vm = vmx.voxelmap_insert(vm, pts, mask, covs, jnp.int32(0))
        far = jnp.asarray(np.array([[1000.0, 1000.0, 1000.0]], np.float32))
        assert int(np.asarray(vmx.voxelmap_lookup(vm, far))[0]) == -1

    def test_lru_eviction(self, rng):
        # Capacity 64 voxels; insert 3 batches in distinct regions; oldest dies.
        vm = vmx.empty_gaussian_voxelmap(64, 1.0)
        regions = []
        for s, offset in enumerate([0.0, 100.0, 200.0]):
            pts = np.zeros((64, 3), np.float32)
            pts[:40] = rng.uniform(0, 8, size=(40, 3)) + offset
            mask = np.zeros(64, bool)
            mask[:40] = True
            covs = np.zeros((64, 3, 3), np.float32)
            regions.append(pts[:40])
            vm = vmx.voxelmap_insert(vm, jnp.asarray(pts), jnp.asarray(mask),
                                     jnp.asarray(covs), jnp.int32(s))
        # Latest region must be fully present.
        idx = vmx.voxelmap_lookup(vm, jnp.asarray(regions[2]))
        assert (np.asarray(idx) >= 0).all()
        # Oldest region should be (mostly) evicted.
        idx0 = vmx.voxelmap_lookup(vm, jnp.asarray(regions[0]))
        n_total = int(vm.num_voxels())
        assert n_total <= 64
        assert (np.asarray(idx0) >= 0).mean() < 0.7

    def test_overlap(self, rng):
        pts, mask, covs = padded(rng, 300, 512, scale=5.0)
        vm = vmx.empty_gaussian_voxelmap(1024, 1.0)
        vm = vmx.voxelmap_insert(vm, pts, mask, covs, jnp.int32(0))
        ov_same = float(vmx.voxelmap_overlap(vm, pts, mask, jnp.eye(4)))
        assert ov_same > 0.99
        T_far = np.eye(4, dtype=np.float32)
        T_far[0, 3] = 1000.0
        ov_far = float(vmx.voxelmap_overlap(vm, pts, mask, jnp.asarray(T_far)))
        assert ov_far < 0.01


class TestPointVoxelMap:
    def test_insert_dedup(self, rng):
        pm = vmx.empty_point_voxelmap(256, 0.5)
        pts, mask, covs = padded(rng, 100, 128, scale=2.0)
        pm = vmx.pointmap_insert(pm, pts, mask, covs, jnp.int32(0))
        n1 = int(pm.num_points())
        assert 0 < n1 <= 100
        # Re-inserting identical points adds nothing (per-subvoxel dedup).
        pm2 = vmx.pointmap_insert(pm, pts, mask, covs, jnp.int32(1))
        assert int(pm2.num_points()) == n1

    def test_capacity_eviction(self, rng):
        pm = vmx.empty_point_voxelmap(64, 0.1)
        for s in range(4):
            pts = np.zeros((64, 3), np.float32)
            pts[:50] = rng.uniform(0, 10, size=(50, 3)) + 100.0 * s
            mask = np.zeros(64, bool)
            mask[:50] = True
            covs = np.zeros((64, 3, 3), np.float32)
            pm = vmx.pointmap_insert(pm, jnp.asarray(pts), jnp.asarray(mask),
                                     jnp.asarray(covs), jnp.int32(s))
        assert int(pm.num_points()) <= 64
        # Survivors should be dominated by the latest insertions.
        surv = np.asarray(pm.points)[np.asarray(pm.mask)]
        assert (surv[:, 0] > 150).mean() > 0.5
