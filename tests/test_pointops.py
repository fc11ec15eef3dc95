"""Point-op kernel tests vs numpy references."""

import jax
import jax.numpy as jnp
import numpy as np

from glim_tpu.ops import pointops


def padded(rng, n=1000, cap=1024, scale=10.0):
    pts = np.zeros((cap, 3), np.float32)
    pts[:n] = rng.normal(size=(n, 3)) * scale
    mask = np.zeros(cap, bool)
    mask[:n] = True
    return jnp.asarray(pts), jnp.asarray(mask)


class TestVoxelKeys:
    def test_equal_coords_equal_hash(self, rng):
        pts = rng.normal(size=(100, 3)).astype(np.float32) * 5
        c = pointops.voxel_coords(jnp.asarray(pts), 1.0 / 0.5)
        h = pointops.hash_coords(c)
        cn = np.asarray(c)
        hn = np.asarray(h)
        for i in range(100):
            for j in range(i + 1, 100):
                if (cn[i] == cn[j]).all():
                    assert hn[i] == hn[j]
        assert (hn >= 0).all() and (hn < pointops.INVALID_HASH).all()

    def test_fast_floor(self):
        x = jnp.asarray([-1.5, -0.1, 0.0, 0.9, 2.0])
        np.testing.assert_array_equal(np.asarray(pointops.fast_floor(x)), [-2, -1, 0, 0, 2])


class TestVoxelgridSampling:
    def test_centroids(self, rng):
        pts, mask = padded(rng, 500, 512)
        res = 1.0
        out, omask = pointops.voxelgrid_sampling(pts, mask, res)
        n_out = int(np.sum(np.asarray(omask)))

        # numpy reference
        pn = np.asarray(pts)[np.asarray(mask)]
        keys = np.floor(pn / res).astype(np.int64)
        uniq, inv = np.unique(keys, axis=0, return_inverse=True)
        assert n_out == len(uniq)
        ref_centroids = np.zeros((len(uniq), 3))
        cnt = np.zeros(len(uniq))
        for i, g in enumerate(inv):
            ref_centroids[g] += pn[i]
            cnt[g] += 1
        ref_centroids /= cnt[:, None]
        got = np.asarray(out)[np.asarray(omask)]
        # Compare as sets (sorted lexicographically).
        got_sorted = got[np.lexsort(got.T)]
        ref_sorted = ref_centroids[np.lexsort(ref_centroids.T)]
        np.testing.assert_allclose(got_sorted, ref_sorted, atol=1e-4)

    def test_all_invalid(self):
        pts = jnp.zeros((64, 3))
        mask = jnp.zeros(64, bool)
        _, omask = pointops.voxelgrid_sampling(pts, mask, 0.5)
        assert not np.asarray(omask).any()


class TestRandomgridSampling:
    def test_target_respected(self, rng):
        pts, mask = padded(rng, 900, 1024, scale=20.0)
        out, omask, _ = pointops.randomgrid_sampling(pts, mask, 2.0, 256, jax.random.PRNGKey(0))
        n = int(np.asarray(omask).sum())
        assert 0 < n <= 256
        # All output points must be actual input points.
        outn = np.asarray(out)[np.asarray(omask)]
        ptsn = np.asarray(pts)[np.asarray(mask)]
        for p in outn[:20]:
            assert np.min(np.linalg.norm(ptsn - p, axis=1)) < 1e-5

    def test_spatial_uniformity(self, rng):
        # Dense cluster + sparse spread: voxel bucketing should keep sparse pts.
        dense = rng.normal(size=(800, 3)).astype(np.float32) * 0.1
        sparse = rng.normal(size=(100, 3)).astype(np.float32) * 50.0
        pts = np.zeros((1024, 3), np.float32)
        pts[:800] = dense
        pts[800:900] = sparse
        mask = np.zeros(1024, bool)
        mask[:900] = True
        out, omask, _ = pointops.randomgrid_sampling(
            jnp.asarray(pts), jnp.asarray(mask), 1.0, 200, jax.random.PRNGKey(1))
        outn = np.asarray(out)[np.asarray(omask)]
        n_far = (np.linalg.norm(outn, axis=1) > 5.0).sum()
        # Sparse region is ~11% of points but most voxels; should be over-represented.
        assert n_far > 0.3 * len(outn)


class TestFilters:
    def test_distance_filter(self, rng):
        pts, mask = padded(rng, 100, 128, scale=5.0)
        m = pointops.distance_filter(pts, mask, 1.0, 8.0)
        d = np.linalg.norm(np.asarray(pts), axis=1)
        ref = np.asarray(mask) & (d >= 1.0) & (d <= 8.0)
        np.testing.assert_array_equal(np.asarray(m), ref)

    def test_distance_filter_nonfinite(self):
        pts = np.ones((8, 3), np.float32)
        pts[3] = np.nan
        pts[5] = np.inf
        m = pointops.distance_filter(jnp.asarray(pts), jnp.ones(8, bool), 0.0, 100.0)
        assert not np.asarray(m)[3] and not np.asarray(m)[5]
        assert np.asarray(m)[0]

    def test_cropbox(self):
        pts = jnp.asarray(np.array([[0.5, 0.5, 0.5], [3.0, 0, 0]], np.float32))
        m = pointops.cropbox_filter(pts, jnp.ones(2, bool), jnp.eye(4),
                                    jnp.asarray([-1.0, -1, -1]), jnp.asarray([1.0, 1, 1]))
        np.testing.assert_array_equal(np.asarray(m), [False, True])

    def test_random_sampling(self, rng):
        pts, mask = padded(rng, 800, 1024)
        out, omask, idx = pointops.random_sampling(pts, mask, 100, jax.random.PRNGKey(0))
        assert int(np.asarray(omask).sum()) == 100

    def test_compact(self):
        pts = jnp.asarray(np.arange(12, dtype=np.float32).reshape(4, 3))
        mask = jnp.asarray([False, True, False, True])
        cp, cm = pointops.compact(pts, mask)
        assert np.asarray(cm)[:2].all() and not np.asarray(cm)[2:].any()
        np.testing.assert_allclose(np.asarray(cp)[0], [3, 4, 5])
        np.testing.assert_allclose(np.asarray(cp)[1], [9, 10, 11])

    def test_median_distance(self, rng):
        pts, mask = padded(rng, 1000, 1024, scale=3.0)
        med = float(pointops.median_distance(pts, mask))
        dn = np.linalg.norm(np.asarray(pts)[np.asarray(mask)], axis=1)
        assert abs(med - np.median(dn)) < np.sort(dn)[505] - np.sort(dn)[495] + 1e-3


class TestSample:
    def test_select_by_indices(self, rng):
        import jax.numpy as jnp
        pts = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
        mask = jnp.asarray(np.arange(64) < 50)
        idx = jnp.asarray([0, 49, 50, -1, 10], jnp.int32)
        out, om = pointops.sample(pts, mask, idx)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(pts[0]))
        np.testing.assert_allclose(np.asarray(out[4]), np.asarray(pts[10]))
        # lane 50 is an invalid source; lane -1 is an invalid request
        assert list(np.asarray(om)) == [True, True, False, False, True]
