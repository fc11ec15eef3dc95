"""FPFH / RANSAC / GNC global registration and segmentation tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from glim_tpu.ops import covariance as cov_ops
from glim_tpu.ops import knn, lie_np
from glim_tpu.ops import registration as reg
from glim_tpu.ops import segmentation as seg


def structured_cloud(rng, n=600, cap=1024):
    """Corner of two walls + floor: rich normals for FPFH."""
    pts = np.zeros((cap, 3), np.float32)
    k = n // 3
    pts[:k, :2] = rng.uniform(0, 8, (k, 2))
    pts[k:2 * k, 0] = rng.uniform(0, 8, k)
    pts[k:2 * k, 2] = rng.uniform(0, 4, k)
    pts[2 * k:n, 1] = rng.uniform(0, 8, n - 2 * k)
    pts[2 * k:n, 2] = rng.uniform(0, 4, n - 2 * k)
    pts[:n] += rng.normal(size=(n, 3)) * 0.01
    mask = np.zeros(cap, bool)
    mask[:n] = True
    return jnp.asarray(pts), jnp.asarray(mask)


def with_normals(pts, mask):
    nbr, _ = knn.knn_self(pts, mask, 10)
    _, normals = cov_ops.estimate_covariances(pts, mask, nbr, "plane")
    return normals


class TestFPFH:
    def test_shape_and_normalization(self, rng):
        pts, mask = structured_cloud(rng)
        normals = with_normals(pts, mask)
        f = reg.estimate_fpfh(pts, normals, mask)
        fn = np.asarray(f)
        assert fn.shape[1] == reg.FPFH_DIM
        sums = fn[np.asarray(mask)].sum(axis=1)
        np.testing.assert_allclose(sums, np.where(sums > 0, sums, 0), atol=1e-5)
        assert (np.abs(sums - 1.0) < 0.2).mean() > 0.9

    def test_rotation_invariance(self, rng):
        pts, mask = structured_cloud(rng)
        normals = with_normals(pts, mask)
        f1 = np.asarray(reg.estimate_fpfh(pts, normals, mask))
        R = lie_np.so3_exp(np.array([0.3, -0.5, 0.9])).astype(np.float32)
        pts_r = pts @ jnp.asarray(R).T
        normals_r = with_normals(pts_r, mask)
        f2 = np.asarray(reg.estimate_fpfh(pts_r, normals_r, mask))
        m = np.asarray(mask)
        # Descriptors should be (approximately) unchanged under rotation.
        diff = np.abs(f1[m] - f2[m]).sum(axis=1)
        assert np.median(diff) < 0.4


@pytest.mark.slow
class TestGlobalRegistration:
    def make_pair(self, rng, xi):
        pts, mask = structured_cloud(rng)
        normals = with_normals(pts, mask)
        feat = reg.estimate_fpfh(pts, normals, mask)
        T = lie_np.se3_exp(xi).astype(np.float32)
        src = pts @ jnp.asarray(np.linalg.inv(T)[:3, :3].T.astype(np.float32)) \
            + jnp.asarray(np.linalg.inv(T)[:3, 3].astype(np.float32))
        normals_s = with_normals(src, mask)
        feat_s = reg.estimate_fpfh(src, normals_s, mask)
        return src, feat_s, mask, pts, feat, mask, T

    def test_ransac_recovers_large_transform(self, rng):
        xi = np.array([0.0, 0.0, 0.8, 3.0, -2.0, 0.5])
        src, fs, ms, tgt, ft, mt, T_true = self.make_pair(rng, xi)
        res, inliers = reg.estimate_pose_ransac(
            src, fs, ms, tgt, ft, mt, reg.RANSACParams(max_iterations=2048,
                                                       inlier_threshold=0.4))
        err = lie_np.se3_log(np.linalg.inv(T_true.astype(np.float64))
                             @ np.asarray(res.T_target_source, np.float64))
        assert float(res.inlier_fraction) > 0.05
        assert np.linalg.norm(err[3:]) < 0.3, err
        pts_in = reg.find_inlier_points(src, inliers)
        assert len(pts_in) == int(res.num_inliers)

    def test_gnc_recovers_transform(self, rng):
        xi = np.array([0.0, 0.0, 0.5, 2.0, 1.0, 0.0])
        src, fs, ms, tgt, ft, mt, T_true = self.make_pair(rng, xi)
        res, _ = reg.estimate_pose_gnc(src, fs, ms, tgt, ft, mt,
                                       reg.GNCParams(inlier_threshold=0.4))
        err = lie_np.se3_log(np.linalg.inv(T_true.astype(np.float64))
                             @ np.asarray(res.T_target_source, np.float64))
        assert np.linalg.norm(err[3:]) < 0.3, err


class TestSegmentation:
    def make_scene(self, rng, cap=512):
        """Floor + a separated box ("object")."""
        pts = np.zeros((cap, 3), np.float32)
        pts[:300, 0] = rng.uniform(-10, 10, 300)
        pts[:300, 1] = rng.uniform(-10, 10, 300)
        # box centered at (3, 3, 1), above the floor
        pts[300:400] = rng.uniform(-0.4, 0.4, (100, 3)) + np.array([3, 3, 1.5])
        mask = np.zeros(cap, bool)
        mask[:400] = True
        return jnp.asarray(pts), jnp.asarray(mask)

    def test_region_growing_segments_floor(self, rng):
        pts, mask = self.make_scene(rng)
        normals = with_normals(pts, mask)
        labels = seg.region_growing(pts, normals, mask, seed_index=0,
                                    params=seg.RegionGrowingParams(
                                        distance_threshold=1.5,
                                        angle_threshold=0.3))
        # The floor grows; the box does not get absorbed.
        assert labels[:300].mean() > 0.7
        assert labels[300:400].mean() < 0.2

    def test_min_cut_isolates_object(self, rng):
        pts, mask = self.make_scene(rng)
        fg = seg.min_cut(pts, mask, seed_index=350,
                         params=seg.MinCutParams(distance_sigma=0.3,
                                                 foreground_radius=1.5,
                                                 background_weight=2.0))
        assert fg[300:400].mean() > 0.6
        assert fg[:300].mean() < 0.3
