"""kNN, closed-form eigh, and covariance-estimation tests vs numpy/scipy."""

import jax.numpy as jnp
import numpy as np

from glim_tpu.ops import covariance, knn
from glim_tpu.ops.eigh3 import eigh_sym3x3, eigvals_sym3x3


class TestKnn:
    def test_vs_numpy(self, rng):
        n, cap, k = 500, 512, 5
        pts = np.zeros((cap, 3), np.float32)
        pts[:n] = rng.normal(size=(n, 3)).astype(np.float32) * 10
        mask = np.zeros(cap, bool)
        mask[:n] = True
        idx, d2 = knn.knn_self(jnp.asarray(pts), jnp.asarray(mask), k)
        idxn, d2n = np.asarray(idx), np.asarray(d2)

        D = ((pts[:n, None, :] - pts[None, :n, :]) ** 2).sum(-1)
        for i in range(0, n, 37):
            ref = np.sort(D[i])[:k]
            np.testing.assert_allclose(np.sort(d2n[i]), ref, atol=1e-2)
            assert i in idxn[i]  # self-match included

    def test_masked_targets_excluded(self, rng):
        pts = rng.normal(size=(64, 3)).astype(np.float32)
        mask = np.ones(64, bool)
        mask[10:] = False
        idx, d2 = knn.knn_search(jnp.asarray(pts), jnp.asarray(mask),
                                 jnp.asarray(pts), jnp.asarray(mask), k=3)
        assert (np.asarray(idx)[:10] < 10).all()

    def test_exclude_self(self, rng):
        pts = rng.normal(size=(32, 3)).astype(np.float32)
        mask = np.ones(32, bool)
        idx, _ = knn.knn_search(jnp.asarray(pts), jnp.asarray(mask),
                                jnp.asarray(pts), jnp.asarray(mask), k=3, exclude_self=True)
        for i in range(32):
            assert i not in np.asarray(idx)[i]


class TestEigh3:
    def random_sym(self, rng, n=256, scale=1.0):
        A = rng.normal(size=(n, 3, 3)) * scale
        return ((A + A.transpose(0, 2, 1)) / 2).astype(np.float32)

    def test_eigvals_vs_numpy(self, rng):
        A = self.random_sym(rng)
        w = np.asarray(eigvals_sym3x3(jnp.asarray(A)))
        w_ref = np.linalg.eigvalsh(A.astype(np.float64))
        np.testing.assert_allclose(w, w_ref, atol=5e-5)

    def test_eigvecs_reconstruct(self, rng):
        A = self.random_sym(rng, 128)
        w, V = eigh_sym3x3(jnp.asarray(A))
        w, V = np.asarray(w), np.asarray(V)
        recon = np.einsum("nij,nj,nkj->nik", V, w, V)
        np.testing.assert_allclose(recon, A, atol=5e-4)
        # Orthonormality
        VtV = np.einsum("nji,njk->nik", V, V)
        np.testing.assert_allclose(VtV, np.broadcast_to(np.eye(3), VtV.shape), atol=5e-5)

    def test_degenerate_sphere(self):
        A = np.broadcast_to(np.eye(3, dtype=np.float32) * 2.0, (4, 3, 3)).copy()
        w, V = eigh_sym3x3(jnp.asarray(A))
        np.testing.assert_allclose(np.asarray(w), 2.0, atol=1e-6)
        VtV = np.einsum("nji,njk->nik", np.asarray(V), np.asarray(V))
        np.testing.assert_allclose(VtV, np.broadcast_to(np.eye(3), VtV.shape), atol=1e-5)

    def test_planar_degenerate(self, rng):
        # Two equal large eigenvalues (plane-regularized covariance shape).
        Q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        A = (Q @ np.diag([1e-3, 1.0, 1.0]) @ Q.T).astype(np.float32)
        w, V = eigh_sym3x3(jnp.asarray(A[None]))
        recon = np.einsum("nij,nj,nkj->nik", np.asarray(V), np.asarray(w), np.asarray(V))
        np.testing.assert_allclose(recon[0], A, atol=5e-4)


class TestCovariance:
    def make_plane_cloud(self, rng, n=200, cap=256):
        # Points on the z=0 plane with small noise.
        pts = np.zeros((cap, 3), np.float32)
        pts[:n, :2] = rng.uniform(-5, 5, size=(n, 2))
        pts[:n, 2] = rng.normal(size=n) * 0.01 + 3.0  # plane z=3 (away from origin)
        mask = np.zeros(cap, bool)
        mask[:n] = True
        return jnp.asarray(pts), jnp.asarray(mask)

    def test_plane_regularization(self, rng):
        pts, mask = self.make_plane_cloud(rng)
        idx, _ = knn.knn_self(pts, mask, k=10)
        covs, normals = covariance.estimate_covariances(pts, mask, idx, "plane")
        covs, normals = np.asarray(covs), np.asarray(normals)
        n = int(np.asarray(mask).sum())
        # Plane normal ~ +-z; oriented toward origin means negative z here.
        nz = normals[:n, 2]
        assert (np.abs(nz) > 0.95).mean() > 0.9
        assert (nz < 0).mean() > 0.9
        # Eigenvalues of regularized covs: {1e-3, 1, 1}.
        w = np.linalg.eigvalsh(covs[:n].astype(np.float64))
        np.testing.assert_allclose(w[:, 0], 1e-3, atol=1e-4)
        np.testing.assert_allclose(w[:, 1:], 1.0, atol=1e-3)

    def test_invalid_lanes_identity(self, rng):
        pts, mask = self.make_plane_cloud(rng, 100, 128)
        idx, _ = knn.knn_self(pts, mask, k=5)
        covs, normals = covariance.estimate_covariances(pts, mask, idx)
        mn = ~np.asarray(mask)
        np.testing.assert_allclose(np.asarray(covs)[mn],
                                   np.broadcast_to(np.eye(3), (mn.sum(), 3, 3)))
        np.testing.assert_allclose(np.asarray(normals)[mn], 0.0)

    def test_outlier_mask(self, rng):
        # Tight cluster + one far outlier.
        cap = 64
        pts = np.zeros((cap, 3), np.float32)
        pts[:30] = rng.normal(size=(30, 3)) * 0.1
        pts[30] = [50, 50, 50]
        mask = np.zeros(cap, bool)
        mask[:31] = True
        idx, d2 = knn.knn_self(jnp.asarray(pts), jnp.asarray(mask), k=5)
        m = covariance.outlier_mask(d2, jnp.asarray(mask), std_mul_factor=1.0)
        mn = np.asarray(m)
        assert not mn[30]
        assert mn[:30].mean() > 0.8


class TestBandedKnnRecall:
    """Quantify the Morton-banded approximate kNN (the preprocessing default)
    against exact kNN on REALISTIC ring-structured raycast scans — covariance
    quality drives GICP accuracy, so recall must stay high (round-1 audit
    left it unmeasured)."""

    def _recall_and_cov_error(self, pts, k=10, window=128):
        import jax.numpy as jnp

        from glim_tpu.ops import covariance as cov_ops
        from glim_tpu.ops import knn

        cap = 1 << int(np.ceil(np.log2(len(pts))))
        buf = np.zeros((cap, 3), np.float32)
        buf[:len(pts)] = pts
        mask = np.zeros(cap, bool)
        mask[:len(pts)] = True
        pts_d = jnp.asarray(buf)
        mask_d = jnp.asarray(mask)

        idx_a, _ = knn.knn_banded(pts_d, mask_d, k, window=window, cell=0.5)
        idx_e, _ = knn.knn_self(pts_d, mask_d, k)
        a = np.asarray(idx_a)[mask]
        e = np.asarray(idx_e)[mask]
        recall = np.mean([len(set(a[i]) & set(e[i])) / k
                          for i in range(len(a))])

        cov_a, _ = cov_ops.estimate_covariances(pts_d, mask_d, idx_a, "plane")
        cov_e, _ = cov_ops.estimate_covariances(pts_d, mask_d, idx_e, "plane")
        ca = np.asarray(cov_a)[mask]
        ce = np.asarray(cov_e)[mask]
        cov_err = np.linalg.norm(ca - ce, axis=(1, 2)) / \
            np.maximum(np.linalg.norm(ce, axis=(1, 2)), 1e-9)
        return recall, float(np.median(cov_err))

    def test_recall_on_raycast_scan(self):
        from glim_tpu.io.synthetic import generate_raycast_sequence
        seq = generate_raycast_sequence(duration=0.1, path="circle",
                                        scene="room", n_channels=32,
                                        n_azimuth=256, noise=0.01, seed=5)
        pts = seq.scans[0].points[:8192]
        recall, cov_err = self._recall_and_cov_error(pts)
        # The banded search must find most true neighbors, and the resulting
        # regularized covariances must be near-identical to exact-kNN ones.
        assert recall > 0.75, recall
        assert cov_err < 0.25, cov_err

    def test_recall_on_corridor_scan(self):
        from glim_tpu.io.synthetic import generate_raycast_sequence
        seq = generate_raycast_sequence(duration=0.1, path="line",
                                        scene="corridor", n_channels=16,
                                        n_azimuth=256, noise=0.005, seed=6)
        pts = seq.scans[0].points[:4096]
        recall, cov_err = self._recall_and_cov_error(pts)
        assert recall > 0.7, recall
        assert cov_err < 0.3, cov_err
