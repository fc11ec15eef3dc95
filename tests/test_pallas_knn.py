"""Pallas streaming-NN kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from glim_tpu.ops.knn import knn_search
from glim_tpu.ops.pallas_knn import TN, TQ, nn_search, nn_search_pallas


class TestPallasNN:
    def test_kernel_matches_xla(self, rng):
        Q, N = TQ * 2, TN
        q = jnp.asarray(rng.uniform(-20, 20, (Q, 3)).astype(np.float32))
        t = jnp.asarray(rng.uniform(-20, 20, (N, 3)).astype(np.float32))
        qm = jnp.asarray(np.arange(Q) < Q - 50)
        tm = jnp.asarray(np.arange(N) < N - 100)

        i1, d1 = nn_search_pallas(q, qm, t, tm, interpret=True)
        i2, d2 = knn_search(q, qm, t, tm, k=1)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2)[:, 0])
        valid = np.asarray(qm)
        np.testing.assert_allclose(np.asarray(d1)[valid],
                                   np.asarray(d2)[valid, 0], atol=1e-3)
        assert np.isinf(np.asarray(d1)[~valid]).all()

    def test_dispatch_fallback_on_cpu(self, rng):
        # On CPU (this test env) nn_search must route to the XLA fallback and
        # still produce correct results for tile-unaligned shapes.
        q = jnp.asarray(rng.uniform(-5, 5, (100, 3)).astype(np.float32))
        t = jnp.asarray(rng.uniform(-5, 5, (300, 3)).astype(np.float32))
        idx, d2 = nn_search(q, jnp.ones(100, bool), t, jnp.ones(300, bool))
        D = ((np.asarray(q)[:, None, :] - np.asarray(t)[None, :, :]) ** 2).sum(-1)
        np.testing.assert_array_equal(np.asarray(idx), D.argmin(1))
