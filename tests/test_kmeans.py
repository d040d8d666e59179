"""k-means family tests: distance kernel, Lloyd's convergence/masking,
k-means++ and k-means|| quality."""

import numpy as np
import jax
import jax.numpy as jnp

from speaker_recognition_tpu.models import kmeans


def blobs(n_per=100, K=4, d=5, spread=0.2, seed=0):
    rng = np.random.RandomState(seed)
    centers = rng.randn(K, d) * 3
    X = np.concatenate([centers[k] + rng.randn(n_per, d) * spread
                        for k in range(K)], axis=0)
    return X, centers


class TestDistance:
    def test_pairwise_matches_naive(self):
        rng = np.random.RandomState(1)
        X = rng.randn(30, 4)
        C = rng.randn(5, 4)
        ref = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        out = kmeans.pairwise_dist2(jnp.asarray(X), jnp.asarray(C))
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-9, atol=1e-9)


class TestLloyd:
    def test_recovers_blobs(self):
        X, centers = blobs()
        mask = jnp.ones(len(X), dtype=bool)
        # seed with perturbed true centers
        C0 = jnp.asarray(centers + 0.5)
        C, cost = kmeans.lloyd(jnp.asarray(X), mask, C0)
        C = np.asarray(C)
        for c in centers:
            assert np.abs(C - c).sum(axis=1).min() < 0.2

    def test_mask_excludes_padding(self):
        X, centers = blobs(seed=2)
        Xp = np.concatenate([X, np.full((50, X.shape[1]), 100.0)], axis=0)
        mask = jnp.arange(len(Xp)) < len(X)
        C0 = jnp.asarray(centers + 0.3)
        C_pad, cost_pad = kmeans.lloyd(jnp.asarray(Xp), mask, C0)
        C_ref, cost_ref = kmeans.lloyd(jnp.asarray(X), jnp.ones(len(X), dtype=bool), C0)
        np.testing.assert_allclose(np.asarray(C_pad), np.asarray(C_ref),
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(float(cost_pad), float(cost_ref), rtol=1e-9)

    def test_empty_cluster_keeps_centroid(self):
        X = np.array([[0.0, 0.0], [1.0, 1.0]])
        C0 = jnp.asarray([[0.0, 0.0], [1.0, 1.0], [50.0, 50.0]])
        C, _ = kmeans.lloyd(jnp.asarray(X), jnp.ones(2, dtype=bool), C0)
        assert np.isfinite(np.asarray(C)).all()


class TestSeeding:
    def test_kmeanspp_quality(self):
        X, centers = blobs(seed=3)
        C, cost = kmeans.kmeanspp(jnp.asarray(X), jnp.ones(len(X), dtype=bool),
                                  4, jax.random.PRNGKey(0))
        # cost should be near the optimal (spread^2 * d * n)
        opt = 0.2 ** 2 * X.shape[1] * len(X)
        assert float(cost) < 3 * opt, (float(cost), opt)

    def test_kmeansii_quality(self):
        X, centers = blobs(seed=4)
        C, cost = kmeans.kmeansii(jnp.asarray(X), jnp.ones(len(X), dtype=bool),
                                  4, jax.random.PRNGKey(1))
        opt = 0.2 ** 2 * X.shape[1] * len(X)
        assert float(cost) < 3 * opt, (float(cost), opt)
        assert np.asarray(C).shape == (4, X.shape[1])

    def test_kmeansii_masked(self):
        X, centers = blobs(seed=5)
        Xp = np.concatenate([X, np.full((30, X.shape[1]), 77.0)], axis=0)
        mask = jnp.arange(len(Xp)) < len(X)
        C, cost = kmeans.kmeansii(jnp.asarray(Xp), mask, 4, jax.random.PRNGKey(2))
        # no centroid may sit on the padding value
        assert np.abs(np.asarray(C) - 77.0).min() > 1.0
