"""Tests for the alternative clustering backends."""
import jax
import jax.numpy as jnp
import numpy as np

from parsenet_tpu.ops.cluster_alt import cluster, kmeans, spectral_cluster


def three_blobs(rng, n=60, d=4, sep=5.0):
    centers = rng.randn(3, d) * sep
    X = np.concatenate([centers[i] + 0.2 * rng.randn(n, d) for i in range(3)])
    gt = np.repeat(np.arange(3), n)
    return X.astype(np.float32), gt


def purity(labels, gt, k=3):
    acc = 0
    for c in range(k):
        m = gt[labels == c]
        if len(m):
            acc += np.bincount(m).max()
    return acc / len(gt)


class TestKMeans:
    def test_blobs(self, rng):
        X, gt = three_blobs(rng)
        labels, centers = kmeans(jnp.asarray(X), 3, jax.random.PRNGKey(0))
        assert purity(np.asarray(labels), gt) > 0.99
        assert centers.shape == (3, 4)

    def test_more_clusters_than_points_safe(self, rng):
        X = jnp.asarray(rng.randn(5, 3).astype(np.float32))
        labels, centers = kmeans(X, 8, jax.random.PRNGKey(0))
        assert np.isfinite(np.asarray(centers)).all()


class TestSpectral:
    def test_blobs(self, rng):
        X, gt = three_blobs(rng, sep=4.0)
        labels = spectral_cluster(jnp.asarray(X), 3, jax.random.PRNGKey(0),
                                  sigma=1.0)
        assert purity(np.asarray(labels), gt) > 0.95


class TestDispatch:
    def test_all_methods(self, rng):
        X, gt = three_blobs(rng)
        for m in ("kmeans", "spectral"):
            labels = cluster(jnp.asarray(X), 3, method=m)
            assert purity(np.asarray(labels), gt) > 0.9, m
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        labels = cluster(jnp.asarray(Xn), 3, method="meanshift",
                         quantile=0.1)
        assert purity(np.asarray(labels), gt) > 0.9
