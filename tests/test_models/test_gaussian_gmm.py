"""Gaussian/GMM tests mirroring the reference tiers
(/root/reference/tests/test_distribution/test_gmm.py,
test_gaussian.py): statistical recovery with permutation-invariant
matching and shape/covariance-type sweeps.
"""
import itertools

import numpy as np
import pytest
from numpy.testing import assert_allclose

from pb_bss_tpu.models import (
    BinaryGMMTrainer,
    GaussianTrainer,
    GMMTrainer,
)


def _two_cluster_data(samples=1000, seed=0):
    rng = np.random.RandomState(seed)
    weight = np.array([0.3, 0.7])
    labels = rng.choice(2, size=(samples,), p=weight)
    mean = np.array([[-1.0, -1.0], [1.0, 1.0]])
    covariance = np.tile(0.25 * np.eye(2), (2, 1, 1))
    x = np.zeros((samples, 2))
    for k in range(2):
        n = np.sum(labels == k)
        x[labels == k] = rng.multivariate_normal(
            mean[k], covariance[k], size=(n,))
    return x, labels, mean, covariance


def _best_permutation(estimated_mean, mean):
    best, best_cost = None, np.inf
    for p in itertools.permutations(range(len(mean))):
        cost = np.sum((estimated_mean[list(p)] - mean) ** 2)
        if cost < best_cost:
            best, best_cost = list(p), cost
    return best


class TestGaussianTrainer:
    def test_full_fit(self):
        rng = np.random.RandomState(1)
        mean = np.array([2.0, -1.0, 0.5])
        L = np.array([[1.0, 0, 0], [0.4, 0.8, 0], [-0.2, 0.3, 0.6]])
        cov = L @ L.T
        x = rng.multivariate_normal(mean, cov, size=20000)
        model = GaussianTrainer().fit(x)
        assert_allclose(np.asarray(model.mean), mean, atol=0.05)
        assert_allclose(np.asarray(model.covariance), cov, atol=0.05)

    def test_covariance_types_shapes(self):
        x = np.random.RandomState(2).randn(100, 4)
        full = GaussianTrainer().fit(x, covariance_type='full')
        assert full.covariance.shape == (4, 4)
        diag = GaussianTrainer().fit(x, covariance_type='diagonal')
        assert diag.covariance.shape == (4,)
        sph = GaussianTrainer().fit(x, covariance_type='spherical')
        assert sph.covariance.shape == ()

    def test_log_pdf_matches_scipy(self):
        from scipy.stats import multivariate_normal
        rng = np.random.RandomState(3)
        mean = rng.randn(3)
        L = np.tril(rng.randn(3, 3)) + 3 * np.eye(3)
        cov = L @ L.T
        x = rng.randn(50, 3)
        model = GaussianTrainer().fit(rng.multivariate_normal(
            mean, cov, size=10))
        got = np.asarray(model.log_pdf(x))
        expected = multivariate_normal(
            np.asarray(model.mean), np.asarray(model.covariance)
        ).logpdf(x)
        assert_allclose(got, expected, rtol=1e-8)

    def test_diagonal_spherical_log_pdf_consistency(self):
        """Full with diagonal covariance == diagonal model."""
        rng = np.random.RandomState(4)
        x = rng.randn(200, 3) * np.array([1.0, 2.0, 0.5])
        full = GaussianTrainer().fit(x, covariance_type='full')
        diag = GaussianTrainer().fit(x, covariance_type='diagonal')
        y = rng.randn(20, 3)
        lp_full = np.asarray(full.log_pdf(y))
        # Full covariance is not exactly diagonal; compare the diagonal
        # model against a full model built from the diagonal.
        from pb_bss_tpu.models import Gaussian
        full_from_diag = Gaussian(
            mean=diag.mean, covariance=np.diag(np.asarray(diag.covariance)))
        assert_allclose(
            np.asarray(diag.log_pdf(y)),
            np.asarray(full_from_diag.log_pdf(y)), rtol=1e-8)
        assert lp_full.shape == (20,)


class TestGMM:
    def test_gmm_recovery(self):
        x, labels, mean, covariance = _two_cluster_data()
        model = GMMTrainer().fit(x, num_classes=2)
        est_mean = np.asarray(model.gaussian.mean)
        p = _best_permutation(est_mean, mean)
        assert_allclose(est_mean[p], mean, atol=0.2)
        assert_allclose(
            np.asarray(model.gaussian.covariance)[p], covariance,
            atol=0.2)

    def test_gmm_independent_dimension(self):
        x, labels, mean, covariance = _two_cluster_data()
        model = GMMTrainer().fit(x[None, ...], num_classes=2)
        assert model.gaussian.mean.shape == (1, 2, 2)
        assert model.gaussian.covariance.shape == (1, 2, 2, 2)

    def test_gmm_affiliation_init(self):
        x, labels, mean, covariance = _two_cluster_data()
        onehot = np.stack([labels == 0, labels == 1]).astype(float)
        model = GMMTrainer().fit(x, initialization=onehot, iterations=5)
        est_mean = np.asarray(model.gaussian.mean)
        p = _best_permutation(est_mean, mean)
        assert_allclose(est_mean[p], mean, atol=0.1)

    def test_predict_sums_to_one(self):
        x, *_ = _two_cluster_data(300)
        affiliation = np.asarray(
            GMMTrainer().fit_predict(x, num_classes=2, iterations=10))
        assert affiliation.shape == (2, 300)
        assert_allclose(affiliation.sum(0), 1.0, rtol=1e-6)

    def test_fixed_covariance(self):
        x, labels, mean, covariance = _two_cluster_data()
        fixed = np.tile(0.25 * np.eye(2), (2, 1, 1))
        model = GMMTrainer().fit(
            x, num_classes=2, iterations=5, fixed_covariance=fixed)
        assert_allclose(np.asarray(model.gaussian.covariance), fixed)


class TestBinaryGMM:
    def test_kmeans_recovers_clusters(self):
        x, labels, mean, covariance = _two_cluster_data()
        model = BinaryGMMTrainer().fit(x, num_classes=2)
        est_mean = np.asarray(model.means)
        p = _best_permutation(est_mean, mean)
        assert_allclose(est_mean[p], mean, atol=0.2)

    def test_predict_one_hot(self):
        x, labels, *_ = _two_cluster_data(500)
        model = BinaryGMMTrainer().fit(x, num_classes=2)
        affiliation = np.asarray(model.predict(x))
        assert affiliation.shape == (2, 500)
        assert set(np.unique(affiliation)) <= {0.0, 1.0}
        assert_allclose(affiliation.sum(0), 1.0)
        # accuracy (up to permutation) should be high
        pred = affiliation.argmax(0)
        acc = max(np.mean(pred == labels), np.mean(pred != labels))
        assert acc > 0.95

    def test_boolean_saliency(self):
        x, labels, *_ = _two_cluster_data(500)
        saliency = np.ones(500, bool)
        saliency[::10] = False
        model = BinaryGMMTrainer().fit(
            x, num_classes=2, saliency=saliency)
        assert np.asarray(model.means).shape == (2, 2)
