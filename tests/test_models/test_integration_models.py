"""GCACGMM / VMFCACGMM tests
(mirrors /root/reference/tests/test_distribution/test_gcacgmm.py
weight-shape sweeps, plus separation-recovery and inline-PA smoke
tests).
"""
import numpy as np
import pytest
from numpy.testing import assert_allclose

from pb_bss_tpu.models import GCACGMMTrainer, VMFCACGMMTrainer


@pytest.fixture(scope='module')
def data():
    rng = np.random.RandomState(0)
    observation_shape = (15, 100, 3)
    observation = rng.normal(size=observation_shape) \
        + 1j * rng.normal(size=observation_shape)
    embedding = rng.normal(size=(15, 100, 10))
    return observation, embedding


class TestGCACGMMWeightShapes:
    """weight_constant_axis -> weight-shape contract
    (reference test_gcacgmm.py:16-34)."""

    def check_weight(self, data, weight_constant_axis,
                     expected_weight_shape):
        observation, embedding = data
        model = GCACGMMTrainer().fit(
            observation, embedding, num_classes=2, iterations=3,
            weight_constant_axis=weight_constant_axis)
        assert np.shape(model.weight) == expected_weight_shape

    def test_no_weight(self, data):
        self.check_weight(data, (-3, -2, -1), ())

    def test_weight_k(self, data):
        self.check_weight(data, (-3, -1), (2,))

    def test_weight_fk(self, data):
        self.check_weight(data, (-1,), (15, 2))

    def test_weight_kt(self, data):
        self.check_weight(data, (-3,), (2, 100))


class TestVMFCACGMMWeightShapes:
    def test_weight_fk(self, data):
        observation, embedding = data
        model = VMFCACGMMTrainer().fit(
            observation, embedding, num_classes=2, iterations=3,
            weight_constant_axis=(-1,))
        assert np.shape(model.weight) == (15, 2)
        assert model.vmf.mean.shape == (2, 10)
        assert model.cacg.covariance_eigenvectors.shape == (15, 2, 3, 3)


def _separable_data(seed=1, F=8, T=120, D=3, E=6):
    """Two sources with distinct spatial direction AND embedding
    cluster, time-interleaved."""
    rng = np.random.RandomState(seed)
    atf = rng.randn(F, D, 2) + 1j * rng.randn(F, D, 2)
    active = (np.arange(T) % 2 == 0)  # source 0 on even frames
    observation = np.where(
        active[None, :, None],
        atf[:, None, :, 0],
        atf[:, None, :, 1],
    ) * np.exp(2j * np.pi * rng.rand(F, T, 1))
    observation = observation + 0.05 * (
        rng.randn(F, T, D) + 1j * rng.randn(F, T, D))
    centers = np.stack([np.ones(E), -np.ones(E)]) / np.sqrt(E)
    embedding = np.where(
        active[None, :, None], centers[0], centers[1]
    ) + 0.1 * rng.randn(F, T, E)
    embedding = np.broadcast_to(embedding, (F, T, E)).copy()
    return observation, embedding, active


@pytest.mark.parametrize('trainer_cls', [GCACGMMTrainer, VMFCACGMMTrainer])
def test_integration_model_separates(trainer_cls):
    observation, embedding, active = _separable_data()
    model = trainer_cls().fit(
        observation, embedding, num_classes=2, iterations=20)
    affiliation = np.asarray(
        model.predict(observation, embedding))  # (F, K, T)
    decision = affiliation.argmax(axis=1)  # (F, T)
    # per frequency, the decision should match `active` up to a flip
    acc = np.mean(decision == active[None, :], axis=-1)
    acc = np.maximum(acc, 1 - acc)
    assert acc.min() > 0.9, acc


@pytest.mark.parametrize('trainer_cls', [GCACGMMTrainer, VMFCACGMMTrainer])
def test_inline_permutation_alignment_smoke(trainer_cls):
    observation, embedding, active = _separable_data(seed=2)
    model = trainer_cls().fit(
        observation, embedding, num_classes=2, iterations=5,
        inline_permutation_alignment=True)
    affiliation = np.asarray(model.predict(observation, embedding))
    assert affiliation.shape == (8, 2, 120)
    assert_allclose(affiliation.sum(1), 1.0, rtol=1e-5)


def test_gcacgmm_covariance_types(data):
    observation, embedding = data
    for covariance_type, expected in [
        ('spherical', (2,)),
        ('diagonal', (2, 10)),
        ('full', (2, 10, 10)),
    ]:
        model = GCACGMMTrainer().fit(
            observation, embedding, num_classes=2, iterations=2,
            covariance_type=covariance_type)
        assert model.gaussian.covariance.shape == expected, covariance_type


def test_gcacgmm_fixed_covariance(data):
    observation, embedding = data
    fixed = np.ones((2,))
    model = GCACGMMTrainer().fit(
        observation, embedding, num_classes=2, iterations=3,
        covariance_type='spherical', fixed_covariance=fixed)
    assert_allclose(np.asarray(model.gaussian.covariance), fixed)
